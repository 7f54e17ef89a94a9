"""Precomputation-table persistence.

The reference rebuilds its 3nh/nh tables in-memory on every run (SURVEY.md §5
'Checkpoint / resume: none'); at n = 2^21 that is 75M points of double-and-add.
Here tables are persisted to .npz keyed by (curve, n, config) so a production
deployment builds once and maps thereafter. Arrays are stored in the on-device
limb layout (Montgomery domain), so loading is a straight host->HBM copy.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..curves.ops import AffinePoint, CurveOps, PackedRows, RowAffine
from . import params as P
from .engine import MsmPlan


def _key(curve: CurveOps, cfg: P.MsmConfig, n: int) -> str:
    return (
        f"{curve.name}_n{n}_c{cfg.c}_h{cfg.h}_ah{cfg.ah}"
        f"_cb{cfg.c_bgmw}_hb{cfg.h_bgmw}_rows"
    )


def save_plan(plan: MsmPlan, cache_dir: str) -> str:
    """Persist the plan's device tables. Returns the file path."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    if plan.points is not None:
        n = plan.points.X.shape[-1]
    else:
        t = plan.table3nh
        rows = t.XY.shape[0] if isinstance(t, PackedRows) else t.X.shape[0]
        n = rows // (3 * plan.cfg.h)
    path = os.path.join(cache_dir, _key(plan.curve, plan.cfg, n) + ".npz")
    # Tables beyond this are cheaper to rebuild (streamed, ~2 min at 2^20)
    # than to round-trip: a multi-GB device_get exhausts the device-side
    # staging over the transport (observed at the 7.2 GB 2^20 table).
    max_bytes = int(os.environ.get("MSM_CACHE_MAX_MB", "4096")) * 1024 * 1024

    def _nbytes(t):
        return sum(int(np.prod(c.shape)) * 4 for c in t)

    arrays = {}
    for name, table in (("t3nh", plan.table3nh), ("tnh", plan.table_nh),
                        ("points", plan.points)):
        if table is None:
            continue
        if _nbytes(table) > max_bytes:
            continue
        if isinstance(table, PackedRows):
            arrays[name + "_xy"] = np.asarray(jax.device_get(table.XY))
        else:
            arrays[name + "_x"] = np.asarray(jax.device_get(table.X))
            arrays[name + "_y"] = np.asarray(jax.device_get(table.Y))
    arrays["layout"] = np.array(plan.layout)
    np.savez_compressed(path, **arrays)
    return path


def load_plan(curve: CurveOps, cfg: P.MsmConfig, n: int,
              cache_dir: str) -> Optional[MsmPlan]:
    """Load a persisted plan; None if not cached. Host-side params (digit
    tables, bucket gaps) are rebuilt — they are cheap and config-derived."""
    import jax.numpy as jnp

    path = os.path.join(cache_dir, _key(curve, cfg, n) + ".npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    plan = MsmPlan(curve=curve, cfg=cfg)
    if "layout" in data:
        plan.layout = str(data["layout"])

    def get(name, rows=False):
        if rows and name + "_xy" in data:
            return PackedRows(jnp.asarray(data[name + "_xy"]))
        if name + "_x" not in data:
            return None
        if rows:  # pre-round-3 cache file: repack RowAffine -> PackedRows
            return PackedRows(jnp.asarray(np.concatenate(
                [data[name + "_x"], data[name + "_y"]], axis=1)))
        return AffinePoint(jnp.asarray(data[name + "_x"]),
                           jnp.asarray(data[name + "_y"]))

    plan.table3nh = get("t3nh", rows=True)
    plan.table_nh = get("tnh", rows=True)
    plan.points = get("points")
    if plan.table3nh is not None:
        m_t, b_t, a_t, _ = P.digit_conversion_table(cfg.q, cfg.ah)
        plan.digit_tables = tuple(jnp.asarray(t) for t in (m_t, b_t, a_t))
        plan.value_to_index = jnp.asarray(P.bucket_value_to_index(cfg.q, cfg.ah))
        plan.packed_table = jnp.asarray(P.packed_digit_table(cfg.q, cfg.ah))
        plan.packed_table_value = jnp.asarray(
            P.packed_digit_table_value(cfg.q, cfg.ah))
        plan.bucket_gaps = np.diff(cfg.bucket_set()).astype(np.int32)
    return plan
