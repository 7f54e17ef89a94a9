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

from ..curves.ops import (AffinePoint, CurveOps, PackedRows, PackedRows32,
                          RowAffine)
from . import params as P
from .engine import MsmPlan


def _key(curve: CurveOps, cfg: P.MsmConfig, n: int) -> str:
    from .precompute import pack_tables_default

    fmt = "_p32" if pack_tables_default() else ""
    return (
        f"{curve.name}_n{n}_c{cfg.c}_h{cfg.h}_ah{cfg.ah}"
        f"_cb{cfg.c_bgmw}_hb{cfg.h_bgmw}_rows{fmt}"
    )


def _rows(t):
    return (t.XY.shape[0] if isinstance(t, (PackedRows, PackedRows32))
            else t.X.shape[0])


def _plan_n(plan: MsmPlan) -> int:
    """n from whichever table the plan actually holds (a loaded bgmw-only
    plan has points=None and table3nh=None)."""
    if plan.points is not None:
        return plan.points.X.shape[-1]
    if plan.table3nh is not None:
        return _rows(plan.table3nh) // (3 * plan.cfg.h)
    if plan.table_nh is not None:
        return _rows(plan.table_nh) // plan.cfg.h_bgmw
    raise ValueError("save_plan: plan holds no tables to derive n from")


def _chunked_get(arr, chunk_bytes: int = 512 * 1024 * 1024) -> np.ndarray:
    """device_get in <=chunk_bytes slices along axis 0: a single multi-GB
    transfer exhausts the device-side staging over the axon tunnel
    (observed in round 3 at the 4.8 GB 2^21 nh table)."""
    import jax

    total = int(np.prod(arr.shape)) * 4
    if total <= chunk_bytes:
        return np.asarray(jax.device_get(arr))
    rows_per = max(1, chunk_bytes // (int(np.prod(arr.shape[1:])) * 4))
    parts = []
    for lo in range(0, arr.shape[0], rows_per):
        parts.append(np.asarray(jax.device_get(arr[lo:lo + rows_per])))
    return np.concatenate(parts, axis=0)


def save_plan(plan: MsmPlan, cache_dir: str) -> str:
    """Persist the plan's device tables. Returns the file path."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    n = _plan_n(plan)
    path = os.path.join(cache_dir, _key(plan.curve, plan.cfg, n) + ".npz")
    # Tables beyond this are cheaper to rebuild (streamed, ~2 min at 2^20)
    # than to round-trip: a multi-GB device_get exhausts the device-side
    # staging over the transport (observed at the 7.2 GB 2^20 table).
    max_bytes = int(os.environ.get("MSM_CACHE_MAX_MB", "8192")) * 1024 * 1024

    def _nbytes(t):
        return sum(int(np.prod(c.shape)) * 4 for c in t)

    arrays = {}
    omitted = []
    for name, table in (("t3nh", plan.table3nh), ("tnh", plan.table_nh),
                        ("points", plan.points)):
        if table is None:
            continue
        if _nbytes(table) > max_bytes:
            omitted.append(name)
            continue
        if isinstance(table, PackedRows32):
            arrays[name + "_xy32"] = _chunked_get(table.XY)
        elif isinstance(table, PackedRows):
            arrays[name + "_xy"] = _chunked_get(table.XY)
        else:
            arrays[name + "_x"] = _chunked_get(table.X)
            arrays[name + "_y"] = _chunked_get(table.Y)
    arrays["layout"] = np.array(plan.layout)
    # record size-omitted tables so loaders can tell "partial cache" from
    # "never built" (load_plan sets plan.cache_omitted)
    arrays["omitted"] = np.array(",".join(omitted))
    # uncompressed: table limbs are high-entropy (compression gains ~0) and
    # zlib on a multi-GB table costs minutes per save/load
    np.savez(path, **arrays)
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
    plan.cache_omitted = (
        tuple(t for t in str(data["omitted"]).split(",") if t)
        if "omitted" in data else ())

    def get(name, rows=False):
        if rows and name + "_xy32" in data:
            return PackedRows32(jnp.asarray(data[name + "_xy32"]))
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
