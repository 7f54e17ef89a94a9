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


def _chunked_get(arr, chunk_bytes: int = 256 * 1024 * 1024) -> np.ndarray:
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


def _chunked_put(host, chunk_bytes: int = 256 * 1024 * 1024):
    """host -> device in bounded slices (donated dynamic_update_slice into a
    preallocated buffer): one multi-GB device_put exhausts the transport
    staging just like the get direction."""
    import functools

    import jax
    import jax.numpy as jnp

    total = int(np.prod(host.shape)) * host.dtype.itemsize
    if total <= chunk_bytes:
        return jnp.asarray(host)
    rows_per = max(1, chunk_bytes // (int(np.prod(host.shape[1:]))
                                      * host.dtype.itemsize))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def wr(buf, part, start):
        idx = (start,) + (jnp.int32(0),) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, part, idx)

    buf = jnp.zeros(host.shape, host.dtype)
    lo = 0
    while lo < host.shape[0]:
        hi = min(lo + rows_per, host.shape[0])
        part = np.ascontiguousarray(host[lo:hi])
        if part.shape[0] < rows_per and lo > 0:
            # keep one jit specialization: pad the tail slice (overwrites
            # rows already equal to themselves is wrong — so pad by
            # REPEATING the final rows and writing at an earlier offset)
            off = host.shape[0] - rows_per
            part = np.ascontiguousarray(host[off:])
            lo = off
        buf = wr(buf, jnp.asarray(part), jnp.int32(lo))
        lo += rows_per
    return buf


def save_plan(plan: MsmPlan, cache_dir: str) -> str:
    """Persist the plan's device tables. Returns the cache base path.

    Per-table .npy files + a small json meta (round 4): one table per file
    so adding the second algorithm's table to an existing cache never
    re-fetches or rewrites the first (at n=2^21 the 7.2 GB CHES fetch next
    to a resident BGMW table OOM'd the chip); unchanged tables whose file
    already exists with the right size are skipped entirely."""
    import json

    os.makedirs(cache_dir, exist_ok=True)
    n = _plan_n(plan)
    base = os.path.join(cache_dir, _key(plan.curve, plan.cfg, n))
    # >~5 GB total fetch exhausts the axon transport staging even chunked
    # (RESOURCE_EXHAUSTED at the 7.2 GB 2^21 CHES table, r4); such tables
    # rebuild each run instead — reported separately as precompute time,
    # matching the reference's always-rebuild policy (SURVEY §5).
    max_bytes = int(os.environ.get("MSM_CACHE_MAX_MB", "5000")) * 1024 * 1024

    def _nbytes(t):
        return sum(int(np.prod(c.shape)) * 4 for c in t)

    meta_path = base + "_meta.json"
    # merge with the existing meta: a later save of a plan lacking a
    # previously-omitted table must not erase the 'omitted' record (it is
    # exactly the partial-cache-vs-never-built distinction); names whose
    # files now exist drop out below.
    prev_omitted: list = []
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if old.get("layout") != plan.layout:
            raise ValueError(
                f"cache layout mismatch at {base}: cached "
                f"{old.get('layout')!r} vs plan {plan.layout!r}")
        prev_omitted = list(old.get("omitted", []))
    meta = {"layout": plan.layout, "omitted": []}

    def _same_content(existing, arr) -> bool:
        """Cheap staleness probe: shape plus first/last rows. The cache key
        has no point digest, so a plan built over DIFFERENT points with the
        same (curve, n, cfg) must overwrite, not skip."""
        if existing.shape != tuple(arr.shape):
            return False
        k = min(2, arr.shape[0])
        head = _chunked_get(arr[:k])
        tail = _chunked_get(arr[-k:])
        return (np.array_equal(np.asarray(existing[:k]), head)
                and np.array_equal(np.asarray(existing[-k:]), tail))

    def _save_coord(path, arr):
        if os.path.exists(path):
            try:
                existing = np.load(path, mmap_mode="r")
                if _same_content(existing, arr):
                    return  # already cached with identical content
            except Exception:
                pass  # corrupt/truncated file: fall through and rewrite
        host = _chunked_get(arr)
        # atomic publish: np.save is not atomic and an interrupted save
        # would leave a truncated .npy that poisons every later load
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, host)
        os.replace(tmp, path)

    for name, table in (("t3nh", plan.table3nh), ("tnh", plan.table_nh),
                        ("points", plan.points)):
        if table is None:
            continue
        if _nbytes(table) > max_bytes:
            meta["omitted"].append(name)
            continue
        try:
            if isinstance(table, PackedRows32):
                _save_coord(base + f"_{name}_xy32.npy", table.XY)
            elif isinstance(table, PackedRows):
                _save_coord(base + f"_{name}_xy.npy", table.XY)
            else:
                _save_coord(base + f"_{name}_x.npy", table.X)
                _save_coord(base + f"_{name}_y.npy", table.Y)
        except Exception:
            # transport staging can refuse transfers when the chip is near
            # capacity; a missing cache entry only costs a rebuild
            meta["omitted"].append(name)
            for suffix in ("_xy32", "_xy", "_x", "_y"):
                p = base + f"_{name}{suffix}.npy"
                if os.path.exists(p):
                    os.remove(p)  # drop possibly-partial writes; rebuilt next run
    for name in prev_omitted:
        # carry forward earlier omissions whose files still don't exist
        if name not in meta["omitted"] and not any(
                os.path.exists(base + f"_{name}{sfx}.npy")
                for sfx in ("_xy32", "_xy", "_x")):
            meta["omitted"].append(name)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return base


def load_plan(curve: CurveOps, cfg: P.MsmConfig, n: int,
              cache_dir: str,
              tables: tuple = ("t3nh", "tnh", "points")) -> Optional[MsmPlan]:
    """Load a persisted plan; None if not cached. Host-side params (digit
    tables, bucket gaps) are rebuilt — they are cheap and config-derived.

    `tables` selects which cached tables to upload — a caller benching one
    algorithm should not spend HBM + transport on the other's multi-GB
    table (it would only drop it again)."""
    import jax.numpy as jnp

    import json

    base = os.path.join(cache_dir, _key(curve, cfg, n))
    meta_path = base + "_meta.json"
    legacy = base + ".npz"
    if not os.path.exists(meta_path) and not os.path.exists(legacy):
        return None
    plan = MsmPlan(curve=curve, cfg=cfg)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        plan.layout = meta.get("layout", "i")
        plan.cache_omitted = tuple(meta.get("omitted", []))

        def _load_np(path, **kw):
            """np.load with a truncated-file guard: np.save is not atomic
            (pre-round-5 caches), and a corrupt .npy would otherwise crash
            every run until deleted by hand — delete it and rebuild."""
            try:
                return np.load(path, **kw)
            except Exception:
                try:
                    os.remove(path)
                except OSError:
                    pass
                return None

        def get(name, rows=False):
            for suffix, cls in (("_xy32", PackedRows32), ("_xy", PackedRows)):
                p = base + f"_{name}{suffix}.npy"
                if rows and os.path.exists(p):
                    host = _load_np(p, mmap_mode="r")
                    return cls(_chunked_put(host)) if host is not None else None
            px, py = base + f"_{name}_x.npy", base + f"_{name}_y.npy"
            if not os.path.exists(px):
                return None
            hx, hy = _load_np(px), _load_np(py)
            if hx is None or hy is None:
                return None
            if rows:
                return PackedRows(_chunked_put(np.concatenate([hx, hy], axis=1)))
            return AffinePoint(jnp.asarray(hx), jnp.asarray(hy))
    else:  # legacy single-npz cache (rounds 1-3)
        data = np.load(legacy)
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
            if rows:  # pre-round-3 cache: repack RowAffine -> PackedRows
                return PackedRows(jnp.asarray(np.concatenate(
                    [data[name + "_x"], data[name + "_y"]], axis=1)))
            return AffinePoint(jnp.asarray(data[name + "_x"]),
                               jnp.asarray(data[name + "_y"]))

    plan.table3nh = get("t3nh", rows=True) if "t3nh" in tables else None
    plan.table_nh = get("tnh", rows=True) if "tnh" in tables else None
    plan.points = get("points") if "points" in tables else None
    if plan.table3nh is not None:
        m_t, b_t, a_t, _ = P.digit_conversion_table(cfg.q, cfg.ah)
        plan.digit_tables = tuple(jnp.asarray(t) for t in (m_t, b_t, a_t))
        plan.value_to_index = jnp.asarray(P.bucket_value_to_index(cfg.q, cfg.ah))
        plan.packed_table = jnp.asarray(P.packed_digit_table_pairs(cfg.q, cfg.ah)
            if os.environ.get("MSM_RECODE_PAIRS", "1") == "1"
            else P.packed_digit_table(cfg.q, cfg.ah))
        plan.packed_table_value = jnp.asarray(
            P.packed_digit_table_value(cfg.q, cfg.ah))
        plan.bucket_gaps = np.diff(cfg.bucket_set()).astype(np.int32)
    return plan
