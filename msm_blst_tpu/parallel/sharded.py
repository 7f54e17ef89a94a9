"""Mesh-sharded MSM: the TPU-native replacement for the reference's thread-pool
tile decomposition (/root/reference/bindings/rust/src/lib.rs:1804-1949).

Decomposition (SURVEY.md §2e):
  * the **points axis** is sharded over the 1-D mesh axis 'points': each chip
    holds a contiguous block of fixed points and the matching slice of the
    precomputation tables (tables are i-major, so a points shard is a
    contiguous table shard);
  * each chip recodes its scalars, sorts its local digit stream, and
    accumulates a full private bucket array (the analog of each Rust worker's
    private scratch, lib.rs:1882);
  * bucket arrays are combined with a **butterfly all-reduce whose combiner is
    the elliptic-curve group law** (jax.lax.psum only sums field components,
    which is meaningless for points) — log2(D) ppermute rounds over ICI;
  * bucket integration and to-affine run replicated (identical on all chips).

Everything is shard_map'd over a Mesh, so the same code drives 1 chip, one
host's 8 chips, or a multi-host slice (points axis over DCN-connected slices
would ride the same collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.ops import (AffinePoint, CurveOps, JacPoint, PackedRows,
    PackedRows32, RowAffine, XyzzPoint)
from ..msm import recode
from ..msm.engine import (
    MsmPlan,
    bgmw_slots,
    bgmw_table_slots,
    ches_slots,
    integrate_gapped,
    integrate_weighted_consecutive,
    _bucket_sums_stream,
)


def _require_i_layout(plan: MsmPlan, where: str) -> None:
    if plan.layout != "i":
        raise ValueError(
            f"{where}: the sharded MSM paths assume i-major table slots; "
            f"got layout={plan.layout!r}. Rebuild the plan with "
            "build_plan(..., streamed=False).")

try:  # jax >= 0.6 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = jax.shard_map
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_points_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), ("points",), devices=devs[:n])


def ec_allreduce_xyzz(curve: CurveOps, pts: XyzzPoint, axis_name: str) -> XyzzPoint:
    """All-reduce a batch of xyzz points with the EC group law as combiner.

    Butterfly: log2(D) rounds of pairwise exchange (XOR partner) + vectorized
    dadd. D must be a power of two (XOR partnering is only a permutation
    then); asserted at trace time.
    """
    D = jax.lax.axis_size(axis_name)
    if D & (D - 1):
        raise ValueError(
            f"ec_allreduce_xyzz: axis {axis_name!r} has {D} devices; the XOR "
            "butterfly requires a power of two (use a 2-D mesh or pad the "
            "device list)")
    step = 1
    while step < D:
        perm = [(i, i ^ step) for i in range(D)]
        other = XyzzPoint(
            *(jax.lax.ppermute(c, axis_name, perm) for c in pts)
        )
        pts = curve.xyzz_dadd(pts, other)
        step *= 2
    return pts


def shard_plan_tables(plan: MsmPlan, mesh: Mesh):
    """Place the plan's big tables sharded over the points axis.

    Requires the i-major table layout (slot = 3*(i*h+j)+m-1 / i*h+j): there a
    contiguous slice of the slot axis IS a contiguous slice of the points
    axis, so `NamedSharding(P("points", None))` on the row axis puts each
    device exactly its own points' rows. Under the j-major streamed layout
    (slot = 3*(j*n+i)+m-1, build_plan(streamed=True)) the same row slice is a
    *window* shard instead, and the local slot formulas in _local_*_buckets
    would gather wrong rows silently — hence the hard check.
    Small lookup tables are replicated.
    """
    if plan.layout != "i":
        raise ValueError(
            "shard_plan_tables: points-axis sharding requires the i-major "
            f"table layout; this plan has layout={plan.layout!r} (built with "
            "streamed=True). Rebuild with build_plan(..., streamed=False) "
            "for mesh sharding.")
    shard = NamedSharding(mesh, P(None, "points"))
    shard2 = NamedSharding(mesh, P(None, None, "points"))
    shard_rows = NamedSharding(mesh, P("points", None))
    repl = NamedSharding(mesh, P())

    def place(pt):
        if pt is None:
            return None
        if isinstance(pt, (RowAffine, PackedRows, PackedRows32)):
            spec = shard_rows  # rows are slot-major; slots are i-major
        else:
            spec = shard2 if pt.X.ndim == 3 else shard
        return type(pt)(*(jax.device_put(c, spec) for c in pt))

    plan.table3nh = place(plan.table3nh)
    plan.table_nh = place(plan.table_nh)
    plan.points = place(plan.points)
    if plan.digit_tables is not None:
        plan.digit_tables = tuple(jax.device_put(t, repl) for t in plan.digit_tables)
    if plan.value_to_index is not None:
        plan.value_to_index = jax.device_put(plan.value_to_index, repl)
    if plan.packed_table is not None:
        plan.packed_table = jax.device_put(plan.packed_table, repl)
    return plan


def _local_ches_buckets(plan: MsmPlan, scalars):
    """Per-shard: recode local scalars, accumulate private bucket array."""
    cfg, curve = plan.cfg, plan.curve
    n = scalars.shape[1]
    h = cfg.h
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
    if plan.packed_table is not None:
        keys, m1, s = recode.ches_recode_device_packed(
            scalars, cfg.c, h, plan.packed_table
        )
        slots = ches_slots(plan, i_idx, j_idx, m1, n, h)
    else:
        b, m, s = recode.ches_recode_device(scalars, cfg.c, h, plan.digit_tables)
        slots = ches_slots(plan, i_idx, j_idx, m - 1, n, h)
        keys = jnp.take(plan.value_to_index, b)
    return _bucket_sums_stream(
        curve, plan.table3nh, slots.reshape(-1), keys.reshape(-1),
        s.reshape(-1), cfg.b_size
    )


def _local_bgmw_buckets(plan: MsmPlan, scalars):
    cfg, curve = plan.cfg, plan.curve
    c, h = cfg.c_bgmw, cfg.h_bgmw
    n = scalars.shape[1]
    if c * h <= 255:
        scalars, flip = recode.fold_r_minus_a_device(scalars)
    else:
        flip = None
    absd, sign = recode.signed_digits_device(scalars, c, h)
    if flip is not None:
        sign = sign ^ flip[None, :]
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
    slots = bgmw_slots(plan, i_idx, j_idx, n, h)
    table, slots = bgmw_table_slots(plan, slots)
    return _bucket_sums_stream(
        curve, table, slots.reshape(-1), absd.reshape(-1),
        sign.reshape(-1), (cfg.q_bgmw >> 1) + 1
    )


def _specs_for(curve: CurveOps):
    fp_pt = P(None, "points") if curve.name == "G1" else P(None, None, "points")
    fp_rep = P(None) if curve.name == "G1" else P(None, None)
    jac = JacPoint(
        *(P(*(None,) * (2 if curve.name == "G1" else 3)) for _ in range(3))
    )
    return fp_pt, fp_rep, jac


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
    except TypeError:  # older jax spelling
        return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_rep=False)


def sharded_msm_ches(plan: MsmPlan, mesh: Mesh):
    """Build the jitted multi-chip CHES MSM: scalars uint32[8, n] -> Jacobian
    (replicated). Scalars + tables are sharded over 'points'."""
    _require_i_layout(plan, "sharded_msm_ches")
    curve = plan.curve
    fp_pt, _, jac_spec = _specs_for(curve)

    def inner(scalars, table, digit_tables, v2i, packed):
        local = MsmPlan(
            curve=curve, cfg=plan.cfg, table3nh=table,
            digit_tables=digit_tables, value_to_index=v2i,
            packed_table=packed, bucket_gaps=plan.bucket_gaps,
        )
        buckets = _local_ches_buckets(local, scalars)
        buckets = ec_allreduce_xyzz(curve, buckets, "points")
        return curve.xyzz_to_jac(integrate_gapped(curve, buckets, plan.bucket_gaps))

    rows_spec = type(plan.table3nh)(P("points", None))
    mapped = _shard_map(
        inner,
        mesh,
        (P(None, "points"), rows_spec, (P(), P(), P()), P(),
         P()),
        jac_spec,
    )
    jitted = jax.jit(mapped)

    def run(scalars):
        return jitted(scalars, plan.table3nh, plan.digit_tables,
                      plan.value_to_index, plan.packed_table)

    return run


def sharded_msm_bgmw(plan: MsmPlan, mesh: Mesh):
    _require_i_layout(plan, "sharded_msm_bgmw")
    curve = plan.curve
    fp_pt, _, jac_spec = _specs_for(curve)
    aliased = plan.table_nh is None and plan.bgmw_stride3
    table_global = plan.table3nh if aliased else plan.table_nh

    def inner(scalars, table):
        local = MsmPlan(curve=curve, cfg=plan.cfg,
                        table_nh=None if aliased else table,
                        table3nh=table if aliased else None,
                        bgmw_stride3=aliased)
        buckets = _local_bgmw_buckets(local, scalars)
        buckets = ec_allreduce_xyzz(curve, buckets, "points")
        return curve.xyzz_to_jac(integrate_weighted_consecutive(curve, buckets))

    rows_spec = type(table_global)(P("points", None))
    mapped = _shard_map(
        inner, mesh, (P(None, "points"), rows_spec), jac_spec
    )
    jitted = jax.jit(mapped)

    def run(scalars):
        return jitted(scalars, table_global)

    return run


# ---------------------------------------------------------------------------
# 2-D decomposition: points x windows (the Rust breakdown() analog,
# /root/reference/bindings/rust/src/lib.rs:2026-2062 — nx point-chunks by
# ny window-chunks; here mesh axes 'points' x 'windows')
# ---------------------------------------------------------------------------


def breakdown(n_points: int, n_devices: int, h: int):
    """Pick the (points, windows) mesh shape: prefer the points axis
    (embarrassingly parallel); open the window axis when point shards would
    drop below ~256 lanes (the Rust policy's shape, lib.rs:2026-2062).
    Window padding (_pad_table_windows / _window_block) removes the old
    h % (nw*2) == 0 divisibility requirement — h=13 configs now open the
    axis too; only nw <= h is required (>=1 real window per shard)."""
    nw = 1
    np_ = n_devices
    while np_ > 1 and n_points // np_ < 256 and nw * 2 <= h:
        np_ //= 2
        nw *= 2
    return np_, nw


def make_2d_mesh(n_points_axis: int, n_windows_axis: int) -> Mesh:
    devs = jax.devices()[: n_points_axis * n_windows_axis]
    return jax.make_mesh(
        (n_points_axis, n_windows_axis), ("points", "windows"), devices=devs
    )


def sharded_msm_ches_2d(plan: MsmPlan, mesh: Mesh):
    """CHES MSM over a ('points', 'windows') mesh.

    Scalars and tables shard over 'points'; each chip recodes its local
    scalars and keeps only its own h/W window rows of the digit stream
    (CHES windows are independent stream elements — no combine doublings),
    accumulates private buckets, then one EC butterfly all-reduce over both
    axes. Integration is replicated.
    """
    _require_i_layout(plan, "sharded_msm_ches_2d")
    curve = plan.curve
    cfg = plan.cfg
    fp_pt, _, jac_spec = _specs_for(curve)
    n_w = mesh.shape["windows"]
    assert cfg.h % n_w == 0, "windows axis must divide h"
    h_loc = cfg.h // n_w

    def inner(scalars, table, packed):
        n = scalars.shape[1]
        h = cfg.h
        keys_f, m1, s = recode.ches_recode_device_packed(
            scalars, cfg.c, h, packed
        )
        w_idx = jax.lax.axis_index("windows")
        j0 = w_idx * h_loc
        kl = jax.lax.dynamic_slice_in_dim(keys_f, j0, h_loc, axis=0)
        ml = jax.lax.dynamic_slice_in_dim(m1, j0, h_loc, axis=0)
        sl = jax.lax.dynamic_slice_in_dim(s, j0, h_loc, axis=0)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (h_loc, n), 1)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (h_loc, n), 0) + j0
        slots = 3 * (i_idx * h + j_idx) + ml
        buckets = _bucket_sums_stream(
            curve, table, slots.reshape(-1), kl.reshape(-1),
            sl.reshape(-1), cfg.b_size
        )
        buckets = ec_allreduce_xyzz(curve, buckets, "windows")
        buckets = ec_allreduce_xyzz(curve, buckets, "points")
        return curve.xyzz_to_jac(
            integrate_gapped(curve, buckets, plan.bucket_gaps)
        )

    rows_spec = type(plan.table3nh)(P("points", None))
    mapped = _shard_map(
        inner,
        mesh,
        (
            P(None, "points"),
            rows_spec,
            P(),
        ),
        jac_spec,
    )
    jitted = jax.jit(mapped)

    def run(scalars):
        return jitted(scalars, plan.table3nh, plan.packed_table)

    return run


# ---------------------------------------------------------------------------
# window-block sharding for J-MAJOR (streamed / big-n) tables — the sharding
# story for the sizes where multi-chip matters most: the n=2^20/2^21 CHES
# tables (7.2 GB G1, 14.5 GB G2) are built j-major, whose rows are
# WINDOW-contiguous (row 3*(j*n+i)+m-1 / j*n+i), so a contiguous row slice
# is a block of whole windows. The reference's Rust decomposition opens the
# same window axis for its grid (/root/reference/bindings/rust/src/
# lib.rs:1836-1948, 2026-2062); CHES/BGMW windows are independent digit
# streams with NO combine doublings, so window shards need only the final
# bucket all-reduce.
# ---------------------------------------------------------------------------


def make_windows_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), ("windows",), devices=devs[:n])


def _require_j_layout(plan: MsmPlan, where: str) -> None:
    if plan.layout != "j":
        raise ValueError(
            f"{where}: window-block sharding assumes j-major (window-"
            f"contiguous) table rows; got layout={plan.layout!r}. Use the "
            "points-axis paths (shard_plan_tables + sharded_msm_*) for "
            "i-major plans, or rebuild with build_plan(..., streamed=True).")


def _pad_table_windows(table, rows_per_window: int, h: int, h_pad: int):
    """Append (h_pad - h) window blocks REPLICATING window 0's rows so the
    row axis divides evenly across the mesh. The replicas are valid curve
    points but are only ever gathered by masked (bucket-0) digits, whose
    bucket every integration weights by zero — they can never reach the
    result."""
    if h_pad == h:
        return table
    extra = h_pad - h

    def padded(arr):
        return jnp.concatenate(
            [arr, jnp.tile(arr[:rows_per_window], (extra, 1))], axis=0)

    if isinstance(table, (PackedRows, PackedRows32)):
        return type(table)(padded(table.XY))
    if isinstance(table, RowAffine):
        return RowAffine(padded(table.X), padded(table.Y))
    raise TypeError(f"_pad_table_windows: {type(table).__name__}")


def shard_plan_tables_jmajor(plan: MsmPlan, mesh: Mesh) -> MsmPlan:
    """Place a j-major plan's tables sharded over the 'windows' mesh axis
    (window-padded to the axis size); small lookup tables replicated."""
    _require_j_layout(plan, "shard_plan_tables_jmajor")
    D = mesh.shape["windows"]
    cfg = plan.cfg
    shard_rows = NamedSharding(mesh, P("windows", None))
    repl = NamedSharding(mesh, P())

    def place(table, h: int, rows_per_window: int):
        if table is None:
            return None
        h_pad = -(-h // D) * D
        table = _pad_table_windows(table, rows_per_window, h, h_pad)
        return type(table)(*(jax.device_put(c, shard_rows) for c in table))

    if plan.table3nh is not None:
        n = (plan.table3nh.XY.shape[0]
             if isinstance(plan.table3nh, (PackedRows, PackedRows32))
             else plan.table3nh.X.shape[0]) // (3 * cfg.h)
        plan.table3nh = place(plan.table3nh, cfg.h, 3 * n)
    if plan.table_nh is not None:
        n = (plan.table_nh.XY.shape[0]
             if isinstance(plan.table_nh, (PackedRows, PackedRows32))
             else plan.table_nh.X.shape[0]) // cfg.h_bgmw
        plan.table_nh = place(plan.table_nh, cfg.h_bgmw, n)
    for name in ("packed_table", "packed_table_value", "value_to_index"):
        t = getattr(plan, name)
        if t is not None:
            setattr(plan, name, jax.device_put(t, repl))
    if plan.digit_tables is not None:
        plan.digit_tables = tuple(
            jax.device_put(t, repl) for t in plan.digit_tables)
    return plan


def _window_block(arrs, j0, h_loc: int, h: int, h_pad: int):
    """Slice [j0, j0+h_loc) window rows out of [h, n] digit arrays, zero-
    padding windows >= h (their digits land in bucket 0: key 0, m=1,
    sign +)."""
    pad = h_pad - h
    out = []
    for a in arrs:
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        out.append(jax.lax.dynamic_slice_in_dim(a, j0, h_loc, axis=0))
    return out


def sharded_msm_ches_windows(plan: MsmPlan, mesh: Mesh):
    """CHES MSM with the TABLE (and digit stream) sharded over 'windows':
    scalars replicated, each chip recodes and keeps only its own window
    block, accumulates a private bucket array over its LOCAL table rows
    (local slot 3*(j_loc*n + i) + m-1), then one EC butterfly all-reduce.
    This is the path that shards the 2^20/2^21 j-major tables HBM-wise."""
    _require_j_layout(plan, "sharded_msm_ches_windows")
    curve, cfg = plan.curve, plan.cfg
    D = mesh.shape["windows"]
    h, c = cfg.h, cfg.c
    h_loc = -(-h // D)
    h_pad = h_loc * D
    _, _, jac_spec = _specs_for(curve)

    def inner(scalars, table, packed):
        n = scalars.shape[1]
        keys_f, m1, s = recode.ches_recode_device_packed(scalars, c, h, packed)
        j0 = jax.lax.axis_index("windows") * h_loc
        kl, ml, sl = _window_block((keys_f, m1, s), j0, h_loc, h, h_pad)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (h_loc, n), 1)
        jl_idx = jax.lax.broadcasted_iota(jnp.int32, (h_loc, n), 0)
        slots = 3 * (jl_idx * n + i_idx) + ml  # LOCAL j-major slot
        buckets = _bucket_sums_stream(
            curve, table, slots.reshape(-1), kl.reshape(-1),
            sl.reshape(-1), cfg.b_size)
        buckets = ec_allreduce_xyzz(curve, buckets, "windows")
        return curve.xyzz_to_jac(
            integrate_gapped(curve, buckets, plan.bucket_gaps))

    rows_spec = type(plan.table3nh)(P("windows", None))
    mapped = _shard_map(
        inner, mesh, (P(None, None), rows_spec, P()), jac_spec)
    jitted = jax.jit(mapped)

    def run(scalars):
        return jitted(scalars, plan.table3nh, plan.packed_table)

    return run


def sharded_msm_bgmw_windows(plan: MsmPlan, mesh: Mesh):
    """BGMW95 twin of sharded_msm_ches_windows (handles the stride-3
    aliased table: local j-major nh slot j_loc*n+i maps to CHES row
    3*(j_loc*n+i))."""
    _require_j_layout(plan, "sharded_msm_bgmw_windows")
    curve, cfg = plan.curve, plan.cfg
    D = mesh.shape["windows"]
    c, h = cfg.c_bgmw, cfg.h_bgmw
    h_loc = -(-h // D)
    h_pad = h_loc * D
    _, _, jac_spec = _specs_for(curve)
    aliased = plan.table_nh is None and plan.bgmw_stride3
    if aliased and cfg.h != h:
        raise ValueError("stride-3 aliasing requires matching radixes")
    table_global = plan.table3nh if aliased else plan.table_nh

    def inner(scalars, table):
        n = scalars.shape[1]
        scalars = recode.reduce_mod_r_device(scalars)
        if c * h <= 255:
            scalars, flip = recode.fold_r_minus_a_device(scalars)
        else:
            flip = None
        absd, sign = recode.signed_digits_device(scalars, c, h)
        if flip is not None:
            sign = sign ^ flip[None, :]
        j0 = jax.lax.axis_index("windows") * h_loc
        al, sl = _window_block((absd, sign), j0, h_loc, h, h_pad)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (h_loc, n), 1)
        jl_idx = jax.lax.broadcasted_iota(jnp.int32, (h_loc, n), 0)
        slots = jl_idx * n + i_idx
        if aliased:
            slots = slots * 3
        buckets = _bucket_sums_stream(
            curve, table, slots.reshape(-1), al.reshape(-1),
            sl.reshape(-1), (cfg.q_bgmw >> 1) + 1)
        buckets = ec_allreduce_xyzz(curve, buckets, "windows")
        return curve.xyzz_to_jac(
            integrate_weighted_consecutive(curve, buckets))

    rows_spec = type(table_global)(P("windows", None))
    mapped = _shard_map(inner, mesh, (P(None, None), rows_spec), jac_spec)
    jitted = jax.jit(mapped)

    def run(scalars):
        return jitted(scalars, table_global)

    return run
