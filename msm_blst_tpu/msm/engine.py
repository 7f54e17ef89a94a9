"""The MSM engine: bucket accumulation, integration, and the four algorithms.

TPU-native formulation (SURVEY.md §2c "TPU equivalents"):

* **Bucket accumulation** — the reference scatters point-adds into buckets one
  at a time (multi_scalar.c:421-463). Data-dependent scatter-accumulate is
  hostile to XLA, so the digit stream is sorted by bucket and reduced per key.
  Default strategy: the prefix-scan pipeline (msm/prefix_pipeline.py) — plain
  chunked prefix sums, bucket = P(right) - P(left) at searchsorted boundaries.
  Fallback (MSM_BUCKET_IMPL=segmented): the head/tail/emission segmented
  reduction in msm/scan.py.
* **Bucket integration** — the descending suffix-sum loops
  (multi_scalar.c:281-344) become a reverse `associative_scan` plus weighted
  tree-reductions. The CHES d-gap trick Σ B[i]·bucket[i] = Σ gap_i·suffix_i is
  evaluated as 3 bit-masked tree-reductions (gaps ≤ 6 fit in 3 bits), i.e.
  Horner over {R_bit0, R_bit1, R_bit2}.
* **No doublings** anywhere in the CHES/BGMW95 query paths — windows are
  absorbed by the q^j precomputation exactly as in the reference; q = 2^c makes
  the table build a batched doubling chain (precompute.py).

Everything here is per-shard-correct: the same functions run under shard_map
with a private bucket array per chip (parallel/sharded.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ..curves.ops import AffinePoint, CurveOps, JacPoint, XyzzPoint
from . import params as P
from . import recode
from .scan import (
    fold_xyzz,
    scan_fold_axis,
    segmented_reduce_affine,
    suffix_scan_xyzz,
)


# ---------------------------------------------------------------------------
# segmented bucket accumulation
# ---------------------------------------------------------------------------


def segmented_bucket_sums(curve: CurveOps, points: AffinePoint, signs, keys,
                          n_buckets: int) -> XyzzPoint:
    """Sum signed affine points into buckets.

    Inputs are *sorted by key* (ascending). Returns XyzzPoint batch of
    n_buckets (bucket 0 included; integration weights it by zero).
    """
    return segmented_reduce_affine(curve, points, signs, keys, n_buckets)


def bucket_impl() -> str:
    """Bucket accumulation strategy: 'prefix' (default; prefix-scan +
    boundary differences, msm/prefix_pipeline.py) or 'segmented' (the
    round-2 head/tail/emission reduction, msm/scan.py)."""
    import os

    return os.environ.get("MSM_BUCKET_IMPL", "prefix")


def sort_num_keys() -> int:
    """1 = sort by bucket key only (payload rides, order within a bucket is
    arbitrary); 2 = lexicographic (key, payload) sort, which orders each
    bucket's gathers by ascending table slot — a gather-locality experiment
    for the big-n tables (MSM_SORT_SLOTS=1). Either order is correct: bucket
    sums are commutative."""
    import os

    return 2 if os.environ.get("MSM_SORT_SLOTS", "0") == "1" else 1


def _bucket_sums_stream(curve, table, slots, keys, signs, n_buckets: int):
    """Sort the digit stream by bucket key, then accumulate into buckets.

    slots/keys/signs: int32/int32/bool flat [N] streams (N = n*h)."""
    payload = (slots.astype(jnp.int32) << 1) | signs.astype(jnp.int32)
    keys_s, payload_s = jax.lax.sort(
        (keys.astype(jnp.int32), payload), num_keys=sort_num_keys()
    )
    signs_s = (payload_s & 1) != 0
    slots_s = payload_s >> 1
    if bucket_impl() == "prefix":
        from .prefix_pipeline import bucket_sums_prefix

        return bucket_sums_prefix(
            curve, table, slots_s, signs_s, keys_s, n_buckets
        )
    pts = curve.take(table, slots_s)
    return segmented_reduce_affine(curve, pts, signs_s, keys_s, n_buckets)


# ---------------------------------------------------------------------------
# bucket integration
# ---------------------------------------------------------------------------


def _weighted_small(curve: CurveOps, pts: XyzzPoint) -> XyzzPoint:
    """Sum i * pts[i] over a SMALL batch (suffix scan + fold)."""
    tail = XyzzPoint(*(c[..., 1:] for c in pts))
    suffix = suffix_scan_xyzz(curve, tail)
    return fold_xyzz(curve, suffix)


def integrate_weighted_consecutive(curve: CurveOps, buckets: XyzzPoint) -> XyzzPoint:
    """Sum i * buckets[i] over i = 0..K-1 (bucket 0's weight is 0).

    Index-split trick: i = u*C + v, so
      Sum_i i*b_i = C * Sum_u u*R_u + Sum_v v*K_v
    with R_u row sums and K_v column sums of the (U, C) bucket grid — two
    parallel folds over K lanes plus two tiny weighted sums, instead of a
    full-width suffix scan (spec equivalent: multi_scalar.c:281-297 with the
    ++buckets bucket-0 skip at :545; the algebra is associativity only).
    """
    K = buckets.X.shape[-1]
    if K <= 64:
        return _weighted_small(curve, buckets)
    C = 1 << max((K.bit_length() // 2), 1)
    U = -(-K // C)
    pad = U * C - K
    grid = XyzzPoint(
        *(
            jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)]).reshape(
                c.shape[:-1] + (U, C)
            )
            for c in buckets
        )
    )
    # row sums R_u (fold over v) and column sums K_v (fold over u)
    rows = scan_fold_axis(curve, grid, axis=-1)   # (U,)
    cols = scan_fold_axis(curve, grid, axis=-2)   # (C,)
    hi = _weighted_small(curve, rows)             # Sum_u u*R_u
    lo = _weighted_small(curve, cols)             # Sum_v v*K_v
    for _ in range(C.bit_length() - 1):
        hi = curve.xyzz_double(hi)
    return curve.xyzz_dadd(hi, lo)


def integrate_gapped(curve: CurveOps, buckets: XyzzPoint, gaps_np: np.ndarray) -> XyzzPoint:
    """Sum bucket_value[i] * buckets[i] for a non-consecutive ascending bucket
    set with gaps <= d_max (spec: multi_scalar.c:301-321, the d-CHES trick).

    gaps_np[i] = B[i+1] - B[i] for i = 0..K-2 (host constant per config).
    Identity: Sum_i B[i]*bucket[i] = Sum_{i>=1} gap_{i-1} * S_i with S_i the
    suffix sums over buckets[1:]. The gaps are HOST constants, so the suffix
    stream is statically gathered into d_max groups (one padded gather, one
    fold) and combined with weights 1..d_max — one pass over the stream
    instead of one masked fold per gap bit.
    """
    tail = XyzzPoint(*(c[..., 1:] for c in buckets))
    suffix = suffix_scan_xyzz(curve, tail)
    d_max = int(gaps_np.max()) if len(gaps_np) else 1
    groups = [np.nonzero(gaps_np == g)[0] for g in range(1, d_max + 1)]
    # per-gap exact-size folds: total dadd work = Km1 (no infinity padding;
    # the group index sets are host constants, so each gather+fold is static)
    sums = []
    for members in groups:
        if len(members) == 0:
            sums.append(None)
            continue
        part = curve.take(suffix, jnp.asarray(members.astype(np.int32)))
        sums.append(fold_xyzz(curve, part))
    # Sum_g g * sums[g-1] with g <= d_max (tiny; Horner over gap bits)
    acc: Optional[XyzzPoint] = None
    nbits = d_max.bit_length()
    for bit in range(nbits - 1, -1, -1):
        sel = [s for g, s in enumerate(sums, start=1)
               if ((g >> bit) & 1) and s is not None]
        part = None
        if sel:
            part = sel[0]
            for s in sel[1:]:
                part = curve.xyzz_dadd(part, s)
        if acc is not None:
            acc = curve.xyzz_double(acc)
            if part is not None:
                acc = curve.xyzz_dadd(acc, part)
        else:
            acc = part
    return acc


# ---------------------------------------------------------------------------
# plans
# ---------------------------------------------------------------------------


@dataclass
class MsmPlan:
    """Device-resident tables + static config for one (curve, n, config)."""

    curve: CurveOps
    cfg: P.MsmConfig
    # CHES (tables in PackedRows layout — curves/ops.py to_rows — for fast gathers)
    table3nh: Optional[AffinePoint] = None     # slot 3*(i*h+j)+m-1 (main_p1.cpp:155-177)
    digit_tables: Optional[tuple] = None       # (m_t, b_t, a_t) int32[q+1]
    value_to_index: Optional[jnp.ndarray] = None  # int32[q/2+2]
    packed_table: Optional[jnp.ndarray] = None  # int32[q+1] (params.packed_digit_table)
    noindexhash: bool = False                  # value-indexed buckets (multi_scalar.c:466-503)
    packed_table_value: Optional[jnp.ndarray] = None  # int32[q+1] (value-keyed)
    bucket_gaps: Optional[np.ndarray] = None   # host int32[B_SIZE-1]
    # BGMW95
    table_nh: Optional[AffinePoint] = None     # slot i*h'+j (main_p1.cpp:94-122)
    # table_nh aliased into table3nh via stride-3 slots (m=1 rows) when the
    # CHES and BGMW radixes match — the reference's reuse (main_p1.cpp:99-106)
    bgmw_stride3: bool = False
    # stock
    points: Optional[AffinePoint] = None       # the raw fixed points
    # table row layout: "i" = reference order (slot 3*(i*h+j)+m-1,
    # main_p1.cpp:163), "j" = window-contiguous (slot 3*(j*n+i)+m-1, the
    # streamed big-n builder — precompute.build_ches_table_rows_streamed)
    layout: str = "i"
    # tables the persisted cache skipped for size (cache.load_plan): lets
    # callers distinguish "partial cache" from "never built"
    cache_omitted: tuple = ()
    # cached jitted device pipelines (built lazily, keyed by input shape)
    _stream_jit: Optional[object] = field(default=None, repr=False, compare=False)
    # cached jit_msm / jit_msm_bign runners keyed by algo (facade hot path:
    # a fresh jax.jit(lambda ...) per call would recompile every query)
    _runners: Optional[dict] = field(default=None, repr=False, compare=False)


def plan_runner(plan: "MsmPlan", algo: str):
    """The plan's cached jitted runner for `algo` — built once per plan, so
    repeated facade calls at the same n compile nothing (VERDICT r4 weak 4).
    Big digit streams route through the ranged-chunking driver exactly as
    bench.py does."""
    if plan._runners is None:
        plan._runners = {}
    run = plan._runners.get(algo)
    if run is None:
        cfg = plan.cfg
        h = cfg.h if algo == "ches" else cfg.h_bgmw
        big = cfg.n * h > 7 * 1024 * 1024
        run = jit_msm_bign(plan, algo) if big else jit_msm(plan, algo)
        plan._runners[algo] = run
    return run


PLAN_ARRAY_FIELDS = (
    "table3nh", "digit_tables", "value_to_index", "packed_table",
    "packed_table_value", "table_nh", "points",
)


def jit_msm(plan: MsmPlan, algo: str = "ches", **kw):
    """Jit an MSM algorithm with the plan's device tables passed as jit
    ARGUMENTS (not closed-over constants): closed-over arrays are embedded
    into the serialized HLO, which at n >= 2^16 (264 MB 3nh table) exceeds
    the remote-compile transport limit — and re-traces on every new plan.

    Returns run(scalars) -> JacPoint.
    """
    import dataclasses

    fn = {"ches": msm_ches_device, "bgmw": msm_bgmw_device,
          "stock": msm_stock_pippenger}[algo]
    arrays = {f: getattr(plan, f) for f in PLAN_ARRAY_FIELDS
              if getattr(plan, f) is not None}

    @jax.jit
    def run(scalars, arrs):
        p = dataclasses.replace(plan, **arrs, _stream_jit=None)
        return fn(p, scalars, **kw)

    return lambda scalars: run(scalars, arrays)


def ches_slots(plan, i_idx, j_idx, m1, n: int, h: int):
    """Table row of the (i, j, m) CHES precompute entry under plan.layout."""
    if plan.layout == "j":
        return 3 * (j_idx * n + i_idx) + m1
    return 3 * (i_idx * h + j_idx) + m1


def bgmw_slots(plan, i_idx, j_idx, n: int, h: int):
    if plan.layout == "j":
        return j_idx * n + i_idx
    return i_idx * h + j_idx


def bgmw_table_slots(plan: MsmPlan, slots):
    """Resolve the BGMW table: a dedicated nh table, or the stride-3 view of
    the 3nh CHES table when the radixes match — the m=1 rows sit at 3*slot in
    BOTH layouts (i-major 3*(i*h+j), j-major 3*(j*n+i)); the reference's
    aliasing (main_p1.cpp:99-106) saves the whole nh table's HBM + build."""
    if plan.table_nh is not None:
        return plan.table_nh, slots
    if plan.bgmw_stride3 and plan.table3nh is not None:
        return plan.table3nh, slots * 3
    raise ValueError("plan has no BGMW table (build_plan(..., bgmw=True))")


# ---------------------------------------------------------------------------
# the four MSM algorithms
# ---------------------------------------------------------------------------


def _flatten_digit_stream(curve, table, slots, keys, signs):
    """Sort the digit stream by bucket key and gather table points.

    slots/keys/signs: int32/bool [N] flat streams (N = n*h).
    Returns (points sorted, signs sorted, keys sorted).

    The (slot, sign) payload rides the sort packed into one int32 — one
    variadic lax.sort instead of argsort plus three gathers. Slots fit
    30 bits (3nh < 2^28 even at n = 2^21)."""
    payload = (slots.astype(jnp.int32) << 1) | signs.astype(jnp.int32)
    keys_s, payload_s = jax.lax.sort(
        (keys.astype(jnp.int32), payload), num_keys=sort_num_keys()
    )
    signs_s = (payload_s & 1) != 0
    slots_s = payload_s >> 1
    pts = curve.take(table, slots_s)
    return pts, signs_s, keys_s


def msm_ches_device(plan: MsmPlan, scalars) -> JacPoint:
    """CHES 'nh + 0.21q' MSM with on-device integral scalar conversion.

    scalars: uint32[8, n] device array. Returns Jacobian (batch of 1).
    Query path: zero doublings (spec: main_p1.cpp:192-246 + multi_scalar.c:421-463).
    """
    cfg, curve = plan.cfg, plan.curve
    n = scalars.shape[1]
    h = cfg.h
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
    if plan.noindexhash and plan.packed_table_value is not None:
        # value-indexed bucket array (spec: multi_scalar.c:466-503): keys are
        # bucket VALUES; occupied entries are gathered back to the dense
        # index order before the d-gap integration.
        keys, m1, s = recode.ches_recode_device_packed(
            scalars, cfg.c, h, plan.packed_table_value
        )
        slots = ches_slots(plan, i_idx, j_idx, m1, n, h)
        n_val = (cfg.q >> 1) + 2
        buckets_val = _bucket_sums_stream(
            curve, plan.table3nh, slots.reshape(-1), keys.reshape(-1),
            s.reshape(-1), n_val
        )
        bs = jnp.asarray(cfg.bucket_set().astype(np.int32))
        buckets = curve.take(buckets_val, bs)
        return curve.xyzz_to_jac(
            integrate_gapped(curve, buckets, plan.bucket_gaps))
    if plan.packed_table is not None:
        keys, m1, s = recode.ches_recode_device_packed(
            scalars, cfg.c, h, plan.packed_table
        )
        slots = ches_slots(plan, i_idx, j_idx, m1, n, h)
    else:
        b, m, s = recode.ches_recode_device(scalars, cfg.c, h, plan.digit_tables)
        slots = ches_slots(plan, i_idx, j_idx, m - 1, n, h)
        keys = jnp.take(plan.value_to_index, b)
    buckets = _bucket_sums_stream(
        curve, plan.table3nh, slots.reshape(-1), keys.reshape(-1),
        s.reshape(-1), cfg.b_size
    )
    return curve.xyzz_to_jac(integrate_gapped(curve, buckets, plan.bucket_gaps))


# ---------------------------------------------------------------------------
# big-n driver: ranged chunking with host-side segment planning
# ---------------------------------------------------------------------------


def _ranged_chunk_target(table_bytes: int = 0, g2: bool = False) -> int:
    """Elements per bucket-range chunk. Tuned on v5e (round 5): bigger
    chunks amortize the ~150 ms/chunk fixed cost of the chunked pipeline —
    2^21 BGMW fell 4.83 s -> 3.92 s moving 2M -> 4M — but per-chunk
    transients (~4 coords x 96 B per element for G1) must fit HBM next to
    the table: 4M OOMs beside the 7.2 GB CHES table (3M fits), and G2 rows
    are twice the bytes, so half the elements."""
    import os

    env = os.environ.get("MSM_RANGED_CHUNK")
    if env:
        return int(env)
    gb = 1024 ** 3
    base = (4 * 1024 * 1024 if table_bytes <= 3 * gb
            else 3 * 1024 * 1024 if table_bytes <= 7.5 * gb
            else 2 * 1024 * 1024)
    return base // 2 if g2 else base


def _ches_streams(plan: MsmPlan, scalars):
    cfg = plan.cfg
    n = scalars.shape[1]
    h = cfg.h
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
    keys, m1, s = recode.ches_recode_device_packed(
        scalars, cfg.c, h, plan.packed_table)
    slots = ches_slots(plan, i_idx, j_idx, m1, n, h)
    return slots.reshape(-1), keys.reshape(-1), s.reshape(-1), cfg.b_size

def _bgmw_streams(plan: MsmPlan, scalars):
    cfg = plan.cfg
    c, h = cfg.c_bgmw, cfg.h_bgmw
    n = scalars.shape[1]
    scalars = recode.reduce_mod_r_device(scalars)
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
    _, slots = bgmw_table_slots(plan, slots)  # stride-3 remap when aliased
    return (slots.reshape(-1), absd.reshape(-1), sign.reshape(-1),
            (cfg.q_bgmw >> 1) + 1)


def _mul_small_xyzz(curve: CurveOps, pt: XyzzPoint, k: int) -> XyzzPoint:
    """pt * k for a small STATIC positive int k (double-and-add, ~log2(k)
    point ops on a batch-1 point — negligible)."""
    assert k >= 1
    bits = bin(k)[2:]
    acc = pt
    for b in bits[1:]:
        acc = curve.xyzz_double(acc)
        if b == "1":
            acc = curve.xyzz_dadd(acc, pt)
    return acc


def _bgmw_partials_ranged(curve: CurveOps, table, slots_s, signs_s, keys_s,
                          n_buckets: int, starts, seg_len: int,
                          n_chunks: int):
    """Bucket-range chunking with the consecutive-weight integration FUSED
    into each chunk: chunk k (buckets [kW, (k+1)W)) emits only
    S_k = fold(b) and T_k = sum_v v*b_v, so the B-wide stacked bucket array
    never materializes. Returns (S XyzzPoint (..., L, K), T likewise)."""
    from .prefix_pipeline import _bucket_sums_prefix_single

    W = -(-n_buckets // n_chunks)
    # sentinel key = n_chunks*W: outside even the LAST chunk's local range
    # (a sentinel of n_buckets could land inside it and poison the fused
    # partials — unlike the stacked path there is no final discard slice)
    slots_p = jnp.pad(slots_s, (0, seg_len))
    signs_p = jnp.pad(signs_s, (0, seg_len))
    keys_p = jnp.pad(keys_s, (0, seg_len), constant_values=n_chunks * W)

    def body(_, st_k):
        st, k = st_k
        sl = lax.dynamic_slice_in_dim(slots_p, st, seg_len)
        sg = lax.dynamic_slice_in_dim(signs_p, st, seg_len)
        ky = lax.dynamic_slice_in_dim(keys_p, st, seg_len) - k * W
        b = XyzzPoint(*_bucket_sums_prefix_single(
            curve, table, sl, sg, ky, W))
        T = integrate_weighted_consecutive(curve, b)
        S = fold_xyzz(curve, b)
        return None, (tuple(S), tuple(T))

    ks = jnp.arange(n_chunks, dtype=jnp.int32)
    _, (Ss, Ts) = lax.scan(body, None, (starts[:-1], ks))

    def stack(cs):
        return XyzzPoint(*(jnp.moveaxis(x[..., 0], 0, -1) for x in cs))

    return stack(Ss), stack(Ts)


def jit_msm_bign(plan: MsmPlan, algo: str = "ches", n_chunks: int | None = None,
                 force_host_chunks: bool = False):
    """Big-n MSM with RANGED chunking (prefix_pipeline.bucket_sums_prefix_
    ranged): two jits with a host step between them that reads the K+1
    segment-start positions and picks the static seg_len — one tiny
    device->host sync per query (~25 ms over the tunnel; <1% of a
    seconds-scale big-n query), in exchange for dropping the O(K·B)
    position-chunk boundary/merge dadds of the round-3 path.

    seg_len is rounded up to a 1/8-of-mean grid so repeated queries with
    fresh random scalars reuse the second jit's compilation.
    Returns run(scalars) -> JacPoint. Unconditionally correct: seg_len is
    derived from the ACTUAL max segment each call.
    """
    import dataclasses

    streams_of = {"ches": _ches_streams, "bgmw": _bgmw_streams}[algo]
    # the raw points never feed the fixed-base query; keeping them out of
    # the jit args saves their HBM next to a near-capacity table
    arrays = {f: getattr(plan, f) for f in PLAN_ARRAY_FIELDS
              if f != "points" and getattr(plan, f) is not None}

    def _plan_table(p):
        """Query table for this algo (stride-3 slot remap already applied in
        the stream builders when the BGMW table aliases the 3nh one)."""
        if algo == "ches" or p.table_nh is None:
            return p.table3nh
        return p.table_nh
    from .prefix_pipeline import bucket_sums_prefix_ranged, segment_starts

    @jax.jit
    def stage1(scalars, arrs):
        p = dataclasses.replace(plan, **arrs, _stream_jit=None)
        slots, keys, signs, n_buckets = streams_of(p, scalars)
        payload = (slots.astype(jnp.int32) << 1) | signs.astype(jnp.int32)
        keys_s, payload_s = jax.lax.sort(
            (keys.astype(jnp.int32), payload), num_keys=sort_num_keys())
        return keys_s, payload_s

    n_buckets = plan.cfg.b_size if algo == "ches" else (plan.cfg.q_bgmw >> 1) + 1

    # stage-2 flavor: the all-device lax.scan pipelines chunks with no host
    # round-trips but reserves a ~6 GB temp arena (measured); it wins while
    # the table leaves that much headroom (BGMW 2^21: 4.71 s scan vs 5.59 s
    # host loop). Near-capacity tables take the host-driven chunk loop whose
    # footprint is one chunk (CHES 2^21, 7.2 GB table: only path that fits).
    def _table_nbytes():
        t = _plan_table(plan)
        if t is None:
            return 0
        arrs = t if isinstance(t, tuple) else (t,)
        return sum(int(np.prod(c.shape)) * 4 for c in arrs)

    import os as _os

    _ds_env = _os.environ.get("MSM_BIGN_DEVICE_SCAN", "")
    if _ds_env in ("0", "1"):
        device_scan = _ds_env == "1" and not force_host_chunks
    else:
        # measured round 5: the all-device scan runs beside tables up to the
        # 7.2 GB 2^21 CHES one (5.21 s at 2M / 4.50 s at 3M chunks vs 6.28 s
        # for the host-driven loop); only near-HBM-capacity tables (G2 CHES
        # 2^21, 14.5 GB) still need the one-chunk-at-a-time host loop
        device_scan = _table_nbytes() <= 8 * 1024 ** 3 and not force_host_chunks

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def stage2_scan(keys_s, payload_s, arrs, seg_len, n_ch):
        p = dataclasses.replace(plan, **arrs, _stream_jit=None)
        table = _plan_table(p)
        signs_s = (payload_s & 1) != 0
        slots_s = payload_s >> 1
        starts, W = segment_starts(keys_s, n_buckets, n_ch)
        if algo == "bgmw":
            # fused per-chunk integration (round 5): chunk k owning buckets
            # [kW, (k+1)W) emits only S_k = fold(b) and T_k = sum_v v*b_v;
            # total = W * sum_k k*S_k + sum T_k. The B-wide stacked bucket
            # array (1.6 GB of G2 xyzz at 2^21, B = 2M+1) never
            # materializes, and the separate B-wide integrate pass is gone.
            S, T = _bgmw_partials_ranged(
                p.curve, table, slots_s, signs_s, keys_s, n_buckets,
                starts, seg_len, n_ch)
            hi = integrate_weighted_consecutive(p.curve, S)  # sum k*S_k
            hi = _mul_small_xyzz(p.curve, hi, W)
            return p.curve.xyzz_to_jac(
                p.curve.xyzz_dadd(hi, fold_xyzz(p.curve, T)))
        buckets = bucket_sums_prefix_ranged(
            p.curve, table, slots_s, signs_s, keys_s, n_buckets,
            starts, seg_len, n_ch)
        return p.curve.xyzz_to_jac(
            integrate_gapped(p.curve, buckets, plan.bucket_gaps))

    @functools.partial(jax.jit, static_argnums=(1,))
    def starts_of(keys_s, K):
        return segment_starts(keys_s, n_buckets, K)[0]

    @functools.partial(jax.jit, static_argnums=(2,))
    def pad_streams(keys_s, payload_s, seg_len):
        # sentinel key = n_buckets: lands past every chunk's bucket range
        keys_p = jnp.pad(keys_s, (0, seg_len), constant_values=n_buckets)
        payload_p = jnp.pad(payload_s, (0, seg_len))
        return keys_p, payload_p

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def chunk_buckets(keys_p, payload_p, arrs, start_and_koff, seg_len, W):
        """One bucket-range chunk -> its W-wide xyzz bucket slice. `start`
        (stream position) and `koff` (bucket offset k*W) ride as DEVICE
        scalars so every chunk shares one compilation."""
        from .prefix_pipeline import _bucket_sums_prefix_single

        p = dataclasses.replace(plan, **arrs, _stream_jit=None)
        table = _plan_table(p)
        start, koff = start_and_koff
        ky = lax.dynamic_slice_in_dim(keys_p, start, seg_len) - koff
        pl = lax.dynamic_slice_in_dim(payload_p, start, seg_len)
        return tuple(_bucket_sums_prefix_single(
            p.curve, table, pl >> 1, (pl & 1) != 0, ky, W))

    @jax.jit
    def integrate(bx, by, bzzz, bzz):
        buckets = XyzzPoint(
            *(c[..., :n_buckets] for c in (bx, by, bzzz, bzz)))
        if algo == "ches":
            return plan.curve.xyzz_to_jac(
                integrate_gapped(plan.curve, buckets, plan.bucket_gaps))
        return plan.curve.xyzz_to_jac(
            integrate_weighted_consecutive(plan.curve, buckets))

    seg_len_sticky = 0

    def run(scalars):
        nonlocal n_chunks, seg_len_sticky
        keys_s, payload_s = stage1(scalars, arrays)
        N = keys_s.shape[0]
        K = n_chunks or max(1, -(-N // _ranged_chunk_target(
            _table_nbytes(), plan.curve.name == "G2")))
        n_chunks = K
        W = -(-n_buckets // K)
        starts = starts_of(keys_s, K)
        st = np.asarray(jax.device_get(starts))  # K+1 ints: the host sync
        max_seg = int(np.max(np.diff(st))) if K > 1 else N
        # stable seg_len across scalar sets: a 1.06x-of-mean floor plus a
        # STICKY maximum (grow-only) means repeated queries reuse the chunk
        # compilation even when the digit distribution is skewed (BGMW's
        # zero-heavy bucket 0 chunk); the observed max still wins whenever
        # it exceeds everything seen (correctness unconditional)
        floor = int(1.06 * N / K) if K > 1 else N
        grid = max(-(-N // K) // 8, 1024)
        seg_len = -(-max(max_seg, floor, seg_len_sticky) // grid) * grid
        seg_len_sticky = seg_len
        if device_scan:
            return stage2_scan(keys_s, payload_s, arrays, seg_len, K)
        keys_p, payload_p = pad_streams(keys_s, payload_s, seg_len)
        # host-driven chunk loop: one jit reused K times (dispatches
        # pipeline without barriers); per-call HBM = ONE chunk's buffers,
        # which is what lets the 7.2 GB 2^21 CHES table coexist with the
        # query (the lax.scan formulation allocated a ~6 GB arena).
        parts = [chunk_buckets(
            keys_p, payload_p, arrays,
            (jnp.int32(st[k]), jnp.int32(k * W)), seg_len, W)
            for k in range(K)]
        coords = [jnp.concatenate([p[i] for p in parts], axis=-1)
                  for i in range(4)]
        return integrate(*coords)

    return run


def msm_ches_host_recode(plan: MsmPlan, scalars_np: np.ndarray) -> JacPoint:
    """CHES MSM with host-side recoding (reference method 1 analog).

    The digit stream is produced on the host (native C++ pass when built);
    the device pipeline (sort -> accumulate -> integrate) is jitted once per
    plan and reused across calls.
    """
    cfg, curve = plan.cfg, plan.curve
    n = scalars_np.shape[1]
    h = cfg.h
    b, m, s = recode.ches_recode_host(scalars_np, cfg.c, h, cfg.ah)  # [n, h]
    v2i = P.bucket_value_to_index(cfg.q, cfg.ah)
    keys = v2i[b]
    i_idx = np.arange(n, dtype=np.int64)[:, None]
    j_idx = np.arange(h, dtype=np.int64)[None, :]
    slots = np.asarray(
        ches_slots(plan, i_idx, j_idx, m - 1, n, h)).astype(np.int32)

    if plan._stream_jit is None:
        # table passed as a jit ARG (embedded-constant HLO blows the
        # remote-compile transport limit at big n; see jit_msm)
        def run(slots_f, keys_f, signs_f, table):
            buckets = _bucket_sums_stream(
                curve, table, slots_f, keys_f, signs_f, cfg.b_size
            )
            return curve.xyzz_to_jac(
                integrate_gapped(curve, buckets, plan.bucket_gaps)
            )

        plan._stream_jit = jax.jit(run)
    return plan._stream_jit(
        jnp.asarray(slots.reshape(-1)),
        jnp.asarray(keys.reshape(-1).astype(np.int32)),
        jnp.asarray(s.reshape(-1)),
        plan.table3nh,
    )


def msm_bgmw_device(plan: MsmPlan, scalars) -> JacPoint:
    """BGMW95 q/2 variant, fully on device (spec: main_p1.cpp:294-398).

    For tight configs (c*h <= 255) the top digit bound r >> c(h-1) exceeds
    q/2, so the group-order fold a -> r-a (+ global sign flip) is applied
    on device first, exactly as the reference does host-side.
    """
    cfg, curve = plan.cfg, plan.curve
    c, h = cfg.c_bgmw, cfg.h_bgmw
    n = scalars.shape[1]
    scalars = recode.reduce_mod_r_device(scalars)
    if c * h <= 255:
        scalars, flip = recode.fold_r_minus_a_device(scalars)
    else:
        flip = None
    absd, sign = recode.signed_digits_device(scalars, c, h)  # [h, n]
    if flip is not None:
        sign = sign ^ flip[None, :]
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
    slots = bgmw_slots(plan, i_idx, j_idx, n, h)
    table, slots = bgmw_table_slots(plan, slots)
    buckets = _bucket_sums_stream(
        curve, table, slots.reshape(-1), absd.reshape(-1),
        sign.reshape(-1), (cfg.q_bgmw >> 1) + 1
    )
    return curve.xyzz_to_jac(integrate_weighted_consecutive(curve, buckets))


def msm_stock_pippenger(plan: MsmPlan, scalars, window: Optional[int] = None,
                        nbits: int = 255) -> JacPoint:
    """Stock Pippenger baseline: no precomputation, per-window bucket pass +
    window-combine doublings (spec: multi_scalar.c:549-576).

    nbits bounds the scalars (blst API parity); one extra bit of headroom
    keeps the top signed digit <= q/2.
    """
    curve = plan.curve
    n = scalars.shape[1]
    c = window or pippenger_window_size(n)
    h = -(-(nbits + 1) // c)
    points_rows = curve.to_rows(plan.points)
    absd, sign = recode.signed_digits_device(scalars, c, h)  # [h, n]
    n_buckets = (1 << (c - 1)) + 1
    point_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

    def window_body(acc, digit_row):
        absd_j, sign_j = digit_row
        buckets = _bucket_sums_stream(
            curve, points_rows, point_idx, absd_j, sign_j, n_buckets
        )
        tile = integrate_weighted_consecutive(curve, buckets)
        for _ in range(c):
            acc = curve.xyzz_double(acc)
        return curve.xyzz_dadd(acc, tile), None

    # top window first: scan over reversed digit rows
    acc0 = curve.xyzz_inf((1,))
    acc, _ = lax.scan(window_body, acc0, (absd[::-1], sign[::-1]))
    return curve.xyzz_to_jac(acc)


def pippenger_window_size(npoints: int) -> int:
    """blst's window heuristic (spec: auxiliaryfunc.h:316-323)."""
    wbits = max(npoints.bit_length() - 1, 0)
    if wbits > 12:
        return wbits - 3
    if wbits > 4:
        return wbits - 2
    return 2 if wbits else 1
