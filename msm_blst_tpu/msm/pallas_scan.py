"""Fused Pallas kernels for the segmented bucket reduction.

The XLA formulation (msm/scan.py) drives each scan column as a separate
fused-point-kernel launch with HBM round trips for the carry state and
select glue between steps, and every recursion level traces its own
while-loop (a large share of both runtime overhead and compile time —
VERDICT.md round 1, items 1/3).

Here one pallas_call runs a whole level: grid = (lane_blocks, columns) with
the column axis innermost, so Mosaic iterates columns sequentially per lane
block while the run/head state lives in VMEM scratch — zero HBM traffic for
the carry, zero per-step launch overhead, and the combiner (the xyzz point
formulas from curves/ops.py, with the doubling path behind a batch-level
cond) is traced exactly once per level.

Semantics are identical to msm/scan.py's head/tail/emission scheme (see its
correctness argument); emissions are scattered into the bucket array by the
caller exactly as before. Spec for the work replaced: the reference's serial
bucket accumulation loop, /root/reference/src/multi_scalar.c:421-463.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.ops import AffinePoint, XyzzPoint
from ..curves import pallas_point
from ..fields import pallas_mont

# Streams shorter than this gain nothing from a kernel launch; the XLA
# fallback (msm/scan.py) handles them.
MIN_LEVEL_N = 1024
_BLK_MAX = 2048

# XLA's memory-space-assignment places pallas results in scoped VMEM when it
# deems them small enough, against a 16 MiB per-kernel budget that also holds
# the block double-buffers; a level over the full stream materialises
# N-element emission outputs (tens of MB at n>=2^14) and the compile dies
# with a scoped-vmem stack OOM. Lanes are independent chains, so the level
# is issued as several identically-shaped pallas_calls over lane slices,
# each with results bounded by this budget (one Mosaic compile total).
_EM_BUDGET = int(os.environ.get("MSM_EM_BUDGET_MB", "6")) * 1024 * 1024
# The prefix-pipeline level kernel (affine_prefix_level) hits the same MSA
# behavior (full-width local-prefix outputs land on the scoped-VMEM stack and
# the compile dies with "Scoped allocation ... exceeded scoped vmem limit"),
# so its level is sliced over lanes to keep per-call outputs under budget.
_PREFIX_BUDGET = int(os.environ.get("MSM_PREFIX_BUDGET_MB", "6")) * 1024 * 1024


def available(curve) -> bool:
    # Opt-in (MSM_FUSED_SCAN=1): hardware-validated bit-exact, and the level
    # kernels beat the XLA formulation in isolation, but end-to-end at
    # n=2^14 the slice launches + column-layout transposes eat the gain
    # (fused min 115.9 ms vs XLA-path min 110.4 ms, artifacts/
    # bench_n14_r2_{fused,nofused}.txt) while compile time grows ~11%.
    if not os.environ.get("MSM_FUSED_SCAN"):
        return False
    if os.environ.get("MSM_NO_PALLAS") or os.environ.get("MSM_NO_FUSED_SCAN"):
        return False
    if pallas_mont.IN_KERNEL:
        return False
    return jax.default_backend() == "tpu"


def prefix_available(curve) -> bool:
    """Fused level-1 kernel for the prefix pipeline (affine_prefix_level)."""
    if os.environ.get("MSM_NO_PALLAS") or os.environ.get("MSM_NO_FUSED_SCAN"):
        return False
    if pallas_mont.IN_KERNEL:
        return False
    return jax.default_backend() == "tpu"


def _shape_stream(N: int, c_target: int = 32, blk_max: int = _BLK_MAX):
    """Pick (columns, lanes, lane-block) for a stream of N elements: lanes a
    power of two >= 128 so the lane block divides evenly; ~c_target columns."""
    n_ch = max(128, 1 << max(int(np.floor(np.log2(max(N // c_target, 1)))), 0))
    c = max(2, -(-N // n_ch))
    blk = min(blk_max, n_ch)
    return c, n_ch, blk


def _lead(curve):
    return (2,) if curve.name == "G2" else ()


@functools.lru_cache(maxsize=None)
def _seg_kernel(curve_name: str, affine: bool, c: int, n_ch: int, blk: int,
                n_buckets: int):
    """Build the jitted level kernel.

    affine=True: level-1 stream of signed affine points (dadd_affine
    combiner); else xyzz stream (dadd combiner).
    Inputs (XLA side, column-major): coords (c, *lead, L, n_ch); sign/key
    (c, 1, n_ch) int32. Outputs: emissions as xyzz (c, *lead, L, n_ch) + key
    (c, 1, n_ch); head/tail xyzz (*lead, L, n_ch) + keys (1, n_ch).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..curves.curve import G1, G2

    curve = G1 if curve_name == "G1" else G2
    lead = _lead(curve)
    nlead = len(lead)
    fp = curve.F.base if curve.name == "G2" else curve.F
    L = fp.n_limbs
    n_in = 2 if affine else 4
    CONST_NAMES = ("P", "NOT_P", "ONE_MONT") + pallas_mont.SOS_CONST_NAMES

    coord_block = (1,) + lead + (L, blk)
    coord_idx = lambda b, j: (j,) + (0,) * nlead + (0, b)
    key_block = (1, 1, blk)
    key_idx = lambda b, j: (j, 0, b)
    ht_block = lead + (L, blk)
    ht_idx = lambda b, j: (0,) * nlead + (0, b)
    htk_block = (1, blk)
    htk_idx = lambda b, j: (0, b)

    coord_spec = pl.BlockSpec(coord_block, coord_idx, memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec(key_block, key_idx, memory_space=pltpu.VMEM)
    ht_spec = pl.BlockSpec(ht_block, ht_idx, memory_space=pltpu.VMEM)
    htk_spec = pl.BlockSpec(htk_block, htk_idx, memory_space=pltpu.VMEM)

    def _const_np(name):
        arr = np.ascontiguousarray(getattr(fp, name + "_np"))
        if arr.dtype == np.float32:
            import ml_dtypes

            return arr.astype(ml_dtypes.bfloat16)
        return arr

    const_arrays = tuple(_const_np(name) for name in CONST_NAMES)
    const_specs = [
        pl.BlockSpec(tuple(a.shape),
                     (lambda b, j, nd=a.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for a in const_arrays
    ]

    n_data = n_in + (2 if affine else 1)  # coords + key (+ sign)
    n_const = len(CONST_NAMES)

    def kernel(*refs):
        data = refs[:n_data]
        consts = {
            ("fp", name): refs[n_data + k][:]
            for k, name in enumerate(CONST_NAMES)
        }
        outs = refs[n_data + n_const:-3]
        run_s, head_s, keys_s = refs[-3:]
        em = outs[0:4]
        em_key = outs[4]
        head_out = outs[5:9]
        tail_out = outs[9:13]
        hk_out, tk_out = outs[13], outs[14]
        j = pl.program_id(1)
        n_cols = pl.num_programs(1)

        with pallas_mont.kernel_mode(consts=consts):
            coords = [r[0] for r in data[:n_in]]     # (*lead, L, blk)
            if affine:
                pt_in = AffinePoint(*coords)
                sg = data[n_in][0, 0] != 0           # (blk,)
                ky = data[n_in + 1][0, 0]            # (blk,)
            else:
                pt_in = XyzzPoint(*coords)
                sg = None
                ky = data[n_in][0, 0]

            def lift():
                if affine:
                    return curve.xyzz_from_affine(pt_in, negate=sg)
                return pt_in

            @pl.when(j == 0)
            def _():
                fresh = lift()
                inf = curve.xyzz_inf((blk,))
                for i in range(4):
                    run_s[i] = fresh[i]
                    head_s[i] = inf[i]
                    em[i][0] = jnp.zeros_like(fresh[i])
                keys_s[0] = ky
                keys_s[1] = ky
                keys_s[2] = jnp.ones_like(ky)
                em_key[0, 0] = jnp.full_like(ky, n_buckets)

            @pl.when(j > 0)
            def _():
                run = XyzzPoint(run_s[0], run_s[1], run_s[2], run_s[3])
                head = XyzzPoint(head_s[0], head_s[1], head_s[2], head_s[3])
                run_key = keys_s[0]
                head_key = keys_s[1]
                from0 = keys_s[2] != 0
                closing = ky != run_key
                cap = closing & from0
                new_head = curve.select(cap, run, head)
                new_head_key = jnp.where(
                    cap, run_key, jnp.where(from0, ky, head_key)
                )
                em_key[0, 0] = jnp.where(
                    closing & ~from0, run_key, n_buckets
                )
                for i in range(4):
                    em[i][0] = run[i]
                if affine:
                    merged = curve.xyzz_dadd_affine_body(
                        run, pt_in, subtract=sg, cond_dbl=True
                    )
                else:
                    merged = curve.xyzz_dadd_body(run, pt_in, cond_dbl=True)
                fresh = lift()
                new_run = curve.select(closing, fresh, merged)
                for i in range(4):
                    run_s[i] = new_run[i]
                    head_s[i] = new_head[i]
                keys_s[0] = ky
                keys_s[1] = new_head_key
                keys_s[2] = (from0 & ~closing).astype(jnp.int32)

            @pl.when(j == n_cols - 1)
            def _():
                from0 = keys_s[2] != 0
                hk_out[0] = jnp.where(from0, keys_s[0], keys_s[1])
                tk_out[0] = keys_s[0]
                for i in range(4):
                    head_out[i][...] = head_s[i]
                    tail_out[i][...] = run_s[i]

    grid = (n_ch // blk, c)
    in_specs = (
        [coord_spec] * n_in
        + ([key_spec, key_spec] if affine else [key_spec])
        + const_specs
    )
    out_specs = (
        [coord_spec] * 4 + [key_spec]
        + [ht_spec] * 8 + [htk_spec, htk_spec]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((c,) + lead + (L, n_ch), jnp.uint32)] * 4
        + [jax.ShapeDtypeStruct((c, 1, n_ch), jnp.int32)]
        + [jax.ShapeDtypeStruct(lead + (L, n_ch), jnp.uint32)] * 8
        + [jax.ShapeDtypeStruct((1, n_ch), jnp.int32)] * 2
    )
    scratch = [
        pltpu.VMEM((4,) + lead + (L, blk), jnp.uint32),
        pltpu.VMEM((4,) + lead + (L, blk), jnp.uint32),
        pltpu.VMEM((3, blk), jnp.int32),
    ]

    @jax.jit
    def run(*arrays):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
        )(*arrays, *(jnp.asarray(a) for a in const_arrays))

    return run


def _to_cols(coord, lead_n: int, n_ch: int, c: int):
    """(*lead, L, N=n_ch*c) -> (c, *lead, L, n_ch): column j holds stream
    elements k*c + j for chunk k (matching msm/scan.py's chunk layout)."""
    x = coord.reshape(coord.shape[:-1] + (n_ch, c))
    return jnp.moveaxis(x, -1, 0)


def _pad_tail(x, pad, fill=0):
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                   constant_values=fill)


def _cat(parts):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)


def _slice_lanes(c: int, n_ch: int, blk: int, per_elem: int):
    """Largest power-of-two lane count n_s (>=128, divides n_ch) whose
    per-call stream-sized outputs fit _EM_BUDGET; per_elem = coordinate
    output bytes per stream element. The int32 key output (4 bytes/elem)
    and the head/tail/htk outputs (~2*per_elem*n_s, column-independent)
    are covered by the 10 MiB headroom the budget leaves against the
    16 MiB scoped-VMEM ceiling, which also holds the block double-buffers."""
    n_s = n_ch
    while n_s > 128 and (per_elem + 4) * c * n_s > _EM_BUDGET:
        n_s //= 2
    return n_s, min(blk, n_s)


def _run_level(curve, pts, signs, keys, buckets, n_buckets: int):
    """One fused level. pts: AffinePoint (level 1, signs != None) or
    XyzzPoint. Returns (buckets', stream XyzzPoint, stream keys)."""
    affine = signs is not None
    lead = _lead(curve)
    nlead = len(lead)
    N = keys.shape[0]
    c, n_ch, blk = _shape_stream(N)
    pad = n_ch * c - N
    pts = type(pts)(*(_pad_tail(x, pad) for x in pts))
    keys = _pad_tail(keys, pad, fill=n_buckets)
    coords = [_to_cols(x, nlead, n_ch, c) for x in pts]
    kcols = jnp.moveaxis(
        keys.reshape(n_ch, c), -1, 0
    ).reshape(c, 1, n_ch).astype(jnp.int32)
    arrays = coords
    if affine:
        signs = _pad_tail(signs.astype(jnp.int32), pad)
        scols = jnp.moveaxis(signs.reshape(n_ch, c), -1, 0).reshape(c, 1, n_ch)
        arrays = coords + [scols, kcols]
    else:
        arrays = coords + [kcols]
    L = pts.X.shape[-2]
    lead_prod = int(np.prod(lead)) if lead else 1
    n_s, blk_s = _slice_lanes(c, n_ch, blk, 16 * lead_prod * L)
    kern = _seg_kernel(curve.name, affine, c, n_s, blk_s, n_buckets)
    heads, tails, hks, tks = [], [], [], []
    for k in range(n_ch // n_s):
        sl = slice(k * n_s, (k + 1) * n_s)
        outs = kern(*(a[..., sl] for a in arrays))
        em = outs[0:4]
        em_key = outs[4].reshape(-1)
        # scatter emissions (keys unique among real emissions; pads and
        # no-emission columns carry key n_buckets -> dropped). Slices
        # partition the level's emission set, so cross-slice keys stay
        # unique and the per-slice scatters compose.
        em_flat = XyzzPoint(
            *(jnp.moveaxis(x, 0, -2).reshape(x.shape[1:-1] + (-1,))
              for x in em)
        )
        buckets = type(buckets)(
            *(bc.at[..., em_key].set(pc, mode="drop")
              for bc, pc in zip(buckets, em_flat))
        )
        heads.append(outs[5:9])
        tails.append(outs[9:13])
        hks.append(outs[13][0])
        tks.append(outs[14][0])

    head = [_cat([h[i] for h in heads]) for i in range(4)]
    tail = [_cat([t[i] for t in tails]) for i in range(4)]
    hk, tk = _cat(hks), _cat(tks)
    # interleave head/tail -> next stream (still key-sorted)
    lvl_pt = XyzzPoint(
        *(
            jnp.stack([h, t], axis=-1).reshape(h.shape[:-1] + (-1,))
            for h, t in zip(head, tail)
        )
    )
    lvl_key = jnp.stack([hk, tk], axis=-1).reshape(-1)
    return buckets, lvl_pt, lvl_key


@functools.lru_cache(maxsize=None)
def _scan_kernel(curve_name: str, c: int, n_ch: int, blk: int):
    """Plain inclusive scan over an xyzz stream in (c, …, n_ch) column
    layout: emits per-column running sums and per-chunk tails. Level-1 core
    of the bucket-integration suffix scan (spec: multi_scalar.c:281-321)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..curves.curve import G1, G2

    curve = G1 if curve_name == "G1" else G2
    lead = _lead(curve)
    nlead = len(lead)
    fp = curve.F.base if curve.name == "G2" else curve.F
    L = fp.n_limbs
    CONST_NAMES = ("P", "NOT_P", "ONE_MONT") + pallas_mont.SOS_CONST_NAMES

    coord_block = (1,) + lead + (L, blk)
    coord_idx = lambda b, j: (j,) + (0,) * nlead + (0, b)
    tail_block = lead + (L, blk)
    tail_idx = lambda b, j: (0,) * nlead + (0, b)
    coord_spec = pl.BlockSpec(coord_block, coord_idx, memory_space=pltpu.VMEM)
    tail_spec = pl.BlockSpec(tail_block, tail_idx, memory_space=pltpu.VMEM)

    def _const_np(name):
        arr = np.ascontiguousarray(getattr(fp, name + "_np"))
        if arr.dtype == np.float32:
            import ml_dtypes

            return arr.astype(ml_dtypes.bfloat16)
        return arr

    const_arrays = tuple(_const_np(name) for name in CONST_NAMES)
    const_specs = [
        pl.BlockSpec(tuple(a.shape),
                     (lambda b, j, nd=a.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for a in const_arrays
    ]
    n_const = len(CONST_NAMES)

    def kernel(*refs):
        data = refs[:4]
        consts = {
            ("fp", name): refs[4 + k][:]
            for k, name in enumerate(CONST_NAMES)
        }
        outs = refs[4 + n_const:-1]
        run_s = refs[-1]
        scans_out = outs[0:4]
        tails_out = outs[4:8]
        j = pl.program_id(1)
        n_cols = pl.num_programs(1)

        with pallas_mont.kernel_mode(consts=consts):
            col = XyzzPoint(*(r[0] for r in data))

            @pl.when(j == 0)
            def _():
                for i in range(4):
                    run_s[i] = col[i]
                    scans_out[i][0] = col[i]

            @pl.when(j > 0)
            def _():
                run = XyzzPoint(run_s[0], run_s[1], run_s[2], run_s[3])
                new_run = curve.xyzz_dadd_body(run, col, cond_dbl=True)
                for i in range(4):
                    run_s[i] = new_run[i]
                    scans_out[i][0] = new_run[i]

            @pl.when(j == n_cols - 1)
            def _():
                for i in range(4):
                    tails_out[i][...] = run_s[i]

    grid = (n_ch // blk, c)
    out_shape = (
        [jax.ShapeDtypeStruct((c,) + lead + (L, n_ch), jnp.uint32)] * 4
        + [jax.ShapeDtypeStruct(lead + (L, n_ch), jnp.uint32)] * 4
    )

    @jax.jit
    def run(*arrays):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[coord_spec] * 4 + const_specs,
            out_specs=[coord_spec] * 4 + [tail_spec] * 4,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((4,) + lead + (L, blk), jnp.uint32)],
        )(*arrays, *(jnp.asarray(a) for a in const_arrays))

    return run


@functools.lru_cache(maxsize=None)
def _affine_prefix_kernel(curve_name: str, c: int, n_ch: int, blk: int):
    """Level-1 kernel of the prefix pipeline (msm/prefix_pipeline.py): plain
    inclusive prefix scan over a signed *affine* stream in (c, …, n_ch)
    column layout — run += point via xyzz_dadd_affine, run state in VMEM.
    No keys, no emissions: the segmented bookkeeping of _seg_kernel is gone.

    Outputs: (1) local prefixes as ROWS (c, n_ch, 4*lead*L) — all four xyzz
    coords concatenated per stream element, transposed in-kernel — so the
    caller's per-bucket boundary lookup is ONE contiguous row gather instead
    of 4*L*B strided element gathers; (2) per-chunk xyzz tails."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..curves.curve import G1, G2

    curve = G1 if curve_name == "G1" else G2
    lead = _lead(curve)
    nlead = len(lead)
    fp = curve.F.base if curve.name == "G2" else curve.F
    L = fp.n_limbs
    lead_prod = 2 if curve.name == "G2" else 1
    D4 = 4 * lead_prod * L
    CONST_NAMES = ("P", "NOT_P", "ONE_MONT") + pallas_mont.SOS_CONST_NAMES

    D1 = lead_prod * L
    sign_block = (1, 1, blk)
    sign_idx = lambda b, j: (j, 0, b)
    in_rows_block = (1, blk, D1)
    in_rows_idx = lambda b, j: (j, b, 0)
    rows_block = (1, blk, D4)
    rows_idx = lambda b, j: (j, b, 0)
    tail_block = lead + (L, blk)
    tail_idx = lambda b, j: (0,) * nlead + (0, b)
    sign_spec = pl.BlockSpec(sign_block, sign_idx, memory_space=pltpu.VMEM)
    in_rows_spec = pl.BlockSpec(in_rows_block, in_rows_idx,
                                memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec(rows_block, rows_idx, memory_space=pltpu.VMEM)
    tail_spec = pl.BlockSpec(tail_block, tail_idx, memory_space=pltpu.VMEM)

    def _const_np(name):
        arr = np.ascontiguousarray(getattr(fp, name + "_np"))
        if arr.dtype == np.float32:
            import ml_dtypes

            return arr.astype(ml_dtypes.bfloat16)
        return arr

    const_arrays = tuple(_const_np(name) for name in CONST_NAMES)
    const_specs = [
        pl.BlockSpec(tuple(a.shape),
                     (lambda b, j, nd=a.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for a in const_arrays
    ]
    n_const = len(CONST_NAMES)

    def _emit_rows(rows_out, pt: XyzzPoint):
        flat = jnp.concatenate(
            [x.reshape(lead_prod * L, blk) for x in pt], axis=0
        )  # (D4, blk)
        rows_out[0] = jnp.transpose(flat, (1, 0))

    def kernel(*refs):
        data = refs[:3]
        consts = {
            ("fp", name): refs[3 + k][:]
            for k, name in enumerate(CONST_NAMES)
        }
        outs = refs[3 + n_const:-1]
        run_s = refs[-1]
        rows_out = outs[0]
        tails_out = outs[1:5]
        j = pl.program_id(1)
        n_cols = pl.num_programs(1)

        with pallas_mont.kernel_mode(consts=consts):
            # input X/Y rows (blk, D): transpose into coord layout in-kernel
            # (the XLA-side layout change cost ~10 ms at n=2^14)
            pt = AffinePoint(
                jnp.transpose(data[0][0], (1, 0)).reshape(lead + (L, blk)),
                jnp.transpose(data[1][0], (1, 0)).reshape(lead + (L, blk)),
            )
            sg = data[2][0, 0] != 0

            @pl.when(j == 0)
            def _():
                run = curve.xyzz_from_affine(pt, negate=sg)
                for i in range(4):
                    run_s[i] = run[i]
                _emit_rows(rows_out, run)

            @pl.when(j > 0)
            def _():
                run = XyzzPoint(run_s[0], run_s[1], run_s[2], run_s[3])
                new_run = curve.xyzz_dadd_affine_body(
                    run, pt, subtract=sg, cond_dbl=True
                )
                for i in range(4):
                    run_s[i] = new_run[i]
                _emit_rows(rows_out, new_run)

            @pl.when(j == n_cols - 1)
            def _():
                for i in range(4):
                    tails_out[i][...] = run_s[i]

    grid = (n_ch // blk, c)
    out_shape = (
        [jax.ShapeDtypeStruct((c, n_ch, D4), jnp.uint32)]
        + [jax.ShapeDtypeStruct(lead + (L, n_ch), jnp.uint32)] * 4
    )

    @jax.jit
    def run(*arrays):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_rows_spec, in_rows_spec, sign_spec] + const_specs,
            out_specs=[rows_spec] + [tail_spec] * 4,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((4,) + lead + (L, blk), jnp.uint32)],
        )(*arrays, *(jnp.asarray(a) for a in const_arrays))

    return run


def affine_prefix_level(curve, rows_x, rows_y, sgn_cols):
    """Run the fused level-1 prefix kernel over gathered point coordinate
    rows (c, n_ch, lead*L) uint32 x2 (straight from the two half-row table
    gathers, no XLA-side layout change) + (c, n_ch) int/bool signs.
    Returns (local ROWS uint32 (c, n_ch, 4*lead*L) — xyzz coords concatenated
    per element — and tails XyzzPoint (*lead, L, n_ch))."""
    c, n_ch, D1 = rows_x.shape
    lead = _lead(curve)
    lead_prod = int(np.prod(lead)) if lead else 1
    L = D1 // lead_prod
    blk = min(_BLK_MAX, n_ch)
    n_s = n_ch
    while n_s > 128 and 16 * lead_prod * L * c * n_s > _PREFIX_BUDGET:
        n_s //= 2
    blk_s = min(blk, n_s)
    assert n_ch % n_s == 0 and n_s % blk_s == 0, (n_ch, n_s, blk_s)
    kern = _affine_prefix_kernel(curve.name, c, n_s, blk_s)
    sgn = sgn_cols.astype(jnp.int32).reshape(c, 1, n_ch)
    l_parts, t_parts = [], []
    for k in range(n_ch // n_s):
        sl = slice(k * n_s, (k + 1) * n_s)
        outs = kern(rows_x[:, sl], rows_y[:, sl], sgn[..., sl])
        l_parts.append(outs[0])
        t_parts.append(outs[1:5])
    local = (l_parts[0] if len(l_parts) == 1
             else jnp.concatenate(l_parts, axis=1))
    tails = XyzzPoint(*(_cat([p[i] for p in t_parts]) for i in range(4)))
    return local, tails


MIN_SCAN_N = 4096


def prefix_scan_xyzz(curve, pts: XyzzPoint) -> XyzzPoint:
    """Inclusive prefix scan over a 1-D xyzz batch; level-1 fused, carry
    combine as one wide dadd (mirrors utils/scans.prefix_scan)."""
    from ..utils import scans

    N = pts.X.shape[-1]
    lead = _lead(curve)
    nlead = len(lead)
    c, n_ch, blk = _shape_stream(N)
    pad = n_ch * c - N
    pts_p = type(pts)(*(_pad_tail(x, pad) for x in pts))
    coords = [_to_cols(x, nlead, n_ch, c) for x in pts_p]
    L = pts.X.shape[-2]
    lead_prod = int(np.prod(lead)) if lead else 1
    n_s, blk_s = _slice_lanes(c, n_ch, blk, 16 * lead_prod * L)
    kern = _scan_kernel(curve.name, c, n_s, blk_s)
    s_parts, t_parts = [], []
    for k in range(n_ch // n_s):
        sl = slice(k * n_s, (k + 1) * n_s)
        outs = kern(*(a[..., sl] for a in coords))
        s_parts.append(outs[0:4])
        t_parts.append(outs[4:8])

    stream = XyzzPoint(
        *(
            _cat([jnp.moveaxis(p[i], 0, -1).reshape(p[i].shape[1:-1] + (-1,))
                  for p in s_parts])
            for i in range(4)
        )
    )  # (…, n_ch, c) -> (…, n_ch*c) chunk-major: index k*c + j
    tails = XyzzPoint(*(_cat([p[i] for p in t_parts]) for i in range(4)))
    if n_ch > 1:
        tails_scan = scans.prefix_scan(curve.xyzz_dadd, tails)
        carry = type(pts)(*(x[..., :-1] for x in tails_scan))
        carry_rep = type(pts)(
            *(jnp.repeat(x, c, axis=-1) for x in carry)
        )
        head = type(pts)(*(x[..., :c] for x in stream))
        rest = type(pts)(*(x[..., c:] for x in stream))
        combined = curve.xyzz_dadd(carry_rep, rest)
        stream = type(pts)(
            *(jnp.concatenate([h, r], axis=-1)
              for h, r in zip(head, combined))
        )
    return type(pts)(*(x[..., :N] for x in stream))


def segmented_reduce(curve, pts: AffinePoint, signs, keys,
                     n_buckets: int) -> XyzzPoint:
    """Fused-kernel replacement for scan.segmented_reduce_affine (same
    contract: key-sorted signed affine stream -> xyzz bucket array)."""
    from .scan import _segmented_reduce_xyzz

    buckets = curve.xyzz_inf((n_buckets,))
    buckets, lvl_pt, lvl_key = _run_level(
        curve, pts, signs, keys, buckets, n_buckets
    )
    while lvl_key.shape[0] >= MIN_LEVEL_N:
        n_prev = lvl_key.shape[0]
        buckets, lvl_pt, lvl_key = _run_level(
            curve, lvl_pt, None, lvl_key, buckets, n_buckets
        )
        if lvl_key.shape[0] >= n_prev:  # no progress (c hit its floor)
            break
    return _segmented_reduce_xyzz(curve, lvl_pt, lvl_key, buckets, n_buckets)
