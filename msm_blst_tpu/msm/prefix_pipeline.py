"""Prefix-scan bucket accumulation — the round-3 hot-path redesign.

With the digit stream sorted by bucket key, each bucket occupies a contiguous
range [left_k, right_k) of the stream, so its sum is a *difference of stream
prefix sums*:

    bucket[k] = P(right_k) - P(left_k),   P(i) = sum of the first i points,

and XYZZ point negation is free (negate Y). The hot loop therefore collapses
to a PLAIN chunked prefix scan of signed mixed adds — no per-element key
compares, no head/tail run bookkeeping, no emission buffers, no scatter (the
round-2 segmented formulation, msm/scan.py, paid for all four). Boundaries
come from two vectorized `searchsorted` calls over the sorted keys, and the
bucket array is produced densely in bucket order.

Pipeline (all device-side):
  1. column-major index permutation (int32-only; the point gather then lands
     directly in scan order — stream pos k*c + j maps to lane k, column j),
  2. table row gather,
  3. level-1 chunked prefix scan: run += point (xyzz_dadd_affine, 8M+2S),
     keeping per-column local prefixes + chunk tails (fused Pallas level
     kernel on TPU, lax.scan of fused point kernels otherwise),
  4. exclusive xyzz scan over the ~N/c chunk tails,
  5. per-bucket boundary gathers + 3 bucket-wide dadds.

Work: N mixed adds + ~2·(N/c) + 3·B full dadds, vs the reference's serial
N mixed adds (/root/reference/src/multi_scalar.c:421-463).

Empty buckets need no special path: right == left makes both boundary
prefixes gather the same element, and dadd(P, -P) yields infinity through
the branch-free case analysis.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ..curves.ops import AffinePoint, CurveOps, XyzzPoint
from ..utils.scans import pick_chunk


def _lead_dims(curve) -> tuple:
    return (2,) if curve.name == "G2" else ()


def stream_shape(N: int):
    """(columns, chunks): chunk-contiguous layout, stream pos = k*c + j.

    For kernel-sized streams the lane count n_ch is a power of two >= 128
    (Mosaic block tiling wants lane dims in multiples of 128) and is capped
    at 2048 = the kernel's lane-block width — wider adds nothing per grid
    step but grows the secondary chunk-tail scan. Small streams fall back to
    the compile-lean scan heuristic (CPU/test path)."""
    if N >= 1024:
        n_ch = min(8192, max(128, 1 << int(np.floor(np.log2(N // 32)))))
        return -(-N // n_ch), n_ch
    c = pick_chunk(N)
    n_ch = -(-N // c)
    return c, n_ch


def column_major_streams(slots_s, signs_s, c: int, n_ch: int):
    """Pad the sorted int streams to c*n_ch and permute to column-major
    order (index j*n_ch + k holds stream pos k*c + j). Pads land in the
    trailing chunks; their contribution reaches only prefix positions > N,
    which no bucket boundary ever reads."""
    N = slots_s.shape[0]
    pad = c * n_ch - N
    if pad:
        slots_s = jnp.pad(slots_s, (0, pad))
        signs_s = jnp.pad(signs_s, (0, pad))
    slots_cm = slots_s.reshape(n_ch, c).T.reshape(-1)
    signs_cm = signs_s.reshape(n_ch, c).T.reshape(-1)
    return slots_cm, signs_cm


def gather_columns(curve: CurveOps, table, slots_cm, c: int, n_ch: int):
    """Gather table points for the column-major stream -> scan layout
    (c, *lead, L, n_ch). (jnp fallback path; the kernel path uses
    gather_rows and transposes in-kernel.)"""
    pts = curve.take(table, slots_cm)  # (*lead, L, c*n_ch), order j*n_ch+k
    cols = AffinePoint(
        *(x.reshape(x.shape[:-1] + (c, n_ch)) for x in pts)
    )
    return AffinePoint(*(jnp.moveaxis(x, -2, 0) for x in cols))


def gather_rows(curve: CurveOps, table, slots_cm, c: int, n_ch: int):
    """Gather packed table rows for the column-major stream as TWO half-row
    gathers (X columns, Y columns): measured on v5e, two 96 B-row gathers
    overlap to ~0.76x the cost of one 192 B-row gather (drivers/
    gather_bench.py). Returns ((c, n_ch, D), (c, n_ch, D)) uint32.

    PackedRows32 tables (two 16-bit limbs per word) gather HALF the bytes;
    the unpack is two VPU shifts fused into the gather consumer."""
    from ..curves.ops import (AffinePoint, PackedRows, PackedRows32,
                              RowAffine, unpack_u16)

    if isinstance(table, PackedRows32):
        import os

        Dp2 = table.XY.shape[1]
        Dp = Dp2 // 2
        # MSM_GATHER_SPLIT: 1 = two half-row gathers, 0 = one whole-row
        # gather, auto (default) = split only for G2-sized rows. Measured on
        # v5e: the row-gather cost is per ROW for 96 B rows (whole-row wins,
        # round 4), while two 96 B half-row gathers of a 192 B row overlap
        # to ~0.76x one 192 B gather (round 3, drivers/gather_bench.py).
        mode = os.environ.get("MSM_GATHER_SPLIT", "auto")
        split = (mode == "1") or (mode == "auto" and Dp2 > 24)
        if split:
            gx = unpack_u16(jnp.take(table.XY[:, :Dp], slots_cm,
                                     axis=0)).reshape(c, n_ch, 2 * Dp)
            gy = unpack_u16(jnp.take(table.XY[:, Dp:], slots_cm,
                                     axis=0)).reshape(c, n_ch, 2 * Dp)
            return gx, gy
        g = jnp.take(table.XY, slots_cm, axis=0)
        gx = unpack_u16(g[:, :Dp]).reshape(c, n_ch, 2 * Dp)
        gy = unpack_u16(g[:, Dp:]).reshape(c, n_ch, 2 * Dp)
        return gx, gy
    if isinstance(table, RowAffine):
        # already row-major: X/Y each (N, D) — gather each half directly
        # (to_rows expects an AffinePoint batch and would mis-reshape this)
        D = table.X.shape[1]
        gx = jnp.take(table.X, slots_cm, axis=0).reshape(c, n_ch, D)
        gy = jnp.take(table.Y, slots_cm, axis=0).reshape(c, n_ch, D)
        return gx, gy
    if not isinstance(table, PackedRows):
        if not isinstance(table, AffinePoint):
            raise TypeError(
                f"gather_rows: unsupported table type {type(table).__name__}")
        table = curve.to_rows(table)
    D2 = table.XY.shape[1]
    D = D2 // 2
    gx = jnp.take(table.XY[:, :D], slots_cm, axis=0).reshape(c, n_ch, D)
    gy = jnp.take(table.XY[:, D:], slots_cm, axis=0).reshape(c, n_ch, D)
    return gx, gy


def local_prefix(curve: CurveOps, cols: AffinePoint, sgn_cols):
    """Inclusive prefix scan down each lane's column chain.

    cols: (c, *lead, L, n_ch) affine; sgn_cols: (c, n_ch) bool/int.
    jnp/lax.scan fallback path (the TPU kernel path is
    pallas_scan.affine_prefix_level over gathered rows). Returns
    (local XyzzPoint (c, *lead, L, n_ch), tails XyzzPoint (*lead, L, n_ch),
    "cols").
    """
    col0 = AffinePoint(*(x[0] for x in cols))
    run0 = curve.xyzz_from_affine(col0, negate=sgn_cols[0] != 0)

    def body(run, xs):
        (px, py), sg = xs
        new = curve.xyzz_dadd_affine(run, AffinePoint(px, py), subtract=sg != 0)
        return new, new

    xs = ((cols.X[1:], cols.Y[1:]), sgn_cols[1:])
    tails, ys = lax.scan(body, run0, xs)
    local = XyzzPoint(
        *(jnp.concatenate([i[None], y], axis=0) for i, y in zip(run0, ys))
    )
    return local, tails, "cols"


def _take_cols(curve, coords, j, k, n_ch: int):
    """Gather lanes (j_i, k_i) from column-major coord arrays (c, *lead, L,
    n_ch). j, k: int32[B]. Returns tuple of (*lead, L, B) arrays."""
    lead = _lead_dims(curve)
    L = coords[0].shape[-2]
    ll = (2 * L) if lead else L
    inner = (jnp.arange(ll, dtype=jnp.int32) * n_ch).reshape(lead + (L, 1))
    flat_idx = j[None, :] * (ll * n_ch) + inner + k[None, :]
    out = []
    for cset in coords:
        g = jnp.take(cset.reshape(-1), flat_idx.reshape(ll, -1))
        out.append(g.reshape(lead + (L, j.shape[0])))
    return tuple(out)


def buckets_from_boundaries(curve: CurveOps, local, tails: XyzzPoint,
                            keys_s, n_buckets: int, c: int, n_ch: int,
                            fmt: str = "cols") -> XyzzPoint:
    """Assemble the dense bucket array from the prefix decomposition.

    `local` per `fmt`: "cols" = XyzzPoint (c, *lead, L, n_ch);
    "rows" = uint32 (c, n_ch, 4*lead*L) concatenated xyzz coords."""
    from ..utils import scans
    from . import pallas_scan

    F = curve.F
    if (tails.X.shape[-1] >= pallas_scan.MIN_SCAN_N
            and pallas_scan.prefix_available(curve)):
        incl = pallas_scan.prefix_scan_xyzz(curve, tails)
    else:
        incl = scans.prefix_scan(curve.xyzz_dadd, tails)
    inf1 = curve.xyzz_inf((1,))
    excl = XyzzPoint(
        *(jnp.concatenate([z, x[..., :-1]], axis=-1)
          for z, x in zip(inf1, incl))
    )

    # Only the RIGHT boundaries are gathered: left_k (# elements with key < k)
    # equals right_{k-1}, so P(left_k) is P(right) shifted by one bucket.
    kq = jnp.arange(n_buckets, dtype=keys_s.dtype)
    right = jnp.searchsorted(keys_s, kq, side="right").astype(jnp.int32)

    lead = _lead_dims(curve)
    L = tails.X.shape[-2]
    lead_prod = 2 if lead else 1

    def _local_at(j, kch):
        if fmt == "rows":
            rows = local.reshape(c * n_ch, 4 * lead_prod * L)
            g = jnp.take(rows, j * n_ch + kch, axis=0)  # (B, 4*lead*L)
            coords = jnp.split(g, 4, axis=1)
            return XyzzPoint(
                *(jnp.moveaxis(x, 0, -1).reshape(lead + (L, j.shape[0]))
                  for x in coords)
            )
        return XyzzPoint(*_take_cols(curve, tuple(local), j, kch, n_ch))

    def prefix_at(idx1):
        """P(idx1) = sum of first idx1 stream elements; P(0) = infinity."""
        pos = jnp.maximum(idx1 - 1, 0)
        kch = pos // c
        j = pos - kch * c
        loc = _local_at(j, kch)
        carry = curve.take(excl, kch)
        val = curve.xyzz_dadd(carry, loc)
        return curve.select(idx1 == 0, curve.xyzz_inf(idx1.shape), val)

    pe = prefix_at(right)
    ps = XyzzPoint(
        *(jnp.concatenate([z, x[..., :-1]], axis=-1)
          for z, x in zip(curve.xyzz_inf((1,)), pe))
    )
    ps_neg = XyzzPoint(ps.X, F.neg(ps.Y), ps.ZZZ, ps.ZZ)
    return curve.xyzz_dadd(pe, ps_neg)


_STREAM_CHUNK_ELEMS = 7 * 1024 * 1024


def bucket_sums_prefix(curve: CurveOps, table, slots_s, signs_s, keys_s,
                       n_buckets: int) -> XyzzPoint:
    """Per-key sums of a key-sorted signed digit stream, as a dense XYZZ
    bucket array of n_buckets (bucket 0 included).

    slots_s/keys_s/signs_s: int32/int32/bool [N], sorted ascending by key;
    `table` is the precompute table (RowAffine or AffinePoint batch).

    Very large streams (n >= 2^20: N ~ 13M elements, whose gathered-point +
    local-prefix intermediates alone are ~7 GB) are processed in sequential
    sub-streams: each part is itself key-sorted, so per-part bucket arrays
    from the same boundary trick merge with one bucket-wide dadd — and the
    lax.scan sequencing bounds live intermediates to one part's worth.
    """
    import os

    N = keys_s.shape[0]
    chunks = int(os.environ.get("MSM_STREAM_CHUNKS", "0")) or (
        -(-N // _STREAM_CHUNK_ELEMS)
    )
    if chunks > 1:
        part = -(-N // chunks)
        pad = chunks * part - N
        slots_p = jnp.pad(slots_s, (0, pad))
        signs_p = jnp.pad(signs_s, (0, pad))
        keys_p = jnp.pad(keys_s, (0, pad), constant_values=n_buckets)

        def body(acc, xs):
            sl, sg, ky = xs
            b = _bucket_sums_prefix_single(curve, table, sl, sg, ky, n_buckets)
            return curve.xyzz_dadd(acc, b), None

        acc0 = curve.xyzz_inf((n_buckets,))
        acc, _ = lax.scan(
            body, acc0,
            (slots_p.reshape(chunks, part), signs_p.reshape(chunks, part),
             keys_p.reshape(chunks, part)),
        )
        return acc
    return _bucket_sums_prefix_single(
        curve, table, slots_s, signs_s, keys_s, n_buckets
    )


def segment_starts(keys_s, n_buckets: int, n_chunks: int):
    """Start position of each bucket-range segment in the sorted stream.

    Chunk k owns buckets [k*W, (k+1)*W), W = ceil(n_buckets/n_chunks); its
    stream segment is [starts[k], starts[k+1]) — data-dependent, computed
    with one searchsorted. Jittable."""
    W = -(-n_buckets // n_chunks)
    marks = jnp.arange(n_chunks + 1, dtype=keys_s.dtype) * W
    return jnp.searchsorted(keys_s, marks, side="left").astype(jnp.int32), W


def bucket_sums_prefix_ranged(curve: CurveOps, table, slots_s, signs_s,
                              keys_s, n_buckets: int, starts, seg_len: int,
                              n_chunks: int) -> XyzzPoint:
    """Chunked bucket accumulation with chunks split by BUCKET RANGE.

    The position-split chunking (bucket_sums_prefix) evaluates the FULL
    n_buckets-wide boundary machinery per chunk plus an n_buckets-wide merge
    dadd — ~4·K·B extra full dadds, which at n=2^21 BGMW (B = 2^21+1, K=4)
    exceeds the stream adds themselves (the round-3 big-n cliff,
    VERDICT r3 item 2). Splitting by bucket range instead makes chunk k
    produce ONLY its own W = B/K buckets: boundary work totals ~3·B across
    ALL chunks and the disjoint outputs concatenate with no merge dadds.

    starts: int32[n_chunks+1] from segment_starts (device). seg_len: static
    upper bound on every segment length — the CALLER must guarantee
    max(diff(starts)) <= seg_len (engine.msm_*_bign checks on host and picks
    seg_len; a violating seg_len silently drops stream elements).
    Elements a segment reads beyond its own range (the tail of the padded
    window) have shifted keys >= W, which no boundary of chunk k ever reads.
    """
    W = -(-n_buckets // n_chunks)
    N = keys_s.shape[0]
    # pad so dynamic_slice never clamps; sentinel key = n_buckets lands in
    # global bucket >= n_buckets, discarded by the final slice
    slots_p = jnp.pad(slots_s, (0, seg_len))
    signs_p = jnp.pad(signs_s, (0, seg_len))
    keys_p = jnp.pad(keys_s, (0, seg_len), constant_values=n_buckets)

    def body(_, st_k):
        st, k = st_k
        sl = lax.dynamic_slice_in_dim(slots_p, st, seg_len)
        sg = lax.dynamic_slice_in_dim(signs_p, st, seg_len)
        ky = lax.dynamic_slice_in_dim(keys_p, st, seg_len) - k * W
        b = _bucket_sums_prefix_single(curve, table, sl, sg, ky, W)
        return None, tuple(b)

    ks = jnp.arange(n_chunks, dtype=jnp.int32)
    _, stacked = lax.scan(body, None, (starts[:-1], ks))
    # (K, ..., L, W) -> (..., L, K*W) -> [:n_buckets]
    out = XyzzPoint(
        *(jnp.moveaxis(x, 0, -2).reshape(x.shape[1:-1] + (n_chunks * W,))
          for x in stacked)
    )
    return XyzzPoint(*(x[..., :n_buckets] for x in out))


def _bucket_sums_prefix_single(curve: CurveOps, table, slots_s, signs_s,
                               keys_s, n_buckets: int) -> XyzzPoint:
    from . import pallas_scan

    N = keys_s.shape[0]
    c, n_ch = stream_shape(N)
    slots_cm, signs_cm = column_major_streams(slots_s, signs_s, c, n_ch)
    if pallas_scan.prefix_available(curve) and N >= pallas_scan.MIN_LEVEL_N:
        rx, ry = gather_rows(curve, table, slots_cm, c, n_ch)
        local, tails = pallas_scan.affine_prefix_level(
            curve, rx, ry, signs_cm.reshape(c, n_ch))
        fmt = "rows"
    else:
        cols = gather_columns(curve, table, slots_cm, c, n_ch)
        local, tails, fmt = local_prefix(
            curve, cols, signs_cm.reshape(c, n_ch))
    return buckets_from_boundaries(
        curve, local, tails, keys_s, n_buckets, c, n_ch, fmt
    )
