"""EC-specific scan/reduction kernels built on utils.scans (compile-lean).

The segmented bucket reduction is the TPU replacement for the reference's
serial scatter loop (/root/reference/src/multi_scalar.c:421-463); suffix scans
and folds replace the serial bucket-integration loops (:281-344).

Segmented-reduction correctness argument (chunked, parallel over chunks):
a key-sorted stream is cut into contiguous chunks. Within a chunk three kinds
of runs exist: (a) runs starting *and* ending strictly inside the chunk and
not touching column 0 — complete; emitted and scattered at this level;
(b) the run touching column 0 (possibly a continuation of the previous
chunk) — captured in the chunk's HEAD slot when it closes, or left as
infinity-with-current-key if the whole chunk is one run; (c) the run still
open at the last column — the chunk's TAIL. The interleaved (head, tail)
stream, which is still key-sorted, is reduced recursively; per-key pieces of
boundary-spanning segments meet and merge there. Each key is scattered by
exactly one level, so plain scatter-set never collides.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ..curves.ops import AffinePoint, CurveOps, XyzzPoint
from ..utils import scans
from ..utils.scans import DEFAULT_CHUNK, _ceil_to, _pad_last, pick_chunk


def fold_xyzz(curve: CurveOps, pts: XyzzPoint, chunk: int = DEFAULT_CHUNK) -> XyzzPoint:
    """Sum all lanes -> batch of 1 (zero padding = infinity = identity)."""
    return scans.fold(curve.xyzz_dadd, pts, chunk)


def masked_fold_xyzz(curve: CurveOps, pts: XyzzPoint, mask,
                     chunk: int = DEFAULT_CHUNK) -> XyzzPoint:
    masked = curve.select(mask, pts, curve.xyzz_inf(mask.shape))
    return fold_xyzz(curve, masked, chunk)


def suffix_scan_xyzz(curve: CurveOps, pts: XyzzPoint,
                     chunk: int = DEFAULT_CHUNK) -> XyzzPoint:
    """Inclusive suffix sums S_i = sum_{j>=i} pts[j], full width.

    On TPU, wide scans route through the fused level kernel
    (pallas_scan._scan_kernel) — default since round 3: at bucket-array
    widths (the integration stage) its layout transposes are a few MB, far
    below the per-step launch savings."""
    from . import pallas_scan

    base_ndim = 3 if curve.name == "G2" else 2
    if (pts.X.ndim == base_ndim
            and pts.X.shape[-1] >= pallas_scan.MIN_SCAN_N
            and (pallas_scan.available(curve)
                 or pallas_scan.prefix_available(curve))):
        rev = XyzzPoint(*(c[..., ::-1] for c in pts))
        out = pallas_scan.prefix_scan_xyzz(curve, rev)
        return XyzzPoint(*(c[..., ::-1] for c in out))
    return scans.suffix_scan(curve.xyzz_dadd, pts, chunk)


def scan_fold_axis(curve: CurveOps, pts: XyzzPoint, axis: int) -> XyzzPoint:
    """EC-sum along `axis` (removed from the batch shape); other batch axes
    are carried in parallel. Zero padding = infinity = identity."""
    ndim = pts.X.ndim
    if axis % ndim != ndim - 1:
        pts = type(pts)(*(jnp.moveaxis(c, axis, -1) for c in pts))
    out = scans.fold(curve.xyzz_dadd, pts)
    return type(pts)(*(c[..., 0] for c in out))


def _pad_point(pt, pad):
    return type(pt)(*(_pad_last(c, pad) for c in pt))


def _point_cols(pt, n_ch, chunk):
    return type(pt)(*(c.reshape(c.shape[:-1] + (n_ch, chunk)) for c in pt))


def _scan_xs_point(pt):
    return type(pt)(*(jnp.moveaxis(c[..., 1:], -1, 0) for c in pt))


def _emissions_flat(pt):
    return type(pt)(
        *(jnp.moveaxis(c, 0, -1).reshape(c.shape[1:-1] + (-1,)) for c in pt)
    )


def _interleave(a, b):
    """Two pytrees with (…, n) batches -> (…, 2n): a_0, b_0, a_1, b_1, ..."""
    return type(a)(
        *(
            jnp.stack([x, y], axis=-1).reshape(x.shape[:-1] + (-1,))
            for x, y in zip(a, b)
        )
    )


def _scatter_points(buckets, keys, pts):
    """Scatter-set points at `keys` (out-of-range keys dropped). In-range keys
    are unique per call, and calls across levels touch disjoint key sets."""
    return type(buckets)(
        *(bc.at[..., keys].set(pc, mode="drop") for bc, pc in zip(buckets, pts))
    )


def segmented_reduce_affine(curve: CurveOps, pts: AffinePoint, signs, keys,
                            n_buckets: int, chunk: int = DEFAULT_CHUNK) -> XyzzPoint:
    """Per-key sums of a key-sorted stream of signed affine points, scattered
    into an XYZZ bucket array of size n_buckets.

    keys must be ascending; entries with key >= n_buckets are dropped (used
    for padding). Level 1 runs one dadd_affine (8M+2S, the reference's
    per-digit cost) per stream element; chunk heads/tails recurse through
    xyzz levels.

    On a TPU backend large streams dispatch to the fused Pallas level kernels
    (msm/pallas_scan.py) — same head/tail/emission scheme, state in VMEM.
    """
    N = keys.shape[0]
    from . import pallas_scan

    if N >= pallas_scan.MIN_LEVEL_N and pallas_scan.available(curve):
        return pallas_scan.segmented_reduce(curve, pts, signs, keys, n_buckets)
    buckets = curve.xyzz_inf((n_buckets,))
    if N == 1:
        return _scatter_points(buckets, keys, curve.xyzz_from_affine(pts, negate=signs))

    c = pick_chunk(N, chunk)
    Np = _ceil_to(N, c)
    n_ch = Np // c
    pts = _pad_point(pts, Np - N)
    signs = _pad_last(signs, Np - N)
    keys = _pad_last(keys, Np - N, fill=n_buckets)
    pc = _point_cols(pts, n_ch, c)
    sc = signs.reshape(n_ch, c)
    kc = keys.reshape(n_ch, c)

    init_pt = curve.xyzz_from_affine(
        type(pts)(*(x[..., 0] for x in pc)), negate=sc[..., 0]
    )
    init_key = kc[..., 0]
    init_head = curve.xyzz_inf((n_ch,))
    init = (init_pt, init_key, jnp.ones((n_ch,), bool), init_head, init_key)

    def body(carry, xs):
        run_pt, run_key, from0, head_pt, head_key = carry
        col_pt, col_sign, col_key = xs
        closing = col_key != run_key
        # the column-0 run closes -> move it to the head slot
        cap = closing & from0
        head_pt = curve.select(cap, run_pt, head_pt)
        head_key = jnp.where(cap, run_key, jnp.where(from0, col_key, head_key))
        # mid-chunk complete runs -> emit
        emit_key = jnp.where(closing & ~from0, run_key, n_buckets)
        merged = curve.xyzz_dadd_affine(run_pt, col_pt, subtract=col_sign)
        fresh = curve.xyzz_from_affine(col_pt, negate=col_sign)
        new_pt = curve.select(closing, fresh, merged)
        return (
            (new_pt, col_key, from0 & ~closing, head_pt, head_key),
            (run_pt, emit_key),
        )

    (tail_pt, tail_key, from0, head_pt, head_key), (em_pt, em_key) = lax.scan(
        body,
        init,
        (_scan_xs_point(pc), jnp.moveaxis(sc[..., 1:], -1, 0),
         jnp.moveaxis(kc[..., 1:], -1, 0)),
    )
    buckets = _scatter_points(buckets, em_key.T.reshape(-1), _emissions_flat(em_pt))
    # chunks that are a single run: head stays infinity with the run's key
    head_key = jnp.where(from0, tail_key, head_key)
    lvl_pt = _interleave(head_pt, tail_pt)
    lvl_key = jnp.stack([head_key, tail_key], axis=-1).reshape(-1)
    return _segmented_reduce_xyzz(curve, lvl_pt, lvl_key, buckets, n_buckets)


def _segmented_reduce_xyzz(curve, pts: XyzzPoint, keys, buckets, n_buckets: int):
    """Recursive levels over xyzz streams, same head/tail scheme."""
    N = keys.shape[-1]
    while N > 1:
        c = pick_chunk(N)
        Np = _ceil_to(N, c)
        n_ch = Np // c
        pts = _pad_point(pts, Np - N)
        keys = _pad_last(keys, Np - N, fill=n_buckets)
        pc = _point_cols(pts, n_ch, c)
        kc = keys.reshape(n_ch, c)
        init_pt = type(pts)(*(x[..., 0] for x in pc))
        init_key = kc[..., 0]
        init_head = curve.xyzz_inf((n_ch,))
        init = (init_pt, init_key, jnp.ones((n_ch,), bool), init_head, init_key)

        def body(carry, xs):
            run_pt, run_key, from0, head_pt, head_key = carry
            col_pt, col_key = xs
            closing = col_key != run_key
            cap = closing & from0
            head_pt = curve.select(cap, run_pt, head_pt)
            head_key = jnp.where(cap, run_key, jnp.where(from0, col_key, head_key))
            emit_key = jnp.where(closing & ~from0, run_key, n_buckets)
            merged = curve.xyzz_dadd(run_pt, col_pt)
            new_pt = curve.select(closing, col_pt, merged)
            return (
                (new_pt, col_key, from0 & ~closing, head_pt, head_key),
                (run_pt, emit_key),
            )

        if c > 1:
            (tail_pt, tail_key, from0, head_pt, head_key), (em_pt, em_key) = lax.scan(
                body, init, (_scan_xs_point(pc), jnp.moveaxis(kc[..., 1:], -1, 0))
            )
            buckets = _scatter_points(
                buckets, em_key.T.reshape(-1), _emissions_flat(em_pt)
            )
            head_key = jnp.where(from0, tail_key, head_key)
            pts = _interleave(head_pt, tail_pt)
            keys = jnp.stack([head_key, tail_key], axis=-1).reshape(-1)
            N = 2 * n_ch
            if n_ch == 1:
                # terminal 2-element stream: merge if same key, else both
                a = type(pts)(*(x[..., :1] for x in pts))
                b = type(pts)(*(x[..., 1:] for x in pts))
                same = keys[:1] == keys[1:]
                merged = curve.xyzz_dadd(a, b)
                second = curve.select(same, merged, b)
                buckets = _scatter_points(
                    buckets, jnp.where(same, n_buckets, keys[:1]), a
                )
                return _scatter_points(buckets, keys[1:], second)
        else:
            N = 1
    return _scatter_points(buckets, keys, pts)
