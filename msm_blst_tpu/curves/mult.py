"""Vectorized single-point scalar multiplication (Booth windows) and the
2-step windowed MSM.

Capability twins of the reference's single-mult machinery:
  * POINTonE1_mult_w5 / gather_booth  — /root/reference/src/ec_mult.h:67-199
  * blst_p1s_mult_wbits (+ precompute) — /root/reference/src/multi_scalar.c:81-261
  * mult by the group order for subgroup checks — src/e1.c:101-138

TPU formulation: one lane per (scalar, point) pair; the per-point multiple
table is a (2^(w-1)+1, n)-lane batch built with vectorized chain adds and one
batched to-affine; window gathers are take_along_axis on the lane axis. The
whole mult is ~255 vectorized doublings + ~52 gathered dadd_affines,
independent of n.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_ORDER
from .ops import AffinePoint, CurveOps, JacPoint, XyzzPoint


def _signed_window_digits(scalars, w: int, nbits: int = 256):
    """uint32[8, n] -> (abs int32[h, n], sign bool[h, n]), digits in
    [-2^(w-1), 2^(w-1)] with sum d_j 2^(w j) == scalar."""
    from ..msm.recode import signed_digits_device

    h = -(-nbits // w)
    return signed_digits_device(scalars, w, h)


def _multiples_table(curve: CurveOps, points: AffinePoint, k: int) -> AffinePoint:
    """Affine table T[d] = d*P per lane, d = 0..k; shape (k+1, lanes) on a new
    leading axis. One batched inversion total."""
    # chain-add P for d = 1..k as a lax.scan (one traced dadd_affine)
    acc0 = curve.xyzz_from_affine(points)

    def chain(acc, _):
        return curve.xyzz_dadd_affine(acc, points), acc

    _, rows = jax.lax.scan(chain, acc0, None, length=k)  # coords (k, ..., n)
    stacked = XyzzPoint(*(jnp.moveaxis(c, 0, -2) for c in rows))
    flat = XyzzPoint(*(c.reshape(c.shape[:-2] + (-1,)) for c in stacked))
    aff_flat = curve.xyzz_to_affine(flat)
    n = points.X.shape[-1]
    aff = AffinePoint(
        *(c.reshape(c.shape[:-1] + (k, n)) for c in aff_flat)
    )
    # prepend the infinity row (affine (0,0))
    zero = AffinePoint(
        *(jnp.zeros(c.shape[:-2] + (1, n), c.dtype) for c in aff)
    )
    return AffinePoint(
        *(jnp.concatenate([z, c], axis=-2) for z, c in zip(zero, aff))
    )


def _gather_rows(table: AffinePoint, idx) -> AffinePoint:
    """table coords (..., k+1, n); idx int32[n] -> coords (..., n)."""

    def g(c):
        ix = jnp.broadcast_to(idx[None], c.shape[:-2] + idx.shape)
        return jnp.take_along_axis(c, ix[..., None, :], axis=-2)[..., 0, :]

    return AffinePoint(g(table.X), g(table.Y))


def point_mult(curve: CurveOps, scalars, points: AffinePoint,
               w: int = 5) -> JacPoint:
    """out[i] = scalars[i] * points[i], batched (blst_p1_mult twin).

    scalars: uint32[8, n] device array (256-bit little-endian limbs).
    """
    absd, sign = _signed_window_digits(scalars, w)  # [h, n]
    h = absd.shape[0]
    table = _multiples_table(curve, points, 1 << (w - 1))

    def body(acc, digit_row):
        d, s = digit_row
        pt = _gather_rows(table, d)
        for _ in range(w):
            acc = curve.xyzz_double(acc)
        return curve.xyzz_dadd_affine(acc, pt, subtract=s), None

    acc0 = curve.xyzz_inf(points.X.shape[-1:])
    acc, _ = jax.lax.scan(body, acc0, (absd[::-1], sign[::-1]))
    return curve.xyzz_to_jac(acc)


def point_mult_ints(curve: CurveOps, ks, points: AffinePoint, w: int = 5) -> JacPoint:
    """Host-int scalars convenience wrapper."""
    from ..msm.recode import scalars_from_ints

    return point_mult(curve, jnp.asarray(scalars_from_ints([k % (1 << 256) for k in ks])),
                      points, w)


def in_group_device(curve: CurveOps, points: AffinePoint, w: int = 5):
    """bool[n]: r * P == inf per lane (definitional subgroup check; the
    endomorphism fast path lives host-side in protocol/glv.py)."""
    n = points.X.shape[-1]
    from ..msm.recode import scalars_from_ints

    sc = jnp.asarray(scalars_from_ints([R_ORDER] * n))
    out = point_mult(curve, sc, points, w)
    return curve.jac_is_inf(out)


def msm_wbits(curve: CurveOps, scalars, points: AffinePoint,
              w: int = 5, table: AffinePoint = None) -> JacPoint:
    """2-step windowed MSM: per-point multiple tables + per-window gather and
    lane-tree reduction (blst_p1s_mult_wbits twin, multi_scalar.c:81-261).

    Competitive for small n where bucket machinery doesn't pay off. Pass a
    prebuilt `table` (from _multiples_table with the same w) to reuse the
    precomputation across calls (blst_p1s_mult_wbits_precompute analog).
    """
    absd, sign = _signed_window_digits(scalars, w)  # [h, n]
    if table is None:
        table = _multiples_table(curve, points, 1 << (w - 1))

    def body(acc, digit_row):
        d, s = digit_row
        pts = _gather_rows(table, d)
        lifted = curve.xyzz_from_affine(pts, negate=s)
        tile = curve.tree_reduce_xyzz(lifted)
        for _ in range(w):
            acc = curve.xyzz_double(acc)
        return curve.xyzz_dadd(acc, tile), None

    acc0 = curve.xyzz_inf((1,))
    acc, _ = jax.lax.scan(body, acc0, (absd[::-1], sign[::-1]))
    return curve.xyzz_to_jac(acc)


def points_add(curve: CurveOps, points: AffinePoint) -> JacPoint:
    """Sum of a batch of affine points (blst_p1s_add twin, bulk_addition.c).

    Log-depth lane tree of unified dadds (the reference's batched-affine
    lambda trick trades the same work for a batch inversion; on TPU the
    tree keeps everything in registers)."""
    lifted = curve.xyzz_from_affine(points)
    return curve.xyzz_to_jac(curve.tree_reduce_xyzz(lifted))


# ---------------------------------------------------------------------------
# XZ Montgomery ladder (capability twin of the reference's ladder path,
# /root/reference/src/ec_ops.h:329-465 + POINTonE1_mult_montgomery)
# ---------------------------------------------------------------------------


def _b_const(curve: CurveOps, batch):
    """The curve constant b in Montgomery form, broadcast to `batch`."""
    import numpy as np

    from ..constants import P as _P
    from ..fields.limb import FP

    def fp_const(v):
        m = v * (1 << 384) % _P
        arr = np.asarray(
            [(m >> (16 * i)) & 0xFFFF for i in range(24)], np.uint32
        ).reshape(24, 1)
        return FP._const(arr, batch)

    if curve.name == "G1":
        return fp_const(curve.b_int)
    return jnp.stack([fp_const(curve.b_int[0]), fp_const(curve.b_int[1])])


def ladder_mult(curve: CurveOps, scalars, points: AffinePoint) -> JacPoint:
    """Branch-free XZ Montgomery ladder: out[i] = scalars[i] * points[i].

    x-only ladder over 256 fixed bits with lane cswap, then algebraic
    y-recovery from (x, y, x(kP), x((k+1)P)):
        y1 = (x^3 + x1^3 + 2b - (x2 + x1 + x)(x1 - x)^2) / (2 y).
    Infinity start is (X, Z) = (1, 0), which the a=0 XZ formulas preserve.
    """
    from ..msm.recode import qary_digits_device

    F = curve.F
    batch = points.X.shape[(2 if curve.name == "G2" else 1):]
    b = _b_const(curve, batch)
    one = F.one_mont(batch)
    zero = F.zeros(batch)
    x, y = points.X, points.Y

    def xdbl(X, Z):
        X2, Z2s = F.mul_many([(X, X), (Z, Z)])
        X3, Z3c = F.mul_many([(X2, X), (Z2s, Z)])
        Xn = F.sub(F.mul(X2, X2), F.mul8(F.mul(b, F.mul(X, Z3c))))
        Zn = F.mul(F.double(F.double(Z)), F.add(X3, F.mul(b, Z3c)))
        return Xn, Zn

    def xadd(X1, Z1, X2, Z2):
        A, Bv, Cv, Dv = F.mul_many([(X1, X2), (Z1, Z2), (X1, Z2), (X2, Z1)])
        Xn = F.sub(F.mul(A, A), F.mul(F.double(F.double(F.mul(b, Bv))), F.add(Cv, Dv)))
        diff = F.sub(Cv, Dv)
        Zn = F.mul(x, F.mul(diff, diff))
        return Xn, Zn

    bits = qary_digits_device(scalars, 1, 256)  # [256, n], LSB row first

    def step(carry, bit_row):
        X0, Z0, X1, Z1 = carry
        sw = bit_row != 0
        A, B = F.select(sw, X1, X0), F.select(sw, Z1, Z0)
        C, D = F.select(sw, X0, X1), F.select(sw, Z0, Z1)
        Cn, Dn = xadd(A, B, C, D)
        An, Bn = xdbl(A, B)
        X0n, Z0n = F.select(sw, Cn, An), F.select(sw, Dn, Bn)
        X1n, Z1n = F.select(sw, An, Cn), F.select(sw, Bn, Dn)
        return (X0n, Z0n, X1n, Z1n), None

    init = (one, zero, x, one)  # (inf, P)
    (X1, Z1, X2, Z2), _ = jax.lax.scan(step, init, bits[::-1])

    # y recovery
    zinv = F.batch_inv(jnp.concatenate([Z1, Z2], axis=-1))
    k = Z1.shape[-1]
    z1i, z2i = zinv[..., :k], zinv[..., k:]
    x1 = F.mul(X1, z1i)
    x2 = F.mul(X2, z2i)
    x3c, x13 = F.mul_many([(F.mul(x, x), x), (F.mul(x1, x1), x1)])
    d = F.sub(x1, x)
    num = F.sub(
        F.add(F.add(x3c, x13), F.double(b)),
        F.mul(F.add(F.add(x2, x1), x), F.mul(d, d)),
    )
    y1 = F.mul(num, F.inv(F.double(y)))
    out = curve.jac_from_affine(AffinePoint(x1, y1))
    # edge lanes: k = 0 (Z1 = 0) -> inf; k = r-1 (Z2 = 0) -> -P; P = inf -> inf
    res_inf = F.is_zero(Z1)
    minus_p = curve.jac_from_affine(AffinePoint(x, F.neg(y)))
    out = curve.select(F.is_zero(Z2), minus_p, out)
    out = curve.select(res_inf | curve.affine_is_inf(points),
                       curve.jac_inf(batch), out)
    return out
