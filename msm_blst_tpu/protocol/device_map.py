"""Batched on-device SSWU map for hash-to-curve (G1 and G2).

The byte-level half of hash_to_curve (expand_message_xmd) is inherently
host work; the *field* half — SSWU, isogeny evaluation, cofactor clearing —
is pure batched field arithmetic, exactly what the TPU wants. This module
maps u-batches to curve points entirely on device:

    msgs --host sha256--> u[2, n] --device--> affine G1/G2 points (in group)

Capability twin of /root/reference/src/map_to_g1.c map_to_isogenous_E1 +
isogeny_map_to_E1 (+ G2 twins), vectorized over messages. Square roots are
exponent chains (p = 3 mod 4 for Fp; the (p^2+7)/16 + fourth-root-of-unity
selection for Fp2), branch-free per lane.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import P
from ..curves import G1, G2
from ..curves.ops import AffinePoint
from ..fields.fp2 import FP2
from ..fields.limb import FP
from . import iso_constants as K

BLS_X = -0xD201000000010000
G1_H_EFF = 1 - BLS_X


def _mont_const_fp(x: int, batch):
    return FP._const(
        np.asarray(
            [((x * (1 << 384)) % P >> (16 * i)) & 0xFFFF for i in range(24)],
            np.uint32,
        ).reshape(24, 1),
        batch,
    )


def _mont_const_fp2(x0: int, x1: int, batch):
    return jnp.stack([_mont_const_fp(x0, batch), _mont_const_fp(x1, batch)])


# ---------------------------------------------------------------------------
# G1
# ---------------------------------------------------------------------------


def _sswu_g1(u):
    """u: Montgomery uint32[24, n] -> (x, y) on the isogenous curve E1'."""
    batch = u.shape[1:]
    A = _mont_const_fp(K.G1_A, batch)
    B = _mont_const_fp(K.G1_B, batch)
    Z = _mont_const_fp(K.G1_SSWU_Z, batch)
    one = FP.one_mont(batch)

    u2 = FP.sqr(u)
    tv1 = FP.mul(Z, u2)
    tv2 = FP.add(FP.sqr(tv1), tv1)
    tv2_zero = FP.is_zero(tv2)
    # x1 = (-B/A) (1 + 1/tv2), exceptional: B/(Z A)
    inv_tv2 = FP.inv(tv2)  # inv(0) = 0 -> handled by select below
    x1_main = FP.mul(FP.mul(FP.neg(B), FP.inv(A)), FP.add(one, inv_tv2))
    x1_exc = FP.mul(B, FP.inv(FP.mul(Z, A)))
    x1 = FP.select(tv2_zero, x1_exc, x1_main)
    gx1 = FP.add(FP.mul(FP.add(FP.sqr(x1), A), x1), B)
    y1 = FP.pow_int(gx1, (P + 1) // 4)
    ok1 = FP.eq(FP.sqr(y1), gx1)
    x2 = FP.mul(tv1, x1)
    gx2 = FP.add(FP.mul(FP.add(FP.sqr(x2), A), x2), B)
    y2 = FP.pow_int(gx2, (P + 1) // 4)
    x = FP.select(ok1, x1, x2)
    y = FP.select(ok1, y1, y2)
    # sgn0 fixup: parity of canonical u vs canonical y
    sgn_u = FP.from_mont(u)[0] & 1
    sgn_y = FP.from_mont(y)[0] & 1
    y = FP.cneg(y, sgn_u != sgn_y)
    return x, y


def _iso_g1(x, y):
    batch = x.shape[1:]

    def horner(coeffs, monic):
        acc = _mont_const_fp(coeffs[-1], batch) if not monic else FP.one_mont(batch)
        cs = coeffs if monic else coeffs[:-1]
        for c in reversed(cs):
            acc = FP.add(FP.mul(acc, x), _mont_const_fp(c, batch))
        return acc

    xn = horner(K.G1_XNUM, monic=False)
    xd = horner(K.G1_XDEN, monic=True)
    yn = horner(K.G1_YNUM, monic=False)
    yd = horner(K.G1_YDEN, monic=True)
    inv_xd_yd = FP.inv(FP.mul(xd, yd))  # one inversion chain for both
    x_out = FP.mul(FP.mul(xn, inv_xd_yd), yd)
    y_out = FP.mul(y, FP.mul(FP.mul(yn, inv_xd_yd), xd))
    return AffinePoint(x_out, y_out)


def map_to_g1_device(u, clear_cofactor: bool = True):
    """Montgomery u-batch uint32[24, n] -> AffinePoint batch on G1."""
    from ..curves.mult import point_mult
    from ..msm.recode import scalars_from_ints

    pt = _iso_g1(*_sswu_g1(u))
    if not clear_cofactor:
        return pt
    n = u.shape[-1]
    sc = jnp.asarray(scalars_from_ints([G1_H_EFF] * n))
    return G1.jac_to_affine(point_mult(G1, sc, pt, w=4))


def hash_to_g1_device(msgs, dst: bytes = None) -> AffinePoint:
    """Host hashing + device map for a batch of messages (RO suite)."""
    from .hash_to_curve import DST_G1_RO, hash_to_field_fp

    dst = dst or DST_G1_RO
    us = []
    for m in msgs:
        u0, u1 = hash_to_field_fp(m, dst, 2)
        us.extend([u0.v, u1.v])
    u_dev = FP.from_ints(us)  # [2n] interleaved u0,u1
    pts = _run_hash_to_g1(u_dev)
    return pts


@functools.lru_cache(maxsize=1)
def _hash_g1_jit():
    @jax.jit
    def run(u_dev):
        q = map_to_g1_device(u_dev, clear_cofactor=False)
        q0 = AffinePoint(*(c[..., 0::2] for c in q))
        q1 = AffinePoint(*(c[..., 1::2] for c in q))
        s = G1.xyzz_dadd_affine(G1.xyzz_from_affine(q0), q1)
        summed = G1.xyzz_to_affine(s)
        from ..curves.mult import point_mult
        from ..msm.recode import scalars_from_ints

        n = summed.X.shape[-1]
        sc = jnp.asarray(scalars_from_ints([G1_H_EFF] * n))
        return G1.jac_to_affine(point_mult(G1, sc, summed, w=4))

    return run


def _run_hash_to_g1(u_dev):
    return _hash_g1_jit()(u_dev)


# ---------------------------------------------------------------------------
# G2
# ---------------------------------------------------------------------------

def _mul_by_i(a):
    """(c0 + c1 i) * i = -c1 + c0 i (no field multiply)."""
    return jnp.stack([FP.neg(a[1]), a[0]])


def _sqrt_fp2_device(a):
    """Fp2 square root for p = 3 mod 4 (Adj & Rodriguez-Henriquez):
      a1 = a^((p-3)/4); x0 = a1 a; alpha = a1 x0 = a^((p-1)/2)
      x = i x0            if alpha == -1
          (1+alpha)^((p-1)/2) x0   otherwise
    Returns (root, ok) — ok False where a is a non-residue."""
    batch = a.shape[2:]
    a1 = FP2.pow_int(a, (P - 3) // 4)
    x0 = FP2.mul(a1, a)
    alpha = FP2.mul(a1, x0)
    minus_one = FP2.neg(FP2.one_mont(batch))
    b = FP2.pow_int(FP2.add(FP2.one_mont(batch), alpha), (P - 1) // 2)
    x = FP2.select(FP2.eq(alpha, minus_one), _mul_by_i(x0), FP2.mul(b, x0))
    ok = FP2.eq(FP2.sqr(x), a)
    return x, ok


def _sgn0_fp2_device(a):
    """RFC 9380 sgn0 for Fp2 (canonical): sign(c0) or (c0==0 and sign(c1))."""
    c0 = FP.from_mont(a[0])
    c1 = FP.from_mont(a[1])
    s0 = (c0[0] & 1) != 0
    z0 = FP.is_zero(c0)
    s1 = (c1[0] & 1) != 0
    return s0 | (z0 & s1)


def _sswu_g2(u):
    batch = u.shape[2:]
    A = _mont_const_fp2(*K.G2_A, batch)
    B = _mont_const_fp2(*K.G2_B, batch)
    Z = _mont_const_fp2(*K.G2_SSWU_Z, batch)
    one = FP2.one_mont(batch)

    tv1 = FP2.mul(Z, FP2.sqr(u))
    tv2 = FP2.add(FP2.sqr(tv1), tv1)
    tv2_zero = FP2.is_zero(tv2)
    inv_tv2 = FP2.inv(tv2)
    x1_main = FP2.mul(FP2.mul(FP2.neg(B), FP2.inv(A)), FP2.add(one, inv_tv2))
    x1_exc = FP2.mul(B, FP2.inv(FP2.mul(Z, A)))
    x1 = FP2.select(tv2_zero, x1_exc, x1_main)
    gx1 = FP2.add(FP2.mul(FP2.add(FP2.sqr(x1), A), x1), B)
    y1, ok1 = _sqrt_fp2_device(gx1)
    x2 = FP2.mul(tv1, x1)
    gx2 = FP2.add(FP2.mul(FP2.add(FP2.sqr(x2), A), x2), B)
    y2, _ = _sqrt_fp2_device(gx2)
    x = FP2.select(ok1, x1, x2)
    y = FP2.select(ok1, y1, y2)
    flip = _sgn0_fp2_device(u) != _sgn0_fp2_device(y)
    y = FP2.cneg(y, flip)
    return x, y


def _iso_g2(x, y):
    batch = x.shape[2:]

    def horner(coeffs, monic):
        acc = (
            _mont_const_fp2(*coeffs[-1], batch)
            if not monic
            else FP2.one_mont(batch)
        )
        cs = coeffs if monic else coeffs[:-1]
        for c in reversed(cs):
            acc = FP2.add(FP2.mul(acc, x), _mont_const_fp2(*c, batch))
        return acc

    xn = horner(K.G2_XNUM, monic=False)
    xd = horner(K.G2_XDEN, monic=True)
    yn = horner(K.G2_YNUM, monic=False)
    yd = horner(K.G2_YDEN, monic=True)
    inv = FP2.inv(FP2.mul(xd, yd))
    return AffinePoint(
        FP2.mul(FP2.mul(xn, inv), yd), FP2.mul(y, FP2.mul(FP2.mul(yn, inv), xd))
    )


def map_to_g2_device(u):
    """Montgomery u-batch uint32[2, 24, n] -> AffinePoint batch on E2
    (cofactor NOT cleared — the psi-based clearing is host-side for now)."""
    return _iso_g2(*_sswu_g2(u))
