"""Branch-free vectorized point arithmetic (Jacobian + XYZZ coordinates).

The reference's point layer branches per point on {either-input-infinity, add,
double, cancel} (/root/reference/src/ec_ops.h:642-769). On TPU, control flow is
per *batch*, not per lane — so every case is computed vectorized and the result
is lane-selected with `where`. The formulas themselves are the standard EFD
ones the reference also uses (add-2008-s / madd-2008-s / dbl-2008-s-1 for XYZZ,
dbl-2009-l for Jacobian, a = 0 short Weierstrass).

Infinity conventions (same as refimpl and the reference):
  affine: (0, 0) | Jacobian: Z == 0 | XYZZ: ZZ == 0 and ZZZ == 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class AffinePoint(NamedTuple):
    X: jnp.ndarray
    Y: jnp.ndarray


class JacPoint(NamedTuple):
    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray


class XyzzPoint(NamedTuple):
    X: jnp.ndarray
    Y: jnp.ndarray
    ZZZ: jnp.ndarray
    ZZ: jnp.ndarray


class RowAffine(NamedTuple):
    """Affine batch in row-major layout: each coord is (N, D) with D =
    prod(lead)*L flattened limbs. TPU gathers of contiguous 96/192-byte rows
    along the major axis run ~6x faster than lane-axis gathers (measured on
    v5e), so the big precompute tables are stored this way."""

    X: jnp.ndarray
    Y: jnp.ndarray


class PackedRows(NamedTuple):
    """Affine batch as ONE row-major array (N, 2D): X||Y packed per row.

    The TPU row-gather rate is per-ROW, nearly independent of row size
    (~30 ns/row measured on v5e for 96 B and 192 B rows alike), so packing
    both coordinates into one row halves the table-gather cost of the MSM
    hot path vs RowAffine. Default table layout since round 3."""

    XY: jnp.ndarray


class PackedRows32(NamedTuple):
    """PackedRows with two adjacent 16-bit limbs packed per uint32 word:
    row = [X limbs packed (D/2), Y limbs packed (D/2)], lo limb in bits
    0-15. HALVES the table's HBM footprint (the reference's 96 B/G1 point
    instead of the limb layout's 192 B) and the gather bandwidth of the MSM
    hot path; unpacked with two VPU shifts right after the gather. This is
    what lets the n=2^20/2^21 CHES 3nh tables (3.6 / 7.2 GB packed) fit one
    v5e next to the query pipeline (round-4; cf. main_p1.cpp:35's own
    memory warning)."""

    XY: jnp.ndarray


def pack_u16_rows(xy: jnp.ndarray) -> jnp.ndarray:
    """(N, 2D) rows of 16-bit limbs in uint32 -> (N, D) packed words."""
    return xy[..., 0::2] | (xy[..., 1::2] << 16)


def unpack_u16(words: jnp.ndarray) -> jnp.ndarray:
    """(..., D) packed words -> (..., 2D) 16-bit limbs (interleave lo/hi)."""
    lo = words & jnp.uint32(0xFFFF)
    hi = words >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(words.shape[:-1] + (-1,))


class CurveOps:
    """Vectorized point ops over a field-ops object F (LimbField or Fp2Ops)."""

    def __init__(self, F, name: str):
        self.F = F
        self.name = name

    # ---- lifts / predicates ---------------------------------------------
    def select(self, mask, a, b):
        """Lane-select between two like-typed points."""
        F = self.F
        return type(a)(*(F.select(mask, x, y) for x, y in zip(a, b)))

    def affine_is_inf(self, p: AffinePoint):
        return self.F.is_zero(p.X) & self.F.is_zero(p.Y)

    def affine_inf(self, batch_shape=()):
        z = self.F.zeros(batch_shape)
        return AffinePoint(z, z)

    def jac_is_inf(self, p: JacPoint):
        return self.F.is_zero(p.Z)

    def jac_inf(self, batch_shape=()):
        one = self.F.one_mont(batch_shape)
        return JacPoint(one, one, self.F.zeros(batch_shape))

    def xyzz_is_inf(self, p: XyzzPoint):
        return self.F.is_zero(p.ZZ) & self.F.is_zero(p.ZZZ)

    def xyzz_inf(self, batch_shape=()):
        z = self.F.zeros(batch_shape)
        return XyzzPoint(z, z, z, z)

    def jac_from_affine(self, p: AffinePoint) -> JacPoint:
        inf = self.affine_is_inf(p)
        return self.select(
            inf,
            self.jac_inf(self._bshape(p.X)),
            JacPoint(p.X, p.Y, self.F.one_mont(self._bshape(p.X))),
        )

    def xyzz_from_affine(self, p: AffinePoint, negate=None) -> XyzzPoint:
        """Lift affine to XYZZ; optional per-lane negation mask."""
        F = self.F
        y = p.Y if negate is None else F.cneg(p.Y, negate)
        inf = self.affine_is_inf(p)
        one = F.one_mont(self._bshape(p.X))
        zero = F.zeros(self._bshape(p.X))
        zz = F.select(inf, zero, one)
        return XyzzPoint(p.X, y, zz, zz)

    def _bshape(self, coord):
        # LimbField elements: (L, *batch); Fp2: (2, L, *batch)
        return coord.shape[2 if hasattr(self.F, "base") else 1 :]

    # ---- Jacobian ---------------------------------------------------------
    # All formulas below are *staged*: independent multiplies at the same DAG
    # depth are issued as one wide F.mul_many call (compile- and VPU-friendly).

    def jac_double(self, p: JacPoint) -> JacPoint:
        """dbl-2009-l, a=0: 2M+5S. Infinity propagates automatically (Z3 = 2YZ = 0)."""
        F = self.F
        A, Bv = F.mul_many([(p.X, p.X), (p.Y, p.Y)])
        C, E2, YZ = F.mul_many([(Bv, Bv), (F.add(p.X, Bv), F.add(p.X, Bv)), (p.Y, p.Z)])
        D = F.double(F.sub(E2, F.add(A, C)))
        E = F.mul3(A)
        (Fq,) = F.mul_many([(E, E)])
        X3 = F.sub(Fq, F.double(D))
        (T,) = F.mul_many([(E, F.sub(D, X3))])
        Y3 = F.sub(T, F.mul8(C))
        Z3 = F.double(YZ)
        return JacPoint(X3, Y3, Z3)

    def jac_dadd(self, p: JacPoint, q: JacPoint) -> JacPoint:
        """Unified Jacobian add-or-double with full case analysis, branch-free."""
        F = self.F
        Z1Z1, Z2Z2, ZZ12 = F.mul_many([(p.Z, p.Z), (q.Z, q.Z), (p.Z, q.Z)])
        U1, U2, S1h, S2h = F.mul_many(
            [(p.X, Z2Z2), (q.X, Z1Z1), (p.Y, Z2Z2), (q.Y, Z1Z1)]
        )
        S1, S2 = F.mul_many([(S1h, q.Z), (S2h, p.Z)])
        H = F.sub(U2, U1)
        R = F.sub(S2, S1)
        # add path
        H2, RR = F.mul_many([(H, H), (R, R)])
        H3, V, Z3 = F.mul_many([(H2, H), (U1, H2), (ZZ12, H)])
        X3 = F.sub(F.sub(RR, H3), F.double(V))
        T1, T2 = F.mul_many([(R, F.sub(V, X3)), (S1, H3)])
        Y3 = F.sub(T1, T2)
        added = JacPoint(X3, Y3, Z3)
        # case analysis
        p_inf = self.jac_is_inf(p)
        q_inf = self.jac_is_inf(q)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(R)
        dbl = self.jac_double(p)
        out = self.select(h_zero & r_zero, dbl, added)
        out = self.select(h_zero & ~r_zero & ~p_inf & ~q_inf,
                          self.jac_inf(self._bshape(p.X)), out)
        out = self.select(q_inf, p, out)
        out = self.select(p_inf, q, out)
        return out

    def jac_dadd_affine(self, p: JacPoint, q: AffinePoint) -> JacPoint:
        """Unified mixed Jacobian add (spec: ec_ops.h:129-179, 8M+5S): the
        specialized madd saves 5M over the general dadd when the second
        operand is affine (Z2 = 1 eliminates Z2Z2/U1/S1 scaling). Used by
        table builds and single-point paths; branch-free case analysis."""
        F = self.F
        Z1Z1 = F.sqr(p.Z)
        U2, S2h = F.mul_many([(q.X, Z1Z1), (q.Y, Z1Z1)])
        (S2,) = F.mul_many([(S2h, p.Z)])
        H = F.sub(U2, p.X)          # H = U2 - X1
        R = F.sub(S2, p.Y)          # R = S2 - Y1
        HH = F.sqr(H)
        RR, HHH, V, Z3 = F.mul_many(
            [(R, R), (HH, H), (p.X, HH), (p.Z, H)]
        )
        X3 = F.sub(F.sub(RR, HHH), F.double(V))
        T1, T2 = F.mul_many([(R, F.sub(V, X3)), (p.Y, HHH)])
        Y3 = F.sub(T1, T2)
        added = JacPoint(X3, Y3, Z3)

        p_inf = self.jac_is_inf(p)
        q_inf = self.affine_is_inf(q)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(R)
        dbl = self.jac_double(p)
        out = self.select(h_zero & r_zero, dbl, added)
        out = self.select(h_zero & ~r_zero & ~p_inf & ~q_inf,
                          self.jac_inf(self._bshape(p.X)), out)
        out = self.select(q_inf, p, out)
        out = self.select(p_inf, self.jac_from_affine(q), out)
        return out

    # ---- XYZZ -------------------------------------------------------------
    def xyzz_double(self, p: XyzzPoint) -> XyzzPoint:
        """dbl-2008-s-1 (a=0). Infinity propagates (ZZ3 = V*ZZ = 0)."""
        from .pallas_point import dispatch

        fused = dispatch(self, "double", p)
        if fused is not None:
            return fused
        F = self.F
        U = F.double(p.Y)
        V, A = F.mul_many([(U, U), (p.X, p.X)])
        M = F.mul3(A)
        W, S, MM = F.mul_many([(U, V), (p.X, V), (M, M)])
        X3 = F.sub(MM, F.double(S))
        T1, T2, ZZZ3, ZZ3 = F.mul_many(
            [(M, F.sub(S, X3)), (W, p.Y), (p.ZZZ, W), (p.ZZ, V)]
        )
        return XyzzPoint(X3, F.sub(T1, T2), ZZZ3, ZZ3)

    def xyzz_dadd(self, p1: XyzzPoint, p2: XyzzPoint) -> XyzzPoint:
        """add-2008-s with case analysis (spec: ec_ops.h:642-702).

        Both the 12M+2S add path and the doubling path are evaluated with
        shared wide multiply stages and lane-selected (4 multiply kernel calls
        total; on TPU the whole formula runs as ONE fused Pallas kernel)."""
        from .pallas_point import dispatch

        fused = dispatch(self, "dadd", p1, p2)
        if fused is not None:
            return fused
        return self.xyzz_dadd_body(p1, p2, cond_dbl=False)

    def xyzz_dadd_body(self, p1: XyzzPoint, p2: XyzzPoint,
                       cond_dbl: bool = False) -> XyzzPoint:
        """The dadd formula without kernel dispatch.

        cond_dbl=True guards the doubling path behind a batch-level lax.cond:
        the 9 extra multiplies run only when some lane actually doubles
        (P == Q, neither infinity) — the analog of the reference's cheaper
        non-unified adds (ec_ops.h:185-294) without giving up unification."""
        import jax

        F = self.F
        U1, S1, U2, S2, ZZp, ZZZp = F.mul_many(
            [
                (p1.X, p2.ZZ),
                (p1.Y, p2.ZZZ),
                (p2.X, p1.ZZ),
                (p2.Y, p1.ZZZ),
                (p1.ZZ, p2.ZZ),
                (p1.ZZZ, p2.ZZZ),
            ]
        )
        Pv = F.sub(U2, U1)
        Rv = F.sub(S2, S1)
        PP, RR = F.mul_many([(Pv, Pv), (Rv, Rv)])
        PPP, Q = F.mul_many([(PP, Pv), (U1, PP)])
        X3 = F.sub(F.sub(RR, PPP), F.double(Q))
        T1, T2, ZZ3, ZZZ3 = F.mul_many(
            [
                (Rv, F.sub(Q, X3)),
                (S1, PPP),
                (ZZp, PP),
                (ZZZp, PPP),
            ]
        )
        added = XyzzPoint(X3, F.sub(T1, T2), ZZZ3, ZZ3)

        p1_inf = self.xyzz_is_inf(p1)
        p2_inf = self.xyzz_is_inf(p2)
        p_zero = F.is_zero(Pv)
        r_zero = F.is_zero(Rv)
        dbl_mask = p_zero & r_zero & ~p1_inf & ~p2_inf

        def dbl_path(_):
            Ud = F.double(p1.Y)
            V, A = F.mul_many([(Ud, Ud), (p1.X, p1.X)])
            M = F.mul3(A)
            W, S, MM = F.mul_many([(Ud, V), (p1.X, V), (M, M)])
            Xd = F.sub(MM, F.double(S))
            T3, T4, ZZd, ZZZd = F.mul_many(
                [(M, F.sub(S, Xd)), (W, p1.Y), (p1.ZZ, V), (p1.ZZZ, W)]
            )
            return XyzzPoint(Xd, F.sub(T3, T4), ZZZd, ZZd)

        if cond_dbl:
            dbl = jax.lax.cond(
                jnp.any(dbl_mask), dbl_path,
                lambda _: XyzzPoint(*(jnp.zeros_like(c) for c in added)),
                None,
            )
        else:
            dbl = dbl_path(None)
        out = self.select(dbl_mask, dbl, added)
        out = self.select(p_zero & ~r_zero & ~p1_inf & ~p2_inf,
                          self.xyzz_inf(self._bshape(p1.X)), out)
        out = self.select(p2_inf, p1, out)
        out = self.select(p1_inf, p2, out)
        return out

    def xyzz_dadd_affine(self, p1: XyzzPoint, p2: AffinePoint, subtract=None) -> XyzzPoint:
        """The MSM hot op: madd-2008-s with sign (spec: ec_ops.h:710-769).

        `subtract` is a per-lane bool mask (None = all-add). 8M+2S add path +
        4M+3S double path, lane-selected (one fused Pallas kernel on TPU).
        """
        from .pallas_point import dispatch

        fused = dispatch(self, "dadd_affine", p1, p2, subtract)
        if fused is not None:
            return fused
        return self.xyzz_dadd_affine_body(p1, p2, subtract, cond_dbl=False)

    def xyzz_dadd_affine_body(self, p1: XyzzPoint, p2: AffinePoint,
                              subtract=None, cond_dbl: bool = False) -> XyzzPoint:
        """The signed mixed-add formula without kernel dispatch; cond_dbl as
        in xyzz_dadd_body (7 extra multiplies skipped when no lane doubles)."""
        import jax

        F = self.F
        y2 = p2.Y if subtract is None else F.cneg(p2.Y, subtract)
        P0, R0 = F.mul_many([(p2.X, p1.ZZ), (y2, p1.ZZZ)])
        Pv = F.sub(P0, p1.X)
        Rv = F.sub(R0, p1.Y)
        PP, RR = F.mul_many([(Pv, Pv), (Rv, Rv)])
        PPP, Q = F.mul_many([(PP, Pv), (p1.X, PP)])
        X3 = F.sub(F.sub(RR, PPP), F.double(Q))
        T1, T2, ZZ3, ZZZ3 = F.mul_many(
            [
                (Rv, F.sub(Q, X3)),
                (p1.Y, PPP),
                (p1.ZZ, PP),
                (p1.ZZZ, PPP),
            ]
        )
        added = XyzzPoint(X3, F.sub(T1, T2), ZZZ3, ZZ3)

        p1_inf = self.xyzz_is_inf(p1)
        p2_inf = self.affine_is_inf(p2)
        p_zero = F.is_zero(Pv)
        r_zero = F.is_zero(Rv)
        dbl_mask = p_zero & r_zero & ~p1_inf & ~p2_inf

        def dbl_path(_):
            U = F.double(y2)
            V, A = F.mul_many([(U, U), (p2.X, p2.X)])
            M = F.mul3(A)
            W, S, MM = F.mul_many([(U, V), (p2.X, V), (M, M)])
            Xd = F.sub(MM, F.double(S))
            T3, T4 = F.mul_many([(M, F.sub(S, Xd)), (W, y2)])
            return XyzzPoint(Xd, F.sub(T3, T4), W, V)

        if cond_dbl:
            dbl = jax.lax.cond(
                jnp.any(dbl_mask), dbl_path,
                lambda _: XyzzPoint(*(jnp.zeros_like(c) for c in added)),
                None,
            )
        else:
            dbl = dbl_path(None)
        out = self.select(dbl_mask, dbl, added)
        out = self.select(p_zero & ~r_zero & ~p1_inf & ~p2_inf,
                          self.xyzz_inf(self._bshape(p1.X)), out)
        lifted = self.xyzz_from_affine(p2, negate=subtract)
        out = self.select(p1_inf, lifted, out)
        out = self.select(p2_inf, p1, out)
        return out

    # ---- homogeneous projective (pairing path) ----------------------------
    # Complete formulas (Renes-Costello-Batina, eprint 2015/1060, algs 7/9
    # for a = 0) — the device twins of the reference's proj_dadd/proj_double
    # (spec: ec_ops.h:497-632). Complete = no case analysis needed, so these
    # are select-free even on TPU. ProjPoint reuses JacPoint's (X, Y, Z)
    # container; x = X/Z, y = Y/Z, infinity = (0, 1, 0).

    def _b3(self, batch_shape):
        if not hasattr(self, "_b3_cache"):
            from ..constants import B_G1, B_G2

            F = self.F
            if self.name == "G2":
                self._b3_cache = F.from_int_pairs(
                    [(3 * B_G2[0], 3 * B_G2[1])])
            else:
                self._b3_cache = F.from_ints([3 * B_G1])
        c = self._b3_cache
        # broadcast to the batch shape (mul_many stacks same-shaped pairs)
        lead = c.shape[:-1]
        return jnp.broadcast_to(c, lead + tuple(batch_shape))

    def proj_from_affine(self, p: AffinePoint) -> JacPoint:
        F = self.F
        inf = self.affine_is_inf(p)
        one = F.one_mont(self._bshape(p.X))
        zero = F.zeros(self._bshape(p.X))
        return JacPoint(
            p.X, F.select(inf, one, p.Y), F.select(inf, zero, one)
        )

    def proj_to_affine(self, p: JacPoint) -> AffinePoint:
        F = self.F
        zi = F.batch_inv(p.Z)  # 0 -> 0: infinity maps to (0, 0)
        return AffinePoint(F.mul(p.X, zi), F.mul(p.Y, zi))

    def proj_double(self, p: JacPoint) -> JacPoint:
        """alg 9 (a=0): 3M+2S+1*b3."""
        F = self.F
        b3 = self._b3(self._bshape(p.X))
        t0, t1, t2 = F.mul_many([(p.Y, p.Y), (p.Y, p.Z), (p.Z, p.Z)])
        z3 = F.mul8(t0)
        (t2b,) = F.mul_many([(b3, t2)])
        x3, z3o, ty = F.mul_many([(t2b, z3), (t1, z3), (p.X, p.Y)])
        y3 = F.add(t0, t2b)
        t0 = F.sub(t0, F.mul3(t2b))
        (y3m, x3m) = F.mul_many([(t0, y3), (t0, ty)])
        return JacPoint(F.double(x3m), F.add(x3, y3m), z3o)

    def proj_dadd(self, p: JacPoint, q: JacPoint) -> JacPoint:
        """alg 7 (a=0): 12M+2*b3, complete (handles doubling/infinity)."""
        F = self.F
        b3 = self._b3(self._bshape(p.X))
        t0, t1, t2 = F.mul_many([(p.X, q.X), (p.Y, q.Y), (p.Z, q.Z)])
        (t3,) = F.mul_many([(F.add(p.X, p.Y), F.add(q.X, q.Y))])
        t3 = F.sub(t3, F.add(t0, t1))
        (t4,) = F.mul_many([(F.add(p.Y, p.Z), F.add(q.Y, q.Z))])
        t4 = F.sub(t4, F.add(t1, t2))
        (x3,) = F.mul_many([(F.add(p.X, p.Z), F.add(q.X, q.Z))])
        y3 = F.sub(x3, F.add(t0, t2))
        t0 = F.mul3(t0)
        (t2b, y3b) = F.mul_many([(b3, t2), (b3, y3)])
        z3 = F.add(t1, t2b)
        t1 = F.sub(t1, t2b)
        xa, xb, ya, yb, za, zb = F.mul_many(
            [(t4, y3b), (t3, t1), (y3b, t0), (t1, z3), (t0, t3), (z3, t4)]
        )
        return JacPoint(F.sub(xb, xa), F.add(yb, ya), F.add(zb, za))

    def xyzz_to_jac(self, p: XyzzPoint) -> JacPoint:
        F = self.F
        inf = self.xyzz_is_inf(p)
        jac = JacPoint(F.mul(p.X, p.ZZ), F.mul(p.Y, p.ZZZ), p.ZZ)
        return self.select(inf, self.jac_inf(self._bshape(p.X)), jac)

    def jac_to_xyzz(self, p: JacPoint) -> XyzzPoint:
        F = self.F
        zz = F.sqr(p.Z)
        return XyzzPoint(p.X, p.Y, F.mul(zz, p.Z), zz)

    # ---- batch to-affine (Montgomery batch inversion) ---------------------
    def jac_to_affine(self, p: JacPoint) -> AffinePoint:
        """Batched: one field inversion total (spec: multi_scalar.c:17-62)."""
        F = self.F
        zinv = F.batch_inv(p.Z)  # 0 -> 0, so infinity maps to (0, 0)
        zinv2 = F.sqr(zinv)
        return AffinePoint(F.mul(p.X, zinv2), F.mul(p.Y, F.mul(zinv2, zinv)))

    def xyzz_to_affine(self, p: XyzzPoint) -> AffinePoint:
        F = self.F
        return AffinePoint(
            F.mul(p.X, F.batch_inv(p.ZZ)), F.mul(p.Y, F.batch_inv(p.ZZZ))
        )

    # ---- utilities ---------------------------------------------------------
    def take(self, p, idx):
        """Gather along the batch (last) axis for any point type."""
        if isinstance(p, (RowAffine, PackedRows, PackedRows32)):
            return self.take_rows(p, idx)
        return type(p)(*(jnp.take(c, idx, axis=-1) for c in p))

    def to_rows(self, p: AffinePoint) -> PackedRows:
        """(…, L, N) affine batch -> packed row-major (N, 2D) table."""
        def r(c):
            return jnp.moveaxis(c, -1, 0).reshape(c.shape[-1], -1)

        return PackedRows(jnp.concatenate([r(p.X), r(p.Y)], axis=1))

    def to_rows32(self, p) -> PackedRows32:
        """AffinePoint batch or PackedRows -> limb-packed (N, D) rows."""
        if not isinstance(p, PackedRows):
            p = self.to_rows(p)
        x, y = jnp.split(p.XY, 2, axis=1)
        return PackedRows32(
            jnp.concatenate([pack_u16_rows(x), pack_u16_rows(y)], axis=1))

    def _restore(self, c):
        lead = (2,) if hasattr(self.F, "base") else ()
        L = self.F.base.n_limbs if hasattr(self.F, "base") else self.F.n_limbs
        return jnp.moveaxis(c, 0, -1).reshape(lead + (L, c.shape[0]))

    def from_rows(self, p) -> AffinePoint:
        """Row-major table -> standard (…, L, N) affine batch."""
        if isinstance(p, PackedRows32):
            x, y = jnp.split(p.XY, 2, axis=1)
            return AffinePoint(self._restore(unpack_u16(x)),
                               self._restore(unpack_u16(y)))
        if isinstance(p, PackedRows):
            x, y = jnp.split(p.XY, 2, axis=1)
            return AffinePoint(self._restore(x), self._restore(y))
        return AffinePoint(self._restore(p.X), self._restore(p.Y))

    def take_rows(self, rows, idx) -> AffinePoint:
        """Row gather + layout restore: the hot-path table lookup."""
        if isinstance(rows, (PackedRows, PackedRows32)):
            return self.from_rows(type(rows)(jnp.take(rows.XY, idx, axis=0)))
        return self.from_rows(
            RowAffine(jnp.take(rows.X, idx, axis=0), jnp.take(rows.Y, idx, axis=0))
        )

    def dynamic_slice(self, p, start, size):
        import jax.lax as lax

        return type(p)(
            *(lax.dynamic_slice_in_dim(c, start, size, axis=-1) for c in p)
        )

    def concat(self, ps):
        return type(ps[0])(*(jnp.concatenate(cs, axis=-1) for cs in zip(*ps)))

    def tree_reduce_xyzz(self, p: XyzzPoint) -> XyzzPoint:
        """Sum all lanes with log-depth pairwise dadds -> batch of 1."""
        n = p.X.shape[-1]
        while n > 1:
            half = n // 2
            lo = type(p)(*(c[..., :half] for c in p))
            hi = type(p)(*(c[..., half : 2 * half] for c in p))
            rest = type(p)(*(c[..., 2 * half : n] for c in p))
            p = self.concat([self.xyzz_dadd(lo, hi), rest])
            n = half + (n - 2 * half)
        return p
