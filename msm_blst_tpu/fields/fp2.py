"""Fp2 = Fp[i]/(i^2+1), vectorized over the same limb layout.

Element layout: uint32[2, L, *batch] — component axis in front so the limb/batch
layout (and therefore every Fp kernel) is reused unchanged.

Karatsuba multiply exactly as the reference's portable Fp2
(/root/reference/src/vect.c:100-135): 3 Fp muls per Fp2 mul, 2 per square.
"""

from __future__ import annotations

import jax.numpy as jnp

from .limb import FP, LimbField


class Fp2Ops:
    """Same field-ops protocol as LimbField, over Fp2 elements."""

    def __init__(self, base: LimbField):
        self.base = base
        self.name = base.name + "2"
        self.n_limbs = base.n_limbs

    # ---- construction ----------------------------------------------------
    def build(self, c0, c1):
        return jnp.stack([c0, c1], axis=0)

    def c0(self, a):
        return a[0]

    def c1(self, a):
        return a[1]

    def zeros(self, batch_shape=()):
        return jnp.zeros((2, self.base.n_limbs) + tuple(batch_shape), dtype=jnp.uint32)

    def one_mont(self, batch_shape=()):
        return self.build(
            self.base.one_mont(batch_shape), self.base.zeros(batch_shape)
        )

    # ---- predicates ------------------------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(0, 1))

    def select(self, mask, a, b):
        extra = a.ndim - mask.ndim
        return jnp.where(mask.reshape((1,) * extra + mask.shape), a, b)

    # ---- arithmetic ------------------------------------------------------
    def add(self, a, b):
        F = self.base
        return self.build(F.add(a[0], b[0]), F.add(a[1], b[1]))

    def sub(self, a, b):
        F = self.base
        return self.build(F.sub(a[0], b[0]), F.sub(a[1], b[1]))

    def double(self, a):
        return self.add(a, a)

    def mul3(self, a):
        return self.add(self.double(a), a)

    def mul8(self, a):
        return self.double(self.double(self.double(a)))

    def neg(self, a):
        F = self.base
        return self.build(F.neg(a[0]), F.neg(a[1]))

    def cneg(self, a, flag):
        return self.select(flag, self.neg(a), a)

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def sqr(self, a):
        # (a0+a1)(a0-a1) + (2 a0 a1) i — both products in one kernel call
        F = self.base
        c0, c1h = F.mul_many(
            [(F.add(a[0], a[1]), F.sub(a[0], a[1])), (a[0], a[1])]
        )
        return self.build(c0, F.double(c1h))

    def mul_many(self, pairs):
        """Karatsuba over all pairs with a single base-field multiply call."""
        F = self.base
        fp_pairs = []
        for a, b in pairs:
            fp_pairs.append((a[0], b[0]))
            fp_pairs.append((a[1], b[1]))
            fp_pairs.append((F.add(a[0], a[1]), F.add(b[0], b[1])))
        rs = F.mul_many(fp_pairs)
        out = []
        for i in range(len(pairs)):
            t0, t1, t2 = rs[3 * i], rs[3 * i + 1], rs[3 * i + 2]
            out.append(self.build(F.sub(t0, t1), F.sub(F.sub(t2, t0), t1)))
        return out

    def inv(self, a):
        # (a0 - a1 i) / (a0^2 + a1^2); inv(0) = 0
        F = self.base
        norm = F.add(F.sqr(a[0]), F.sqr(a[1]))
        ninv = F.inv(norm)
        return self.build(F.mul(a[0], ninv), F.neg(F.mul(a[1], ninv)))

    def batch_inv(self, a):
        F = self.base
        norm = F.add(F.sqr(a[0]), F.sqr(a[1]))
        ninv = F.batch_inv(norm)
        return self.build(F.mul(a[0], ninv), F.neg(F.mul(a[1], ninv)))

    def pow_int(self, a, e: int):
        import jax

        one = self.one_mont(a.shape[2:])
        nbits = max(e.bit_length(), 1)
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
        )

        def body(acc, bit):
            acc = self.sqr(acc)
            return self.select(bit != 0, self.mul(acc, a), acc), None

        acc, _ = jax.lax.scan(body, one, bits)
        return acc

    # ---- host io ---------------------------------------------------------
    def from_int_pairs(self, pairs, mont: bool = True):
        """[(c0, c1), ...] ints -> device batch."""
        c0 = self.base.from_ints([p[0] for p in pairs], mont=mont)
        c1 = self.base.from_ints([p[1] for p in pairs], mont=mont)
        return self.build(c0, c1)

    def to_int_pairs(self, a, mont: bool = True):
        c0 = self.base.to_ints(a[0], mont=mont)
        c1 = self.base.to_ints(a[1], mont=mont)
        return list(zip(c0, c1))


FP2 = Fp2Ops(FP)
