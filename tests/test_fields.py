"""Limb-vectorized Fp / Fr / Fp2 vs the pure-Python oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_blst_tpu.constants import P, R_ORDER
from msm_blst_tpu.fields.fp2 import FP2
from msm_blst_tpu.fields.limb import FP, FR

B = 32


@pytest.fixture(scope="module")
def rng():
    random.seed(1234)
    return random


@pytest.fixture(scope="module")
def fp_pairs(rng):
    xs = [rng.randrange(P) for _ in range(B)]
    ys = [rng.randrange(P) for _ in range(B)]
    # adversarial values
    xs[0], ys[0] = 0, 0
    xs[1], ys[1] = P - 1, P - 1
    xs[2], ys[2] = 1, P - 1
    xs[3], ys[3] = P - 1, 1
    xs[4], ys[4] = 0, P - 1
    return xs, ys


def test_fp_add_sub(fp_pairs):
    xs, ys = fp_pairs
    a = FP.from_ints(xs, mont=False)
    b = FP.from_ints(ys, mont=False)
    assert FP.to_ints(jax.jit(FP.add)(a, b), mont=False) == [
        (x + y) % P for x, y in zip(xs, ys)
    ]
    assert FP.to_ints(jax.jit(FP.sub)(a, b), mont=False) == [
        (x - y) % P for x, y in zip(xs, ys)
    ]
    assert FP.to_ints(jax.jit(FP.neg)(a), mont=False) == [(-x) % P for x in xs]
    assert FP.to_ints(jax.jit(FP.mul3)(a), mont=False) == [3 * x % P for x in xs]
    assert FP.to_ints(jax.jit(FP.mul8)(a), mont=False) == [8 * x % P for x in xs]


def test_fp_mont_mul(fp_pairs):
    xs, ys = fp_pairs
    am = FP.from_ints(xs)
    bm = FP.from_ints(ys)
    assert FP.to_ints(am) == xs  # to/from Montgomery roundtrip
    assert FP.to_ints(jax.jit(FP.mul)(am, bm)) == [x * y % P for x, y in zip(xs, ys)]
    assert FP.to_ints(jax.jit(FP.sqr)(am)) == [x * x % P for x in xs]


def test_fp_mont_form_matches_blst_radix(fp_pairs):
    # Montgomery residue must equal x * 2^384 mod P (blst's radix), bit-exactly.
    xs, _ = fp_pairs
    am = FP.from_ints(xs)
    raw = FP.to_ints(am, mont=False)
    assert raw == [x * (1 << 384) % P for x in xs]


def test_fp_cneg(fp_pairs):
    xs, _ = fp_pairs
    a = FP.from_ints(xs, mont=False)
    flags = jnp.asarray(np.arange(B) % 2 == 0)
    got = FP.to_ints(jax.jit(FP.cneg)(a, flags), mont=False)
    assert got == [(-x) % P if i % 2 == 0 else x for i, x in enumerate(xs)]


def test_fp_inv(fp_pairs):
    xs, _ = fp_pairs
    am = FP.from_ints(xs)
    inv = FP.to_ints(jax.jit(FP.inv)(am))
    for x, ix in zip(xs, inv):
        assert (x * ix) % P == (1 if x else 0)
    assert FP.to_ints(jax.jit(FP.batch_inv)(am)) == inv


def test_fr(rng):
    zs = [rng.randrange(R_ORDER) for _ in range(8)] + [0, 1, R_ORDER - 1]
    zm = FR.from_ints(zs)
    assert FR.to_ints(jax.jit(FR.mul)(zm, zm)) == [z * z % R_ORDER for z in zs]
    got = FR.to_ints(jax.jit(FR.add)(zm, zm))
    assert got == [2 * z % R_ORDER for z in zs]


def test_fp2(rng):
    from msm_blst_tpu.refimpl.field import Fp2 as RFp2

    pa = [(rng.randrange(P), rng.randrange(P)) for _ in range(B)]
    pb = [(rng.randrange(P), rng.randrange(P)) for _ in range(B)]
    pa[0], pb[0] = (0, 0), (0, 0)
    pa[1] = (P - 1, P - 1)
    A = FP2.from_int_pairs(pa)
    Bv = FP2.from_int_pairs(pb)
    got = FP2.to_int_pairs(jax.jit(FP2.mul)(A, Bv))
    for x, y, g in zip(pa, pb, got):
        e = RFp2(*x) * RFp2(*y)
        assert g == (e.c0.v, e.c1.v)
    got = FP2.to_int_pairs(jax.jit(FP2.sqr)(A))
    for x, g in zip(pa, got):
        e = RFp2(*x).sqr()
        assert g == (e.c0.v, e.c1.v)
    got = FP2.to_int_pairs(jax.jit(FP2.inv)(A))
    for x, g in zip(pa, got):
        if x == (0, 0):
            assert g == (0, 0)
        else:
            e = RFp2(*x).inv()
            assert g == (e.c0.v, e.c1.v)


def test_resolve_limbs_stress(rng):
    """Carry resolution on adversarial limb patterns (long 0xffff ripples)."""
    from msm_blst_tpu.fields.limb import resolve_limbs, limbs_to_int

    cases = []
    # all-0xffff + 1 at bottom: maximal ripple
    cases.append(np.full(24, 0xFFFF, np.uint32))
    c = np.full(24, 0xFFFF, np.uint32)
    c[0] = 0x1FFFE
    cases.append(c)
    for _ in range(20):
        cases.append(np.array([rng.randrange(1 << 32) for _ in range(24)], np.uint32))
    for case in cases:
        val = sum(int(v) << (16 * i) for i, v in enumerate(case))
        out = np.asarray(jax.jit(resolve_limbs)(jnp.asarray(case.reshape(24, 1))))
        assert (out < (1 << 16)).all()
        assert limbs_to_int(out[:, 0]) == val


def test_is_square_batch():
    """Device Legendre test vs Python Euler criterion (incl. 0 and 1)."""
    import random

    import jax

    from msm_blst_tpu.fields import FP

    rnd = random.Random(99)
    xs = [0, 1, FP.modulus - 1] + [rnd.randrange(FP.modulus) for _ in range(13)]
    got = list(jax.jit(FP.is_square)(FP.from_ints(xs)))
    for x, g in zip(xs, got):
        want = x == 0 or pow(x, (FP.modulus - 1) // 2, FP.modulus) == 1
        assert bool(g) == want, x
