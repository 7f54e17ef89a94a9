"""Vectorized single-point mult / wbits MSM / bulk add vs the Python oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_blst_tpu.constants import R_ORDER
from msm_blst_tpu.curves import (
    G1,
    G2,
    in_group_device,
    msm_wbits,
    point_mult,
    points_add,
)
from msm_blst_tpu.msm.recode import scalars_from_ints, scalars_to_ints
from msm_blst_tpu.refimpl import G1_REF, G2_REF

rng = random.Random(0x5EED)

CASES = [(G1, G1_REF), (G2, G2_REF)]
IDS = ["g1", "g2"]


def _pts_device(curve, ref, n):
    pts = ref.fixed_points(n)
    if curve.name == "G1":
        return pts, curve.affine_from_ints([(p[0].v, p[1].v) for p in pts])
    return pts, curve.affine_from_ints(
        [((p[0].c0.v, p[0].c1.v), (p[1].c0.v, p[1].c1.v)) for p in pts]
    )


def _to_ints(ref, pt):
    if ref is G1_REF:
        return (pt[0].v, pt[1].v)
    return ((pt[0].c0.v, pt[0].c1.v), (pt[1].c0.v, pt[1].c1.v))


@pytest.mark.parametrize("curve,ref", CASES, ids=IDS)
def test_point_mult_matches_oracle(curve, ref):
    n = 8
    w = 4
    pts_ref, pts_dev = _pts_device(curve, ref, n)
    ks = [0, 1, 2, R_ORDER - 1] + [rng.randrange(R_ORDER) for _ in range(n - 4)]
    sc = jnp.asarray(scalars_from_ints(ks))
    out = jax.jit(lambda s: point_mult(curve, s, pts_dev, w=w))(sc)
    got = curve.affine_to_ints(curve.jac_to_affine(out))
    for i, k in enumerate(ks):
        want = ref.affine_mult(k, pts_ref[i])
        assert got[i] == _to_ints(ref, want), f"lane {i}, k={k}"


def test_point_mult_infinity_point():
    pts = G1.affine_from_ints([(0, 0), (0, 0)])
    sc = jnp.asarray(scalars_from_ints([5, 0]))
    out = point_mult(G1, sc, pts)
    assert bool(G1.jac_is_inf(out).all())


@pytest.mark.parametrize("curve,ref", CASES, ids=IDS)
def test_msm_wbits_matches_naive(curve, ref):
    n = 8
    pts_ref, pts_dev = _pts_device(curve, ref, n)
    ks = [rng.randrange(R_ORDER) for _ in range(n)]
    sc = jnp.asarray(scalars_from_ints(ks))
    out = jax.jit(lambda s: msm_wbits(curve, s, pts_dev, w=4))(sc)
    got = curve.affine_to_ints(curve.jac_to_affine(out))[0]
    want = ref.naive_msm(ks, pts_ref)
    assert got == _to_ints(ref, want)


@pytest.mark.parametrize("curve,ref", CASES, ids=IDS)
def test_points_add_matches_naive(curve, ref):
    n = 13  # odd: exercises the tree remainder path
    pts_ref, pts_dev = _pts_device(curve, ref, n)
    out = jax.jit(lambda p: points_add(curve, p))(pts_dev)
    got = curve.affine_to_ints(curve.jac_to_affine(out))[0]
    want = ref.naive_msm([1] * n, pts_ref)
    assert got == _to_ints(ref, want)


def test_in_group_device():
    # subgroup points pass; a cofactor point fails
    pts_ref, pts_dev = _pts_device(G1, G1_REF, 2)
    ok = np.asarray(jax.jit(lambda p: in_group_device(G1, p, w=4))(pts_dev))
    assert ok.all()
    # find an on-curve, out-of-subgroup point
    from msm_blst_tpu.protocol.hash_to_curve import sqrt_fp
    from msm_blst_tpu.refimpl.field import Fp

    x = 1
    while True:
        x += 1
        y = sqrt_fp(Fp(x).sqr() * Fp(x) + G1_REF.b)
        if y is None:
            continue
        if not G1_REF.jac_is_inf(
            G1_REF.jac_mult(R_ORDER, G1_REF.from_affine((Fp(x), y)))
        ):
            bad = (Fp(x).v, y.v)
            break
    dev = G1.affine_from_ints([bad])
    dev2 = G1.affine_from_ints([bad, bad])
    assert not np.asarray(in_group_device(G1, dev2, w=4))[0]


@pytest.mark.parametrize("curve,ref", CASES, ids=IDS)
def test_ladder_mult_matches_oracle(curve, ref):
    from msm_blst_tpu.curves import ladder_mult

    n = 8
    pts_ref, pts_dev = _pts_device(curve, ref, n)
    ks = [0, 1, 2, R_ORDER - 1, R_ORDER - 2] + [
        rng.randrange(R_ORDER) for _ in range(n - 5)
    ]
    sc = jnp.asarray(scalars_from_ints(ks))
    out = jax.jit(lambda s: ladder_mult(curve, s, pts_dev))(sc)
    got = curve.affine_to_ints(curve.jac_to_affine(out))
    for i, k in enumerate(ks):
        want = ref.affine_mult(k, pts_ref[i])
        assert got[i] == _to_ints(ref, want), f"lane {i}, k={k}"
