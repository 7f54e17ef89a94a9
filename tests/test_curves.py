"""Vectorized point ops vs the pure-Python oracle, incl. adversarial cases.

The case checklist mirrors /root/reference/src/ec_ops.h:699-701,766-768:
{p1 at infinity, p2 at infinity, generic add, double (P==0, R==0),
cancellation (P==0, R!=0)} — exercised per lane in one batch.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_blst_tpu.constants import R_ORDER
from msm_blst_tpu.curves import G1, G2
from msm_blst_tpu.refimpl import G1_REF, G2_REF

CURVES = [(G1, G1_REF, "g1"), (G2, G2_REF, "g2")]


def _rand_points(ref, k, seed):
    rnd = random.Random(seed)
    pts = [
        ref.to_affine(ref.jac_mult(rnd.randrange(1, R_ORDER), ref.generator_jac()))
        for _ in range(k)
    ]
    return pts


def _aff_to_ints(ref, pt):
    if ref is G1_REF:
        return (pt[0].v, pt[1].v)
    return ((pt[0].c0.v, pt[0].c1.v), (pt[1].c0.v, pt[1].c1.v))


@pytest.mark.parametrize("curve,ref,name", CURVES, ids=["g1", "g2"])
def test_xyzz_dadd_affine_cases(curve, ref, name):
    k = 8
    base = _rand_points(ref, k, seed=42)
    other = _rand_points(ref, k, seed=43)
    inf_i = ref.affine_inf()

    # lane layout: [generic, double, cancel, p1_inf, p2_inf, both_inf, gen2, gen3]
    p1_list = [base[0], base[1], base[2], inf_i, base[3], inf_i, base[4], base[5]]
    p2_list = [other[0], base[1], base[2], other[1], inf_i, inf_i, other[2], other[3]]
    signs = [False, False, True, False, False, False, True, False]

    p1 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p1_list])
    p2 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p2_list])
    sign_mask = jnp.asarray(np.array(signs))

    def run(p1, p2, s):
        acc = curve.xyzz_from_affine(p1)
        acc = curve.xyzz_dadd_affine(acc, p2, subtract=s)
        return curve.xyzz_to_affine(acc)

    got = curve.affine_to_ints(jax.jit(run)(p1, p2, sign_mask))

    for i in range(k):
        acc = ref.xyzz_from_affine(p1_list[i])
        expect = ref.xyzz_to_affine(ref.xyzz_dadd_affine(acc, p2_list[i], signs[i]))
        assert got[i] == _aff_to_ints(ref, expect), f"{name} lane {i}"


@pytest.mark.parametrize("curve,ref,name", CURVES, ids=["g1", "g2"])
def test_xyzz_dadd_full(curve, ref, name):
    k = 6
    a = _rand_points(ref, k, seed=7)
    b = _rand_points(ref, k, seed=8)
    inf_i = ref.affine_inf()
    # [generic, double, cancel-via-negate, p1inf, p2inf, generic]
    p1_list = [a[0], a[1], a[2], inf_i, a[3], a[4]]
    p2_list = [b[0], a[1], a[2], b[1], inf_i, b[2]]
    neg2 = [False, False, True, False, False, False]

    p1 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p1_list])
    p2 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p2_list])
    neg_mask = jnp.asarray(np.array(neg2))

    def run(p1, p2, neg):
        x1 = curve.xyzz_from_affine(p1)
        x2 = curve.xyzz_from_affine(p2, negate=neg)
        return curve.xyzz_to_affine(curve.xyzz_dadd(x1, x2))

    got = curve.affine_to_ints(jax.jit(run)(p1, p2, neg_mask))
    for i in range(k):
        x1 = ref.xyzz_from_affine(p1_list[i])
        x2 = ref.xyzz_from_affine(p2_list[i], negate=neg2[i])
        expect = ref.xyzz_to_affine(ref.xyzz_dadd(x1, x2))
        assert got[i] == _aff_to_ints(ref, expect), f"{name} lane {i}"


@pytest.mark.parametrize("curve,ref,name", CURVES, ids=["g1", "g2"])
def test_jacobian_ops(curve, ref, name):
    k = 6
    a = _rand_points(ref, k, seed=17)
    b = _rand_points(ref, k, seed=18)
    inf_i = ref.affine_inf()
    p1_list = [a[0], a[1], a[2], inf_i, a[3], inf_i]
    p2_list = [b[0], a[1], a[2], b[1], inf_i, inf_i]

    p1 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p1_list])
    p2 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p2_list])

    def run(p1, p2):
        j1 = curve.jac_from_affine(p1)
        j2 = curve.jac_from_affine(p2)
        s = curve.jac_dadd(j1, j2)
        d = curve.jac_double(j1)
        return curve.jac_to_affine(s), curve.jac_to_affine(d)

    gs, gd = jax.jit(run)(p1, p2)
    gs, gd = curve.affine_to_ints(gs), curve.affine_to_ints(gd)
    for i in range(k):
        es = ref.to_affine(
            ref.jac_add(ref.from_affine(p1_list[i]), ref.from_affine(p2_list[i]))
        )
        ed = ref.to_affine(ref.jac_double(ref.from_affine(p1_list[i])))
        assert gs[i] == _aff_to_ints(ref, es), f"{name} dadd lane {i}"
        assert gd[i] == _aff_to_ints(ref, ed), f"{name} double lane {i}"


@pytest.mark.parametrize("curve,ref,name", CURVES, ids=["g1", "g2"])
def test_tree_reduce(curve, ref, name):
    k = 11  # odd on purpose
    pts = _rand_points(ref, k, seed=3)
    p = curve.affine_from_ints([_aff_to_ints(ref, q) for q in pts])

    def run(p):
        return curve.xyzz_to_affine(curve.tree_reduce_xyzz(curve.xyzz_from_affine(p)))

    got = curve.affine_to_ints(jax.jit(run)(p))[0]
    expect = ref.naive_msm([1] * k, pts)
    assert got == _aff_to_ints(ref, expect)


@pytest.mark.parametrize("curve,ref,name", CURVES, ids=["g1", "g2"])
def test_xyzz_jac_roundtrip(curve, ref, name):
    pts = _rand_points(ref, 4, seed=5)
    p = curve.affine_from_ints([_aff_to_ints(ref, q) for q in pts])

    def run(p):
        x = curve.xyzz_from_affine(p)
        x = curve.xyzz_dadd(x, x)  # 2P, forces nontrivial ZZ
        j = curve.xyzz_to_jac(x)
        return curve.jac_to_affine(j)

    got = curve.affine_to_ints(jax.jit(run)(p))
    for i, q in enumerate(pts):
        expect = ref.to_affine(ref.jac_double(ref.from_affine(q)))
        assert got[i] == _aff_to_ints(ref, expect)


@pytest.mark.parametrize("curve,ref,name", CURVES, ids=["g1", "g2"])
def test_jac_dadd_affine_cases(curve, ref, name):
    """Specialized 8M+5S mixed Jacobian add (spec: ec_ops.h:129-179):
    full case matrix vs the oracle's generic jacobian add."""
    k = 6
    a = _rand_points(ref, k, seed=27)
    b = _rand_points(ref, k, seed=28)
    inf_i = ref.affine_inf()
    # [generic, double, cancel, p1_inf, p2_inf, both via generic]
    p1_list = [a[0], a[1], a[2], inf_i, a[3], a[4]]
    neg_a2 = ref.to_affine(ref.jac_mult(1, ref.from_affine(a[2])))
    neg_a2 = (neg_a2[0], -neg_a2[1])  # cancel case: q = -p
    p2_list = [b[0], a[1], neg_a2, b[1], inf_i, b[2]]

    p1 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p1_list])
    p2 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p2_list])

    def run(p1, p2):
        j1 = curve.jac_from_affine(p1)
        return curve.jac_to_affine(curve.jac_dadd_affine(j1, p2))

    got = curve.affine_to_ints(jax.jit(run)(p1, p2))
    for i in range(k):
        expect = ref.to_affine(
            ref.jac_add(ref.from_affine(p1_list[i]), ref.from_affine(p2_list[i]))
        )
        assert got[i] == _aff_to_ints(ref, expect), f"{name} lane {i}"


@pytest.mark.parametrize("curve,ref,name", CURVES, ids=["g1", "g2"])
def test_projective_complete_formulas(curve, ref, name):
    """Device homogeneous-projective add/double (complete RCB15 algs 7/9,
    spec: ec_ops.h:497-632) vs the oracle — including the doubling and
    infinity inputs that completeness must absorb with no case analysis."""
    k = 6
    a = _rand_points(ref, k, seed=37)
    b = _rand_points(ref, k, seed=38)
    inf_i = ref.affine_inf()
    # [generic, double(P==Q), p1_inf, p2_inf, generic, generic]
    p1_list = [a[0], a[1], inf_i, a[2], a[3], a[4]]
    p2_list = [b[0], a[1], b[1], inf_i, b[2], b[3]]

    p1 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p1_list])
    p2 = curve.affine_from_ints([_aff_to_ints(ref, p) for p in p2_list])

    def run(p1, p2):
        q1 = curve.proj_from_affine(p1)
        q2 = curve.proj_from_affine(p2)
        s = curve.proj_dadd(q1, q2)
        d = curve.proj_double(q1)
        return curve.proj_to_affine(s), curve.proj_to_affine(d)

    gs, gd = jax.jit(run)(p1, p2)
    gs, gd = curve.affine_to_ints(gs), curve.affine_to_ints(gd)
    for i in range(k):
        es = ref.to_affine(
            ref.jac_add(ref.from_affine(p1_list[i]), ref.from_affine(p2_list[i]))
        )
        ed = ref.to_affine(ref.jac_double(ref.from_affine(p1_list[i])))
        assert gs[i] == _aff_to_ints(ref, es), f"{name} add lane {i}"
        assert gd[i] == _aff_to_ints(ref, ed), f"{name} dbl lane {i}"
