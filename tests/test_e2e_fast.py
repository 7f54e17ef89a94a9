"""Commit-gate end-to-end MSM (VERDICT r4 Next 5): a small cross-method
agreement test in the FAST CI tier, so an engine regression cannot pass the
commit gate. Mirrors the reference's own primary oracle (test_pippengers,
/root/reference/main_p1.cpp:438-610) at toy size.

Kept cheap: ONE shared plan, n=16, c=8 (B_SIZE ~ 60 buckets), and shapes
chosen to match the nightly tests so the persistent compilation cache
(tests/conftest.py) is shared — warm runs are seconds.
"""

import jax
import jax.numpy as jnp

from msm_blst_tpu.constants import R_ORDER
from msm_blst_tpu.curves import G1
from msm_blst_tpu.msm import (
    build_plan,
    fixed_point_list,
    msm_bgmw_device,
    msm_ches_device,
    msm_stock_pippenger,
    params,
    recode,
)
from msm_blst_tpu.refimpl import G1_REF

N = 16
CFG = params.make_config(4, c=8, h=32, c_bgmw=8, h_bgmw=32)


def test_e2e_three_way_agreement():
    points = fixed_point_list(G1, N)
    plan = build_plan(G1, points, CFG)
    sc = recode.random_scalars(N, seed=51)
    ints = recode.scalars_to_ints(sc)
    ints[0], ints[1] = 0, R_ORDER - 1        # adversarial edges
    ints[2] = ints[3]                        # duplicate -> double path
    sc = jnp.asarray(recode.scalars_from_ints(ints))

    total = sum(s * pow(2, i + 1, R_ORDER)
                for i, s in enumerate(ints)) % R_ORDER
    pt = G1_REF.to_affine(G1_REF.jac_mult(total, G1_REF.generator_jac()))
    expect = (pt[0].v, pt[1].v)

    r_ches = G1.affine_to_ints(G1.jac_to_affine(
        jax.jit(lambda s: msm_ches_device(plan, s))(sc)))[0]
    # BGMW rides the stride-3 aliased 3nh table here (radixes match)
    r_bgmw = G1.affine_to_ints(G1.jac_to_affine(
        jax.jit(lambda s: msm_bgmw_device(plan, s))(sc)))[0]
    r_stock = G1.affine_to_ints(G1.jac_to_affine(
        jax.jit(lambda s: msm_stock_pippenger(plan, s, window=8))(sc)))[0]
    assert r_ches == expect, "CHES device"
    assert r_bgmw == expect, "BGMW95 (aliased table)"
    assert r_stock == expect, "stock Pippenger"
