"""End-to-end MSM: four algorithms, bit-exact cross-agreement + oracle check.

This is the TPU analog of the reference's primary correctness gate
(test_pippengers, main_p1.cpp:438-610): all algorithms on the same scalar
arrays must produce identical affine coordinates, here additionally checked
against the structural ground truth Sum s_i 2^(i+1) G = (Sum s_i 2^(i+1)) G.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_blst_tpu.constants import R_ORDER
from msm_blst_tpu.curves import G1, G2
from msm_blst_tpu.msm import (
    build_plan,
    fixed_point_list,
    msm_bgmw_device,
    msm_ches_device,
    msm_ches_host_recode,
    msm_stock_pippenger,
    params,
    recode,
)
from msm_blst_tpu.refimpl import G1_REF, G2_REF

N = 32
CFG = params.make_config(5, c=8, h=32, c_bgmw=8, h_bgmw=32)
CFG_TIGHT = params.make_config(5, c=8, h=32, c_bgmw=5, h_bgmw=51)  # exercises r-a fold


def _expected_affine(ref, scalars_ints, n):
    """(Sum s_i 2^(i+1)) mod r * G via the oracle — one scalar mult."""
    total = sum(s * pow(2, i + 1, R_ORDER) for i, s in enumerate(scalars_ints)) % R_ORDER
    pt = ref.to_affine(ref.jac_mult(total, ref.generator_jac()))
    if ref is G1_REF:
        return (pt[0].v, pt[1].v)
    return ((pt[0].c0.v, pt[0].c1.v), (pt[1].c0.v, pt[1].c1.v))


def _scalar_fixture(seed):
    sc = recode.random_scalars(N, seed=seed)
    ints = recode.scalars_to_ints(sc)
    # adversarial: zero, one, r-1, and a duplicated scalar (forces equal bucket
    # entries -> the xyzz double path)
    ints[0], ints[1], ints[2] = 0, 1, R_ORDER - 1
    ints[3] = ints[4]
    return recode.scalars_from_ints(ints), ints


@pytest.fixture(scope="module")
def g1_setup():
    points = fixed_point_list(G1, N)
    plan = build_plan(G1, points, CFG)
    return points, plan


def test_fixed_point_list_matches_oracle(g1_setup):
    points, _ = g1_setup
    got = G1.affine_to_ints(points)
    expect = [( p[0].v, p[1].v) for p in G1_REF.fixed_points(N)]
    assert got == expect


def test_ches_table_entries(g1_setup):
    _, plan = g1_setup
    tbl = G1.affine_to_ints(G1.from_rows(plan.table3nh))
    q, h = CFG.q, CFG.h
    fixed = G1_REF.fixed_points(N)
    for (i, j, m) in [(0, 0, 1), (0, 0, 2), (0, 0, 3), (1, 2, 3), (5, 7, 2), (N - 1, h - 1, 3)]:
        slot = 3 * (i * h + j) + m - 1
        e = G1_REF.affine_mult(m * pow(q, j, R_ORDER), fixed[i])
        assert tbl[slot] == (e[0].v, e[1].v), (i, j, m)


def test_bgmw_table_entries(g1_setup):
    points, plan = g1_setup
    # CFG's radixes match, so the dual plan aliases nh into the 3nh table
    # (main_p1.cpp:99-106 semantics): no dedicated table is built...
    assert plan.table_nh is None and plan.bgmw_stride3
    # ...and a bgmw-only plan still builds the real nh table; check entries
    plan_b = build_plan(G1, points, CFG, ches=False, stock=False)
    tbl = G1.affine_to_ints(G1.from_rows(plan_b.table_nh))
    qb, hb = CFG.q_bgmw, CFG.h_bgmw
    fixed = G1_REF.fixed_points(N)
    for (i, j) in [(0, 0), (0, 1), (3, 5), (N - 1, hb - 1)]:
        e = G1_REF.affine_mult(pow(qb, j, R_ORDER), fixed[i])
        assert tbl[i * hb + j] == (e[0].v, e[1].v), (i, j)
    # and the aliased m=1 rows ARE the nh table entries (stride-3 view)
    tbl3 = G1.affine_to_ints(G1.from_rows(plan.table3nh))
    h = CFG.h
    for (i, j) in [(0, 0), (3, 5), (N - 1, h - 1)]:
        assert tbl3[3 * (i * h + j)] == tbl[i * hb + j], (i, j)


def test_g1_four_way_agreement(g1_setup):
    points, plan = g1_setup
    sc_np, ints = _scalar_fixture(seed=11)
    sc_dev = jnp.asarray(sc_np)
    expect = _expected_affine(G1_REF, ints, N)

    r_ches_host = G1.affine_to_ints(
        G1.jac_to_affine(msm_ches_host_recode(plan, sc_np))
    )[0]
    r_ches_dev = G1.affine_to_ints(
        G1.jac_to_affine(jax.jit(lambda s: msm_ches_device(plan, s))(sc_dev))
    )[0]
    r_bgmw = G1.affine_to_ints(
        G1.jac_to_affine(jax.jit(lambda s: msm_bgmw_device(plan, s))(sc_dev))
    )[0]
    r_stock = G1.affine_to_ints(
        G1.jac_to_affine(
            jax.jit(lambda s: msm_stock_pippenger(plan, s, window=8))(sc_dev)
        )
    )[0]
    assert r_ches_host == expect, "CHES host-recode"
    assert r_ches_dev == expect, "CHES integral (device recode)"
    assert r_bgmw == expect, "BGMW95"
    assert r_stock == expect, "stock Pippenger"


def test_bgmw_tight_config_r_minus_a():
    points = fixed_point_list(G1, N)
    plan = build_plan(G1, points, CFG_TIGHT, ches=False)
    sc_np, ints = _scalar_fixture(seed=13)
    # force scalars into the fold branch (top bits large)
    ints[5] = R_ORDER - 12345
    ints[6] = (1 << 254) + 999
    sc_np = recode.scalars_from_ints(ints)
    expect = _expected_affine(G1_REF, ints, N)
    got = G1.affine_to_ints(
        G1.jac_to_affine(
            jax.jit(lambda s: msm_bgmw_device(plan, s))(jnp.asarray(sc_np))
        )
    )[0]
    assert got == expect


def test_g2_agreement():
    n = 16
    cfg = params.make_config(4, c=8, h=32, c_bgmw=8, h_bgmw=32)
    points = fixed_point_list(G2, n)
    plan = build_plan(G2, points, cfg)
    sc = recode.random_scalars(n, seed=21)
    ints = recode.scalars_to_ints(sc)
    ints[0], ints[1] = 0, R_ORDER - 1
    ints[2] = ints[3]
    sc = recode.scalars_from_ints(ints)
    expect = _expected_affine(G2_REF, ints, n)
    sc_dev = jnp.asarray(sc)
    r_ches = G2.affine_to_ints(
        G2.jac_to_affine(jax.jit(lambda s: msm_ches_device(plan, s))(sc_dev))
    )[0]
    r_bgmw = G2.affine_to_ints(
        G2.jac_to_affine(jax.jit(lambda s: msm_bgmw_device(plan, s))(sc_dev))
    )[0]
    assert r_ches == expect, "G2 CHES"
    assert r_bgmw == expect, "G2 BGMW95"


def test_noindexhash_agreement(g1_setup):
    """Value-indexed bucket variant (multi_scalar.c:466-503) must agree."""
    import dataclasses

    _, plan = g1_setup
    plan_v = dataclasses.replace(plan, noindexhash=True)
    sc_np, ints = _scalar_fixture(seed=17)
    expect = _expected_affine(G1_REF, ints, N)
    got = G1.affine_to_ints(
        G1.jac_to_affine(
            jax.jit(lambda s: msm_ches_device(plan_v, s))(jnp.asarray(sc_np))
        )
    )[0]
    assert got == expect


def test_bign_ranged_driver(g1_setup):
    """jit_msm_bign (round 4): the two-jit ranged-chunking driver must match
    the oracle for both algorithms (forced K=3 so chunking actually
    exercises at n=32)."""
    from msm_blst_tpu.msm.engine import jit_msm_bign

    points, plan = g1_setup
    sc_np, ints = _scalar_fixture(seed=23)
    expect = _expected_affine(G1_REF, ints, N)
    for algo in ("ches", "bgmw"):
        for host_chunks in (False, True):
            run = jit_msm_bign(plan, algo, n_chunks=3,
                               force_host_chunks=host_chunks)
            got = G1.affine_to_ints(
                G1.jac_to_affine(run(jnp.asarray(sc_np))))[0]
            assert got == expect, (algo, host_chunks)


def test_non_power_of_two_n():
    """n = 1027 — deliberately non-power-of-two, mirroring the reference's Go
    MSM test (/root/reference/bindings/go/blst_minpk_test.go:622-642):
    exercises the stream padding in the prefix pipeline and the chunked
    column-major layout at an odd N = n*h. CHES and BGMW must agree with the
    structural oracle."""
    n = 1027
    cfg = params.make_config(10, c=8, h=32, c_bgmw=8, h_bgmw=32)
    points = fixed_point_list(G1, n)
    plan = build_plan(G1, points, cfg, stock=False)
    sc = recode.random_scalars(n, seed=41)
    ints = recode.scalars_to_ints(sc)
    ints[0] = 0  # empty bucket entries at an odd stream length
    sc = recode.scalars_from_ints(ints)
    total = sum(s * pow(2, i + 1, R_ORDER) for i, s in enumerate(ints)) % R_ORDER
    pt = G1_REF.to_affine(G1_REF.jac_mult(total, G1_REF.generator_jac()))
    expect = (pt[0].v, pt[1].v)
    got_ches = G1.affine_to_ints(G1.jac_to_affine(
        jax.jit(lambda s: msm_ches_device(plan, s))(jnp.asarray(sc))))[0]
    got_bgmw = G1.affine_to_ints(G1.jac_to_affine(
        jax.jit(lambda s: msm_bgmw_device(plan, s))(jnp.asarray(sc))))[0]
    assert got_ches == expect
    assert got_bgmw == expect


@pytest.mark.slow
def test_realistic_radix_c16():
    """CHES at the reference's production radix (c=16, B_SIZE=18,343,
    CONFIGS[14]'s parameters) with a small point count: exercises the d-gap
    integration, the packed digit table, and the segmented reduce at real
    bucket counts off-hardware (VERDICT round 1, item 6)."""
    n = 64
    cfg14 = params.CONFIGS[14]
    cfg = params.MsmConfig(6, cfg14.c, cfg14.h, cfg14.ah, cfg14.b_size,
                           cfg14.c_bgmw, cfg14.h_bgmw)
    points = fixed_point_list(G1, n)
    plan = build_plan(G1, points, cfg, bgmw=False, stock=False)
    sc = recode.random_scalars(n, seed=31)
    ints = recode.scalars_to_ints(sc)
    ints[0] = (1 << 255) - 1  # folds mod r; max-weight digits
    sc = recode.scalars_from_ints(ints)
    expect = _expected_affine(G1_REF, ints, n)
    got = G1.affine_to_ints(
        G1.jac_to_affine(
            jax.jit(lambda s: msm_ches_device(plan, s))(jnp.asarray(sc))
        )
    )[0]
    assert got == expect
