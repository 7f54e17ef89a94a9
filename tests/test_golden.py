"""Golden vectors from the reference's own binary (SURVEY.md §4(b)).

tests/fixtures/golden_msm.json holds ZCash-serialized MSM results produced by
the UNMODIFIED reference blst (`blst_p1s_mult_pippenger` /
`blst_p2s_mult_pippenger`, built from /root/reference/src by
tools/golden/build.sh, driven by tools/golden/make_fixtures.py) on this
host, over the canonical fixed points P_i = 2^(i+1)*G and the framework's own
seeded scalar fixtures. These tests close the same-author-oracle loophole:
byte-exact agreement with an independent implementation.

Fast tier: the structural oracle (sum s_i 2^(i+1) mod r) * G — pure host
Python — must serialize to the reference's bytes for every case.
Full tier: the device MSM engine itself must hit the same bytes.
"""

import json
import os

import pytest

from msm_blst_tpu.constants import R_ORDER
from msm_blst_tpu.curves import serialize
from msm_blst_tpu.msm import recode
from msm_blst_tpu.refimpl import G1_REF, G2_REF

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "golden_msm.json")


def _cases():
    with open(FIXTURES) as f:
        return json.load(f)


def _expected_affine(group, ints):
    ref = G1_REF if group == 1 else G2_REF
    total = sum(s * pow(2, i + 1, R_ORDER) for i, s in enumerate(ints)) % R_ORDER
    return ref.to_affine(ref.jac_mult(total, ref.generator_jac()))


def _serialize(group, aff):
    if group == 1:
        return serialize.g1_serialize((aff[0].v, aff[1].v))
    return serialize.g2_serialize(
        ((aff[0].c0.v, aff[0].c1.v), (aff[1].c0.v, aff[1].c1.v)))


@pytest.mark.parametrize("case", _cases(),
                         ids=lambda c: f"G{c['group']}_n{c['n']}")
def test_oracle_matches_blst_binary(case):
    sc = recode.random_scalars(case["n"], seed=case["seed"])
    ints = recode.scalars_to_ints(sc)
    aff = _expected_affine(case["group"], ints)
    assert _serialize(case["group"], aff).hex() == case["serialized"]


@pytest.mark.parametrize("case",
                         [c for c in _cases() if c["n"] <= 128],
                         ids=lambda c: f"G{c['group']}_n{c['n']}")
def test_engine_matches_blst_binary(case):
    """The device MSM (CHES path) serializes byte-exactly to the reference
    binary's output."""
    import jax
    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1, G2
    from msm_blst_tpu.msm import (build_plan, fixed_point_list,
                                  msm_ches_device, params)

    group, n = case["group"], case["n"]
    curve = G1 if group == 1 else G2
    cfg = params.make_config(max(n.bit_length() - 1, 1), c=8,
                             h=32, c_bgmw=8, h_bgmw=32)
    points = fixed_point_list(curve, n)
    plan = build_plan(curve, points, cfg, bgmw=False, stock=False)
    sc = jnp.asarray(recode.random_scalars(n, seed=case["seed"]))
    jac = jax.jit(lambda s: msm_ches_device(plan, s))(sc)
    aff = curve.affine_to_ints(curve.jac_to_affine(jac))[0]
    if group == 1:
        got = serialize.g1_serialize(aff)
    else:
        got = serialize.g2_serialize(aff)
    assert got.hex() == case["serialized"]
