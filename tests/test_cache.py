"""Table-persistence round trip (msm/cache.py) — VERDICT round 1, item 8."""

import jax
import jax.numpy as jnp
import numpy as np

from msm_blst_tpu.curves import G1
from msm_blst_tpu.msm import build_plan, cache, fixed_point_list, msm_ches_device, params, recode


def test_plan_cache_roundtrip(tmp_path):
    n = 32
    cfg = params.make_config(5, c=8, h=32, c_bgmw=8, h_bgmw=32)
    points = fixed_point_list(G1, n)
    plan = build_plan(G1, points, cfg)
    path = cache.save_plan(plan, str(tmp_path))
    loaded = cache.load_plan(G1, cfg, n, str(tmp_path))
    assert loaded is not None
    for name in ("table3nh", "table_nh"):
        a, b = getattr(plan, name), getattr(loaded, name)
        for ca, cb in zip(a, b):
            assert (np.asarray(ca) == np.asarray(cb)).all(), name
    assert type(loaded.table3nh).__name__ in ("PackedRows", "PackedRows32")
    assert type(loaded.table3nh) is type(plan.table3nh)
    assert loaded.cache_omitted == ()
    # the loaded plan must run the full query path and agree
    sc = recode.random_scalars(n, seed=41)
    out_a = jax.jit(lambda s: msm_ches_device(plan, s))(jnp.asarray(sc))
    out_b = jax.jit(lambda s: msm_ches_device(loaded, s))(jnp.asarray(sc))
    ga = G1.affine_to_ints(G1.jac_to_affine(out_a))[0]
    gb = G1.affine_to_ints(G1.jac_to_affine(out_b))[0]
    assert ga == gb


def test_save_bgmw_only_plan(tmp_path):
    """save_plan on a plan with neither points nor table3nh (e.g. a loaded
    bgmw-only plan) must derive n from table_nh instead of crashing
    (ADVICE r3)."""
    n = 32
    cfg = params.make_config(5, c=8, h=32, c_bgmw=8, h_bgmw=32)
    points = fixed_point_list(G1, n)
    plan = build_plan(G1, points, cfg, ches=False, bgmw=True, stock=False)
    plan.points = None
    path = cache.save_plan(plan, str(tmp_path))
    loaded = cache.load_plan(G1, cfg, n, str(tmp_path))
    assert loaded is not None and loaded.table_nh is not None
    assert loaded.table3nh is None


def test_cache_miss_returns_none(tmp_path):
    cfg = params.make_config(5, c=8, h=32, c_bgmw=8, h_bgmw=32)
    assert cache.load_plan(G1, cfg, 32, str(tmp_path)) is None
