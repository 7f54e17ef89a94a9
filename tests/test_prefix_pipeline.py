"""The prefix-scan bucket pipeline vs the segmented reduction and the oracle.

Covers: random signed streams (duplicate keys, empty buckets, bucket 0),
all-one-key streams, single-element streams, cancellation inside a bucket,
G1 and G2.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msm_blst_tpu.curves import G1, G2
from msm_blst_tpu.msm.prefix_pipeline import bucket_sums_prefix
from msm_blst_tpu.msm.scan import segmented_reduce_affine
from msm_blst_tpu.refimpl import G1_REF, G2_REF


def _aff_to_ints(ref, pt):
    if ref is G1_REF:
        return (pt[0].v, pt[1].v)
    return ((pt[0].c0.v, pt[0].c1.v), (pt[1].c0.v, pt[1].c1.v))


def _table(curve, ref, n):
    pts = [ref.to_affine(ref.jac_mult(k + 1, ref.generator_jac()))
           for k in range(n)]
    dev = curve.affine_from_ints([_aff_to_ints(ref, p) for p in pts])
    return dev, pts


def _oracle_buckets(ref, table_pts, slots, signs, keys, n_buckets):
    sums = [ref.xyzz_inf()] * n_buckets
    for sl, sg, k in zip(slots, signs, keys):
        if k >= n_buckets:
            continue
        sums[k] = ref.xyzz_dadd_affine(sums[k], table_pts[sl], subtract=bool(sg))
    return [ref.to_affine(ref.xyzz_to_jacobian(s)) for s in sums]


def _check(curve, ref, buckets, expect):
    got = curve.affine_to_ints(curve.xyzz_to_affine(buckets))
    for k, e in enumerate(expect):
        assert got[k] == _aff_to_ints(ref, e), f"bucket {k} mismatch"


@pytest.mark.parametrize("curve,ref,n_buckets,N", [
    (G1, G1_REF, 17, 160),
    (G1, G1_REF, 9, 1),
    (G1, G1_REF, 5, 40),
    (G2, G2_REF, 11, 96),
], ids=["g1_160", "g1_single", "g1_40", "g2_96"])
def test_prefix_matches_oracle_and_segmented(curve, ref, n_buckets, N):
    rng = np.random.default_rng(42 + N)
    n_table = 13
    table, table_pts = _table(curve, ref, n_table)

    slots = rng.integers(0, n_table, size=N).astype(np.int32)
    signs = rng.integers(0, 2, size=N).astype(bool)
    # restrict to a subset of keys so some buckets stay empty; include key 0
    pool = np.unique(
        np.concatenate([[0], rng.choice(n_buckets, size=max(n_buckets // 2, 1),
                                        replace=False)])
    )
    keys = rng.choice(pool, size=N).astype(np.int32)
    order = np.argsort(keys, kind="stable")
    slots, signs, keys = slots[order], signs[order], keys[order]

    expect = _oracle_buckets(ref, table_pts, slots, signs, keys, n_buckets)

    out_p = jax.jit(
        lambda s, g, k: bucket_sums_prefix(curve, table, s, g, k, n_buckets)
    )(jnp.asarray(slots), jnp.asarray(signs), jnp.asarray(keys))
    _check(curve, ref, out_p, expect)

    out_s = jax.jit(
        lambda s, g, k: segmented_reduce_affine(
            curve, curve.take(table, s), g, k, n_buckets)
    )(jnp.asarray(slots), jnp.asarray(signs), jnp.asarray(keys))
    _check(curve, ref, out_s, expect)


def test_packed32_rows_roundtrip_and_buckets():
    """PackedRows32 (two 16-bit limbs per word, round 4): pack -> unpack is
    the identity on real table coords, and bucket_sums_prefix over a packed
    table is bit-identical to the unpacked run."""
    curve, ref = G1, G1_REF
    n_buckets, N = 9, 48
    table, table_pts = _table(curve, ref, 7)
    rows = curve.to_rows(table)
    rows32 = curve.to_rows32(table)
    assert rows32.XY.shape[1] == rows.XY.shape[1] // 2
    back = curve.affine_to_ints(curve.from_rows(rows32))
    orig = curve.affine_to_ints(table)
    assert back == orig
    rng = np.random.default_rng(3)
    slots = rng.integers(0, 7, size=N).astype(np.int32)
    signs = rng.integers(0, 2, size=N).astype(bool)
    keys = np.sort(rng.integers(0, n_buckets, size=N)).astype(np.int32)
    expect = _oracle_buckets(ref, table_pts, slots, signs, keys, n_buckets)
    out32 = jax.jit(
        lambda s, g, k: bucket_sums_prefix(curve, rows32, s, g, k, n_buckets)
    )(jnp.asarray(slots), jnp.asarray(signs), jnp.asarray(keys))
    _check(curve, ref, out32, expect)


def test_bigmem_builder_matches_streamed():
    """build_ches_table_rows_bigmem (window-at-a-time + donated DUS) is
    bit-identical to the scan-stacked streamed builder."""
    import jax

    from msm_blst_tpu.msm import fixed_point_list, params
    from msm_blst_tpu.msm.precompute import (
        build_ches_table_rows_bigmem, build_ches_table_rows_streamed)

    cfg = params.make_config(4, c=8, h=32, c_bgmw=8, h_bgmw=32)
    pts = fixed_point_list(G1, 16)
    a = build_ches_table_rows_streamed(G1, pts, cfg)
    b = build_ches_table_rows_bigmem(G1, pts, cfg)
    assert type(a) is type(b)
    assert (np.asarray(jax.device_get(a.XY))
            == np.asarray(jax.device_get(b.XY))).all()


def test_bgmw_bigmem_builder_matches_streamed(monkeypatch):
    """build_bgmw_table_rows_bigmem (round 5: window-at-a-time + point-split
    twin for the 4.8 GB G2 2^21 nh table) is bit-identical to the
    scan-stacked streamed builder, including with the point axis split."""
    import jax

    from msm_blst_tpu.msm import fixed_point_list, params
    from msm_blst_tpu.msm.precompute import (
        build_bgmw_table_rows_bigmem, build_bgmw_table_rows_streamed)

    cfg = params.make_config(4, c=8, h=32, c_bgmw=8, h_bgmw=32)
    pts = fixed_point_list(G1, 16)
    a = build_bgmw_table_rows_streamed(G1, pts, cfg)
    # lanes=8 forces Pn=2 point chunks so the split-write path is exercised
    monkeypatch.setenv("MSM_BUILD_LANES", "8")
    b = build_bgmw_table_rows_bigmem(G1, pts, cfg)
    assert type(a) is type(b)
    assert (np.asarray(jax.device_get(a.XY))
            == np.asarray(jax.device_get(b.XY))).all()


def test_packed32_rows_g2():
    curve, ref = G2, G2_REF
    table, _ = _table(curve, ref, 5)
    rows32 = curve.to_rows32(table)
    assert curve.affine_to_ints(curve.from_rows(rows32)) == \
        curve.affine_to_ints(table)


def test_ranged_chunking_matches_oracle():
    """bucket_sums_prefix_ranged (round 4): bucket-range chunks concatenate
    to the same bucket array the oracle produces, including empty ranges,
    sentinel padding, and a bucket straddling nothing (ranges are disjoint
    by construction)."""
    from msm_blst_tpu.msm.prefix_pipeline import (
        bucket_sums_prefix_ranged, segment_starts)

    curve, ref = G1, G1_REF
    n_buckets, N, K = 13, 160, 4
    table, table_pts = _table(curve, ref, 11)
    rng = np.random.default_rng(11)
    slots = rng.integers(0, 11, size=N).astype(np.int32)
    signs = rng.integers(0, 2, size=N).astype(bool)
    # skew keys so segment lengths differ wildly (bucket 2 heavy, 5-8 empty)
    keys = np.sort(np.concatenate([
        np.full(N // 2, 2), rng.choice([0, 1, 3, 4, 9, 10, 11, 12],
                                       size=N - N // 2)])).astype(np.int32)
    expect = _oracle_buckets(ref, table_pts, slots, signs, keys, n_buckets)
    st_np = np.searchsorted(keys, np.arange(K + 1) * (-(-n_buckets // K)),
                            side="left").astype(np.int32)
    seg_len = int(np.diff(st_np).max())

    def run(s, g, k, st):
        return bucket_sums_prefix_ranged(
            curve, table, s, g, k, n_buckets, st, seg_len, K)

    out = jax.jit(run)(jnp.asarray(slots), jnp.asarray(signs),
                       jnp.asarray(keys), jnp.asarray(st_np))
    _check(curve, ref, out, expect)
    # device segment_starts must agree with the host plan
    st_dev, W = jax.jit(
        lambda k: segment_starts(k, n_buckets, K))(jnp.asarray(keys))
    assert np.asarray(st_dev).tolist() == st_np.tolist()


def test_single_key_stream():
    """All elements in one bucket (maximal run crossing every chunk)."""
    curve, ref = G1, G1_REF
    N, n_buckets = 70, 6
    table, table_pts = _table(curve, ref, 5)
    rng = np.random.default_rng(7)
    slots = rng.integers(0, 5, size=N).astype(np.int32)
    signs = np.zeros(N, bool)
    keys = np.full(N, 3, np.int32)
    expect = _oracle_buckets(ref, table_pts, slots, signs, keys, n_buckets)
    out = jax.jit(
        lambda s, g, k: bucket_sums_prefix(curve, table, s, g, k, n_buckets)
    )(jnp.asarray(slots), jnp.asarray(signs), jnp.asarray(keys))
    _check(curve, ref, out, expect)


def test_cancelling_stream():
    """P + (-P) inside one bucket must give infinity (empty bucket)."""
    curve, ref = G1, G1_REF
    table, table_pts = _table(curve, ref, 3)
    slots = np.array([1, 1, 2, 2], np.int32)
    signs = np.array([False, True, False, False])
    keys = np.array([0, 0, 2, 2], np.int32)
    n_buckets = 4
    expect = _oracle_buckets(ref, table_pts, slots, signs, keys, n_buckets)
    out = jax.jit(
        lambda s, g, k: bucket_sums_prefix(curve, table, s, g, k, n_buckets)
    )(jnp.asarray(slots), jnp.asarray(signs), jnp.asarray(keys))
    _check(curve, ref, out, expect)
