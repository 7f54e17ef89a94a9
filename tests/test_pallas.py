"""Pallas Montgomery-multiply kernel vs the jnp spec path and Python oracle.

Runs in interpreter mode on CPU (the real-TPU path is exercised by bench.py
and the driver's compile checks; both paths share the same math, and the
kernel was verified bit-exact on hardware).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_blst_tpu.fields.limb import FP, FR, array_to_ints, ints_to_array
from msm_blst_tpu.fields import pallas_mont

rng = random.Random(0x9A11A5)


@pytest.mark.parametrize("field", [FP, FR], ids=["fp", "fr"])
def test_kernel_matches_jnp_and_oracle(field):
    from jax.experimental.pallas import tpu as pltpu

    mul = pallas_mont.make_mont_mul(
        field.n_limbs, int(field.p0), field.modulus, block_b=128
    )
    B = 200  # non-multiple of block: exercises the padding path
    xs = [rng.randrange(field.modulus) for _ in range(B)]
    ys = [rng.randrange(field.modulus) for _ in range(B)]
    xs[:3] = [0, 1, field.modulus - 1]
    ys[:3] = [field.modulus - 1, field.modulus - 1, field.modulus - 1]
    a = jnp.asarray(ints_to_array(xs, field.n_limbs))
    b = jnp.asarray(ints_to_array(ys, field.n_limbs))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(mul(a, b))
    want = np.asarray(field.mul(a, b))
    assert (got == want).all()
    # spot-check against the Montgomery-product oracle
    r_inv = pow(1 << (16 * field.n_limbs), -1, field.modulus)
    got_ints = array_to_ints(got)
    for i in (0, 1, 2, B - 1):
        assert got_ints[i] == xs[i] * ys[i] * r_inv % field.modulus


def test_dispatch_respects_backend():
    # on the CPU test backend the jnp path must be taken (no pallas lowering)
    assert jax.default_backend() == "cpu"
    assert not FP._pallas_enabled()
    a = FP.from_ints([5, 7])
    out = FP.to_ints(jax.jit(FP.mul)(a, a))
    assert out == [25, 49]


@pytest.mark.parametrize("op", ["dadd_affine", "dadd", "double"])
def test_fused_point_kernel_interpret(op):
    """Fused point kernel (SOS multiply inside) vs the unfused jnp path,
    including the degenerate lanes (infinity, P+P, P-P)."""
    from jax.experimental.pallas import tpu as pltpu

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.curves import pallas_point
    from msm_blst_tpu.msm.precompute import fixed_point_list

    B = 16
    pts = fixed_point_list(G1, B)
    acc = G1.xyzz_from_affine(pts)
    # lane 0: infinity accumulator; lane 1: same point (double);
    # lane 2: negated (cancel)
    inf = G1.xyzz_inf((B,))
    mask = (jnp.arange(B) == 0)
    acc = G1.select(mask, inf, acc)
    signs = jnp.arange(B) == 2
    if op == "dadd_affine":
        args = (acc, pts, signs)
        want = G1.xyzz_dadd_affine(*args)
    elif op == "dadd":
        args = (acc, G1.xyzz_from_affine(pts, negate=signs))
        want = G1.xyzz_dadd(*args)
    else:
        args = (acc,)
        want = G1.xyzz_double(*args)
    # dispatch() self-disables off-TPU, so call the kernel directly
    with pltpu.force_tpu_interpret_mode():
        k = pallas_point._kernel("G1", op, block_b=16)
        flat = [c for c in acc]
        if op == "dadd_affine":
            flat += [c for c in pts]
            flat += [signs.reshape(1, B).astype(jnp.int32)]
        elif op == "dadd":
            flat += [c for c in args[1]]
        got = k(*flat)
    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all(), op


@pytest.mark.parametrize("n,n_buckets", [(2048, 48), (1500, 300)])
def test_fused_segmented_scan_interpret(n, n_buckets):
    """Fused segmented-scan level kernels (msm/pallas_scan.py) vs the XLA
    formulation (msm/scan.py) — bucket arrays must be bit-identical.

    Keys are duplicate-heavy so runs span chunk boundaries; includes
    repeated slots (forces the doubling path) and sign cancellations."""
    from jax.experimental.pallas import tpu as pltpu

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import pallas_scan
    from msm_blst_tpu.msm.scan import segmented_reduce_affine
    from msm_blst_tpu.msm.precompute import fixed_point_list

    rng = np.random.default_rng(n)
    base = fixed_point_list(G1, 64)
    slots = rng.integers(0, 64, n)
    slots[10:14] = slots[10]          # repeated point -> double case
    keys = np.sort(rng.integers(0, n_buckets, n)).astype(np.int32)
    keys[10:14] = keys[10]
    signs = rng.integers(0, 2, n).astype(bool)
    signs[12] = ~signs[11]            # cancellation inside a run
    pts = G1.take(base, jnp.asarray(slots.astype(np.int32)))
    keys_j = jnp.asarray(keys)
    signs_j = jnp.asarray(signs)

    want = segmented_reduce_affine(G1, pts, signs_j, keys_j, n_buckets)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_scan.segmented_reduce(G1, pts, signs_j, keys_j, n_buckets)
    # different chunk decompositions group partial sums differently, so xyzz
    # coords may differ while the points are equal -> compare in affine
    got_a = G1.xyzz_to_affine(got)
    want_a = G1.xyzz_to_affine(want)
    for g, w in zip(got_a, want_a):
        assert (np.asarray(g) == np.asarray(w)).all()


def test_fused_prefix_scan_interpret():
    """Fused inclusive-scan kernel vs utils.scans.prefix_scan (same chunk
    decomposition is not guaranteed, so compare in affine)."""
    from jax.experimental.pallas import tpu as pltpu

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import pallas_scan
    from msm_blst_tpu.utils import scans
    from msm_blst_tpu.msm.precompute import fixed_point_list

    n = 600
    base = fixed_point_list(G1, 64)
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, 64, n).astype(np.int32))
    signs = jnp.asarray(rng.integers(0, 2, n).astype(bool))
    pts = G1.xyzz_from_affine(G1.take(base, idx), negate=signs)

    want = scans.prefix_scan(G1.xyzz_dadd, pts)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_scan.prefix_scan_xyzz(G1, pts)
    got_a = G1.xyzz_to_affine(got)
    want_a = G1.xyzz_to_affine(want)
    for g, w in zip(got_a, want_a):
        assert (np.asarray(g) == np.asarray(w)).all()


@pytest.mark.parametrize("n,n_buckets", [(2048, 48), (1500, 300)])
def test_fused_prefix_pipeline_interpret(n, n_buckets):
    """The round-3 default path: fused affine-prefix level kernel +
    boundary-difference bucket assembly (msm/prefix_pipeline.py) vs the
    XLA segmented reduction — equal as points (chunk decompositions and
    the prefix-difference algebra legitimately change the xyzz repr)."""
    from jax.experimental.pallas import tpu as pltpu

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import pallas_scan, prefix_pipeline as pp
    from msm_blst_tpu.msm.scan import segmented_reduce_affine
    from msm_blst_tpu.msm.precompute import fixed_point_list

    rng = np.random.default_rng(n + 1)
    base = fixed_point_list(G1, 64)
    slots = rng.integers(0, 64, n).astype(np.int32)
    slots[10:14] = slots[10]          # repeated point -> double case
    keys = np.sort(rng.integers(0, n_buckets, n)).astype(np.int32)
    keys[10:14] = keys[10]
    signs = rng.integers(0, 2, n).astype(bool)
    signs[12] = ~signs[11]            # cancellation inside a run
    table = G1.to_rows(base)
    slots_j = jnp.asarray(slots)
    keys_j = jnp.asarray(keys)
    signs_j = jnp.asarray(signs)

    want = segmented_reduce_affine(
        G1, G1.take(base, slots_j), signs_j, keys_j, n_buckets)

    c, n_ch = pp.stream_shape(n)
    slots_cm, signs_cm = pp.column_major_streams(slots_j, signs_j, c, n_ch)
    rx, ry = pp.gather_rows(G1, table, slots_cm, c, n_ch)
    with pltpu.force_tpu_interpret_mode():
        local, tails = pallas_scan.affine_prefix_level(
            G1, rx, ry, signs_cm.reshape(c, n_ch))
    got = pp.buckets_from_boundaries(
        G1, local, tails, keys_j, n_buckets, c, n_ch, "rows")

    got_a = G1.xyzz_to_affine(got)
    want_a = G1.xyzz_to_affine(want)
    for g, w in zip(got_a, want_a):
        assert (np.asarray(g) == np.asarray(w)).all()
