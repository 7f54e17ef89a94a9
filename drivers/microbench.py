"""Microbenchmarks anchoring the Fp-multiply roofline on this chip.

Measures, per VERDICT.md item 1:
  * raw VPU uint32 multiply throughput (Pallas kernel, chained mults)
  * raw VPU f32 multiply throughput (for comparison)
  * MXU int8 matmul throughput at bignum-reduction shapes
  * the production Montgomery-multiply kernel's Fp-muls/s
  * the fused xyzz_dadd_affine kernel's point-adds/s

Prints one JSON line per experiment. Run on the TPU:
    PYTHONPATH=/root/repo python drivers/microbench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10, warmup=2):
    """Time fn(*args); completion forced by device_get of one element (the
    only reliable barrier over the axon tunnel — block_until_ready returns
    early there)."""
    import jax

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(jax.device_get(leaf.ravel()[:1]))

    for _ in range(warmup):
        force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_vpu_mul(dtype, chain=16, iters=32768, shape=(256, 1024)):
    """Chained elementwise multiply-adds inside one Pallas kernel; an inner
    fori_loop amortizes the ~25 ms axon round-trip latency."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(_, acc):
            for _ in range(chain):
                acc = acc * b + a
            return acc

        o_ref[:] = jax.lax.fori_loop(0, iters, body, a)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(a, b)

    if dtype == jnp.float32:
        a = jnp.ones(shape, dtype) * 1.0000001
        b = jnp.ones(shape, dtype) * 0.9999999
    else:
        a = jnp.full(shape, 3, dtype)
        b = jnp.full(shape, 5, dtype)
    t = timeit(run, a, b)
    n_ops = 2 * chain * iters * shape[0] * shape[1]
    return {"metric": f"vpu_{jnp.dtype(dtype).name}_madd_ops_per_s",
            "value": float(f"{n_ops / t:.4g}"), "unit": "op/s",
            "shape": list(shape), "chain": chain * iters, "t_s": round(t, 5)}


def bench_mxu_matmul(dtype_in, dtype_acc, M=1024, iters=16384):
    """Chained square matmuls (values are garbage; timing only)."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((M, M), dtype_in)
    b = jnp.ones((M, M), dtype_in)

    @jax.jit
    def run(a, b):
        def body(_, acc):
            return jax.lax.dot_general(
                acc, b, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype_acc,
            ).astype(dtype_in)

        return jax.lax.fori_loop(0, iters, body, a)

    t = timeit(run, a, b)
    macs = iters * M * M * M
    return {"metric": f"mxu_{jnp.dtype(dtype_in).name}_to_{jnp.dtype(dtype_acc).name}_macs_per_s",
            "value": float(f"{macs / t:.4g}"), "unit": "MAC/s",
            "M": M, "iters": iters, "t_s": round(t, 5)}


def bench_mont_mul(B=262144, iters=512):
    import jax
    import jax.numpy as jnp

    from msm_blst_tpu.fields.limb import FP

    rng = np.random.default_rng(0)
    a = FP.from_ints([int(rng.integers(1, 1 << 62)) for _ in range(256)])
    a = jnp.tile(a, (1, B // 256))
    b = jnp.roll(a, 7, axis=-1)

    @jax.jit
    def run(a, b):
        return jax.lax.fori_loop(0, iters, lambda i, x: FP.mul(x, b), a)

    t = timeit(run, a, b)
    return {"metric": "fp_mont_mul_per_s",
            "value": float(f"{B * iters / t:.4g}"),
            "unit": "mul/s", "B": B, "iters": iters, "t_s": round(t, 5)}


def bench_dadd_affine(B=65536, iters=256):
    import jax
    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm.precompute import fixed_point_list

    pts = fixed_point_list(G1, 256)
    pts = type(pts)(*(jnp.tile(c, (1, B // 256)) for c in pts))
    acc = G1.xyzz_from_affine(pts)
    signs = jnp.zeros((B,), bool)

    @jax.jit
    def run(acc, pts, signs):
        return jax.lax.fori_loop(
            0, iters,
            lambda i, a: G1.xyzz_dadd_affine(a, pts, subtract=signs),
            acc,
        )

    t = timeit(run, acc, pts, signs)
    return {"metric": "xyzz_dadd_affine_per_s",
            "value": float(f"{B * iters / t:.4g}"),
            "unit": "add/s", "B": B, "iters": iters, "t_s": round(t, 5)}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = set((sys.argv[1] if len(sys.argv) > 1 else "all").split(","))
    out = []
    if which & {"all", "vpu"}:
        out.append(bench_vpu_mul(jnp.uint32))
        out.append(bench_vpu_mul(jnp.int32))
        out.append(bench_vpu_mul(jnp.float32))
    if which & {"all", "mxu"}:
        out.append(bench_mxu_matmul(jnp.int8, jnp.int32))
        out.append(bench_mxu_matmul(jnp.bfloat16, jnp.float32))
        out.append(bench_mxu_matmul(jnp.float32, jnp.float32))
    if which & {"all", "mont"}:
        out.append(bench_mont_mul())
    if which & {"all", "point"}:
        out.append(bench_dadd_affine())
    for r in out:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
