#!/usr/bin/env python
"""Hardware validation + timing for the fused segmented-scan kernels
(msm/pallas_scan.py) at real level-1 sizes, against the XLA formulation.

Usage: python drivers/test_fused_tpu.py [N] [n_buckets]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 18343

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import pallas_scan
    from msm_blst_tpu.msm.precompute import fixed_point_list
    from msm_blst_tpu.msm.scan import segmented_reduce_affine

    rng = np.random.default_rng(42)
    base = fixed_point_list(G1, 1024)
    slots = rng.integers(0, 1024, N).astype(np.int32)
    keys = np.sort(rng.integers(0, n_buckets, N)).astype(np.int32)
    signs = rng.integers(0, 2, N).astype(bool)
    pts = G1.take(base, jnp.asarray(slots))
    keys_j = jnp.asarray(keys)
    signs_j = jnp.asarray(signs)

    fused = jax.jit(lambda p, s, k: pallas_scan.segmented_reduce(
        G1, p, s, k, n_buckets))
    xla = jax.jit(lambda p, s, k: segmented_reduce_affine(
        G1, p, s, k, n_buckets))

    def timed(name, fn):
        t0 = time.time()
        out = jax.block_until_ready(fn(pts, signs_j, keys_j))
        t_first = time.time() - t0
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = jax.block_until_ready(fn(pts, signs_j, keys_j))
        dt = (time.time() - t0) / reps
        print(f"{name}: first {t_first:.1f}s, steady {dt*1e3:.2f} ms "
              f"({N/dt/1e6:.2f} M adds/s)")
        return out

    got = timed("fused", fused)
    want = timed("xla  ", xla)
    ga = G1.xyzz_to_affine(got)
    wa = G1.xyzz_to_affine(want)
    ok = all((np.asarray(g) == np.asarray(w)).all() for g, w in zip(ga, wa))
    print("bit-exact (affine):", ok)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
