"""Benchmark: CHES G1 MSM wall-clock on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Protocol mirrors the reference driver (TEST_NUM scalar sets x LOOP_NUM reps,
mean microseconds per MSM query; precompute timed separately —
/root/reference/main_p1.cpp:441-447,554-608). The query path measured is
scalars-on-device -> recode -> sort -> bucket accumulate -> integrate ->
Jacobian result (to-affine excluded from the loop, as in the reference's
per-method timing which includes it — we include it; see INCLUDE_TO_AFFINE).

Env knobs: MSM_BENCH_NEXP (default 14), MSM_BENCH_REPS (default 5),
MSM_BENCH_ALGO (ches|bgmw, default ches).
"""

import json
import os
import sys
import time

import numpy as np

# Reference driver means (us per MSM) measured on this host (Intel Xeon
# 2.70 GHz VM, single-threaded, rebuilt from /root/reference; see BASELINE.md).
# Keys: n_exp -> {method: us}.
REFERENCE_US = {
    10: {"ches": 20841, "ches_integral": 21851, "bgmw": 26546, "stock": 34174},
    14: {"ches": 442478, "ches_integral": 349130, "bgmw": 319253, "stock": 406346},
    16: {"ches": 1829808, "ches_integral": 1670304, "bgmw": 1504057,
         "stock": 1872569},
}


def main():
    n_exp = int(os.environ.get("MSM_BENCH_NEXP", "14"))
    reps = int(os.environ.get("MSM_BENCH_REPS", "5"))
    algo = os.environ.get("MSM_BENCH_ALGO", "ches")

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import (
        build_plan,
        fixed_point_list,
        msm_bgmw_device,
        msm_ches_device,
        params,
        recode,
    )

    n = 1 << n_exp
    cfg = params.CONFIGS.get(n_exp) or params.make_config(n_exp, c=13, h=20)

    t0 = time.time()
    points = fixed_point_list(G1, n)
    jax.block_until_ready(points)
    t_points = time.time() - t0

    t0 = time.time()
    plan = build_plan(G1, points, cfg, ches=(algo == "ches"), bgmw=(algo == "bgmw"),
                      stock=False)
    jax.block_until_ready(plan.table3nh if algo == "ches" else plan.table_nh)
    t_pre = time.time() - t0

    fn = msm_ches_device if algo == "ches" else msm_bgmw_device
    run = jax.jit(lambda s: fn(plan, s))

    def force(out):
        # device_get of the tiny Jacobian result: the only reliable completion
        # barrier over the axon tunnel (block_until_ready returns early there)
        return tuple(np.asarray(jax.device_get(c)) for c in out)

    sc = jnp.asarray(recode.random_scalars(n, seed=1))
    t0 = time.time()
    force(run(sc))
    t_compile = time.time() - t0

    times = []
    for r in range(reps):
        scr = jnp.asarray(recode.random_scalars(n, seed=2 + r))
        jax.block_until_ready(scr)
        t0 = time.time()
        force(run(scr))
        times.append(time.time() - t0)
    mean_us = float(np.mean(times) * 1e6)

    # derived throughput: CHES query ~ n*h dadd_affine(17M) + integration
    h = cfg.h if algo == "ches" else cfg.h_bgmw
    nb = cfg.b_size if algo == "ches" else (cfg.q_bgmw >> 1) + 1
    fp_muls = n * h * 17 + 2 * nb * 23
    muls_per_s = fp_muls / np.mean(times)

    ref = REFERENCE_US.get(n_exp, {})
    ref_same = ref.get(algo)
    ref_best = min(ref.values()) if ref else None
    result = {
        "metric": f"G1 {algo.upper()} MSM n=2^{n_exp} mean wall-clock",
        "value": round(mean_us, 1),
        "unit": "us",
        # speedup over the reference running the SAME algorithm on this host
        # (>1 = we beat it); see BASELINE.md for the measurement.
        "vs_baseline": round(ref_same / mean_us, 3) if ref_same else None,
        "vs_reference_best_method": (
            round(ref_best / mean_us, 3) if ref_best else None
        ),
        "fp_muls_per_s": float(f"{muls_per_s:.3e}"),
        "reps": reps,
        "compile_s": round(t_compile, 1),
        "precompute_s": round(t_pre, 1),
        "fixed_points_s": round(t_points, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
