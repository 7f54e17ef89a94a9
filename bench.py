"""Benchmark: CHES G1 MSM wall-clock on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Protocol mirrors the reference driver (TEST_NUM scalar sets x LOOP_NUM reps,
mean microseconds per MSM query; precompute timed separately —
/root/reference/main_p1.cpp:441-447,554-608). The timed query path is
scalars-on-device -> recode -> sort -> bucket accumulate -> integrate ->
Jacobian result fetched to host -> host to-affine (one 381-bit inverse; the
reference's per-method timing includes its to-affine, main_p1.cpp:459-548,
so ours does too — "timed_path" in the JSON records this).

Env knobs:
  MSM_BENCH_NEXP   headline size (default 14)
  MSM_BENCH_SIZES  comma list for a sweep (default = headline only)
  MSM_BENCH_REPS   timed reps per size (default 5)
  MSM_BENCH_ALGO   ches|bgmw (default ches)
  MSM_BENCH_GROUP  1|2 (default 1)
  MSM_TABLE_CACHE  table cache dir (default .table_cache; set empty to disable)
"""

import json
import os
import sys
import time

import numpy as np

# Reference driver means (us per MSM) measured on this host (Intel Xeon
# 2.70 GHz VM, single-threaded, rebuilt from /root/reference; see BASELINE.md).
REFERENCE_US = {
    1: {
        10: {"ches": 20841, "ches_integral": 21851, "bgmw": 26546, "stock": 34174},
        14: {"ches": 442478, "ches_integral": 349130, "bgmw": 319253, "stock": 406346},
        16: {"ches": 1829808, "ches_integral": 1670304, "bgmw": 1504057,
             "stock": 1872569},
    },
}

# Measured device Fp-multiply rate (drivers/microbench.py, CIOS kernel,
# TPU v5e, artifacts/microbench_r3.txt): the mul-roofline anchor for
# fraction reporting. (Round-2's 245.9e6 under-amortized the ~25 ms
# tunnel completion barrier; the kernel itself runs at ~374M mul/s.)
CHIP_FP_MULS_PER_S = 373.8e6


def bench_one(n_exp, algo, group, reps, cache_dir):
    import jax
    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1, G2
    from msm_blst_tpu.msm import (
        build_plan,
        cache as table_cache,
        fixed_point_list,
        msm_bgmw_device,
        msm_ches_device,
        params,
        recode,
    )

    curve = G1 if group == 1 else G2
    n = 1 << n_exp
    cfg = params.CONFIGS.get(n_exp) or params.make_config(n_exp, c=13, h=20)

    plan = None
    t_pre = t_points = 0.0
    if cache_dir:
        t0 = time.time()
        # only this algorithm's table is uploaded: at n=2^21 CHES (7.2 GB)
        # + BGMW (2.4 GB) + query transients exceed one chip
        want = ("t3nh",) if algo == "ches" else ("tnh",)
        plan = table_cache.load_plan(curve, cfg, n, cache_dir, tables=want)
        if plan is not None:
            jax.block_until_ready(plan.table3nh if algo == "ches" else plan.table_nh)
            t_pre = time.time() - t0
    if plan is None or (algo == "ches" and plan.table3nh is None) or (
            algo == "bgmw" and plan.table_nh is None):
        t0 = time.time()
        points = fixed_point_list(curve, n)
        jax.block_until_ready(points)
        t_points = time.time() - t0
        t0 = time.time()
        if plan is None:
            plan = build_plan(curve, points, cfg, ches=(algo == "ches"),
                              bgmw=(algo == "bgmw"), stock=False)
        else:
            # cache hit for the other algorithm: add only the missing table
            # (save_plan below then persists both)
            from msm_blst_tpu.msm.precompute import (
                _attach_ches_params,
                build_bgmw_table, build_ches_table,
                build_bgmw_table_rows_streamed, build_ches_table_rows_streamed,
                plan_rows,
            )

            if algo == "ches":
                plan.table3nh = (
                    build_ches_table_rows_streamed(curve, points, cfg)
                    if plan.layout == "j"
                    else plan_rows(curve, build_ches_table(curve, points, cfg)))
                if plan.packed_table is None:
                    _attach_ches_params(plan, cfg)
            else:
                plan.table_nh = (
                    build_bgmw_table_rows_streamed(curve, points, cfg)
                    if plan.layout == "j"
                    else plan_rows(curve, build_bgmw_table(curve, points, cfg)))
        jax.block_until_ready(plan.table3nh if algo == "ches" else plan.table_nh)
        points = None  # free the raw fixed points' HBM before the query
        t_pre = time.time() - t0
        if cache_dir:
            try:
                table_cache.save_plan(plan, cache_dir)
            except Exception as e:  # cache is an optimization, never fatal
                print(f"# cache save skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)

    plan.points = None  # free the raw points next to near-capacity tables

    from msm_blst_tpu.msm.engine import jit_msm, jit_msm_bign

    # big streams: ranged chunking (bucket-range chunks; one tiny host sync
    # per query) — the round-4 fix for the big-n boundary-work cliff
    N_stream = n * (cfg.h if algo == "ches" else cfg.h_bgmw)
    use_ranged = os.environ.get("MSM_RANGED", "auto")
    if use_ranged == "1" or (use_ranged == "auto" and N_stream > 7 * 1024 * 1024):
        run = jit_msm_bign(plan, algo)
    else:
        run = jit_msm(plan, algo)

    def force(out):
        # device_get of the tiny Jacobian result: the only reliable completion
        # barrier over the axon tunnel (block_until_ready returns early there)
        return tuple(np.asarray(jax.device_get(c)) for c in out)

    def host_affine(jac_np):
        """Final Jacobian -> affine on host (one 381-bit inverse; included
        in the timed query for parity with main_p1.cpp:459-548)."""
        from msm_blst_tpu.constants import P as PMOD
        from msm_blst_tpu.fields.limb import limbs_to_int
        from msm_blst_tpu.refimpl import G1_REF, G2_REF
        from msm_blst_tpu.refimpl.curve import JacobianPoint
        from msm_blst_tpu.refimpl.field import Fp, Fp2

        rinv = pow(1 << 384, -1, PMOD)

        def elem(c):
            if c.ndim == 3:  # Fp2 coord (2, L, 1)
                return Fp2(limbs_to_int(c[0, :, 0]) * rinv % PMOD,
                           limbs_to_int(c[1, :, 0]) * rinv % PMOD)
            return Fp(limbs_to_int(c[:, 0]) * rinv % PMOD)

        ref = G1_REF if group == 1 else G2_REF
        return ref.to_affine(JacobianPoint(*(elem(c) for c in jac_np)))

    sc = jnp.asarray(recode.random_scalars(n, seed=1))
    t0 = time.time()
    host_affine(force(run(sc)))
    t_compile = time.time() - t0

    # Timing protocol = the reference's: LOOP_NUM dispatches timed around the
    # loop with one completion barrier, mean = elapsed / loops
    # (main_p1.cpp:459-548). One barrier per rep also amortizes the dev-setup
    # axon tunnel's ~25 ms host<->device round-trip latency, which is not
    # part of the query (a production host drives the chip locally).
    loops = int(os.environ.get("MSM_BENCH_LOOPS", "4"))
    times = []
    out = None
    for r in range(reps):
        scr = jnp.asarray(recode.random_scalars(n, seed=2 + r))
        jax.block_until_ready(scr)
        t0 = time.time()
        for _ in range(loops):
            out = run(scr)
        host_affine(force(out))
        times.append((time.time() - t0) / loops)
    times = np.array(times)

    # Protocol symmetry (VERDICT r4 weak 7): the reference converts its
    # result to affine EVERY iteration (main_p1.cpp:459-548); the loop above
    # pays conversion+fetch once per rep (1/loops). Measure the host
    # to-affine alone and charge the remaining (loops-1)/loops per query, so
    # the reported mean matches the reference's per-iteration protocol
    # exactly; only the axon tunnel's result fetch (not a framework cost —
    # a production host drives the chip locally) stays amortized, and is
    # itself reported in the JSON.
    jac_np = force(out)
    t0 = time.time()
    for _ in range(16):
        host_affine(jac_np)
    to_affine_s = (time.time() - t0) / 16
    times = times + to_affine_s * (loops - 1) / loops

    # derived throughput: CHES query ~ n*h dadd_affine(17M worst-case) +
    # integration; kept as the reference-comparable op model
    h = cfg.h if algo == "ches" else cfg.h_bgmw
    nb = cfg.b_size if algo == "ches" else (cfg.q_bgmw >> 1) + 1
    fp_muls = n * h * 17 + 2 * nb * 23
    muls_per_s = fp_muls / times.mean()

    return {
        "mean_us": float(times.mean() * 1e6),
        "to_affine_us": float(to_affine_s * 1e6),
        "min_us": float(times.min() * 1e6),
        "std_us": float(times.std() * 1e6),
        "reps": reps,
        "compile_s": round(t_compile, 1),
        "precompute_s": round(t_pre, 1),
        "fixed_points_s": round(t_points, 1),
        "fp_muls_per_s": float(f"{muls_per_s:.4g}"),
        "mul_roofline_fraction": round(muls_per_s / CHIP_FP_MULS_PER_S, 3),
    }


def main():
    n_exp = int(os.environ.get("MSM_BENCH_NEXP", "14"))
    sizes = os.environ.get("MSM_BENCH_SIZES", "")
    sizes = [int(s) for s in sizes.split(",") if s] or [n_exp]
    reps = int(os.environ.get("MSM_BENCH_REPS", "5"))
    algo = os.environ.get("MSM_BENCH_ALGO", "ches")
    group = int(os.environ.get("MSM_BENCH_GROUP", "1"))
    cache_dir = os.environ.get(
        "MSM_TABLE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".table_cache"),
    )

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sweep = {}
    for s in sizes:
        sweep[s] = bench_one(s, algo, group, reps, cache_dir)

    head = max(sizes)
    r = sweep[head]
    ref = REFERENCE_US.get(group, {}).get(head, {})
    ref_same = ref.get(algo)
    ref_best = min(ref.values()) if ref else None
    gname = "G1" if group == 1 else "G2"
    result = {
        "metric": f"{gname} {algo.upper()} MSM n=2^{head} mean wall-clock",
        "value": round(r["mean_us"], 1),
        "unit": "us",
        # speedup over the reference running the SAME algorithm on this host
        # (>1 = we beat it); see BASELINE.md for the measurement.
        "vs_baseline": round(ref_same / r["mean_us"], 3) if ref_same else None,
        "vs_reference_best_method": (
            round(ref_best / r["mean_us"], 3) if ref_best else None
        ),
        "device": str(jax.devices()[0]),
        "timed_path": "recode+sort+accumulate+integrate on device + host "
                      "to-affine charged per iteration (to_affine_us; "
                      "protocol parity with main_p1.cpp:459-548) — only the "
                      "axon-tunnel result fetch is amortized 1/loops",
        **{k: r[k] for k in ("to_affine_us", "min_us", "std_us", "reps", "compile_s",
                             "precompute_s", "fixed_points_s",
                             "fp_muls_per_s", "mul_roofline_fraction")},
    }
    if len(sizes) > 1:
        result["sweep"] = {f"2^{s}": sweep[s] for s in sizes}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
