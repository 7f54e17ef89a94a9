#!/usr/bin/env python
"""MSM benchmark driver — the framework's analog of the reference's
main_p1.cpp / main_p2.cpp test_pippengers harness (:438-610).

Runs the four MSM algorithms on the SAME random scalar sets, prints each
result's affine coordinates (the cross-method bit-exactness oracle, SURVEY.md
§4.1), mean per-query wall-clock, pairwise improvement percentages, and the
scalar-conversion share.

Usage:
    python drivers/run_msm.py --group 1 --config 10 [--reps 5] [--loops 3]
                              [--cache-dir tables/] [--oracle]

--config takes a key of msm_blst_tpu.msm.params.CONFIGS (8..21, '16b', ...)
or 'tiny' for a fast smoke config. --oracle additionally checks method 4's
result against the pure-Python naive MSM (slow at large n).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(out):
    """Completion barrier that works over the axon tunnel."""
    import jax

    return tuple(np.asarray(jax.device_get(c)) for c in out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=1, choices=(1, 2))
    ap.add_argument("--config", default="tiny")
    ap.add_argument("--reps", type=int, default=3, help="scalar sets (TEST_NUM)")
    ap.add_argument("--loops", type=int, default=1, help="timed reps per set")
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1, G2
    from msm_blst_tpu.msm import (
        build_plan,
        cache,
        fixed_point_list,
        msm_ches_host_recode,
        params,
        recode,
    )
    from msm_blst_tpu.msm.engine import jit_msm

    curve = G1 if args.group == 1 else G2

    if args.config == "tiny":
        cfg = params.make_config(6, c=8, h=32, c_bgmw=8, h_bgmw=32)
        n = 64
    else:
        key = int(args.config) if args.config.isdigit() else args.config
        cfg = params.CONFIGS[key]
        n = cfg.n

    print(f"# group=G{args.group} n=2^{cfg.n_exp if args.config != 'tiny' else 6} "
          f"c={cfg.c} h={cfg.h} |B|={cfg.b_size} c'={cfg.c_bgmw} h'={cfg.h_bgmw}")

    t0 = time.time()
    plan = None
    if args.cache_dir:
        plan = cache.load_plan(curve, cfg, n, args.cache_dir)
        if plan is not None:
            print(f"# tables loaded from cache in {time.time()-t0:.1f}s")
    if plan is None:
        points = fixed_point_list(curve, n)
        plan = build_plan(curve, points, cfg, ches=True, bgmw=True, stock=True)
        force(plan.table3nh)
        print(f"# precompute (3nh + nh tables) in {time.time()-t0:.1f}s")
        if args.cache_dir:
            print("# cached ->", cache.save_plan(plan, args.cache_dir))
    if plan.points is None:
        plan.points = fixed_point_list(curve, n)
    if plan.table_nh is None:  # cache built by a ches-only run
        from msm_blst_tpu.msm.precompute import (
            build_bgmw_table, build_bgmw_table_rows_streamed, plan_rows)

        t0 = time.time()
        # honor the cached plan's row layout (a j-layout cache must get the
        # j-major streamed builder or its slots gather wrong rows)
        plan.table_nh = (
            build_bgmw_table_rows_streamed(curve, plan.points, cfg)
            if plan.layout == "j"
            else plan_rows(curve, build_bgmw_table(curve, plan.points, cfg)))
        force(plan.table_nh)
        print(f"# nh (BGMW95) table built in {time.time()-t0:.1f}s")
        if args.cache_dir:
            cache.save_plan(plan, args.cache_dir)

    import dataclasses

    run_ches_dev = jit_msm(plan, "ches")
    run_bgmw = jit_msm(plan, "bgmw")
    run_stock = jit_msm(plan, "stock")
    plan_nih = dataclasses.replace(plan, noindexhash=True, _stream_jit=None)
    run_ches_nih = jit_msm(plan_nih, "ches")

    methods = [
        ("CHES q/5 (host conversion)", lambda sc_np, sc:
            msm_ches_host_recode(plan, sc_np)),
        ("CHES q/5 (integral device conversion)", lambda sc_np, sc:
            run_ches_dev(sc)),
        ("CHES q/5 noindexhash", lambda sc_np, sc: run_ches_nih(sc)),
        ("BGMW95 q/2", lambda sc_np, sc: run_bgmw(sc)),
        ("stock Pippenger (no precompute)", lambda sc_np, sc: run_stock(sc)),
    ]

    results = {name: [] for name, _ in methods}
    conv_times = []
    for r in range(args.reps):
        sc_np = recode.random_scalars(n, seed=1000 + r)
        sc = jnp.asarray(sc_np)
        force((sc,))
        # time host conversion alone (the reference's conversion-share metric)
        t0 = time.time()
        recode.ches_recode_host(sc_np, cfg.c, cfg.h, cfg.ah)
        conv_times.append(time.time() - t0)

        coords = []
        for name, fn in methods:
            force(fn(sc_np, sc))  # warm (compile once) + completion barrier
            t0 = time.time()
            out = None
            for _ in range(args.loops):
                out = fn(sc_np, sc)
            force(out)  # one barrier around the loop (main_p1.cpp:459-548)
            results[name].append((time.time() - t0) / args.loops)
            aff = curve.jac_to_affine(out)
            coords.append(curve.affine_to_ints(aff)[0])
        # cross-method agreement: the primary oracle
        for name_coord, c in zip([m[0] for m in methods], coords):
            if c != coords[0]:
                print(f"!! MISMATCH set {r}: {name_coord} disagrees")
                sys.exit(1)
        if args.oracle:
            from msm_blst_tpu.refimpl import G1_REF, G2_REF

            ref = G1_REF if args.group == 1 else G2_REF
            ints = recode.scalars_to_ints(sc_np)
            want = ref.naive_msm(ints, ref.fixed_points(n))
            got = coords[0]
            want_t = ((want[0].v, want[1].v) if args.group == 1 else
                      ((want[0].c0.v, want[0].c1.v), (want[1].c0.v, want[1].c1.v)))
            assert got == want_t, "oracle mismatch"
            print(f"# set {r}: oracle check OK")
        if r == 0:
            x = coords[0][0]
            print(f"# result x = {x if args.group == 1 else x[0]:#x} (all methods agree)")

    print()
    means = {}
    for name, _ in methods:
        m = float(np.mean(results[name]) * 1e6)
        means[name] = m
        print(f"{name:42s} {m:12.1f} us/query")
    conv_us = float(np.mean(conv_times) * 1e6)
    base = means["stock Pippenger (no precompute)"]
    ches = means["CHES q/5 (integral device conversion)"]
    bgmw = means["BGMW95 q/2"]
    print(f"{'host scalar conversion':42s} {conv_us:12.1f} us "
          f"({100*conv_us/max(means[methods[0][0]], 1e-9):.1f}% of method 1)")
    print(f"CHES vs stock Pippenger: {100*(base-ches)/base:+.1f}% "
          f"| CHES vs BGMW95: {100*(bgmw-ches)/bgmw:+.1f}%")
    if args.json:
        print(json.dumps({"n": n, "group": args.group, "means_us": means,
                          "conversion_us": conv_us}))


if __name__ == "__main__":
    main()
