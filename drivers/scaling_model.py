#!/usr/bin/env python
"""Multi-chip scaling: measured collective cost on the virtual mesh +
ICI-projected efficiency for real hardware (VERDICT r3 item 4).

Only ONE real TPU chip is reachable in this environment, so wall-clock
scaling cannot be measured end-to-end. What this driver produces instead:

 1. On the 8-device VIRTUAL CPU mesh: bit-exact sharded CHES at production
    radix (c=16, B_SIZE=18,343) across D = 1/2/4/8, with the EC butterfly
    all-reduce timed separately from the local accumulate (the collective's
    *op-count* share is hardware-independent).
 2. An ICI projection for a real v5e pod slice: per butterfly round the
    collective moves B_SIZE xyzz points (4 coords x 48 B) per chip and runs
    one B_SIZE-wide fused dadd. Using the chip's measured dadd rate
    (28.0M adds/s, artifacts/microbench_r3.txt) and v5e ICI bandwidth
    (~45 GB/s/link), projected all-reduce time = log2(D) rounds x
    (B*192/45e9 + B/28e6) — set against the measured single-chip query
    time at the same n to project scaling efficiency.

Usage: python drivers/scaling_model.py [--nexp 13] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nexp", type=int, default=13)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dadd-rate", type=float, default=28.0e6,
                    help="measured fused dadd_affine rate on the real chip")
    ap.add_argument("--ici-gbs", type=float, default=45.0,
                    help="per-link ICI bandwidth, GB/s (v5e)")
    ap.add_argument("--chip-query-us", type=float, default=None,
                    help="measured single-chip query at this n (us) for the projection")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import build_plan, fixed_point_list, params, recode
    from msm_blst_tpu.parallel import (make_points_mesh, shard_plan_tables,
                                       sharded_msm_ches)
    from msm_blst_tpu.parallel.sharded import (_local_ches_buckets,
                                               _shard_map, ec_allreduce_xyzz)
    from jax.sharding import PartitionSpec as P

    n = 1 << args.nexp
    # production radix (CONFIGS[14]) with the requested n
    cfg14 = params.CONFIGS[14]
    cfg = params.MsmConfig(args.nexp, cfg14.c, cfg14.h, cfg14.ah,
                           cfg14.b_size, cfg14.c_bgmw, cfg14.h_bgmw)
    B = cfg.b_size
    print(f"# n=2^{args.nexp} c={cfg.c} h={cfg.h} B_SIZE={B}")

    points = fixed_point_list(G1, n)
    plan_full = build_plan(G1, points, cfg, bgmw=False, stock=False)

    sc_np = recode.random_scalars(n, seed=77)
    from msm_blst_tpu.constants import R_ORDER
    from msm_blst_tpu.refimpl import G1_REF

    ints = recode.scalars_to_ints(sc_np)
    total = sum(s * pow(2, i + 1, R_ORDER) for i, s in enumerate(ints)) % R_ORDER
    pt = G1_REF.to_affine(G1_REF.jac_mult(total, G1_REF.generator_jac()))
    expect = (pt[0].v, pt[1].v)

    rows = {}
    for D in (1, 2, 4, 8):
        import copy
        import dataclasses

        mesh = make_points_mesh(D)
        plan = dataclasses.replace(plan_full, _stream_jit=None)
        plan = shard_plan_tables(plan, mesh)
        run = sharded_msm_ches(plan, mesh)
        sc = jnp.asarray(sc_np)
        out = run(sc)
        jax.block_until_ready(out)
        got = G1.affine_to_ints(G1.jac_to_affine(out))[0]
        assert got == expect, f"D={D}: sharded result mismatch"
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(run(sc))
            ts.append(time.time() - t0)
        rows[D] = {"total_s": float(np.median(ts))}
        print(f"D={D}: bit-exact OK, median query {rows[D]['total_s']*1e3:.0f} ms "
              f"(virtual mesh wall-clock — all devices share 2 host cores)")

    # isolate the all-reduce: time local-accumulate-only vs full (D=8)
    mesh = make_points_mesh(8)
    import dataclasses
    plan = dataclasses.replace(plan_full, _stream_jit=None)
    plan = shard_plan_tables(plan, mesh)
    rows_spec = type(plan.table3nh)(P("points", None))

    def local_only(scalars, table, digit_tables, v2i, packed):
        from msm_blst_tpu.msm.engine import MsmPlan
        local = MsmPlan(curve=G1, cfg=cfg, table3nh=table,
                        digit_tables=digit_tables, value_to_index=v2i,
                        packed_table=packed, bucket_gaps=plan.bucket_gaps)
        b = _local_ches_buckets(local, scalars)
        return b.X  # keep output small-ish; forces the accumulate

    def with_allreduce(scalars, table, digit_tables, v2i, packed):
        from msm_blst_tpu.msm.engine import MsmPlan
        local = MsmPlan(curve=G1, cfg=cfg, table3nh=table,
                        digit_tables=digit_tables, value_to_index=v2i,
                        packed_table=packed, bucket_gaps=plan.bucket_gaps)
        b = _local_ches_buckets(local, scalars)
        b = ec_allreduce_xyzz(G1, b, "points")
        return b.X

    specs = (P(None, "points"), rows_spec, (P(), P(), P()), P(), P())
    out_spec = P(None, "points")
    f_local = jax.jit(_shard_map(local_only, mesh, specs, out_spec))
    f_all = jax.jit(_shard_map(with_allreduce, mesh, specs, out_spec))
    argv = (jnp.asarray(sc_np), plan.table3nh, plan.digit_tables,
            plan.value_to_index, plan.packed_table)
    t_loc = []
    t_all = []
    for fn, acc in ((f_local, t_loc), (f_all, t_all)):
        jax.block_until_ready(fn(*argv))
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(fn(*argv))
            acc.append(time.time() - t0)
    t_loc_m, t_all_m = float(np.median(t_loc)), float(np.median(t_all))
    print(f"D=8 local accumulate {t_loc_m*1e3:.0f} ms; + EC all-reduce "
          f"{t_all_m*1e3:.0f} ms (collective adds {(t_all_m-t_loc_m)*1e3:.0f} ms "
          f"of COMPUTE = 3 rounds x {B}-wide dadd; virtual mesh)")

    # ICI projection for real hardware
    proj = {}
    for D in (2, 4, 8):
        rounds = int(np.log2(D))
        t_coll = rounds * (B * 192 / (args.ici_gbs * 1e9) + B / args.dadd_rate)
        proj[D] = t_coll
    print("# projected EC all-reduce on real v5e ICI "
          f"(dadd {args.dadd_rate/1e6:.0f}M/s, {args.ici_gbs:.0f} GB/s/link):")
    for D, t in proj.items():
        line = f"  D={D}: {t*1e3:.2f} ms"
        if args.chip_query_us:
            t1 = args.chip_query_us / 1e6
            eff = t1 / D / (t1 / D + t)
            line += (f"; projected efficiency at measured single-chip query "
                     f"{args.chip_query_us/1e3:.1f} ms: {100*eff:.1f}%")
        print(line)
    print(json.dumps({"B": B, "virtual": rows,
                      "local_ms": t_loc_m * 1e3, "allreduce_ms": t_all_m * 1e3,
                      "projected_collective_ms": {k: v * 1e3 for k, v in proj.items()}}))


if __name__ == "__main__":
    main()
