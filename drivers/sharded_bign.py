#!/usr/bin/env python
"""Virtual-mesh validation of the BIG-N sharding paths (VERDICT r4 Next 1+7).

Round 4's scaling evidence stopped at n=2^13 / i-major tables; the sizes
where multi-chip matters most (n >= 2^17) build J-MAJOR tables that could
not be sharded at all. This driver exercises round 5's window-block sharding
at amortized sizes on the 8-device virtual CPU mesh:

 1. n=2^16 at the production radix (CONFIGS[16]: c=19, h=14, B=109,244),
    J-MAJOR plan, window-sharded over D=8 (h padded 14->16): bit-exact vs
    the structural oracle, with the EC all-reduce timed separately from the
    local accumulate (op-count shares are hardware-independent).
 2. The 2-D (points x windows) i-major mesh at n=2^14 production radix —
    the Rust breakdown() analog — bit-exact + timed.

Artifacts: stdout -> artifacts/sharded_bign_r5.txt (committed).

Usage: python drivers/sharded_bign.py [--nexp 16] [--reps 2] [--skip-2d]
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
    ap.add_argument("--nexp", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-2d", action="store_true")
    ap.add_argument("--dadd-rate", type=float, default=28.0e6)
    ap.add_argument("--ici-gbs", type=float, default=45.0)
    ap.add_argument("--chip-query-us", type=float, default=None,
                    help="measured single-chip query at this n for projection")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from msm_blst_tpu.constants import R_ORDER
    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import build_plan, fixed_point_list, params, recode
    from msm_blst_tpu.parallel import (make_windows_mesh,
                                       shard_plan_tables_jmajor,
                                       sharded_msm_ches_windows)
    from msm_blst_tpu.parallel.sharded import _shard_map, ec_allreduce_xyzz
    from msm_blst_tpu.refimpl import G1_REF

    n = 1 << args.nexp
    base = params.CONFIGS.get(args.nexp) or params.CONFIGS[16]
    cfg = params.MsmConfig(args.nexp, base.c, base.h, base.ah, base.b_size,
                           base.c_bgmw, base.h_bgmw)
    B = cfg.b_size
    D = 8
    print(f"# j-major window sharding: n=2^{args.nexp} c={cfg.c} h={cfg.h} "
          f"B_SIZE={B} D={D} (h padded to {-(-cfg.h // D) * D})")

    t0 = time.time()
    points = fixed_point_list(G1, n)
    jax.block_until_ready(points)
    print(f"fixed points: {time.time()-t0:.1f} s")
    t0 = time.time()
    plan = build_plan(G1, points, cfg, bgmw=False, stock=False, streamed=True)
    assert plan.layout == "j"
    jax.block_until_ready(plan.table3nh)
    print(f"j-major 3nh table ({3*n*cfg.h} rows): {time.time()-t0:.1f} s")

    mesh = make_windows_mesh(D)
    plan = shard_plan_tables_jmajor(plan, mesh)
    run = sharded_msm_ches_windows(plan, mesh)

    sc_np = recode.random_scalars(n, seed=99)
    ints = recode.scalars_to_ints(sc_np)
    total = sum(s * pow(2, i + 1, R_ORDER) for i, s in enumerate(ints)) % R_ORDER
    pt = G1_REF.to_affine(G1_REF.jac_mult(total, G1_REF.generator_jac()))
    expect = (pt[0].v, pt[1].v)

    sc = jnp.asarray(sc_np)
    t0 = time.time()
    out = run(sc)
    jax.block_until_ready(out)
    print(f"compile+first query: {time.time()-t0:.1f} s")
    got = G1.affine_to_ints(G1.jac_to_affine(out))[0]
    assert got == expect, "window-sharded j-major CHES mismatch at production radix"
    print(f"BIT-EXACT vs structural oracle at n=2^{args.nexp} radix c={cfg.c} OK")

    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        jax.block_until_ready(run(sc))
        ts.append(time.time() - t0)
    total_s = float(np.median(ts))
    print(f"full sharded query (virtual mesh, 8 devices on 2 host cores): "
          f"{total_s*1e3:.0f} ms median")

    # isolate the collective: same bucket width, butterfly only
    bx = G1.xyzz_inf((B,))

    def allreduce_only(b):
        from msm_blst_tpu.curves.ops import XyzzPoint
        p = XyzzPoint(*b)
        p = ec_allreduce_xyzz(G1, p, "windows")
        return tuple(p)

    spec = tuple(P(None, None) for _ in bx)
    f_coll = jax.jit(_shard_map(allreduce_only, mesh, (spec,), spec))
    jax.block_until_ready(f_coll(tuple(bx)))
    tc = []
    for _ in range(max(args.reps, 3)):
        t0 = time.time()
        jax.block_until_ready(f_coll(tuple(bx)))
        tc.append(time.time() - t0)
    coll_s = float(np.median(tc))
    print(f"EC butterfly all-reduce alone (3 rounds x {B}-wide dadd, virtual "
          f"mesh): {coll_s*1e3:.0f} ms -> collective/compute share "
          f"{100*coll_s/total_s:.1f}% of the full query ON THE SAME BACKEND")

    # ICI projection for real hardware at this n
    proj = {}
    for Dp in (2, 4, 8):
        rounds = int(np.log2(Dp))
        proj[Dp] = rounds * (B * 192 / (args.ici_gbs * 1e9) + B / args.dadd_rate)
    print(f"# projected EC all-reduce on real v5e ICI (dadd "
          f"{args.dadd_rate/1e6:.0f}M/s, {args.ici_gbs:.0f} GB/s/link):")
    for Dp, t in proj.items():
        line = f"  D={Dp}: {t*1e3:.2f} ms"
        if args.chip_query_us:
            t1 = args.chip_query_us / 1e6
            eff = (t1 / Dp) / (t1 / Dp + t)
            line += f"; efficiency vs measured 1-chip query: {100*eff:.1f}%"
        print(line)

    out_json = {"nexp": args.nexp, "B": B, "total_ms": total_s * 1e3,
                "allreduce_ms": coll_s * 1e3,
                "projected_collective_ms": {k: v * 1e3 for k, v in proj.items()}}

    if not args.skip_2d:
        # 2-D (points x windows) i-major mesh at n=2^14 production radix
        from msm_blst_tpu.parallel import (breakdown, make_2d_mesh,
                                           shard_plan_tables,
                                           sharded_msm_ches_2d)

        n2 = 1 << 14
        c14 = params.CONFIGS[14]
        cfg2 = params.MsmConfig(14, c14.c, c14.h, c14.ah, c14.b_size,
                                c14.c_bgmw, c14.h_bgmw)
        np_ax, nw_ax = 4, 2
        assert cfg2.h % nw_ax == 0
        mesh2 = make_2d_mesh(np_ax, nw_ax)
        pts2 = fixed_point_list(G1, n2)
        plan2 = build_plan(G1, pts2, cfg2, bgmw=False, stock=False,
                           streamed=False)
        plan2 = shard_plan_tables(plan2, mesh2)
        run2 = sharded_msm_ches_2d(plan2, mesh2)
        sc2_np = recode.random_scalars(n2, seed=101)
        ints2 = recode.scalars_to_ints(sc2_np)
        tot2 = sum(s * pow(2, i + 1, R_ORDER)
                   for i, s in enumerate(ints2)) % R_ORDER
        pt2 = G1_REF.to_affine(G1_REF.jac_mult(tot2, G1_REF.generator_jac()))
        sc2 = jnp.asarray(sc2_np)
        t0 = time.time()
        out2 = run2(sc2)
        jax.block_until_ready(out2)
        print(f"2-D mesh ({np_ax}x{nw_ax}) compile+first query: "
              f"{time.time()-t0:.1f} s")
        got2 = G1.affine_to_ints(G1.jac_to_affine(out2))[0]
        assert got2 == (pt2[0].v, pt2[1].v), "2-D mesh CHES mismatch"
        ts2 = []
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(run2(sc2))
            ts2.append(time.time() - t0)
        t2 = float(np.median(ts2))
        print(f"2-D mesh BIT-EXACT at n=2^14 radix c={cfg2.c}; query "
              f"{t2*1e3:.0f} ms median (virtual mesh)")
        out_json["mesh2d"] = {"shape": [np_ax, nw_ax], "nexp": 14,
                              "total_ms": t2 * 1e3}

    print(json.dumps(out_json))


if __name__ == "__main__":
    main()
