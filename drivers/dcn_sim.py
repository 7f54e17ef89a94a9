#!/usr/bin/env python
"""Two-process DCN simulation of the sharded CHES MSM (SURVEY.md §2e).

The reference has no cross-host story at all (its only parallelism is the
Rust thread-pool tile grid, bindings/rust/src/lib.rs:1804-1949); the TPU
framework's multi-host design is shard_map over a points-axis mesh with an
EC-combiner butterfly all-reduce. This driver proves that design executes
across *process* boundaries — the same collective path a DCN-connected
multi-slice deployment takes — by running 2 JAX processes x 4 virtual CPU
devices each and checking the result bit-exact against the structural
oracle (Sum s_i 2^(i+1) G).

Run:  python drivers/dcn_sim.py            (launches both workers)
      python drivers/dcn_sim.py --worker K (internal)
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 64
PORT = 9911


def worker(pid: int, radix: int = 8):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=2, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msm_blst_tpu.constants import R_ORDER
    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import build_plan, fixed_point_list, params, recode
    from msm_blst_tpu.parallel import sharded

    assert len(jax.devices()) == 8, jax.devices()
    mesh = sharded.make_points_mesh(8)

    # every process builds the same (small) plan deterministically, then
    # lifts the tables into global arrays: each process donates the shards
    # it owns — exactly how a real multi-host deployment feeds its slice.
    if radix == 16:
        # production CHES radix (CONFIGS[14]): the cross-process all-reduce
        # runs over the real 18,343-wide bucket array (VERDICT r2, item 7)
        cfg = params.make_config(6, c=16, h=16, ah=29677)
    else:
        cfg = params.make_config(6, c=8, h=32, c_bgmw=8, h_bgmw=32)
    points = fixed_point_list(G1, N)
    plan = build_plan(G1, points, cfg, bgmw=False, stock=False)

    def globalize(x, spec):
        if x is None:
            return None
        sh = NamedSharding(mesh, spec)
        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, sh, lambda i: host[i])

    rows = P("points", None)
    plan.table3nh = type(plan.table3nh)(
        *(globalize(c, rows) for c in plan.table3nh)
    )
    if plan.digit_tables is not None:
        plan.digit_tables = tuple(globalize(t, P()) for t in plan.digit_tables)
    if plan.value_to_index is not None:
        plan.value_to_index = globalize(plan.value_to_index, P())
    if plan.packed_table is not None:
        plan.packed_table = globalize(plan.packed_table, P())

    sc = recode.random_scalars(N, seed=77)
    ints = recode.scalars_to_ints(sc)
    sc_glob = globalize(np.asarray(sc), P(None, "points"))

    run = sharded.sharded_msm_ches(plan, mesh)
    out = run(sc_glob)
    aff = G1.affine_to_ints(G1.jac_to_affine(out))[0]

    from msm_blst_tpu.refimpl import G1_REF

    total = sum(s * pow(2, i + 1, R_ORDER) for i, s in enumerate(ints)) % R_ORDER
    pt = G1_REF.to_affine(G1_REF.jac_mult(total, G1_REF.generator_jac()))
    assert tuple(aff) == (pt[0].v, pt[1].v), f"proc {pid}: mismatch"
    print(f"proc {pid}: 2-process x 4-device sharded CHES MSM bit-exact OK",
          flush=True)


def main():
    radix = 8
    if "--radix" in sys.argv:
        radix = int(sys.argv[sys.argv.index("--radix") + 1])
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]), radix)
        return
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          "--worker", str(k), "--radix", str(radix)],
                         env={**os.environ, "JAX_PLATFORMS": ""})
        for k in range(2)
    ]
    try:
        rcs = [p.wait(timeout=900) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        sys.exit("worker timed out (peer likely hung on the collective)")
    if any(rcs):
        for p in procs:
            if p.poll() is None:
                p.kill()
        sys.exit(f"worker rcs {rcs}")
    print("dcn_sim: OK")


if __name__ == "__main__":
    main()
