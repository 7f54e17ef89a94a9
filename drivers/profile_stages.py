"""Stage-level wall-clock breakdown of the CHES MSM query path on the TPU.

Times each pipeline stage in isolation (jitted separately, with a device_get
completion barrier): recode -> sort -> gather -> bucket-accumulate ->
integrate. Stages are cumulative-prefix jits so each measurement includes
exactly one extra stage; the deltas attribute the cost.

Usage: MSM_PROF_NEXP=10 python drivers/profile_stages.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(x):
    import jax

    return jax.tree_util.tree_map(lambda c: np.asarray(jax.device_get(c)), x)


def main():
    n_exp = int(os.environ.get("MSM_PROF_NEXP", "10"))
    reps = int(os.environ.get("MSM_PROF_REPS", "3"))

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
    from msm_blst_tpu.msm import build_plan, fixed_point_list, params, recode
    from msm_blst_tpu.msm.engine import integrate_gapped
    from msm_blst_tpu.msm import prefix_pipeline as pp

    n = 1 << n_exp
    cfg = params.CONFIGS.get(n_exp) or params.make_config(n_exp, c=13, h=20)
    points = fixed_point_list(G1, n)
    plan = build_plan(G1, points, cfg, ches=True, bgmw=False, stock=False)
    curve, h = plan.curve, cfg.h
    N = n * h
    c_cols, n_ch = pp.stream_shape(N)

    def stage_recode(scalars):
        from msm_blst_tpu.msm.engine import ches_slots

        keys, m1, s = recode.ches_recode_device_packed(
            scalars, cfg.c, h, plan.packed_table)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
        slots = ches_slots(plan, i_idx, j_idx, m1, n, h)
        return slots.reshape(-1), keys.reshape(-1), s.reshape(-1)

    def stage_sort(scalars):
        slots, keys, s = stage_recode(scalars)
        payload = (slots.astype(jnp.int32) << 1) | s.astype(jnp.int32)
        keys_s, payload_s = jax.lax.sort((keys, payload), num_keys=1)
        return keys_s, (payload_s & 1) != 0, payload_s >> 1

    from msm_blst_tpu.msm import pallas_scan

    use_kernel = pallas_scan.prefix_available(G1)

    def stage_gather(scalars, table=None):
        table = plan.table3nh if table is None else table
        keys_s, signs_s, slots_s = stage_sort(scalars)
        slots_cm, signs_cm = pp.column_major_streams(
            slots_s, signs_s, c_cols, n_ch)
        if use_kernel:
            data = pp.gather_rows(curve, table, slots_cm, c_cols, n_ch)
        else:
            data = pp.gather_columns(
                curve, table, slots_cm, c_cols, n_ch)
        return data, signs_cm, keys_s

    def _prefix(scalars, table=None):
        data, signs_cm, keys_s = stage_gather(scalars, table)
        sgn = signs_cm.reshape(c_cols, n_ch)
        if use_kernel:
            local, tails = pallas_scan.affine_prefix_level(
                curve, data[0], data[1], sgn)
            return local, tails, keys_s, "rows"
        local, tails, fmt = pp.local_prefix(curve, data, sgn)
        return local, tails, keys_s, fmt

    def stage_accum(scalars, table=None):
        local, tails, keys_s, fmt = _prefix(scalars, table)
        return local, tails, keys_s

    def stage_buckets(scalars, table=None):
        local, tails, keys_s, fmt = _prefix(scalars, table)
        return pp.buckets_from_boundaries(
            curve, local, tails, keys_s, cfg.b_size, c_cols, n_ch, fmt)

    def stage_full(scalars, table=None):
        buckets = stage_buckets(scalars, table)
        return curve.xyzz_to_jac(integrate_gapped(curve, buckets, plan.bucket_gaps))

    def checksum(tree):
        """Reduce any pytree of arrays to one uint32 scalar so device_get
        transfers (over the axon tunnel) cost nothing."""
        leaves = jax.tree_util.tree_leaves(tree)
        acc = None
        for leaf in leaves:
            s = jnp.sum(leaf.astype(jnp.uint32) if leaf.dtype != jnp.uint32
                        else leaf, dtype=jnp.uint32)
            acc = s if acc is None else acc + s
        return acc

    # table-consuming stages get the table as a jit ARG (a closed-over
    # multi-GB constant blows the remote-compile transport, cf. engine.jit_msm)
    stages = [
        ("recode", stage_recode, False),
        ("sort", stage_sort, False),
        ("gather", stage_gather, True),
        ("prefix-scan", stage_accum, True),
        ("buckets", stage_buckets, True),
        ("integrate+full", stage_full, True),
    ]
    sc = jnp.asarray(recode.random_scalars(n, seed=3))
    prev = 0.0
    print(f"n=2^{n_exp} c={cfg.c} h={h} B={cfg.b_size} stream={n * h}")
    loops = int(os.environ.get("MSM_PROF_LOOPS", "4"))
    for name, fn, takes_table in stages:
        if takes_table:
            f0 = jax.jit(lambda s, t, fn=fn: checksum(fn(s, t)))
            f = lambda s, f0=f0: f0(s, plan.table3nh)
        else:
            f = jax.jit(lambda s, fn=fn: checksum(fn(s)))
        t0 = time.time()
        force(f(sc))
        compile_s = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = None
            for _ in range(loops):
                out = f(sc)
            force(out)  # one barrier: amortizes the ~25 ms tunnel round-trip
            ts.append((time.time() - t0) / loops)
        t = float(np.median(ts))
        print(
            f"{name:>16}: cum {t * 1e3:9.2f} ms  (+{(t - prev) * 1e3:8.2f} ms)"
            f"  compile {compile_s:6.1f} s"
        )
        prev = t


if __name__ == "__main__":
    main()
