#!/usr/bin/env python
"""Stage breakdown of the big-n (ranged-chunking) MSM query on the real TPU.

Times cumulative prefixes of the jit_msm_bign pipeline so the deltas
attribute the cost (VERDICT r4 Next 2: 'options measured, not guessed'):

  1. recode            (digit extraction + table lookups)
  2. + sort            (stage1: the 25M-element lax.sort at 2^21)
  3. + segment_starts  (+ the one host sync for seg_len)
  4. full query        (adds: gather + prefix scan + boundaries + integrate)

Usage: MSM_PROF_NEXP=21 MSM_PROF_ALGO=bgmw python drivers/bign_profile.py
Env: MSM_SORT_SLOTS=1 to measure the slot-ordered (2-key) sort variant.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_exp = int(os.environ.get("MSM_PROF_NEXP", "19"))
    algo = os.environ.get("MSM_PROF_ALGO", "bgmw")
    reps = int(os.environ.get("MSM_PROF_REPS", "2"))
    loops = int(os.environ.get("MSM_PROF_LOOPS", "2"))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import functools

    import jax.numpy as jnp

    from msm_blst_tpu.curves import G1
    from msm_blst_tpu.msm import (build_plan, cache as table_cache,
                                  fixed_point_list, params, recode)
    from msm_blst_tpu.msm import engine
    from msm_blst_tpu.msm.engine import (PLAN_ARRAY_FIELDS, _bgmw_streams,
                                         _ches_streams, jit_msm_bign,
                                         sort_num_keys)

    n = 1 << n_exp
    cfg = params.CONFIGS[n_exp]
    cache_dir = os.environ.get(
        "MSM_TABLE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".table_cache"))
    want = ("t3nh",) if algo == "ches" else ("tnh",)
    plan = table_cache.load_plan(G1, cfg, n, cache_dir, tables=want)
    t0 = time.time()
    if plan is None or (algo == "ches" and plan.table3nh is None) or (
            algo == "bgmw" and plan.table_nh is None):
        points = fixed_point_list(G1, n)
        plan = build_plan(G1, points, cfg, ches=(algo == "ches"),
                          bgmw=(algo == "bgmw"), stock=False)
        plan.points = None
        try:
            table_cache.save_plan(plan, cache_dir)
        except Exception as e:
            print(f"# cache save skipped: {e}", file=sys.stderr)
    jax.block_until_ready(plan.table3nh if algo == "ches" else plan.table_nh)
    print(f"# setup {time.time()-t0:.1f}s  n=2^{n_exp} algo={algo} "
          f"sort_keys={sort_num_keys()}")

    import dataclasses

    streams_of = {"ches": _ches_streams, "bgmw": _bgmw_streams}[algo]
    arrays = {f: getattr(plan, f) for f in PLAN_ARRAY_FIELDS
              if f != "points" and getattr(plan, f) is not None}

    @jax.jit
    def recode_only(scalars, arrs):
        p = dataclasses.replace(plan, **arrs, _stream_jit=None)
        slots, keys, signs, _ = streams_of(p, scalars)
        return slots.sum() + keys.sum() + signs.sum()

    @jax.jit
    def recode_sort(scalars, arrs):
        p = dataclasses.replace(plan, **arrs, _stream_jit=None)
        slots, keys, signs, _ = streams_of(p, scalars)
        payload = (slots.astype(jnp.int32) << 1) | signs.astype(jnp.int32)
        keys_s, payload_s = jax.lax.sort(
            (keys.astype(jnp.int32), payload), num_keys=sort_num_keys())
        return keys_s[-1] + payload_s[-1]

    full = jit_msm_bign(plan, algo)

    def force(x):
        return jax.tree_util.tree_map(
            lambda c: np.asarray(jax.device_get(c)), x)

    sc = jnp.asarray(recode.random_scalars(n, seed=3))

    def timed(label, fn):
        force(fn())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = None
            for _ in range(loops):
                out = fn()
            force(out)
            ts.append((time.time() - t0) / loops)
        m = float(np.median(ts))
        print(f"{label:28s} {m*1e3:9.1f} ms")
        return m

    t_rec = timed("recode", lambda: recode_only(sc, arrays))
    t_srt = timed("recode+sort (stage1)", lambda: recode_sort(sc, arrays))
    t_all = timed("full query", lambda: full(sc))
    print(f"{'-> sort delta':28s} {(t_srt-t_rec)*1e3:9.1f} ms")
    print(f"{'-> accumulate+integrate':28s} {(t_all-t_srt)*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
