#!/usr/bin/env python
"""Microbenchmark: gather formulations on the TPU.

The round-3 profile shows every pipeline stage is gather-bound through XLA's
gather lowering. This driver measures the alternatives so the pipeline can
pick layouts deliberately. All outputs are checksum-reduced on device (a raw
device_get would drag megabytes through the axon tunnel and swamp the
measurement).

  t1d       jnp.take from a 64K int32 table, 512K random indices
  t1d_sort  same, ascending indices (indices_are_sorted hint)
  row96     affine row gather (N, 24) u32 — the table-point gather
  row_pair  affine row gather with X||Y packed in one (N, 48) row
  kern_vmem Pallas kernel: table resident in VMEM, 2-D in-kernel take
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, reps=5):
    import jax

    out = fn(*args)
    np.asarray(jax.device_get(out))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.device_get(fn(*args)))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def cks(x):
        return jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32)

    T = 65537
    N = 1 << 19
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.integers(0, 1 << 30, size=T).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, T, size=N).astype(np.int32))
    idx_sorted = jnp.sort(idx)

    t = bench(jax.jit(lambda t_, i: cks(jnp.take(t_, i))), table, idx)
    print(f"t1d       : {t*1e3:8.2f} ms  {N/t/1e6:8.1f} M elem/s", flush=True)

    f_sorted = jax.jit(lambda t_, i: cks(jax.lax.gather(
        t_, i[:, None],
        jax.lax.GatherDimensionNumbers((), (0,), (0,)), (1,),
        indices_are_sorted=True, mode="clip")))
    t = bench(f_sorted, table, idx_sorted)
    print(f"t1d_sort  : {t*1e3:8.2f} ms  {N/t/1e6:8.1f} M elem/s", flush=True)

    Np = N // 2
    rows = jnp.asarray(rng.integers(0, 1 << 30, size=(T, 24)).astype(np.uint32))
    ridx = jnp.asarray(rng.integers(0, T, size=Np).astype(np.int32))
    t = bench(jax.jit(lambda r, i: cks(jnp.take(r, i, axis=0))), rows, ridx)
    print(f"row96     : {t*1e3:8.2f} ms  {Np/t/1e6:8.1f} M rows/s "
          f"({Np*96/t/1e9:.1f} GB/s)", flush=True)

    rows48 = jnp.asarray(rng.integers(0, 1 << 30, size=(T, 48)).astype(np.uint32))
    t = bench(jax.jit(lambda r, i: cks(jnp.take(r, i, axis=0))), rows48, ridx)
    print(f"row_pair  : {t*1e3:8.2f} ms  {Np/t/1e6:8.1f} M rows/s "
          f"({Np*192/t/1e9:.1f} GB/s)", flush=True)

    # in-kernel VMEM table lookup ("Only 2D gather is supported": shape the
    # table (R, 128) and take along axis 0 per lane with row indices)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLK = 4096
    R = -(-T // 128)
    table2 = jnp.pad(table, (0, R * 128 - T)).reshape(R, 128)

    SUB, LANES = 8, 512
    NR = N // LANES

    @jax.jit
    def kern_vmem(tab, i):
        lin = i.reshape(NR, LANES)

        def kern2(tab_ref, lin_ref, out_ref):
            tab_flat = jnp.broadcast_to(
                tab_ref[:].reshape(1, -1), (SUB, R * 128))
            out_ref[:] = jnp.take_along_axis(tab_flat, lin_ref[:], axis=1)

        return pl.pallas_call(
            kern2,
            grid=(NR // SUB,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, LANES), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NR, LANES), jnp.int32),
        )(tab, lin)

    try:
        t = bench(jax.jit(lambda tb, i: cks(kern_vmem(tb, i))), table2, idx)
        print(f"kern_vmem : {t*1e3:8.2f} ms  {N/t/1e6:8.1f} M elem/s",
              flush=True)
    except Exception as e:
        print(f"kern_vmem : FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
