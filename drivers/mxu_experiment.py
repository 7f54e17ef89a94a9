#!/usr/bin/env python
"""Second MXU attempt (VERDICT r3 item 5): step-wise timing of the SOS
Montgomery multiply to locate where the byte-marshalling cost lives, plus a
wider-matmul variant (even/odd Toeplitz rows fused into one matmul so the
MXU sees M=2L instead of two M=L passes).

Variants, all bit-identical where they produce full results:
  cios          — the production deferred-carry CIOS kernel (baseline)
  prod          — full product only (VPU schoolbook, no reduction)
  prod+bytes    — + u32->bf16 byte-plane marshalling of U
  prod+mm1      — + first Toeplitz matmul (m = U*P' mod R)
  sos           — the full SOS multiply (round-3 implementation)
  sos_wide      — SOS with fused even/odd matmuls (2 matmuls instead of 4)

Usage: python drivers/mxu_experiment.py [B] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    loops = int(os.environ.get("MXU_LOOPS", "8"))

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from msm_blst_tpu.constants import P as PMOD
    from msm_blst_tpu.fields import FP
    from msm_blst_tpu.fields import pallas_mont as pm

    L = FP.n_limbs
    R = 1 << (16 * L)
    p0 = int(FP.p0)
    block_b = 512
    p_limbs = np.array([(PMOD >> (16 * i)) & 0xFFFF for i in range(L)],
                       np.uint32).reshape(L, 1)
    not_p = np.array([((R - PMOD) >> (16 * i)) & 0xFFFF for i in range(L)],
                     np.uint32).reshape(L, 1)
    sos_np = pm.build_sos_consts(L, PMOD)
    # fused even/odd: rows [E; O] in one matrix
    w1 = np.concatenate([sos_np["W1E"], sos_np["W1O"]], axis=0)   # (2L, 3L)
    w2 = np.concatenate([sos_np["W2E"], sos_np["W2O"]], axis=0)   # (4L, 3L)

    def body_prod(a, b):
        return pm._full_product(a, b, L)[:L]

    def body_bytes(a, b):
        return pm._f32_to_u32(
            pm._bytes3(pm._full_product(a, b, L)[:L]).astype(jnp.float32))

    def body_mm1(a, b, w1e, w1o):
        U = pm._full_product(a, b, L)
        ub = pm._bytes3(U[:L])
        ml = pm._f32_to_u32(pm._dotf(w1e, ub)) + (
            pm._f32_to_u32(pm._dotf(w1o, ub)) << 8)
        return ml

    def body_sos_wide(a, b, w1f, w2f, notp):
        U = pm._full_product(a, b, L)
        ub = pm._bytes3(U[:L])
        m_eo = pm._f32_to_u32(pm._dotf(w1f, ub))        # (2L, B): [E; O]
        ml = m_eo[:L] + (m_eo[L:] << 8)
        m2 = (ml & pm.MASK) + pm._shift_up(ml >> 16, 1)
        mb = pm._bytes3(m2)
        mp_eo = pm._f32_to_u32(pm._dotf(w2f, mb))       # (4L, B)
        mp = mp_eo[: 2 * L] + (mp_eo[2 * L:] << 8)
        T = U + mp
        res = pm._resolve_full(T)
        return pm._csub_p_ks(res[L: 2 * L], notp, L)

    def make(body, consts):
        csts = tuple(jnp.asarray(c) for c in consts)

        def kern(a_ref, b_ref, *refs):
            out_ref = refs[-1]
            out_ref[:] = body(a_ref[:], b_ref[:],
                              *[r[:] for r in refs[:-1]])

        def spec(shape):
            return pl.BlockSpec(shape, None, memory_space=pltpu.VMEM)

        data_spec = pl.BlockSpec((L, block_b), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)

        @jax.jit
        def run(a, b):
            Bp = a.shape[1]
            # probe output row count from an eval_shape
            out_rows = jax.eval_shape(
                lambda x, y: body(x, y, *csts),
                jax.ShapeDtypeStruct((L, block_b), jnp.uint32),
                jax.ShapeDtypeStruct((L, block_b), jnp.uint32)).shape[0]
            return pl.pallas_call(
                kern,
                grid=(Bp // block_b,),
                in_specs=[data_spec, data_spec] + [
                    spec(tuple(c.shape)) for c in csts],
                out_specs=pl.BlockSpec((out_rows, block_b), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((out_rows, Bp), jnp.uint32),
            )(a, b, *csts)

        return run

    bf = jnp.bfloat16
    variants = {
        "cios": pm.make_mont_mul(L, p0, PMOD, impl="cios"),
        "prod": make(body_prod, ()),
        "prod+bytes": make(body_bytes, ()),
        "prod+mm1": make(body_mm1, (sos_np["W1E"].astype(bf),
                                    sos_np["W1O"].astype(bf))),
        "sos": pm.make_mont_mul(L, p0, PMOD, impl="sos"),
        "sos_wide": make(body_sos_wide, (w1.astype(bf), w2.astype(bf), not_p)),
    }

    rng = np.random.default_rng(5)
    a_i = [int.from_bytes(rng.bytes(47), "little") % PMOD for _ in range(256)]
    b_i = [int.from_bytes(rng.bytes(47), "little") % PMOD for _ in range(256)]
    a = jnp.asarray(np.tile(np.asarray(FP.from_ints(a_i)), (1, B // 256)))
    b = jnp.asarray(np.tile(np.asarray(FP.from_ints(b_i)), (1, B // 256)))

    # correctness: sos_wide must equal cios on the first 256 lanes
    want = FP.to_ints(jax.device_get(variants["cios"](a, b))[:, :256])
    got = FP.to_ints(jax.device_get(variants["sos_wide"](a, b))[:, :256])
    assert got == want, "sos_wide mismatch vs cios"
    got_s = FP.to_ints(jax.device_get(variants["sos"](a, b))[:, :256])
    assert got_s == want, "sos mismatch vs cios"
    print(f"# correctness OK; B={B} loops={loops}")

    def bench(fn):
        out = fn(a, b)
        np.asarray(jax.device_get(out[:1, :8]))  # warm + barrier
        ts = []
        for _ in range(reps):
            t0 = time.time()
            o = None
            for _ in range(loops):
                o = fn(a, b)
            np.asarray(jax.device_get(o[:1, :8]))
            ts.append((time.time() - t0) / loops)
        return float(np.median(ts))

    t_by = {}
    for name, fn in variants.items():
        t = bench(fn)
        t_by[name] = t
        print(f"{name:>11}: {t*1e3:8.3f} ms  {B/t/1e6:8.1f} M muls/s")
    print("# deltas: bytes-marshal %.3f ms, mm1 %.3f ms" % (
        (t_by["prod+bytes"] - t_by["prod"]) * 1e3,
        (t_by["prod+mm1"] - t_by["prod+bytes"]) * 1e3))


if __name__ == "__main__":
    main()
