"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp path (fields/limb.py) expresses the CIOS loop as a lax.fori_loop of
~6 vector ops over a (L+1, B) accumulator; XLA materializes loop state and
schedules conservatively. This kernel runs the whole multiply — 24 fully
unrolled CIOS rounds + carry resolution + conditional subtract — inside one
Pallas invocation, keeping the accumulator in VMEM/registers with zero HBM
round-trips between rounds.

Same math as LimbField.mul (deferred-carry CIOS, 16-bit limbs, spec:
/root/reference/src/no_asm.h:29-102), bit-identical outputs; property-tested
against the jnp path and the Python oracle.

Only used when the active backend is TPU (CPU tests use the jnp path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
MASK = np.uint32(0xFFFF)

# True while tracing *inside* a Pallas kernel body: field ops must then take
# their plain-jnp path (a pallas_call cannot nest another pallas_call).
IN_KERNEL = False

# While tracing a kernel, field constants (P, NOT_P, ONE_MONT, ... as (L, 1)
# arrays) must come from kernel INPUTS, not captured host constants — Mosaic
# rejects captured arrays. Keys: (field_name, const_name) -> in-kernel array.
KERNEL_CONSTS: dict = {}


class kernel_mode:
    """Context manager flipping the in-kernel trace flag and registering the
    kernel's field-constant input refs."""

    def __init__(self, consts: dict | None = None):
        self._consts = consts or {}

    def __enter__(self):
        global IN_KERNEL
        self._old = IN_KERNEL
        IN_KERNEL = True
        KERNEL_CONSTS.update(self._consts)

    def __exit__(self, *exc):
        global IN_KERNEL
        IN_KERNEL = self._old
        for k in self._consts:
            KERNEL_CONSTS.pop(k, None)


def _shift_up(x, d, fill=0):
    """Row j of output = row j-d of input (`fill` shifted in at the bottom)."""
    if d == 0:
        return x
    if d >= x.shape[0]:
        return jnp.full_like(x, fill)
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _kogge_stone(g, p):
    """Resolve single-bit carry chains: returns carry-in per row."""
    K = g.shape[0]
    d = 1
    while d < K:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d, fill=1)
        d *= 2
    return g


def _resolve_full(t):
    """uint32[K, B] deferred-carry limbs (any 32-bit values) -> clean 16-bit
    limbs uint32[K+1, B] (local pass + Kogge-Stone)."""
    zero_row = jnp.zeros((1,) + t.shape[1:], jnp.uint32)
    c = t >> LIMB_BITS
    s = t & MASK
    s = jnp.concatenate([s, zero_row]) + _shift_up(
        jnp.concatenate([c, zero_row]), 1
    )
    g = _kogge_stone(
        (s >> LIMB_BITS).astype(jnp.uint32),
        ((s & MASK) == MASK).astype(jnp.uint32),
    )
    return (s + _shift_up(g, 1)) & MASK


def _csub_p_ks(r, not_p_rows, L):
    """Conditional subtract p for clean-limb r < 2p (Kogge-Stone compare)."""
    v = r + not_p_rows
    g2 = _kogge_stone(
        (v >> LIMB_BITS).astype(jnp.uint32),
        ((v & MASK) == MASK).astype(jnp.uint32),
    )
    v = ((v & MASK) + _shift_up(g2, 1)) & MASK
    ge_p = g2[L - 1] != 0
    return jnp.where(ge_p[None], v, r)


# ---------------------------------------------------------------------------
# SOS multiply: full product on the VPU, Montgomery reduction as two
# multiplications by CONSTANTS (P' = -P^-1 mod R, and P) evaluated as
# byte-Toeplitz matmuls on the MXU (bf16 x bf16 -> f32 is exact for byte
# operands with <= 3L <= 2^7 accumulation terms: products < 2^16, sums < 2^23
# < 2^24 mantissa). This removes the CIOS serial chain entirely and moves
# ~half the multiply work onto the systolic array.
# ---------------------------------------------------------------------------


def build_sos_consts(L: int, modulus: int) -> dict:
    """Byte-Toeplitz reduction matrices, float32 numpy (cast to bf16 at use).

    Column order r = s*L + l for byte s of limb l (byte position 2l+s);
    W1E/W1O rows t give byte positions 2t / 2t+1 of (x * P') mod R;
    W2E/W2O rows t give byte positions 2t / 2t+1 of (m * P).
    """
    R = 1 << (LIMB_BITS * L)
    pp = (-pow(modulus, -1, R)) % R
    nb = 2 * L
    ppb = [(pp >> (8 * i)) & 0xFF for i in range(nb)]
    pb = [(modulus >> (8 * i)) & 0xFF for i in range(nb)]

    def toeplitz(vals, out_rows, parity):
        w = np.zeros((out_rows, 3 * L), dtype=np.float32)
        for t in range(out_rows):
            for s in range(3):
                for l in range(L):
                    idx = 2 * t + parity - (2 * l + s)
                    if 0 <= idx < nb:
                        w[t, s * L + l] = vals[idx]
        return w

    return {
        "W1E": toeplitz(ppb, L, 0),
        "W1O": toeplitz(ppb, L, 1),
        "W2E": toeplitz(pb, nb, 0),
        "W2O": toeplitz(pb, nb, 1),
    }


SOS_CONST_NAMES = ("W1E", "W1O", "W2E", "W2O")


def _full_product(a, b, L):
    """Schoolbook product of clean 16-bit limb batches: uint32[L, B] x2 ->
    deferred-carry uint32[2L, B] with rows < 2^22 (per-diagonal lo/hi sums)."""
    arows = [a[i] for i in range(L)]
    brows = [b[j] for j in range(L)]
    U = []
    hi_prev = None
    for k in range(2 * L - 1):
        lo_sum = None
        hi_sum = None
        for i in range(max(0, k - L + 1), min(L, k + 1)):
            p = arows[i] * brows[k - i]
            lo = p & MASK
            hi = p >> LIMB_BITS
            lo_sum = lo if lo_sum is None else lo_sum + lo
            hi_sum = hi if hi_sum is None else hi_sum + hi
        U.append(lo_sum if hi_prev is None else lo_sum + hi_prev)
        hi_prev = hi_sum
    U.append(hi_prev)
    return jnp.stack(U)


def _bytes3(x):
    """uint32[K, B] values < 2^24 -> bf16[3K, B], blocks [lo8; mid8; hi8].
    (u32 -> i32 -> f32 -> bf16: Mosaic has no direct u32<->f32 cast.)"""
    s0 = x & 0xFF
    s1 = (x >> 8) & 0xFF
    s2 = x >> 16
    cat = jnp.concatenate([s0, s1, s2], axis=0)
    return cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _f32_to_u32(x):
    """Exact-integer float32 (>= 0, < 2^31) -> uint32 (via int32 for Mosaic)."""
    return x.astype(jnp.int32).astype(jnp.uint32)


def _dotf(w, x):
    import jax

    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mont_mul_body_sos(a, b, L, w1e, w1o, w2e, w2o, not_p_rows):
    """SOS Montgomery multiply: canonical clean-limb inputs < p ->
    canonical output (a*b*R^-1 mod p). Bit-identical to _mont_mul_body."""
    U = _full_product(a, b, L)                     # (2L, B) rows < 2^22
    ub = _bytes3(U[:L])                            # (3L, B)
    ml = _f32_to_u32(_dotf(w1e, ub)) + (
        _f32_to_u32(_dotf(w1o, ub)) << 8
    )                                              # (L, B) < 2^31
    # one local carry pass bounds m's value < 1.5 R (mod R preserved)
    m2 = (ml & MASK) + _shift_up(ml >> LIMB_BITS, 1)
    mb = _bytes3(m2)                               # (3L, B), bytes <= 255
    mp = _f32_to_u32(_dotf(w2e, mb)) + (
        _f32_to_u32(_dotf(w2o, mb)) << 8
    )                                              # (2L, B) < 2^31
    T = U + mp                                     # == 0 mod R by construction
    res = _resolve_full(T)                         # (2L+1, B) clean limbs
    out = res[L : 2 * L]                           # / R; value < 1.7 p
    return _csub_p_ks(out, not_p_rows, L)


def _mont_mul_body(a, b, L, p0, p_rows, not_p_rows):
    """The in-register CIOS multiply: a, b uint32[L, B] -> uint32[L, B]."""
    B = a.shape[1]
    zero_row = jnp.zeros((1, B), jnp.uint32)
    t = jnp.zeros((L + 1, B), jnp.uint32)
    for i in range(L):
        ai = a[i][None, :]
        prod = ai * b  # (L, B): 16b x 16b products in 32 bits
        t = t + jnp.concatenate([prod & MASK, zero_row]) + _shift_up(
            jnp.concatenate([prod >> LIMB_BITS, zero_row]), 1
        )
        m = (t[0] * p0) & MASK
        q = m[None, :] * p_rows
        t = t + jnp.concatenate([q & MASK, zero_row]) + _shift_up(
            jnp.concatenate([q >> LIMB_BITS, zero_row]), 1
        )
        carry = t[0] >> LIMB_BITS
        # drop row 0 (fully reduced mod 2^16), fold its carry into row 1
        # (concat instead of .at[].add — Mosaic has no scatter)
        t = jnp.concatenate([(t[1] + carry)[None], t[2:], zero_row])

    # carry resolution (Kogge-Stone, as fields.limb.resolve_limbs)
    c = t >> LIMB_BITS
    s = t & MASK
    s = jnp.concatenate([s, zero_row]) + _shift_up(
        jnp.concatenate([c, zero_row]), 1
    )
    g = _kogge_stone(
        (s >> LIMB_BITS).astype(jnp.uint32),
        ((s & MASK) == MASK).astype(jnp.uint32),
    )
    s = (s + _shift_up(g, 1)) & MASK
    r = s[:L]  # value < 2p, so rows L..L+1 resolved to zero

    # conditional subtract p: compute r + (2^(16L) - p); keep it iff it
    # carries out of the top limb (i.e. r >= p)
    v = r + not_p_rows
    g2 = _kogge_stone(
        (v >> LIMB_BITS).astype(jnp.uint32),
        ((v & MASK) == MASK).astype(jnp.uint32),
    )
    v = ((v & MASK) + _shift_up(g2, 1)) & MASK
    ge_p = g2[L - 1] != 0  # carry out of the top limb
    return jnp.where(ge_p[None, :], v, r)


def mul_impl() -> str:
    """Montgomery-multiply implementation: 'cios' (default) or 'sos'.

    Round-4 step-wise profile (drivers/mxu_experiment.py, B=2^21, v5e,
    artifacts/mxu_experiment_r4.txt — same-harness relative numbers):
      cios 12.61 ms | full product alone 11.75 | +byte-marshal 11.90
      | +matmul-1 12.54 | full sos 17.18 | fused-E/O matmuls 16.94
    i.e. the u32->bf16 byte-plane marshalling costs only ~0.15 ms and the
    Toeplitz matmuls ~0.6 ms — the SOS loss is the VPU schoolbook full
    product (itself ~ a whole CIOS multiply: its per-diagonal lo/hi carry
    splitting erases the saving) plus the final 2L-limb Kogge-Stone resolve
    (~4.6 ms). Amortizing marshalling across a fused dadd_affine's 17 muls
    (VERDICT r3 item 5) can therefore recover at most ~6% — the MXU route is
    a measured dead end for this limb width, and CIOS stays the default."""
    import os

    return os.environ.get("MSM_MUL_IMPL", "cios")


def make_mont_mul(L: int, p0: int, modulus: int, block_b: int = 512,
                  impl: str | None = None):
    """Build a jitted pallas Montgomery multiply for uint32[L, B] batches.

    impl: 'sos' (full product + MXU byte-Toeplitz reduction, default) or
    'cios' (serial deferred-carry rounds). Both are bit-identical.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    impl = impl or mul_impl()
    R = 1 << (LIMB_BITS * L)
    p_limbs = np.array(
        [(modulus >> (LIMB_BITS * i)) & 0xFFFF for i in range(L)], np.uint32
    ).reshape(L, 1)
    not_p_limbs = np.array(
        [((R - modulus) >> (LIMB_BITS * i)) & 0xFFFF for i in range(L)],
        np.uint32,
    ).reshape(L, 1)
    p0_u32 = np.uint32(p0)

    def cios_kernel(a_ref, b_ref, p_ref, notp_ref, out_ref):
        out_ref[:] = _mont_mul_body(
            a_ref[:], b_ref[:], L, p0_u32, p_ref[:], notp_ref[:]
        )

    sos_np = build_sos_consts(L, modulus) if impl == "sos" else None

    def sos_kernel(a_ref, b_ref, w1e, w1o, w2e, w2o, notp_ref, out_ref):
        out_ref[:] = _mont_mul_body_sos(
            a_ref[:], b_ref[:], L,
            w1e[:], w1o[:], w2e[:], w2o[:], notp_ref[:],
        )

    def _spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0, 0)) if nd == 2 else None,
                            memory_space=pltpu.VMEM)

    @jax.jit
    def mont_mul(a, b):
        assert a.ndim == 2 and a.shape[0] == L, a.shape
        B = a.shape[1]
        Bp = -(-B // block_b) * block_b
        if Bp != B:
            pad = [(0, 0), (0, Bp - B)]
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        data_spec = pl.BlockSpec((L, block_b), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        if impl == "sos":
            consts = tuple(
                jnp.asarray(sos_np[n]).astype(jnp.bfloat16)
                for n in SOS_CONST_NAMES
            ) + (jnp.asarray(not_p_limbs),)
            kernel = sos_kernel
            extra_specs = [_spec(tuple(c.shape)) for c in consts]
        else:
            consts = (jnp.asarray(p_limbs), jnp.asarray(not_p_limbs))
            kernel = cios_kernel
            extra_specs = [_spec((L, 1)), _spec((L, 1))]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=[data_spec, data_spec] + extra_specs,
            out_specs=pl.BlockSpec((L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, Bp), jnp.uint32),
        )(a, b, *consts)
        return out[:, :B] if Bp != B else out

    return mont_mul
