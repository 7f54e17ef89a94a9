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


def make_mont_mul(L: int, p0: int, modulus: int, block_b: int = 512):
    """Build a jitted pallas Montgomery multiply for uint32[L, B] batches."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 1 << (LIMB_BITS * L)
    p_limbs = np.array(
        [(modulus >> (LIMB_BITS * i)) & 0xFFFF for i in range(L)], np.uint32
    ).reshape(L, 1)
    not_p_limbs = np.array(
        [((R - modulus) >> (LIMB_BITS * i)) & 0xFFFF for i in range(L)],
        np.uint32,
    ).reshape(L, 1)
    p0_u32 = np.uint32(p0)

    def kernel(a_ref, b_ref, p_ref, notp_ref, out_ref):
        out_ref[:] = _mont_mul_body(
            a_ref[:], b_ref[:], L, p0_u32, p_ref[:], notp_ref[:]
        )

    @jax.jit
    def mont_mul(a, b):
        assert a.ndim == 2 and a.shape[0] == L, a.shape
        B = a.shape[1]
        Bp = -(-B // block_b) * block_b
        if Bp != B:
            pad = [(0, 0), (0, Bp - B)]
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=[
                pl.BlockSpec((L, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, Bp), jnp.uint32),
        )(a, b, jnp.asarray(p_limbs), jnp.asarray(not_p_limbs))
        return out[:, :B] if Bp != B else out

    return mont_mul
