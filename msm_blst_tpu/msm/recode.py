"""Scalar recoding: standard q-ary, CHES MB-radix-q, BGMW95 q/2, Booth windows.

Two implementations of each:
  * host numpy (vectorized uint64) — the oracle, and the analog of the
    reference's driver-side conversion (/root/reference/auxiliaryfunc.h:83-145)
  * device jnp (uint32 limbs) — the fused on-device path, the analog of the
    reference's native "integral scalar conversion"
    (/root/reference/src/multi_scalar.c:748-775), avoiding any host->device
    digit transfer in the query path.

Scalars cross the host boundary as uint32[8, n] little-endian limb arrays.
"""

from __future__ import annotations

import numpy as np

from ..constants import R_ORDER

# ---------------------------------------------------------------------------
# host scalar containers
# ---------------------------------------------------------------------------


def scalars_from_ints(xs) -> np.ndarray:
    """Python ints -> uint32[8, n] little-endian."""
    out = np.zeros((8, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        assert 0 <= x < (1 << 256)
        for i in range(8):
            out[i, j] = (x >> (32 * i)) & 0xFFFFFFFF
    return out


def scalars_to_ints(a: np.ndarray) -> list:
    return [
        sum(int(a[i, j]) << (32 * i) for i in range(8)) for j in range(a.shape[1])
    ]


def random_scalars(n: int, seed: int) -> np.ndarray:
    """Deterministic scalars < r (the test-fixture replacement for the
    reference's SHA256-of-RAND_bytes, auxiliaryfunc.h:178-207)."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        x = int.from_bytes(rng.bytes(32), "little") >> 1  # 255-bit
        if x < R_ORDER:
            out.append(x)
    return scalars_from_ints(out)


# ---------------------------------------------------------------------------
# host (numpy) digit extraction and recodings — the oracle
# ---------------------------------------------------------------------------


_R_LIMBS_NP = np.array(
    [(0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
      >> (32 * i)) & 0xFFFFFFFF for i in range(8)],
    dtype=np.uint32,
)


def reduce_mod_r_host(scalars_u32: np.ndarray) -> np.ndarray:
    """Fold scalars in [r, 2^255) down by one subtraction of r (2^255 < 2r, so
    one is enough). MSM semantics are mod r (k*P = (k mod r)*P); the recodings'
    digit-coverage guarantees hold only for scalars < r."""
    ints = scalars_to_ints(scalars_u32)
    if all(x < R_ORDER for x in ints):
        return scalars_u32
    return scalars_from_ints([x - R_ORDER if x >= R_ORDER else x for x in ints])


def reduce_mod_r_device(scalars):
    """Device twin of reduce_mod_r_host: branch-free conditional subtract."""
    import jax.numpy as jnp

    ge = jnp.zeros(scalars.shape[1:], bool)  # scalar >= r, from the top limb
    eq = jnp.ones(scalars.shape[1:], bool)
    for i in range(7, -1, -1):
        ri = np.uint32(_R_LIMBS_NP[i])
        ge = ge | (eq & (scalars[i] > ri))
        eq = eq & (scalars[i] == ri)
    ge = ge | eq
    out = []
    borrow = jnp.zeros(scalars.shape[1:], jnp.uint32)
    for i in range(8):
        ri = np.uint32(_R_LIMBS_NP[i])
        ai = scalars[i]
        d = ai - ri - borrow
        borrow = ((ai < ri) | ((ai == ri) & (borrow != 0))).astype(jnp.uint32)
        out.append(d)
    sub = jnp.stack(out)
    return jnp.where(ge[None, :], sub, scalars)


def qary_digits_host(scalars_u32: np.ndarray, c: int, h: int) -> np.ndarray:
    """Standard q-ary digits: int32[n, h], digit j = bits [j*c, (j+1)*c).
    (spec: auxiliaryfunc.h:83-90)"""
    n = scalars_u32.shape[1]
    limbs = scalars_u32.astype(np.uint64)  # (8, n)
    digits = np.zeros((n, h), dtype=np.int64)
    mask = np.uint64((1 << c) - 1)
    for j in range(h):
        bit = j * c
        w, off = bit // 32, bit % 32
        if w >= limbs.shape[0]:  # windows past bit 256 are zero
            continue
        d = limbs[w] >> np.uint64(off)
        if off + c > 32 and w + 1 < limbs.shape[0]:
            d |= limbs[w + 1] << np.uint64(32 - off)
        if off + c > 64 and w + 2 < 8:
            d |= limbs[w + 2] << np.uint64(64 - off)
        digits[:, j] = (d & mask).astype(np.int64)
    return digits.astype(np.int32)


def ches_recode_host(scalars_u32: np.ndarray, c: int, h: int, ah: int,
                     use_native: bool | None = None):
    """MB-radix-q recoding (spec: auxiliaryfunc.h:92-118): per digit emit
    (m in {1,2,3}, b in bucket set, sign), carrying +1 on alpha=1 digits.

    Returns (bucket_b int32[n,h], m int32[n,h], sign bool[n,h]).
    `use_native`: None = auto (native C++ pass if built), True/False to force.
    """
    from .params import digit_conversion_table

    scalars_u32 = reduce_mod_r_host(scalars_u32)
    q = 1 << c
    m_t, b_t, a_t, _ = digit_conversion_table(q, ah)
    from .. import native

    if (use_native is None and native.available()) or use_native:
        b_g, m_g, s_g = native.ches_recode(scalars_u32, c, h, m_t, b_t, a_t)
        return b_g.T.copy(), m_g.T.copy(), s_g.T.copy()
    digits = qary_digits_host(scalars_u32, c, h)
    n = digits.shape[0]
    b_out = np.zeros((n, h), dtype=np.int32)
    m_out = np.zeros((n, h), dtype=np.int32)
    s_out = np.zeros((n, h), dtype=bool)
    carry = np.zeros(n, dtype=np.int32)
    for j in range(h):
        d = digits[:, j] + carry
        b_out[:, j] = b_t[d]
        m_out[:, j] = m_t[d]
        alpha = a_t[d]
        s_out[:, j] = alpha == 1
        carry = alpha
    assert not s_out[:, h - 1].any(), (
        "leading CHES digit required a carry; config parameters must prevent this"
    )
    return b_out, m_out, s_out


def bgmw_recode_host(scalars_u32: np.ndarray, c: int, h: int,
                     use_native: bool | None = None):
    """BGMW95 signed q/2 recoding incl. the r-a trick for tight configs
    (spec: auxiliaryfunc.h:130-145 and main_p1.cpp:294-398).

    Returns (absdigit int32[n,h], sign bool[n,h]).
    `use_native`: None = auto (native C++ pass if built), True/False to force.
    """
    scalars_u32 = reduce_mod_r_host(scalars_u32)
    q = 1 << c
    tight = c * h <= 255  # needs the group-order negation trick
    from .. import native

    if (use_native is None and native.available()) or use_native:
        a_g, s_g = native.bgmw_recode(scalars_u32, c, h, tight)
        return a_g.T.copy(), s_g.T.copy()
    scal = scalars_u32
    flip = np.zeros(scalars_u32.shape[1], dtype=bool)
    if tight:
        # condition: top 64 bits > 2^62  (main_p1.cpp:311-318)
        top = scalars_u32[6].astype(np.uint64) | (
            scalars_u32[7].astype(np.uint64) << np.uint64(32)
        )
        flip = top > np.uint64(1 << 62)
        ints = scalars_to_ints(scalars_u32)
        ints = [R_ORDER - x if f else x for x, f in zip(ints, flip)]
        scal = scalars_from_ints(ints)
    digits = qary_digits_host(scal, c, h).astype(np.int64)
    half = q >> 1
    for j in range(h - 1):
        over = digits[:, j] > half
        digits[:, j] -= np.where(over, q, 0)
        digits[:, j + 1] += over
    assert (digits[:, h - 1] <= half).all(), "BGMW95 leading digit exceeds q/2"
    sign = digits < 0
    absd = np.abs(digits).astype(np.int32)
    sign ^= flip[:, None]
    sign &= absd != 0
    return absd, sign


def booth_recode_host(scalars_u32: np.ndarray, c: int):
    """Signed-window recoding for the stock (no-precompute) Pippenger path:
    h = ceil(256/c) windows of signed digits in [-q/2, q/2].

    Functionally equivalent to blst's booth encoding
    (/root/reference/src/ec_mult.h:46-55); exact digit choices may differ —
    correctness is fixed by Sum digit_j * q^j == scalar.
    """
    h = -(-256 // c)
    return bgmw_recode_host_nofold(scalars_u32, c, h)


def bgmw_recode_host_nofold(scalars_u32: np.ndarray, c: int, h: int):
    q = 1 << c
    digits = qary_digits_host(scalars_u32, c, h).astype(np.int64)
    half = q >> 1
    for j in range(h - 1):
        over = digits[:, j] > half
        digits[:, j] -= np.where(over, q, 0)
        digits[:, j + 1] += over
    assert (digits[:, h - 1] <= half).all()
    sign = digits < 0
    absd = np.abs(digits).astype(np.int32)
    sign &= absd != 0
    return absd, sign


# ---------------------------------------------------------------------------
# device (jnp) recodings — fused integral conversion
# ---------------------------------------------------------------------------


def qary_digits_device(scalars, c: int, h: int):
    """uint32[8, n] device scalars -> int32[h, n] standard q-ary digits.
    All limb/shift indices are static; pure vector ops."""
    import jax.numpy as jnp

    mask = np.uint32((1 << c) - 1)
    rows = []
    for j in range(h):
        bit = j * c
        w, off = bit // 32, bit % 32
        if w >= scalars.shape[0]:
            # windows entirely past the 256-bit scalar are zero (c*h may
            # overshoot 256; JAX would silently CLAMP scalars[w] to the top
            # word otherwise, fabricating garbage digits)
            rows.append(jnp.zeros(scalars.shape[1:], jnp.int32))
            continue
        d = scalars[w] >> np.uint32(off) if off else scalars[w]
        if off + c > 32 and w + 1 < scalars.shape[0]:
            d = d | (scalars[w + 1] << np.uint32(32 - off))
        rows.append((d & mask).astype(jnp.int32))
    return jnp.stack(rows)


def ches_recode_device(scalars, c: int, h: int, tables):
    """Device MB-radix-q recoding. `tables` = (m_t, b_t, a_t) device int32[q+1].

    Returns (b int32[h, n], m int32[h, n], sign bool[h, n]). The carry chain is
    a static length-h loop of vector ops (the TPU-native analog of the fused
    native conversion at multi_scalar.c:748-775).
    """
    import jax.numpy as jnp

    m_t, b_t, a_t = tables
    digits = qary_digits_device(reduce_mod_r_device(scalars), c, h)
    n = digits.shape[1]
    carry = jnp.zeros((n,), jnp.int32)
    bs, ms, ss = [], [], []
    for j in range(h):
        d = digits[j] + carry
        bs.append(jnp.take(b_t, d))
        ms.append(jnp.take(m_t, d))
        alpha = jnp.take(a_t, d)
        ss.append(alpha == 1)
        carry = alpha
    return jnp.stack(bs), jnp.stack(ms), jnp.stack(ss)


def ches_recode_device_packed(scalars, c: int, h: int, packed_table):
    """Device MB-radix-q recoding off the packed table (params.packed_digit_table).

    Carry-speculative formulation: the h per-window table lookups are data-
    dependent only through the +1 carry, so BOTH candidate entries (digit and
    digit+1) are fetched in ONE gather of [2, h, n] indices, and the carry
    chain collapses to h boolean selects over the precomputed alpha bits —
    h sequential gathers (the round-2 hot spot, 32.6 ms of the n=2^14 query)
    become one parallel gather plus integer selects.

    Returns (key int32[h, n], m1 int32[h, n] in {0,1,2}, sign bool[h, n])."""
    import jax.numpy as jnp

    digits = qary_digits_device(reduce_mod_r_device(scalars), c, h)
    n = digits.shape[1]
    # digit in [0, q-1]; digit+1 <= q and the table has q+1 entries
    if packed_table.ndim == 2:
        # pairs layout (params.packed_digit_table_pairs): both candidates in
        # ONE row gather instead of two element gathers
        spec = jnp.take(packed_table, digits, axis=0)  # [h, n, 2]
        p0, p1 = spec[..., 0], spec[..., 1]
    else:
        spec = jnp.take(packed_table, jnp.stack([digits, digits + 1]))
        p0, p1 = spec[0], spec[1]
    a0 = (p0 >> 26) & 1
    a1 = (p1 >> 26) & 1
    carry = jnp.zeros((n,), jnp.int32)
    carries = []
    for j in range(h):
        carries.append(carry)
        if j < h - 1:
            carry = jnp.where(carry != 0, a1[j], a0[j])
    p = jnp.where(jnp.stack(carries) != 0, p1, p0)
    return p & 0xFFFFFF, (p >> 24) & 3, ((p >> 26) & 1) == 1


def fold_r_minus_a_device(scalars):
    """Device group-order negation trick (spec: main_p1.cpp:311-356): where the
    scalar's top 64 bits exceed 2^62, replace a with r - a and report the flip
    mask so all digit signs are inverted.

    Returns (folded uint32[8, n], flip bool[n]).
    """
    import jax.numpy as jnp

    r_limbs = [(R_ORDER >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
    hi = np.uint32(1 << 30)
    flip = (scalars[7] > hi) | ((scalars[7] == hi) & (scalars[6] > 0))
    # r - a with an 8-step borrow chain (static loop, vectorized over n)
    out = []
    borrow = jnp.zeros(scalars.shape[1:], jnp.uint32)
    for i in range(8):
        ri = np.uint32(r_limbs[i])
        ai = scalars[i]
        d = ri - ai - borrow
        borrow = ((ri < ai) | ((ri == ai) & (borrow != 0))).astype(jnp.uint32)
        out.append(d)
    folded = jnp.stack(out)
    folded = jnp.where(flip[None, :], folded, scalars)
    return folded, flip


def signed_digits_device(scalars, c: int, h: int):
    """Device signed q/2 recoding (no r-a fold): (absdigit, sign) int32/bool [h, n]."""
    import jax.numpy as jnp

    q = 1 << c
    half = q >> 1
    digits = qary_digits_device(scalars, c, h)
    outs = []
    carry = jnp.zeros(digits.shape[1:], jnp.int32)
    for j in range(h):
        d = digits[j] + carry
        if j < h - 1:
            over = d > half
            carry = over.astype(jnp.int32)
            d = jnp.where(over, d - q, d)
        outs.append(d)
    d = jnp.stack(outs)
    sign = d < 0
    return jnp.abs(d), sign
