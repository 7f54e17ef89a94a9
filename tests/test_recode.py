"""Scalar recoding + bucket-set machinery vs exact integer identities."""

import numpy as np
import pytest

from msm_blst_tpu.constants import R_ORDER
from msm_blst_tpu.msm import params, recode

# small test config: q = 2^8 keeps tables tiny but structure identical
SMALL = params.make_config(6, c=8, h=32)
REAL = params.CONFIGS[10]


@pytest.mark.parametrize("cfg", [SMALL, REAL], ids=["small_q8", "ref_n10"])
def test_bucket_set_validity(cfg):
    params.check_bucket_set_validity(cfg.q, cfg.ah)
    bs = cfg.bucket_set()
    assert bs[0] == 0 and bs[1] == 1
    assert (np.diff(bs) >= 1).all() and (np.diff(bs) <= params.D_MAX_DIFF).all()
    # b_size of the reference config table must match our construction
    inv = params.bucket_value_to_index(cfg.q, cfg.ah)
    assert (inv[bs] == np.arange(len(bs))).all()


def test_reference_config_b_sizes():
    # spot-check the published B_SIZE values against the sieve (SURVEY.md §2g)
    for key in [8, 9, 10, 11]:
        params.CONFIGS[key].bucket_set()


def test_qary_digits_exact():
    sc = recode.random_scalars(50, seed=1)
    ints = recode.scalars_to_ints(sc)
    for cfg in (SMALL, REAL):
        digits = recode.qary_digits_host(sc, cfg.c, cfg.h)
        for i, x in enumerate(ints):
            assert sum(int(d) << (cfg.c * j) for j, d in enumerate(digits[i])) == x


@pytest.mark.parametrize("cfg", [SMALL, REAL], ids=["small_q8", "ref_n10"])
def test_ches_recode_exact(cfg):
    sc = recode.random_scalars(200, seed=2)
    ints = recode.scalars_to_ints(sc)
    b, m, s = recode.ches_recode_host(sc, cfg.c, cfg.h, cfg.ah)
    bs = set(cfg.bucket_set().tolist())
    assert set(np.unique(b).tolist()) <= bs
    assert set(np.unique(m).tolist()) <= {1, 2, 3}
    for i, x in enumerate(ints):
        val = sum(
            (-1 if s[i, j] else 1) * int(m[i, j]) * int(b[i, j]) << (cfg.c * j)
            for j in range(cfg.h)
        )
        assert val == x, f"scalar {i}"


def test_ches_recode_edge_scalars():
    for cfg in (SMALL, REAL):
        edge = recode.scalars_from_ints(
            [0, 1, R_ORDER - 1, R_ORDER // 2, (1 << 255) - 1]
        )
        b, m, s = recode.ches_recode_host(edge, cfg.c, cfg.h, cfg.ah)
        ints = recode.scalars_to_ints(edge)
        for i, x in enumerate(ints):
            val = sum(
                (-1 if s[i, j] else 1) * int(m[i, j]) * int(b[i, j]) << (cfg.c * j)
                for j in range(cfg.h)
            )
            # scalars >= r are folded mod r first (group semantics)
            assert val == x % R_ORDER


@pytest.mark.parametrize(
    "key", [10, 13], ids=["loose", "tight_r_minus_a"]
)
def test_bgmw_recode_exact(key):
    cfg = params.CONFIGS[key]
    sc = recode.random_scalars(200, seed=3)
    # force some large scalars to exercise the r-a branch
    ints = recode.scalars_to_ints(sc)
    ints[:4] = [R_ORDER - 1, R_ORDER - 2, (1 << 254) + 12345, 1 << 254]
    sc = recode.scalars_from_ints(ints)
    absd, sign = recode.bgmw_recode_host(sc, cfg.c_bgmw, cfg.h_bgmw)
    assert absd.max() <= cfg.q_bgmw // 2
    for i, x in enumerate(ints):
        val = sum(
            (-1 if sign[i, j] else 1) * int(absd[i, j]) << (cfg.c_bgmw * j)
            for j in range(cfg.h_bgmw)
        )
        assert val % R_ORDER == x % R_ORDER, f"scalar {i}"


def test_booth_recode_exact():
    sc = recode.random_scalars(100, seed=4)
    ints = recode.scalars_to_ints(sc)
    for c in (4, 9, 13):
        absd, sign = recode.booth_recode_host(sc, c)
        h = absd.shape[1]
        for i, x in enumerate(ints):
            val = sum(
                (-1 if sign[i, j] else 1) * int(absd[i, j]) << (c * j)
                for j in range(h)
            )
            assert val == x


def test_device_recode_matches_host():
    import jax
    import jax.numpy as jnp

    cfg = SMALL
    sc = recode.random_scalars(64, seed=5)
    b_h, m_h, s_h = recode.ches_recode_host(sc, cfg.c, cfg.h, cfg.ah)
    m_t, b_t, a_t, _ = params.digit_conversion_table(cfg.q, cfg.ah)
    tables = tuple(jnp.asarray(t) for t in (m_t, b_t, a_t))
    f = jax.jit(
        lambda s: recode.ches_recode_device(s, cfg.c, cfg.h, tables)
    )
    b_d, m_d, s_d = f(jnp.asarray(sc))
    assert (np.asarray(b_d).T == b_h).all()
    assert (np.asarray(m_d).T == m_h).all()
    assert (np.asarray(s_d).T == s_h).all()

    a_h2, s_h2 = recode.bgmw_recode_host_nofold(sc, cfg.c, cfg.h)
    g = jax.jit(lambda s: recode.signed_digits_device(s, cfg.c, cfg.h))
    a_d, sg_d = g(jnp.asarray(sc))
    assert (np.asarray(a_d).T == a_h2).all()
    # device sign may be True on zero digits; host zeroes them — compare masked
    nz = a_h2 != 0
    assert (np.asarray(sg_d).T[nz] == s_h2[nz]).all()


def test_packed_digit_table_matches_unpacked():
    """packed_digit_table must reproduce (v2i[b], m-1, alpha) per digit and
    the device packed recode must agree with the unpacked device recode."""
    import jax.numpy as jnp

    from msm_blst_tpu.msm import params as P
    from msm_blst_tpu.msm import recode

    q, ah = 256, 7
    m_t, b_t, a_t, _ = P.digit_conversion_table(q, ah)
    v2i = P.bucket_value_to_index(q, ah)
    packed = P.packed_digit_table(q, ah)
    assert ((packed & 0xFFFFFF) == v2i[b_t]).all()
    assert (((packed >> 24) & 3) == np.where(m_t > 0, m_t - 1, 0)).all()
    assert (((packed >> 26) & 1) == a_t).all()

    sc = recode.random_scalars(16, seed=5)
    c, h = 8, 32
    dev = jnp.asarray(sc)
    tables = tuple(jnp.asarray(t) for t in (m_t, b_t, a_t))
    b, m, s = recode.ches_recode_device(dev, c, h, tables)
    k2, m1, s2 = recode.ches_recode_device_packed(dev, c, h, jnp.asarray(packed))
    assert (np.asarray(k2) == v2i[np.asarray(b)]).all()
    assert (np.asarray(m1) == np.asarray(m) - 1).all()
    assert (np.asarray(s2) == np.asarray(s)).all()


def test_qary_digits_past_bit_256():
    """c*h may overshoot the 256-bit scalar (e.g. c=8, h=33): windows past
    bit 256 must be ZERO on every backend. JAX clamps out-of-bounds static
    indices, so the device path used to fabricate garbage digits from the
    top word (round-5 window-padding tests exposed this)."""
    import jax.numpy as jnp

    from msm_blst_tpu.msm import recode

    ints = [(1 << 255) - 19, 12345, 0]
    sc = recode.scalars_from_ints(ints)
    dh = recode.qary_digits_host(sc, 8, 33)                         # (n, h)
    dd = np.asarray(recode.qary_digits_device(jnp.asarray(sc), 8, 33))
    for i, v in enumerate(ints):
        expect = [(v >> (8 * j)) & 0xFF for j in range(33)]
        assert list(dh[i]) == expect, ("host", i)
        assert list(dd[:, i]) == expect, ("device", i)
