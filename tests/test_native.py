"""Native C++ host runtime vs the numpy oracles (bit-exact equivalence).

The native library (native/libmsm_host.so, built by make -C native) provides
the recoding carry chains and table construction that the reference keeps in
native code (multi_scalar.c:748-775, auxiliaryfunc.h:257-288). These tests
prove the native and numpy paths agree element-for-element.
"""

import numpy as np
import pytest

from msm_blst_tpu import native
from msm_blst_tpu.msm import params, recode

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

N = 2048


@pytest.fixture(scope="module")
def scalars():
    return recode.random_scalars(N, seed=0xC0FFEE)


class TestQary:
    @pytest.mark.parametrize("c,h", [(8, 32), (13, 20), (16, 16), (22, 12)])
    def test_matches_numpy(self, scalars, c, h):
        want = recode.qary_digits_host(scalars, c, h)  # [n, h]
        got = native.qary_digits(scalars, c, h)  # [h, n]
        assert (got == want.T).all()

    def test_digits_recompose(self, scalars):
        c, h = 13, 20
        d = native.qary_digits(scalars, c, h)
        ints = recode.scalars_to_ints(scalars)
        for j in (0, 7, N - 1):
            assert sum(int(d[k, j]) << (c * k) for k in range(h)) == ints[j]


class TestChesRecode:
    @pytest.mark.parametrize("key", [8, 10, 13])
    def test_matches_numpy(self, scalars, key):
        cfg = params.CONFIGS[key]
        b_w, m_w, s_w = recode.ches_recode_host(
            scalars, cfg.c, cfg.h, cfg.ah, use_native=False
        )
        b_g, m_g, s_g = recode.ches_recode_host(
            scalars, cfg.c, cfg.h, cfg.ah, use_native=True
        )
        assert (b_g == b_w).all() and (m_g == m_w).all() and (s_g == s_w).all()

    def test_recomposition_identity(self, scalars):
        """sum_j (+-m*b) q^j must reproduce the scalar (the CHES invariant)."""
        cfg = params.CONFIGS[10]
        b, m, s = recode.ches_recode_host(scalars, cfg.c, cfg.h, cfg.ah)
        ints = recode.scalars_to_ints(scalars)
        q = cfg.q
        for j in (0, 1, N // 2, N - 1):
            val2 = sum(
                (-1 if s[j, k] else 1) * int(m[j, k]) * int(b[j, k]) * q**k
                for k in range(cfg.h)
            )
            assert val2 == ints[j]


class TestBgmwRecode:
    @pytest.mark.parametrize("key", [10, 13, 16])
    def test_matches_numpy(self, scalars, key):
        cfg = params.CONFIGS[key]
        c, h = cfg.c_bgmw, cfg.h_bgmw
        a_w, s_w = recode.bgmw_recode_host(scalars, c, h, use_native=False)
        a_g, s_g = recode.bgmw_recode_host(scalars, c, h, use_native=True)
        assert (a_g == a_w).all() and (s_g == s_w).all()

    def test_recomposition_identity(self, scalars):
        from msm_blst_tpu.constants import R_ORDER

        cfg = params.CONFIGS[13]
        c, h = cfg.c_bgmw, cfg.h_bgmw
        absd, sign = recode.bgmw_recode_host(scalars, c, h)
        ints = recode.scalars_to_ints(scalars)
        q = 1 << c
        for j in (0, 3, N - 1):
            val = sum(
                (-1 if sign[j, k] else 1) * int(absd[j, k]) * q**k
                for k in range(h)
            )
            assert val % R_ORDER == ints[j] % R_ORDER


class TestTables:
    @pytest.mark.parametrize("key", [8, 10, 13, 16])
    def test_bucket_set_matches(self, key, monkeypatch):
        cfg = params.CONFIGS[key]
        got = native.construct_bucket_set(cfg.q, cfg.ah)
        assert len(got) == cfg.b_size
        # numpy sieve (bypass the native fast path inside construct_bucket_set)
        params.construct_bucket_set.cache_clear()
        monkeypatch.setattr(native, "available", lambda: False)
        want = cfg.bucket_set()
        params.construct_bucket_set.cache_clear()
        assert (got == want).all()

    def test_digit_table_matches(self):
        cfg = params.CONFIGS[10]
        bs = native.construct_bucket_set(cfg.q, cfg.ah)
        m_g, b_g, a_g, missing = native.digit_conversion_table(cfg.q, bs)
        assert missing == 0
        m_w, b_w, a_w, written = params.digit_conversion_table(cfg.q, cfg.ah)
        assert written.all()
        assert (m_g == m_w).all() and (b_g == b_w).all() and (a_g == a_w).all()
