"""Byte/word conversion layer (utils/exports.py) round-trips and checks."""

import pytest

from msm_blst_tpu.constants import P, R_ORDER
from msm_blst_tpu.utils import exports as ex


class TestScalar:
    def test_bendian_roundtrip(self):
        x = 0x123456789ABCDEF0 << 64 | 0xDEADBEEF
        assert ex.scalar_from_bendian(ex.scalar_to_bendian(x)) == x
        assert ex.scalar_from_lendian(ex.scalar_to_lendian(x)) == x

    def test_word_roundtrips(self):
        x = R_ORDER - 12345
        assert ex.scalar_from_uint32(ex.scalar_to_uint32(x)) == x
        assert ex.scalar_from_uint64(ex.scalar_to_uint64(x)) == x

    def test_endianness_is_consistent(self):
        x = 1
        assert ex.scalar_to_bendian(x)[-1] == 1 and ex.scalar_to_lendian(x)[0] == 1

    def test_checks(self):
        assert ex.scalar_fr_check(0) and not ex.sk_check(0)
        assert ex.sk_check(R_ORDER - 1)
        assert not ex.scalar_fr_check(R_ORDER)
        assert ex.fr_from_scalar(R_ORDER + 5) == 5

    def test_bad_lengths(self):
        with pytest.raises(ValueError):
            ex.scalar_from_bendian(b"\x00" * 31)
        with pytest.raises(ValueError):
            ex.fp_from_bendian(b"\x00" * 47)


class TestFp:
    def test_roundtrip_and_canonical(self):
        x = P - 1
        assert ex.fp_from_bendian(ex.fp_to_bendian(x)) == x
        assert ex.fp_from_lendian(ex.fp_to_lendian(x)) == x
        with pytest.raises(ValueError):
            ex.fp_from_bendian(P.to_bytes(48, "big"))

    def test_device_batch(self):
        vals = [0, 1, P - 1, 12345678901234567890 % P]
        dev = ex.fp_batch_to_device(vals)
        assert ex.fp_batch_from_device(dev) == vals


class TestBatchScalars:
    def test_bendian_batch_roundtrip(self):
        xs = [0, 1, R_ORDER - 1, 2**255 - 19]
        bs = [ex.scalar_to_bendian(x) for x in xs]
        arr = ex.scalars_from_bendian_batch(bs)
        assert ex.scalars_to_bendian_batch(arr) == bs
