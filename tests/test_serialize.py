"""ZCash wire-format serialization (spec: e1.c:139-359, e2.c:176-419)."""

import pytest

from msm_blst_tpu.constants import G1_X, G1_Y, G2_X, G2_Y, P, R_ORDER
from msm_blst_tpu.curves import serialize as S
from msm_blst_tpu.refimpl import G1_REF, G2_REF

# canonical public test vectors: the generator encodings
G1_GEN_COMPRESSED = (
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)
G2_GEN_COMPRESSED_PREFIX = "93e02b6052719f607dacd3a088274f65"


def test_g1_known_vector():
    assert S.g1_compress((G1_X, G1_Y)).hex() == G1_GEN_COMPRESSED


def test_g2_known_prefix():
    assert S.g2_compress((G2_X, G2_Y)).hex().startswith(G2_GEN_COMPRESSED_PREFIX)


def test_g1_roundtrips():
    import random

    rnd = random.Random(5)
    for _ in range(8):
        pt = G1_REF.to_affine(
            G1_REF.jac_mult(rnd.randrange(1, R_ORDER), G1_REF.generator_jac())
        )
        p = (pt[0].v, pt[1].v)
        assert S.g1_uncompress(S.g1_compress(p)) == p
        assert S.g1_deserialize(S.g1_serialize(p)) == p
    assert S.g1_uncompress(S.g1_compress((0, 0))) == (0, 0)
    assert S.g1_deserialize(S.g1_serialize((0, 0))) == (0, 0)


def test_g2_roundtrips():
    import random

    rnd = random.Random(6)
    for _ in range(4):
        pt = G2_REF.to_affine(
            G2_REF.jac_mult(rnd.randrange(1, R_ORDER), G2_REF.generator_jac())
        )
        p = ((pt[0].c0.v, pt[0].c1.v), (pt[1].c0.v, pt[1].c1.v))
        assert S.g2_uncompress(S.g2_compress(p)) == p
        assert S.g2_deserialize(S.g2_serialize(p)) == p
    inf = ((0, 0), (0, 0))
    assert S.g2_uncompress(S.g2_compress(inf)) == inf


def test_g1_rejects_bad_input():
    with pytest.raises(ValueError):
        S.g1_uncompress(bytes(48))  # compressed bit unset
    with pytest.raises(ValueError):
        S.g1_uncompress(bytes([0x80]) + b"\xff" * 47)  # x >= p
    bad_inf = bytearray(S.g1_compress((0, 0)))
    bad_inf[10] = 1
    with pytest.raises(ValueError):
        S.g1_uncompress(bytes(bad_inf))
    # x not on curve: x=1 -> 5 is a QR? construct x with no sqrt
    x = 5
    while True:
        yy = (pow(x, 3, P) + 4) % P
        if S._sqrt_fp(yy) is None:
            break
        x += 1
    enc = bytearray(x.to_bytes(48, "big"))
    enc[0] |= 0x80
    with pytest.raises(ValueError):
        S.g1_uncompress(bytes(enc))
