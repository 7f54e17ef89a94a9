"""The blst-name-parity facade must import and its entries must be callable.

(The facade was silently unimportable through round 2: protocol/__init__
re-exports functions named `keygen` and `pairing` that shadow the same-named
submodules, so `from .protocol import keygen as kg` bound the function and
`kg.keygen` raised at import time. No test imported the module.)
"""


def test_api_imports_and_basic_entries():
    import msm_blst_tpu.api as api

    assert callable(api.keygen)
    assert callable(api.p1_add_or_double)
    assert callable(api.p1s_mult_pippenger) or hasattr(api, "p1s_mult_pippenger")
    sk = api.keygen(b"\x13" * 32)
    assert isinstance(sk, int) and sk > 0


def test_api_single_point_roundtrip():
    import msm_blst_tpu.api as api

    g = api.p1_affine_generator()
    j = api.p1_from_affine(g)
    d = api.p1_add_or_double(j, j)
    a = api.p1_to_affine(d)
    from msm_blst_tpu.refimpl import G1_REF

    ref = G1_REF.to_affine(G1_REF.jac_double(G1_REF.generator_jac()))
    assert a == (ref[0].v, ref[1].v)
