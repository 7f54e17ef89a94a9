"""Protocol layer: pairing, hash-to-curve, keygen, BLS signatures, GLV/GLS.

Capability parity with the reference's protocol stack (SURVEY.md §2f):
hash_to_field/map_to_g1/map_to_g2/keygen/aggregate/pairing plus the
endomorphism machinery from e1.c/e2.c. The MSM engine (msm/) is the TPU
performance path; this layer completes the blst_* API surface.
"""

from .tower import Fp6, Fp12  # noqa: F401
from .pairing import (  # noqa: F401
    miller_loop,
    miller_loop_n,
    final_exp,
    pairing,
    multi_pairing,
    pairing_check,
)
from .hash_to_curve import (  # noqa: F401
    expand_message_xmd,
    hash_to_field_fp,
    hash_to_field_fp2,
    hash_to_g1,
    hash_to_g2,
    encode_to_g1,
    encode_to_g2,
    psi,
)
from .keygen import (  # noqa: F401
    keygen,
    keygen_v3,
    derive_master_eip2333,
    derive_child_eip2333,
    derive_path_eip2333,
)
from .glv import (  # noqa: F401
    BETA,
    LAMBDA,
    glv_decompose,
    gls_decompose,
    mult_glv_g1,
    mult_gls_g2,
    in_g1,
    in_g2,
    phi,
)
from .signatures import MinPk, MinSig, PairingContext  # noqa: F401
