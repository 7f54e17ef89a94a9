"""Pure-Python ground-truth implementation (the test oracle).

Slow, obviously-correct big-int implementations of BLS12-381 field and curve
arithmetic plus naive MSM. Every TPU kernel in this repo is validated against
this module. Mirrors the *behavior* specified by the reference library
(/root/reference/src/ec_ops.h, src/e1.c, src/e2.c) — not its implementation.
"""

from .field import Fp, Fp2, Fr  # noqa: F401
from .curve import (  # noqa: F401
    CurveRef,
    G1_REF,
    G2_REF,
    JacobianPoint,
    XyzzPoint,
)
