"""Vectorized, branch-free elliptic-curve point arithmetic for G1/G2.

Point batches are NamedTuples of field-element arrays (limbs-first,
batch-last), so every point op is a pure pytree->pytree function that works
under jit/scan/shard_map and is generic over Fp (G1) and Fp2 (G2) — the
TPU-native analog of the reference's macro instantiation over both fields
(/root/reference/src/multi_scalar.c:795-807).
"""

from .ops import AffinePoint, JacPoint, XyzzPoint, CurveOps  # noqa: F401
from .curve import G1, G2  # noqa: F401
from .mult import (  # noqa: F401
    point_mult,
    point_mult_ints,
    in_group_device,
    ladder_mult,
    msm_wbits,
    points_add,
)
