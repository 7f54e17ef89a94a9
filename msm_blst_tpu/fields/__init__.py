"""TPU limb-vectorized finite-field arithmetic.

Layout convention for every device array in this package: **limbs-first,
batch-last** — an Fp batch is `uint32[N_LIMBS, *batch]` so the batch axis rides
the TPU's 128-wide lane dimension and per-limb indexing is static. Fp2 stacks
components in front: `uint32[2, N_LIMBS, *batch]`.
"""

from .limb import LimbField, FP, FR  # noqa: F401
from .fp2 import Fp2Ops, FP2  # noqa: F401
