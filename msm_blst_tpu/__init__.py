"""msm_blst_tpu — TPU-native BLS12-381 multi-scalar multiplication framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference MSM_blst library (Pippenger MSM with the CHES reduced-bucket-set and
BGMW95 precomputation variants over G1/G2), re-designed for TPU hardware:
limb-vectorized branch-free field kernels on the VPU, sort+segmented-scan
bucket accumulation, log-depth scan-based bucket integration, and
mesh-sharded multi-chip execution with elliptic-curve collectives.
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
