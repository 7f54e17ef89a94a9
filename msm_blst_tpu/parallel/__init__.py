"""Multi-chip execution: mesh-sharded MSM with elliptic-curve collectives."""

from .sharded import (  # noqa: F401
    ec_allreduce_xyzz,
    make_points_mesh,
    sharded_msm_ches,
    sharded_msm_bgmw,
    shard_plan_tables,
)
