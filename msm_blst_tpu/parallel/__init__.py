"""Multi-chip execution: mesh-sharded MSM with elliptic-curve collectives."""

from .sharded import (  # noqa: F401
    breakdown,
    ec_allreduce_xyzz,
    make_2d_mesh,
    make_points_mesh,
    make_windows_mesh,
    sharded_msm_ches,
    sharded_msm_ches_2d,
    sharded_msm_ches_windows,
    sharded_msm_bgmw,
    sharded_msm_bgmw_windows,
    shard_plan_tables,
    shard_plan_tables_jmajor,
)
