"""MSM engines: CHES 'nh + 0.21q', BGMW95 q/2, stock Pippenger, + precompute."""

from . import cache, params, recode  # noqa: F401
from .engine import (  # noqa: F401
    MsmPlan,
    msm_bgmw_device,
    msm_ches_device,
    msm_ches_host_recode,
    msm_stock_pippenger,
    pippenger_window_size,
)
from .precompute import (  # noqa: F401
    build_plan,
    build_ches_table,
    build_bgmw_table,
    fixed_point_list,
    fixed_base_mult,
)
