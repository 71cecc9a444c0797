from ivm_extension_spark.operators.asof import asof_join
from ivm_extension_spark.operators.merge import (  # noqa: F401
    apply_delta_to_table,
    finalize,
)
# NOTE: the bare name ``merge`` must stay bound to the SUBMODULE
# (engine.py does ``from ...operators import merge as merge_ops``) — the
# merge function is reachable as ``operators.merge.merge``.
from ivm_extension_spark.operators import merge  # noqa: F401
from ivm_extension_spark.operators.ineqjoin import (
    ineq_full_join,
    ineq_full_join_delta,
    ineq_join,
    ineq_join_delta,
    ineq_anti_join,
    ineq_anti_join_delta,
    ineq_left_join,
    ineq_left_join_delta,
    ineq_semi_join,
    ineq_semi_join_delta,
)
from ivm_extension_spark.operators.rangejoin import range_join
from ivm_extension_spark.operators.rewrite import (
    MULT_COL,
    IVMError,
    compute_view,
    delta_plan,
)
from ivm_extension_spark.operators.skew import salted_join, two_phase_agg
from ivm_extension_spark.operators.timeseries import bucket_resample, gap_fill, time_bucket
from ivm_extension_spark.operators.thetajoin import (
    theta_anti_join,
    theta_anti_join_delta,
    theta_full_join,
    theta_full_join_delta,
    theta_join,
    theta_join_delta,
    theta_left_join,
    theta_left_join_delta,
    theta_semi_join,
    theta_semi_join_delta,
)

__all__ = [
    "MULT_COL",
    "IVMError",
    "apply_delta_to_table",
    "asof_join",
    "bucket_resample",
    "compute_view",
    "delta_plan",
    "finalize",
    "gap_fill",
    "ineq_full_join",
    "ineq_full_join_delta",
    "ineq_join",
    "ineq_join_delta",
    "ineq_anti_join",
    "ineq_anti_join_delta",
    "ineq_left_join",
    "ineq_left_join_delta",
    "ineq_semi_join",
    "ineq_semi_join_delta",
    "range_join",
    "salted_join",
    "theta_anti_join",
    "theta_anti_join_delta",
    "theta_full_join",
    "theta_full_join_delta",
    "theta_join",
    "theta_join_delta",
    "theta_left_join",
    "theta_left_join_delta",
    "theta_semi_join",
    "theta_semi_join_delta",
    "time_bucket",
    "two_phase_agg",
]
