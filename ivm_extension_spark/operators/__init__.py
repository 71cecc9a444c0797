from ivm_extension_spark.operators.asof import asof_join
from ivm_extension_spark.operators.merge import apply_delta_to_table, finalize, merge
from ivm_extension_spark.operators.rangejoin import range_join
from ivm_extension_spark.operators.rewrite import (
    MULT_COL,
    IVMError,
    compute_view,
    delta_plan,
)
from ivm_extension_spark.operators.skew import salted_join, two_phase_agg

__all__ = [
    "MULT_COL",
    "IVMError",
    "apply_delta_to_table",
    "asof_join",
    "compute_view",
    "delta_plan",
    "finalize",
    "merge",
    "range_join",
    "salted_join",
    "two_phase_agg",
]
