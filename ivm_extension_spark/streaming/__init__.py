from ivm_extension_spark.streaming.continuous import (
    StreamingViewMaintainer,
    windowed_aggregate,
)

__all__ = ["StreamingViewMaintainer", "windowed_aggregate"]
