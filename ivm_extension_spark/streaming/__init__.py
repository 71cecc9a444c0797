from ivm_extension_spark.streaming.continuous import (
    StreamingViewMaintainer,
    windowed_aggregate,
)
from ivm_extension_spark.streaming.stateful import sessionize, streaming_dedup

__all__ = [
    "StreamingViewMaintainer",
    "windowed_aggregate",
    "sessionize",
    "streaming_dedup",
]
