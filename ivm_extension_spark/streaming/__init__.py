from ivm_extension_spark.streaming.continuous import (
    StreamingViewMaintainer,
    windowed_aggregate,
)
from ivm_extension_spark.streaming.joins import interval_join
from ivm_extension_spark.streaming.sketchstream import run_sketch_stream
from ivm_extension_spark.streaming.stateful import sessionize, streaming_dedup

__all__ = [
    "StreamingViewMaintainer",
    "windowed_aggregate",
    "interval_join",
    "run_sketch_stream",
    "sessionize",
    "streaming_dedup",
]
