from ivm_extension_spark.functions import (
    dedup,
    hll,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = ["dedup", "hll", "multimodal", "sampling", "similarity", "text"]
