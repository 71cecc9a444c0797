from ivm_extension_spark.functions import (
    cms,
    dedup,
    hll,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = ["cms", "dedup", "hll", "multimodal", "sampling", "similarity", "text"]
