from ivm_extension_spark.functions import (
    cms,
    dedup,
    hll,
    multimodal,
    pq,
    quantiles,
    sampling,
    similarity,
    text,
    tfidf,
)

__all__ = [
    "cms",
    "dedup",
    "hll",
    "multimodal",
    "pq",
    "quantiles",
    "sampling",
    "similarity",
    "text",
    "tfidf",
]
