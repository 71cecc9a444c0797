"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- ``brute_force_topk``: exact cosine top-k.  The query side is small
  (a handful of probe vectors) and is BROADCAST, so the big vector table
  is scanned once, never shuffled; ranking is a per-query-key window.
  The dot product is a built-in fold (``aggregate`` over ``zip_with``)
  — JVM-side, no Python.
- ``lsh_bucketed_topk``: the scale path.  Sign-random-projection LSH
  (deterministic hyperplanes from a fixed seed) buckets vectors; each
  query only scores its own bucket, turning O(n·q) into O(n·q/2^planes)
  at some recall cost.  Bucket id is computed with the same broadcast
  hyperplane constants on both sides.

At real 100-TB scale the vector table would additionally be written
bucketed-by(bucket) so the probe join is shuffle-free on the table side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def cosine_expr(a: str, b: str) -> Column:
    """Exact cosine similarity of two array<double> columns, as a single
    codegen'd expression (sequential fold — deterministic order)."""
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))"
    nb = f"sqrt(aggregate({b}, 0D, (acc, v) -> acc + v * v))"
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim, rank), self-matches
    excluded; ties broken by neighbor id (deterministic).
    """
    v = vectors.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("nv")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            F.round(cosine_expr("qv", "nv"), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )


def _hyperplanes(dim: int, planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(planes, dim).round(6).tolist()


def bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id (0..2^planes-1) as a built-in
    expression: sign bit per hyperplane, packed into an int."""
    bits = []
    for i, h in enumerate(planes):
        arr = "array(" + ",".join(f"{x}D" for x in h) + ")"
        dot = f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    With p hyperplanes the candidate set shrinks ~2^p-fold; recall is
    tunable via p (fewer planes = bigger buckets = higher recall).
    """
    hp = _hyperplanes(dim, planes, seed)
    v = vectors.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("nv")
    ).withColumn("bucket", bucket_expr("nv", hp))
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("bucket", bucket_expr("qv", hp))
    scored = (
        v.join(F.broadcast(q), on="bucket")
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", F.round(cosine_expr("qv", "nv"), 4).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )
