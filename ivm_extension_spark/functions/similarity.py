"""Similarity search over embedding columns (array<float>).

Three paths, per the standard ANN playbook:

- ``brute_force_topk``: exact cosine top-k.  The query side is small
  (a handful of probe vectors) and is BROADCAST, so the big vector table
  is scanned once, never shuffled; ranking is a per-query-key window.
  The dot product is a built-in fold (``aggregate`` over ``zip_with``)
  — JVM-side, no Python.
- ``lsh_bucketed_topk``: sign-random-projection LSH (deterministic
  hyperplanes from a fixed seed) buckets vectors; each query only
  scores its own bucket, turning O(n·q) into O(n·q/2^planes) at some
  recall cost.  Bucket id is computed with the same broadcast
  hyperplane constants on both sides.
- ``ivf_topk``: IVF (inverted-file) — a k-means coarse quantizer
  trained once on a sample partitions vectors into cells; each query
  probes its ``n_probe`` nearest cells.  Data-adaptive (unlike LSH's
  oblivious hyperplanes), the classical FAISS-style scale path.

At real 100-TB scale the vector table would additionally be written
bucketed-by(bucket/cell) so the probe join is shuffle-free on the table
side, and the centroid set (tiny: k·d doubles) stays a broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T


def cosine_expr(a: str, b: str) -> Column:
    """Exact cosine similarity of two array<double> columns, as a single
    codegen'd expression (sequential fold — deterministic order)."""
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))"
    nb = f"sqrt(aggregate({b}, 0D, (acc, v) -> acc + v * v))"
    # zero-norm guard: 0/0 is NaN, and Spark orders NaN ABOVE every double,
    # so an unguarded zero vector would rank as everyone's best neighbor —
    # define cos(0⃗, ·) = 0 instead (same convention as embedding_near_dups)
    denom = f"(({na}) * ({nb}))"
    return F.expr(f"CASE WHEN {denom} = 0D THEN 0D ELSE ({dot}) / {denom} END")


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
    # normalize each side ONCE (norm is per-row, not per-pair): cosine of
    # unit vectors is a plain dot product, so the per-pair work drops from
    # three array folds to one — at n·q pairs that is the dominant cost
    def _unit(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        # norm in its own projection so the division lambda references a
        # computed column (one fold per row, not one per element)
        return (
            df.select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).cast("array<double>").alias("__v"),
            )
            .withColumn(
                "__n", F.expr("sqrt(aggregate(__v, 0D, (acc, v) -> acc + v * v))")
            )
            # zero-norm guard: leave a zero vector as-is (unit "norm" 1) so
            # its dot with anything is 0, not NaN (NaN sorts above every
            # double and would rank the zero vector as everyone's top hit)
            .withColumn(
                "__n", F.when(F.col("__n") == 0.0, F.lit(1.0)).otherwise(F.col("__n"))
            )
            .select(
                out_id, F.expr("transform(__v, x -> x / __n)").alias(out_vec)
            )
        )

    v = _unit(vectors, "nid", "nv")
    q = _unit(queries, "qid", "qv")
    dot = F.expr(
        "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            (F.round(dot * F.lit(10000.0)) / F.lit(10000.0)).alias("cos_sim"),
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


def ivf_train(
    vectors: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Train the IVF coarse quantizer: spherical k-means (Lloyd's on
    unit vectors, cosine assignment) over a bounded driver-side sample.

    The sample is the only driver-side data in the IVF path and is
    capped at ``sample`` rows regardless of table size — training cost
    does not grow with the corpus.  Returns (n_centroids, dim) unit
    centroids, deterministic for a fixed seed.
    """
    rows = (
        vectors.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(sample)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    k = min(n_centroids, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    return C


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    n_probe: int = 1,
    out: str = "cells",
) -> DataFrame:
    """Append ``out``: the ids of the ``n_probe`` nearest centroids
    (cosine) as array<int>.  One Arrow-batched matmul per batch; the
    centroid matrix rides along in the UDF closure (broadcast once per
    executor)."""
    C = np.asarray(centroids, dtype=np.float64)
    np_ = min(n_probe, len(C))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells_udf(vs: pd.Series) -> pd.Series:
        M = np.array(list(vs), dtype=np.float64)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        sims = (M / norms[:, None]) @ C.T  # (batch, k)
        top = np.argsort(-sims, kind="stable", axis=1)[:, :np_]
        return pd.Series([r.astype(np.int32).tolist() for r in top])

    return df.withColumn(out, cells_udf(F.col(vec_col).cast("array<double>")))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k via IVF: vectors live in their single nearest
    cell; each query scores only its ``n_probe`` nearest cells.

    Candidate volume is ~n·(n_probe/n_centroids) per query.  With
    ``n_probe = n_centroids`` this degenerates to exact brute force
    (useful as a recall ceiling in tests).
    """
    C = ivf_train(vectors, vec_col, n_centroids, seed=seed)
    v = ivf_assign(
        vectors.select(
            F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("nv")
        ),
        "nv",
        C,
        n_probe=1,
    ).select("nid", "nv", F.element_at("cells", 1).alias("cell"))
    q = ivf_assign(
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
        ),
        "qv",
        C,
        n_probe=n_probe,
    ).select("qid", "qv", F.explode("cells").alias("cell"))
    scored = (
        v.join(F.broadcast(q), on="cell")
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", (F.round(cosine_expr("qv", "nv") * F.lit(10000.0)) / F.lit(10000.0)).alias("cos_sim"))
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
        .select("qid", "nid", (F.round(cosine_expr("qv", "nv") * F.lit(10000.0)) / F.lit(10000.0)).alias("cos_sim"))
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


def incremental_topk_update(
    topk_state: DataFrame,
    new_vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Advance a maintained exact top-k similarity result with a batch of
    NEW vectors — the IVM treatment of similarity search (cf. the
    incremental top-k framework of EDBT 2020: re-rank the union of the
    current result and the delta's candidates instead of rescanning).

    ``topk_state`` is a previous (query_id, neighbor_id, cos_sim, rank)
    result for the SAME queries and k; only the new batch is scored
    (O(|Δ|·q) instead of O(n·q)), its candidates union with the state,
    and a per-query re-rank keeps the best k.  Inserts only: a deletion
    of a row currently in some top-k needs the runner-up, which the
    k-row state cannot answer — that is the MIN/MAX-under-deletes
    problem again; rebuild with brute_force_topk (or keep k' > k slack)
    when vectors leave the corpus.

    Scale shape: the delta is the only side scored against the broadcast
    queries; the state is O(k·q) rows and the re-rank shuffles only
    state + new candidates, never the corpus.
    """
    cand = brute_force_topk(new_vectors, queries, id_col, vec_col, k)
    merged = topk_state.select(
        "query_id", "neighbor_id", "cos_sim"
    ).unionByName(cand.select("query_id", "neighbor_id", "cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def centroid_state(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label maintained-centroid STATE: (label, n_vectors, sumvec).

    Vector means are LINEAR — per-dimension sums plus a count — so the
    state is exactly maintainable under inserts AND deletes with the
    same signed-weight algebra as SUM/COUNT (:func:`centroid_update`);
    the mean is derived on read (:func:`centroid_read`), so no division
    error ever enters the state.  Computed via posexplode → one
    (label, dim) aggregation → re-assembly in dimension order: all
    built-in expressions, map-side combinable, one shuffle of
    O(labels × dim) rows.
    """
    pos = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    sums = pos.groupBy("label", "dim").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return _assemble_centroid_state(sums)


def _assemble_centroid_state(sums: DataFrame) -> DataFrame:
    return (
        sums.groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vectors"),
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("s")))
            ).alias("__ds"),
        )
        .select(
            "label",
            "n_vectors",
            F.expr("transform(__ds, p -> p.s)").alias("sumvec"),
        )
    )


def centroid_read(state: DataFrame) -> DataFrame:
    """(label, n_vectors, centroid): the mean vector, derived on read."""
    return state.select(
        "label",
        "n_vectors",
        F.expr("transform(sumvec, s -> s / n_vectors)").alias("centroid"),
    )


def label_centroids(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label count and centroid (mean vector) of an embedding column
    — :func:`centroid_state` composed with :func:`centroid_read`."""
    return centroid_read(centroid_state(vectors, label_col, vec_col))


def centroid_update(
    state: DataFrame,
    delta: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    mult_col: str = "_duckdb_ivm_multiplicity",
) -> DataFrame:
    """Advance the (label, n_vectors, sumvec) state with a delta batch of
    vectors tagged with the engine's boolean multiplicity (insert /
    delete) — the IVM treatment of embedding-space statistics.  Only the
    delta and the O(labels) state are touched, never the corpus; labels
    whose count reaches zero disappear.  Sums combine with signed
    weights, so multi-batch maintenance accumulates no division error
    (the mean is derived on read)."""
    sign = F.when(F.col(mult_col), F.lit(1)).otherwise(F.lit(-1))
    dpos = delta.select(
        F.col(label_col).alias("label"),
        sign.alias("__w"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    dsums = dpos.groupBy("label", "dim").agg(
        F.sum(F.col("x") * F.col("__w")).alias("s"),
        F.sum("__w").alias("n"),
    )
    spos = state.select(
        "label",
        F.col("n_vectors").alias("n"),
        F.posexplode(F.col("sumvec")).alias("dim", "s"),
    ).select("label", "dim", "s", "n")
    merged = (
        spos.unionByName(dsums.select("label", "dim", "s", "n"))
        .groupBy("label", "dim")
        .agg(F.sum("s").alias("s"), F.sum("n").cast("long").alias("n"))
        .filter(F.col("n") > 0)
    )
    return _assemble_centroid_state(merged)
