"""Regression tests for the round-2 functions/sources/sqlfront review:

- WHERE-clause conjunct splitting must preserve semantics for OR
  precedence, BETWEEN ... AND, and CASE WHEN ... AND ... (pre-fix the
  parser split at every depth-0 AND and silently changed `a OR b AND c`
  to `(a OR b) AND c`).
- subword_token_count must exclude whitespace from punctuation runs
  (pre-fix the SQL string literal unescaped \\s to plain `s`).
- zero embedding vectors must score cosine 0, never NaN (NaN sorts
  above every double and would rank as everyone's top neighbor).
- frame_sample must not emit a trailing empty frame on exact-multiple
  payloads, nor any frame for empty payloads.
- embedding_near_dups on an empty corpus returns zero pairs.
- the word "union" inside a string literal must not be mistaken for a
  bare UNION set operation.
- read_parquet handles directory-layout parquet with TIMESTAMP(NANOS)
  (pre-fix only single files were schema-probed).
"""

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark.plans.sqlfront import _split_conjuncts, parse_view_sql
from ivm_extension_spark.operators.rewrite import compute_view

from tests.conftest import rows


# ---------------------------------------------------------------- sqlfront

def test_split_conjuncts_or_precedence():
    # AND binds tighter than OR → the whole clause is ONE disjunction
    assert _split_conjuncts("a = 1 OR b = 2 AND c = 3") == [
        "a = 1 OR b = 2 AND c = 3"
    ]


def test_split_conjuncts_between():
    got = _split_conjuncts(
        "d BETWEEN DATE '1994-01-01' AND DATE '1995-01-01' AND x > 0"
    )
    assert got == ["d BETWEEN DATE '1994-01-01' AND DATE '1995-01-01'", "x > 0"]


def test_split_conjuncts_case_when():
    got = _split_conjuncts("CASE WHEN a AND b THEN 1 ELSE 0 END = 1 AND c = 2")
    assert got == ["CASE WHEN a AND b THEN 1 ELSE 0 END = 1", "c = 2"]


def test_split_conjuncts_plain():
    assert _split_conjuncts("a = 1 AND b = 2 AND c = 3") == [
        "a = 1",
        "b = 2",
        "c = 3",
    ]


def test_where_or_precedence_view_matches_spark_sql(spark):
    df = spark.createDataFrame(
        [(1, 1, 9), (2, 2, 3), (3, 7, 3), (4, 7, 9)], "a int, b int, c int"
    )
    sql = "SELECT a FROM t WHERE a = 1 OR b = 2 AND c = 3"
    vdef = parse_view_sql("v", sql)
    got = rows(compute_view(vdef, lambda name: df))
    df.createOrReplaceTempView("t")
    want = rows(spark.sql(sql))
    assert got == want == [(1,), (2,)]


def test_where_between_view(spark):
    df = spark.createDataFrame([(1, 5), (2, 40), (3, 100)], "a int, b int")
    vdef = parse_view_sql("v", "SELECT a FROM t WHERE b BETWEEN 10 AND 50 AND a > 0")
    assert rows(compute_view(vdef, lambda name: df)) == [(2,)]


def test_union_word_in_string_literal_ok():
    from ivm_extension_spark.plans.sqlfront import split_union_all

    parts = split_union_all("SELECT a FROM t WHERE c = 'union square'")
    assert len(parts) == 1
    with pytest.raises(NotImplementedError, match="bare UNION"):
        split_union_all("SELECT a FROM t UNION SELECT a FROM u")


# ---------------------------------------------------------------- text

def test_subword_token_count_whitespace_runs(spark):
    from ivm_extension_spark.functions import text as tx

    df = spark.createDataFrame(
        [("hello  world",), ("a, b!! c's 42",)], "text string"
    )
    got = [r[0] for r in df.select(tx.subword_token_count("text")).collect()]
    # 'hello  world' is 2 tokens — the double space must NOT become a token
    assert got == [2, 7]


# ---------------------------------------------------------------- similarity

def test_brute_force_topk_zero_vector_not_nan(spark):
    from ivm_extension_spark.functions.similarity import brute_force_topk

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # zero vector
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = brute_force_topk(vecs, vecs.filter("vec_id = 0"), k=2).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["neighbor_id"] == 1  # real neighbor wins
    assert by_rank[2]["neighbor_id"] == 2 and by_rank[2]["cos_sim"] == 0.0


def test_cosine_expr_zero_vector(spark):
    from ivm_extension_spark.functions.similarity import cosine_expr

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_expr("a", "b").alias("c")).collect()[0]["c"] == 0.0


# ---------------------------------------------------------------- multimodal

def test_frame_sample_exact_multiple_no_empty_frame(spark):
    from ivm_extension_spark.functions import multimodal

    media = spark.createDataFrame(
        [(1, b"x" * 128), (2, b"y" * 100), (3, b"")],
        "media_id bigint, payload binary",
    ).withColumn("meta", F.struct(F.length("payload").alias("n_bytes")))
    out = multimodal.frame_sample(media, every_n_bytes=64, max_frames=8).collect()
    frames = {}
    for r in out:
        frames.setdefault(r["media_id"], []).append(len(r["frame_bytes"]))
    assert frames[1] == [64, 64]  # exact multiple: 2 frames, no empty tail
    assert frames[2] == [64, 36]
    assert 3 not in frames  # empty payload: zero frames


# ---------------------------------------------------------------- dedup

def test_embedding_near_dups_empty_input(spark):
    from ivm_extension_spark.functions.dedup import embedding_near_dups

    empty = spark.createDataFrame([], "doc_id bigint, emb array<double>")
    out = embedding_near_dups(empty, "doc_id", "emb")
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cos_sim"]


def test_connected_components_nonconvergence_raises(spark):
    from ivm_extension_spark.functions.dedup import connected_components

    n = 6  # chain 0-1-2-3-4-5, diameter 5 > max_iter 2
    verts = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(verts, edges, max_iter=2)
    ok = connected_components(verts, edges, max_iter=10)
    assert rows(ok) == [(i, 0) for i in range(n)]


# ---------------------------------------------------------------- sources

def test_read_parquet_directory_nanos(spark, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ivm_extension_spark.sources.parquet import read_parquet

    d = tmp_path / "t"
    d.mkdir()
    tbl = pa.table(
        {
            "ts": pa.array(
                np.array([1_600_000_000_000_000_123], dtype="int64"),
                type=pa.timestamp("ns"),
            ),
            "v": [1],
        }
    )
    pq.write_table(tbl, str(d / "part-0.parquet"))
    df = read_parquet(spark, str(d))
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert df.count() == 1


def test_read_any_parquet_honors_schema_and_refresh(spark, tmp_path):
    from ivm_extension_spark.sources.formats import read_any
    from ivm_extension_spark.sources.parquet import read_parquet

    p = str(tmp_path / "x.parquet")
    spark.createDataFrame([(1, "a")], "a bigint, b string").write.parquet(p)
    got = read_any(spark, p, schema="a bigint")
    assert got.columns == ["a"]  # schema honored, not silently dropped

    # overwrite the files; refresh=True must re-resolve the listing
    first = read_parquet(spark, p)
    assert first.count() == 1
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "a bigint, b string"
    ).write.mode("overwrite").parquet(p)
    assert read_parquet(spark, p, refresh=True).count() == 2
