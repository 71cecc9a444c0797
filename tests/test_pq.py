"""Product quantization (functions/pq.py): integer-grid exactness, the
ADC ranking, and the refine recall ceiling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ivm_extension_spark.functions import pq, similarity


def _vecs(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id int, embedding array<double>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 64))
    return _vecs(spark, X), X


def _np_pipeline(X, books, qidx, k):
    """Driver-side replica of quantize -> encode -> ADC -> topk."""
    scale = pq.SCALE
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    IX = np.round(X / norms[:, None] * scale).astype(np.int64)
    m, dsub = len(books), len(books[0][0])
    B = np.array(books, dtype=np.int64)  # (m, ksub, dsub)
    codes = np.empty((len(IX), m), dtype=np.int64)
    for s in range(m):
        S = IX[:, s * dsub : (s + 1) * dsub]
        d2 = ((S[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1)  # first min = lowest entry id
    out = []
    for qi in qidx:
        scores = {}
        for n in range(len(IX)):
            if n == qi:
                continue
            sc = 0
            for s in range(m):
                sc += int(IX[qi, s * dsub : (s + 1) * dsub] @ B[s][codes[n, s]])
            scores[n] = sc
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qi, n, sc, r + 1) for r, (n, sc) in enumerate(top)]
    return sorted(out)


def test_codes_shape_and_range(spark, corpus):
    df, X = corpus
    enc = pq.pq_encode(df).collect()
    assert len(enc) == len(X)
    for r in enc:
        assert len(r["codes"]) == 16
        assert all(0 <= c < 16 for c in r["codes"])


def test_adc_topk_matches_numpy_replica(spark, corpus):
    df, X = corpus
    books = pq.pq_train(df, m=4, ksub=4, sample=40, iters=5)
    q = df.filter(F.col("vec_id") % 10 == 0)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["adc_score"], r["rank"])
        for r in pq.pq_adc_topk(df, q, k=3, codebooks=books).collect()
    )
    want = _np_pipeline(X, books, [0, 10, 20, 30], k=3)
    assert got == want


def test_refine_with_full_shortlist_equals_bruteforce(spark, corpus):
    df, _ = corpus
    q = df.filter(F.col("vec_id") % 10 == 0)
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in similarity.brute_force_topk(df, q, k=4).collect()
    )
    refined = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in pq.pq_refine_topk(df, q, k=4, shortlist=100).collect()
    )
    assert refined == exact  # shortlist >= corpus: the recall ceiling is exact


def test_pq_train_deterministic_and_grid_valued(spark, corpus):
    df, _ = corpus
    b1 = pq.pq_train(df, m=8, ksub=4, sample=40, iters=3)
    b2 = pq.pq_train(df, m=8, ksub=4, sample=40, iters=3)
    assert b1 == b2
    assert len(b1) == 8 and all(len(s) == 4 and len(s[0]) == 8 for s in b1)
    assert all(isinstance(v, int) for s in b1 for e in s for v in e)


def test_zero_vector_is_total(spark):
    df = _vecs(spark, np.vstack([np.zeros(64), np.ones(64)]))
    enc = {r["vec_id"]: r["codes"] for r in pq.pq_encode(df).collect()}
    assert len(enc) == 2  # zero vector encodes (all-zero grid point), no NaN
    out = pq.pq_adc_topk(df, df, k=1).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in out} == {(0, 1), (1, 0)}


def test_maintained_pq_index_equals_recompute(spark):
    """IVM × PQ: the packed-code projection view merged under an
    insert+delete delta equals a fresh encode of the applied base."""
    import numpy as np

    from ivm_extension_spark.engine import IVMEngine, MULT_COL

    rng = np.random.default_rng(9)
    X = rng.normal(size=(30, 64))
    base = _vecs(spark, X[:20])
    eng = IVMEngine(spark)
    eng.register_table("emb", base)
    vec = "CAST(embedding AS ARRAY<DOUBLE>)"
    lo = pq.pq_packed_sql(vec, subspaces=range(0, 8))
    hi = pq.pq_packed_sql(vec, subspaces=range(8, 16))
    sql = f"SELECT vec_id, {lo} AS pq_lo, {hi} AS pq_hi FROM emb"
    eng.create_immv("v", sql=sql)
    delta = (
        _vecs(spark, X[20:]).withColumn("vec_id", F.col("vec_id") + 20)
        .withColumn(MULT_COL, F.lit(True))
        .unionByName(
            base.filter(F.col("vec_id") < 5).withColumn(MULT_COL, F.lit(False))
        )
    )
    eng.register_delta("emb", delta)
    eng.ivm_upsert("v")
    got = sorted(tuple(r) for r in eng.merge_view("v").collect())
    applied = _vecs(spark, X[5:]).withColumn("vec_id", F.col("vec_id") + 5)
    eng2 = IVMEngine(spark)
    eng2.register_table("emb", applied)
    eng2.create_immv("v", sql=sql)
    want = sorted(tuple(r) for r in eng2.read_view("v").collect())
    assert got == want and len(got) == 25
