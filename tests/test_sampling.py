"""Semantics tests for deterministic sampling / data-mixing
(functions/sampling.py) — beyond-reference pipeline operators."""

from pyspark.sql import functions as F

from ivm_extension_spark.functions import sampling

from tests.conftest import rows


def _corpus(spark):
    data = [(i, ["en", "de", "fr"][i % 3], (i * 37) % 200) for i in range(300)]
    return spark.createDataFrame(data, "doc_id long, lang string, n_chars long")


def test_uniform_sample_deterministic_and_subset(spark):
    df = _corpus(spark)
    s1 = rows(sampling.uniform_sample(df, "doc_id", 300))
    s2 = rows(sampling.uniform_sample(df, "doc_id", 300))
    assert s1 == s2  # same hash, same rows, every run
    # monotone: a higher rate keeps a superset
    s_hi = rows(sampling.uniform_sample(df, "doc_id", 700))
    assert set(s1) <= set(s_hi)
    # rate 0 keeps nothing, rate 1000 keeps everything
    assert sampling.uniform_sample(df, "doc_id", 0).count() == 0
    assert sampling.uniform_sample(df, "doc_id", 1000).count() == 300


def test_stratified_rates_respected(spark):
    df = _corpus(spark)
    out = sampling.stratified_sample(
        df, "doc_id", "lang", {"en": 0, "de": 1000}, default_per_mille=500
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in got  # rate 0 drops the stratum entirely
    assert got["de"] == 100  # rate 1000 keeps all
    assert 0 < got["fr"] < 100  # default rate keeps a strict subset


def test_stratified_matches_per_stratum_uniform(spark):
    # the stratified filter must equal running uniform_sample per stratum
    df = _corpus(spark)
    strat = sampling.stratified_sample(df, "doc_id", "lang", {"de": 300}, 1000)
    uni_de = sampling.uniform_sample(df.filter(F.col("lang") == "de"), "doc_id", 300)
    rest = df.filter(F.col("lang") != "de")
    assert rows(strat) == rows(uni_de.unionByName(rest))


def test_quota_per_group_caps_and_orders(spark):
    df = _corpus(spark)
    out = sampling.quota_per_group(
        df, ["lang"], [F.col("n_chars").desc(), F.col("doc_id").asc()], 7
    )
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(per.values()) == {7}
    # the kept rows are exactly the top-7 by (n_chars desc, doc_id asc)
    kept_en = sorted(
        [(r["n_chars"], r["doc_id"]) for r in out.filter(F.col("lang") == "en").collect()],
        key=lambda t: (-t[0], t[1]),
    )
    all_en = sorted(
        [(r["n_chars"], r["doc_id"]) for r in df.filter(F.col("lang") == "en").collect()],
        key=lambda t: (-t[0], t[1]),
    )
    assert kept_en == all_en[:7]


def test_length_histogram_partitions_corpus(spark):
    df = _corpus(spark)
    out = sampling.length_histogram(df, F.col("n_chars"), 50).collect()
    assert sum(r["n_docs"] for r in out) == 300
    assert sum(r["total_len"] for r in out) == df.agg(F.sum("n_chars")).first()[0]
    for r in out:
        assert r["bucket_lo"] % 50 == 0


def test_bucket_portable_against_duckdb(spark):
    # the md5 bucket must agree bit-for-bit with the oracle-side SQL
    import duckdb

    ids = [(i,) for i in range(0, 500, 7)]
    df = spark.createDataFrame(ids, "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", sampling.hash_bucket("doc_id").alias("b")).collect()
    }
    con = duckdb.connect()
    expected = dict(
        con.execute(
            "SELECT doc_id, " + sampling.oracle_bucket_sql("doc_id") + " AS b "
            "FROM (SELECT unnest(range(0, 500, 7)) AS doc_id)"
        ).fetchall()
    )
    assert got == {k: v for k, v in expected.items()}


def test_pack_sequences_concat_and_split(spark):
    # budget 10; group g: docs (1:4), (2:5), (3:3), (4:9) tokens in id
    # order -> start offsets 0,4,9,12 -> packs 0,0,0,1 (doc 3 STARTS at
    # offset 9 inside pack 0 and straddles into pack 1)
    df = spark.createDataFrame(
        [("g", 1, 4), ("g", 2, 5), ("g", 3, 3), ("g", 4, 9), ("h", 9, 25)],
        "src string, doc_id long, n long",
    )
    out = sampling.pack_sequences(
        df, "doc_id", F.col("n"), budget=10, group_cols=("src",)
    )
    got = {(r["src"], r["doc_id"]): (r["start_offset"], r["pack_id"]) for r in out.collect()}
    assert got == {
        ("g", 1): (0, 0),
        ("g", 2): (4, 0),
        ("g", 3): (9, 0),
        ("g", 4): (12, 1),
        ("h", 9): (0, 0),  # packing is local to the group
    }


def test_weighted_sample_extremes_and_monotonicity(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 1001) for i in range(400)], "id long, w long"
    )
    none = sampling.weighted_sample(df, "id", F.lit(0)).count()
    everything = sampling.weighted_sample(df, "id", F.lit(1000)).count()
    assert none == 0 and everything == 400
    # kept-at-weight-w is a subset of kept-at-higher-weight (same hash)
    low = {r["id"] for r in sampling.weighted_sample(df, "id", F.lit(200)).collect()}
    high = {r["id"] for r in sampling.weighted_sample(df, "id", F.lit(700)).collect()}
    assert low <= high and len(low) < len(high)
    # per-row weights: survivors satisfy bucket < weight exactly
    kept = sampling.weighted_sample(df, "id", F.col("w"))
    check = kept.withColumn("b", sampling.hash_bucket("id")).filter(
        F.col("b") >= F.col("w")
    )
    assert check.count() == 0
