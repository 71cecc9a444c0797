"""Deterministic Bloom filter (functions/bloom.py): cross-engine state
equality, insert-only merge exactness, and the no-false-negative
guarantee."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ivm_extension_spark.functions import bloom

SF = "/root/testdata/sf0.001"
GROUP = ("o_orderstatus",)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    return con


def test_state_bit_identical_to_duckdb_twin(spark, orders):
    bits = bloom.bloom_bits(orders, GROUP, "o_custkey", 2048, 4)
    srows = sorted(tuple(r) for r in bits.collect())
    drows = sorted(
        tuple(r)
        for r in _duck()
        .execute(bloom.bloom_bits_oracle_sql("orders", GROUP, "o_custkey", 2048, 4))
        .fetchall()
    )
    assert srows == drows and len(srows) > 50


def test_contains_matches_twin_and_has_no_false_negatives(spark, orders):
    bits = bloom.bloom_bits(orders, GROUP, "o_custkey", 2048, 4)
    # probes: 3 definitely-present per-group values + 2 absent sentinels
    present = [
        (r["o_orderstatus"], r["o_custkey"])
        for r in orders.select("o_orderstatus", "o_custkey").limit(50).collect()
    ]
    probe_vals = sorted({v for _, v in present})[:3] + [-1, 10**12]
    probes = spark.createDataFrame([(int(v),) for v in probe_vals], "o_custkey bigint")
    got = {
        (r["o_orderstatus"], r["o_custkey"]): r["contained"]
        for r in bloom.bloom_contains(
            bits, probes, GROUP, "o_custkey", 2048, 4
        ).collect()
    }
    # no false negatives: every truly-present (group, value) answers True
    truly = {
        (r["o_orderstatus"], r["o_custkey"])
        for r in orders.filter(
            F.col("o_custkey").isin([int(v) for v in probe_vals])
        )
        .select("o_orderstatus", "o_custkey")
        .distinct()
        .collect()
    }
    for gk in truly:
        assert got[gk] is True, gk
    # twin equality (incl. whatever false positives the hash family gives)
    vals_sql = ", ".join(f"({int(v)})" for v in probe_vals)
    orows = {
        (r[0], r[1]): r[2]
        for r in _duck()
        .execute(
            bloom.bloom_contains_oracle_sql(
                "orders",
                f"SELECT * FROM (VALUES {vals_sql}) AS t(o_custkey)",
                GROUP,
                "o_custkey",
                2048,
                4,
            )
        )
        .fetchall()
    }
    assert got == orows


def test_merge_equals_full_recompute(spark, orders):
    base = orders.filter("NOT (o_orderkey % 5 = 0)")
    delta = orders.filter("o_orderkey % 5 = 0")
    merged = bloom.bloom_merge(
        bloom.bloom_bits(base, GROUP, "o_custkey", 2048, 4),
        bloom.bloom_bits(delta, GROUP, "o_custkey", 2048, 4),
        GROUP,
    )
    full = bloom.bloom_bits(orders, GROUP, "o_custkey", 2048, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_k_over_md5_width_rejected(spark, orders):
    with pytest.raises(ValueError):
        bloom.bloom_bits(orders, GROUP, "o_custkey", 2048, k=5)


def test_counting_filter_maintained_under_deletes(spark, orders):
    # signed per-position merge == full recompute over the post-delta
    # table, under a MIXED insert/delete delta (the bit filter rejects
    # deletes; the counting variant is exact w.r.t. the value multiset)
    from ivm_extension_spark.operators.rewrite import MULT_COL

    pred, mult = "o_orderkey % 10 = 0", "o_custkey % 2 = 0"
    base = orders
    delta = (
        orders.filter(pred)
        .withColumn(MULT_COL, F.expr(mult))
        .select("o_orderstatus", "o_custkey", MULT_COL)
    )
    state = bloom.bloom_counts(base, GROUP, "o_custkey", 2048, 4)
    dc = bloom.bloom_counts_delta(delta, GROUP, "o_custkey", 2048, 4)
    merged = bloom.bloom_counts_merge(state, dc, GROUP)
    # post-delta table: remove delete rows, duplicate insert rows
    applied = (
        orders.filter(f"NOT (({pred}) AND NOT ({mult}))")
        .unionByName(orders.filter(f"({pred}) AND ({mult})"))
    )
    want = bloom.bloom_counts(applied, GROUP, "o_custkey", 2048, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_counting_state_matches_duckdb_twin(spark, orders):
    srows = sorted(
        tuple(r)
        for r in bloom.bloom_counts(orders, GROUP, "o_custkey", 2048, 4).collect()
    )
    drows = sorted(
        tuple(r)
        for r in _duck()
        .execute(
            bloom.bloom_counts_oracle_sql("orders", GROUP, "o_custkey", 2048, 4)
        )
        .fetchall()
    )
    assert srows == drows and len(srows) > 100
