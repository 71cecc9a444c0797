"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming at all (its model is batch-pull deltas,
README.md:24-31); these operators are the LLM-pipeline closure the
driver mandates: dedup and sessionization over unbounded streams, where
Spark's built-in windowed aggregation can't express the semantics.

Scale design: state is partitioned by the grouping key across the state
store — each executor holds only its keys' state.  The per-group state
payloads are kept deliberately tiny (a set of 64-bit fingerprints, or a
pair of session bounds), so state size is O(distinct keys), not O(rows).
At 100 TB the same code runs with RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) so state spills to
local disk instead of the JVM heap.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream: DataFrame,
    id_col: str,
    fingerprint_col: str,
    shard_mod: int = 64,
) -> DataFrame:
    """Emit each document exactly once per fingerprint across ALL
    micro-batches (first occurrence wins; later duplicates are dropped).

    Built-in ``dropDuplicates`` can do this for one column set, but gives
    no control over state shape or eviction; this operator keeps an
    explicit per-shard set of 64-bit fingerprints (via
    ``applyInPandasWithState``) so the policy — shard count, what counts
    as a duplicate, what to emit for dupes — stays in user space.

    The stream is sharded by ``xxhash64(fingerprint) % shard_mod`` so
    state is spread over the cluster; each group's state is the set of
    FULL fingerprint strings seen in that shard (still O(distinct keys)
    — the hash only routes, it never decides), so dedup is EXACT: a
    64-bit hash collision between distinct fingerprints cannot drop a
    non-duplicate.  Output: (id, fingerprint) — only first occurrences
    are emitted (duplicates are dropped, so every emitted row IS a first
    sighting).
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("fingerprint", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])

    def dedup_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        # shuffle order within a micro-batch is arbitrary: take the whole
        # batch and let the SMALLEST id win per fingerprint, so the
        # survivor is deterministic across reruns/recoveries
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("id", kind="stable")
            fresh_mask = []
            for fp in batch["fingerprint"]:
                if fp in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(fp)
                    fresh_mask.append(True)
            out = batch.loc[fresh_mask, ["id", "fingerprint"]]
            if len(out):
                yield out
        state.update((list(seen),))

    src = stream.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(fingerprint_col).alias("fingerprint"),
        F.xxhash64(fingerprint_col).alias("fph"),
    ).withColumn("shard", F.pmod(F.col("fph"), F.lit(shard_mod)))
    return src.groupBy("shard").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per key: events within ``gap`` of each other merge
    into one session row (key, session_start, session_end, n_events).

    Uses Spark's native ``session_window`` (state-store backed, merges
    overlapping sessions across micro-batches).  Batch DataFrames run the
    same plan without the watermark.
    """
    out = stream
    if out.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    return (
        out.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            F.col("n_events"),
        )
    )
