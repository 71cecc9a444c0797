"""Engine sketch views maintained from Structured Streaming micro-batches.

``run_sketch_stream`` wires a streaming DataFrame into the engine's
sketch lifecycle (round 7, operators/sketches.py): each micro-batch is
registered as an insert-only delta on the sketch's source table, the
sketch advances through the ordinary ``ivm_upsert`` → ``merge_view``
verbs, and the batch is then DISCARDED (``engine.discard_delta``) —
sketch merges never consult the base relation, so folding each batch
into an ever-growing base would be O(stream) work per batch for state
nobody reads.

Exactness: for the linear kinds (cms/hist/bloom_counting) merge-of-
batches ≡ sketch-of-union by linearity; for the monotone kinds
(bloom/hll) by the bit_or/max set-union argument — either way the final
state equals a batch recompute over the whole stream bit-for-bit.

Scale shape: per batch ONE map-side-combined sketch shuffle over the
batch rows + the state merge over O(state) rows; state size is bounded
by the sketch parameters regardless of stream length, and the eager
state checkpoint inside merge_view keeps plan depth O(1) across
batches (no lineage chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def run_sketch_stream(
    eng,
    name: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    timeout_s: float = 300.0,
) -> int:
    """Drive sketch view ``name`` on ``eng`` from ``stream_df`` until the
    stream's available data is exhausted (``availableNow`` trigger).
    Returns the number of micro-batches processed.

    Rows without a multiplicity column are inserts.  A CDC/retraction
    stream carries the bool multiplicity column itself (insert=true,
    delete=false) and is registered per batch AS-IS — the LINEAR kinds
    (cms/hist/bloom_counting) absorb signed deltas exactly; a monotone
    kind (bloom/hll) rejects the first delete-bearing batch loudly
    (operators/sketches.py monotone guard).  Batch-content contract for
    counting sketches: each micro-batch's deletes must be covered by
    values live in the state-so-far ∪ that batch's inserts (the merge
    drops non-positive counters, so a delete arriving before its insert
    would be lost) — partition the CDC landing files by the sketch
    value so a delete ships with its insert."""
    from ivm_extension_spark.operators.rewrite import MULT_COL

    spec = eng._sketch_specs.get(name)
    if spec is None:
        from ivm_extension_spark.operators.rewrite import IVMError

        raise IVMError(f"{name!r} is not a sketch view (create_sketch_immv)")
    n_batches = {"n": 0}

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        insert_only = MULT_COL not in batch_df.columns
        eng.register_delta(
            spec.source,
            batch_df
            if not insert_only
            else batch_df.withColumn(MULT_COL, F.lit(True)),
        )
        if insert_only:
            # the adapter stamped the multiplicity itself — declare it so
            # monotone kinds skip their per-batch delete-probe job
            eng._insert_only_deltas.add(spec.source)
        eng.ivm_upsert(name)
        eng.merge_view(name)
        eng.discard_delta(spec.source)
        n_batches["n"] += 1

    q = (
        stream_df.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(f"sketch stream {name!r} did not finish in {timeout_s}s")
    return n_batches["n"]
