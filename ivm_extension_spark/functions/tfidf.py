"""Maintained TF-IDF index — the library API for the recipe the
``ivm_merge_tfidf`` driver key runs (promoted out of the entry file,
VERDICT r6 "Next round" #4).

TF-IDF itself is nonlinear (idf = ln(N/df) moves with every document),
so the maintained state is the LINEAR decomposition — three ordinary
IMMVs over a tokenized terms relation:

- ``<prefix>tf``:    tf(doc, term) counts
- ``<prefix>dfreq``: per-term distinct document frequencies (delete-safe
  via the count-distinct aux state)
- ``<prefix>ndocs``: the distinct document count

and the scoring is finalize-on-read over the merged states (the same
split HAVING / MEDIAN use — engine.py finalize-on-read).

Tokenization is a stateless per-row map, so Δ(doc_terms) =
tokenize(Δdocuments): multiplicity threads through the explode
unchanged, and the base corpus is NEVER re-tokenized on merge — only
the delta is.  Scale shape: state is O(doc·terms) / O(vocabulary) /
O(1); the idf relation is O(vocabulary) and joins back BROADCAST; the
per-doc top-k plans as a rank-pushed window (WindowGroupLimit).

Reference scope note: TF-IDF is outside the reference extension's
surface (README.md:33-36); this is part of the LLM-pipeline layer the
brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ivm_extension_spark.functions.text import tokens, union_constraint_barrier


def tokenize_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 3,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, term) rows — one per token occurrence — of the normalized
    text, behind :func:`union_constraint_barrier` so the exploded plan
    can meet its delta in the engine's merge unions (and so the
    tokenization materializes once instead of re-running per consumer).

    ``carry`` forwards extra columns unchanged (pass the multiplicity
    column name to tokenize a delta: the bool threads through the
    explode untouched, which IS the delta rule for a stateless map).
    """
    t = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term"), *carry
    ).filter(F.length("term") >= min_token_len)
    return union_constraint_barrier(t)


def tfidf_register_delta(
    eng,
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 3,
    terms_table: str = "doc_terms",
) -> None:
    """Derive Δ(terms) = tokenize(Δdocs) from the CURRENTLY registered
    docs delta and register it on the terms relation — call this once
    per document batch (``tfidf_index_views`` does it for the batch
    registered at creation time; LATER batches advance ``ndocs`` but
    would silently leave tf/dfreq stale without this re-derivation).
    After merging the three views, ``apply_delta`` BOTH tables so the
    next batch maintains against the advanced world."""
    from ivm_extension_spark.operators.rewrite import MULT_COL

    eng.register_delta(
        terms_table,
        tokenize_terms(
            eng.delta(docs_table), id_col, text_col, min_token_len, (MULT_COL,)
        ),
    )


def tfidf_index_views(
    eng,
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 3,
    terms_table: str = "doc_terms",
    prefix: str = "",
) -> tuple[str, str, str]:
    """Register the tokenized terms relation on ``eng`` and create the
    three maintained views of the TF-IDF decomposition.  If the docs
    table has a registered delta, the terms relation gets the matching
    Δ-only tokenized delta.  Returns the view names ``(tf, dfreq,
    ndocs)`` — drive them like any IMMV (``ivm_upsert`` → ``merge_view``)
    and score the merged states with :func:`tfidf_scores`.

    Batch contract: for every SUBSEQUENT document batch, register the
    docs delta and call :func:`tfidf_register_delta` (the tokenized
    delta is a derivation this module owns, not something the engine
    can infer), drive the three views, then ``apply_delta`` both
    ``docs_table`` and ``terms_table``.
    """
    from ivm_extension_spark.operators.rewrite import IVMError, MULT_COL

    docs = eng.table(docs_table)
    eng.register_table(
        terms_table, tokenize_terms(docs, id_col, text_col, min_token_len)
    )
    try:
        eng.delta(docs_table)
    except IVMError:
        pass
    else:
        tfidf_register_delta(
            eng, docs_table, id_col, text_col, min_token_len, terms_table
        )
    tf, dfreq, ndocs = (f"{prefix}tf", f"{prefix}dfreq", f"{prefix}ndocs")
    # the three creates are independent (distinct names, each over an
    # already-registered relation) — materialize their initial states
    # concurrently, same thread-per-view drive as engine.merge_views
    from ivm_extension_spark.operators import pin

    creates = [
        (
            tf,
            f"SELECT {id_col}, term, count(*) AS tf "
            f"FROM {terms_table} GROUP BY {id_col}, term",
        ),
        (
            dfreq,
            f"SELECT term, count(DISTINCT {id_col}) AS df "
            f"FROM {terms_table} GROUP BY term",
        ),
        (ndocs, f"SELECT count(DISTINCT {id_col}) AS n FROM {docs_table}"),
    ]
    for f in [
        pin.submit(lambda nv=nv: eng.create_immv(nv[0], sql=nv[1]))
        for nv in creates
    ]:
        f.result()
    return tf, dfreq, ndocs


def tfidf_scores(
    tf_state: DataFrame,
    df_state: DataFrame,
    ndocs_state: DataFrame,
    id_col: str = "doc_id",
    quantize: int = 6,
) -> DataFrame:
    """Finalize-on-read scoring over the merged states: per (doc, term)
    the integer score tf · round(ln(N/df) · 10^quantize) — the same
    quantized-idf integer ranking as ``text.tfidf_top_terms``, so an
    oracle engine whose libm ln differs by an ulp still produces the
    identical ranking.  The idf relation is O(vocabulary), broadcast.
    """
    idf = df_state.crossJoin(F.broadcast(ndocs_state)).select(
        "term",
        F.round(
            F.log(F.col("n").cast("double") / F.col("df").cast("double"))
            * F.lit(float(10**quantize))
        )
        .cast("bigint")
        .alias("__idf_q"),
    )
    return tf_state.join(F.broadcast(idf), on="term").select(
        id_col,
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        (F.col("tf") * F.col("__idf_q")).cast("bigint").alias("score"),
    )


def tfidf_top_k(scored: DataFrame, k: int = 3, id_col: str = "doc_id") -> DataFrame:
    """rank 1..k per document over :func:`tfidf_scores` output, ties
    broken by term (deterministic; plans as WindowGroupLimit)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )
