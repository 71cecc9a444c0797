"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in pyspark.sql functions (JVM-side,
whole-stage codegen — no Python in the row loop), so they scale to
100 TB document sets: each is a narrow per-row projection, no shuffle.

Every operator here has an exact DuckDB-SQL twin used by the driver's
oracle gate; parity gotchas that matter:
  - Spark ``regexp_replace`` replaces all matches by default; DuckDB
    needs the ``'g'`` flag.
  - Spark ``split`` takes a regex; DuckDB ``string_split`` is literal —
    we normalize whitespace first so both split on a single space.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# languages checked in fixed priority order (deterministic tie-break)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "et", "est", "les", "un", "de"),
    "es": ("el", "la", "es", "y", "los", "un", "en"),
}

LANG_ORDER = ("en", "de", "fr", "es")


def _norm_sql(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9\\\\s]', ' '), "
        "'\\\\s+', ' '))"
    )


def _bind(inner: str, bound_expr: str, var: str = "s") -> str:
    """Evaluate ``bound_expr`` ONCE and reference it as ``var`` inside
    ``inner`` — a lambda-variable binding via a single-element transform.

    Why: Catalyst's CollapseProject inlines column aliases into every
    reference, so an aliased tokens() column used inside a per-element
    lambda re-runs the whole regex normalization for EVERY element
    (measured 20x slowdown on shingling).  Lambda variables are never
    inlined, making this the expression-level `let`.
    """
    return f"element_at(transform(array({bound_expr}), {var} -> {inner}), 1)"


def normalized(col: str) -> Column:
    """lowercase, strip non-alphanumerics, collapse whitespace."""
    return F.expr(_norm_sql(col))


def tokens(col: str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalized(col), " ")


def token_count(col: str) -> Column:
    return F.size(tokens(col))


def char_count(col: str) -> Column:
    return F.length(F.col(col))


# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit runs,
# punctuation runs (no lookarounds — identical under Java regex and RE2,
# so the DuckDB oracle runs the same pattern verbatim)
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def subword_token_count(col: str) -> Column:
    """BPE-ish token count: matches of the pre-tokenizer regex over the
    lowercased text — the standard cheap proxy for LLM token budgets
    (whitespace tokens undercount punctuation-heavy text)."""
    # pass the pattern as a Column literal, NOT inside a SQL string literal:
    # SQL-literal unescaping would strip the backslash of \s and corrupt
    # the char class (whitespace runs would then count as punctuation
    # tokens wherever text has consecutive spaces)
    return F.size(
        F.regexp_extract_all(F.lower(F.col(col)), F.lit(BPE_SPLIT_RE), F.lit(0))
    )


def fingerprint(col: str) -> Column:
    """Document fingerprint: md5 of the normalized text.  Stable across
    engines and runs; used for order-insensitive exact dedup."""
    return F.md5(normalized(col))


def _hits_sql(words: tuple[str, ...], toks_var: str = "t") -> str:
    in_list = " OR ".join(f"w = '{w}'" for w in words)
    return f"size(filter({toks_var}, w -> {in_list}))"


def with_lang_id(df, col: str, out: str = "lang_pred"):
    """Stopword language-ID heuristic.  Deterministic: the first
    language in LANG_ORDER with the (strictly) highest hit count wins;
    'und' when no stopword hits at all.  All per-language counts come
    from ONE tokenization pass (lambda-bound, see _bind)."""
    fields = ", ".join(
        f"{_hits_sql(STOPWORDS[lang])} AS s_{lang}" for lang in LANG_ORDER
    )
    scores_expr = _bind(
        _bind(f"struct({fields})", "split(s, ' ')", var="t"), _norm_sql(col)
    )
    df = df.withColumn("__ls", F.expr(scores_expr))
    scores = {lang: F.col(f"__ls.s_{lang}") for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_ORDER:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return df.withColumn(out, expr).drop("__ls")


def quality_features(df, col: str):
    """Length / punctuation / stopword / digit ratios — the standard
    cheap quality signals for corpus filtering.  Ratios are rounded to
    6 decimals (hash-stable: numerators and denominators are exact ints).
    One normalization+tokenization pass (lambda-bound)."""
    n_chars = F.length(F.col(col))
    n_alpha = F.length(F.regexp_replace(F.col(col), "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(F.col(col), "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(F.col(col), "[^.,;:!?]", ""))
    tok_struct = _bind(
        _bind(
            f"struct(size(t) AS n_toks, length(s) AS n_norm, "
            f"{_hits_sql(STOPWORDS['en'])} AS n_stop)",
            "split(s, ' ')",
            var="t",
        ),
        _norm_sql(col),
    )
    ts = F.expr(tok_struct)
    n_toks = ts["n_toks"]

    # round(q * 1e6) / 1e6, NOT round(q, 6): integer-scale rounding of a
    # positive double agrees across engines (HALF_UP == half-away-from-zero
    # and the multiply/divide are identical IEEE ops), while decimal
    # rounding diverges on representation boundaries (observed at sf0.1)
    def r6(x):
        return F.round(x * F.lit(1000000.0)) / F.lit(1000000.0)

    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "alpha_ratio": r6(n_alpha / F.greatest(n_chars, F.lit(1))),
        "digit_ratio": r6(n_digit / F.greatest(n_chars, F.lit(1))),
        "punct_ratio": r6(n_punct / F.greatest(n_chars, F.lit(1))),
        "stopword_ratio": r6(ts["n_stop"] / F.greatest(n_toks, F.lit(1))),
        "mean_token_len": r6(
            (ts["n_norm"] - n_toks + 1) / F.greatest(n_toks, F.lit(1))
        ),
    }


def with_quality(df, col: str):
    feats = quality_features(df, col)
    df = df.withColumns(feats)
    # simple composite score in [0, 1e6] ppm: favors alphabetic,
    # stopword-bearing, medium-length documents (weights arbitrary but
    # fixed).  Integer ppm, not round(x, 6): decimal rounding of a double
    # hits representation-boundary cases where engines disagree in the
    # 6th decimal (observed at sf0.1); rounding to integer scale is the
    # same hash-stable pattern as money-in-cents.  Computed from the
    # ROUNDED feature columns in a separate projection (no re-inlining).
    score_ppm = F.expr(
        "CAST(round(least(n_tokens / 100.0, 1.0) * 300000 "
        "+ alpha_ratio * 400000 "
        "+ least(stopword_ratio * 5, 1.0) * 300000) AS BIGINT)"
    )
    return df.withColumn("quality_score_ppm", score_ppm)


def rolling_fingerprints(
    df, col: str, k: int = 16, mod_p: int = 8, out: str = "fingerprints"
):
    """MOD-p rolling-hash document fingerprinting (the Rabin-Karp /
    Moss-style selection scheme): hash every k-char gram of the
    normalized text with a polynomial rolling hash, keep the hashes
    ≡ 0 (mod ``mod_p``) — a content-defined ~1/p sample that is stable
    under insertions elsewhere in the document (unlike fixed-stride
    sampling).  Output column: sorted array<bigint> of selected hashes.

    Whole expression is JVM-side: base-257 polynomial over a 2^31-1
    modulus, positions via transform(sequence(...)) on ONE normalization
    pass (lambda-bound).  Identical arithmetic runs in the DuckDB oracle.
    """
    m = (1 << 31) - 1
    # h(i) = sum_j c[i+j] * 257^(k-1-j) mod m, computed per position from
    # scratch (k is small and constant; true O(1) rolling needs a scan
    # dependency Spark expressions can't express — O(n*k) is still narrow)
    gram_hash = (
        f"aggregate(sequence(1, {k}), 0L, "
        f"(acc, j) -> (acc * 257 + ascii(substring(s, i + j - 1, 1))) % {m})"
    )
    inner = (
        f"CASE WHEN length(s) >= {k} THEN "
        f"array_sort(array_distinct(filter(transform(sequence(1, length(s) - {k} + 1), "
        f"i -> {gram_hash}), h -> h % {mod_p} = 0))) "
        "ELSE array() END"
    )
    return df.withColumn(out, F.expr(_bind(inner, _norm_sql(col))))


def explode_array_barrier(df, arr_col: str, out: str):
    """Explode ``arr_col`` to one row per element WITHOUT letting the
    optimizer inline the (possibly expensive) expression that computed
    the array into the Generate.

    Catalyst's CollapseProject/ColumnPruning substitute a Project alias
    into the generator input, so ``explode(<O(len·k) expr>)`` re-evaluates
    the whole expression once per EMITTED row instead of once per input
    row — measured 19x on rolling_fingerprints at sf0.1 (VERDICT.md r3
    item 1).  A lazy ``localCheckpoint`` turns the computed relation into
    a LogicalRDD the optimizer cannot see through: the array is computed
    exactly once per row, the Generate merely iterates it.  Lazy (not
    eager) so no extra job runs; the RDD pipelines into the first action.
    At 100 TB the checkpointed projection is (id, small-array) — a tiny
    fraction of the corpus — and it persists MEMORY_AND_DISK per action.
    """
    df = df.localCheckpoint(eager=False)
    return df.select(
        *[c for c in df.columns if c != arr_col],
        F.explode(F.col(arr_col)).alias(out),
    )


def posexplode_array_barrier(df, arr_col: str, pos_out: str, out: str):
    """``posexplode`` twin of :func:`explode_array_barrier` — same
    optimizer-barrier rationale, emits (position, element) pairs."""
    df = df.localCheckpoint(eager=False)
    return df.select(
        *[c for c in df.columns if c != arr_col],
        F.posexplode(F.col(arr_col)).alias(pos_out, out),
    )


def union_constraint_barrier(df):
    """Checkpoint + re-alias a plan so it can safely meet a union.

    Spark 4.1's Union constraint rewrite chokes when exploded plans meet
    in a union: the checkpointed LogicalRDD keeps constraints that still
    reference the pre-checkpoint generator attribute and the rewrite
    fails with "key not found: <col>#N".  ``toDF`` projects through
    fresh attribute ids, which rewrites the constraints consistently.
    Lazy (no extra job); the checkpoint doubles as the one-pass
    materialization of the computed relation — at scale this is the
    "store the derived table" pattern, not an extra cost.  Lives here
    with the other optimizer-barrier helpers (see
    :func:`explode_array_barrier`)."""
    df = df.localCheckpoint(eager=False)
    return df.toDF(*df.columns)


def chunk_tokens(df, col: str, size: int = 64, overlap: int = 8):
    """Split each document into fixed-size token windows with overlap —
    the canonical LLM training-data chunking step.  Output: one row per
    chunk with (original columns..., chunk_id, chunk_text, chunk_tokens).

    stride = size - overlap; chunk i covers tokens [i*stride+1,
    i*stride+size]; the last chunk may be short.  All JVM expressions
    (tokenize once, slice per chunk) — no Python in the row loop.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    chunks_inner = (
        f"transform(sequence(0, CAST((greatest(size(t) - {size}, 0) + {stride} - 1) "
        f"DIV {stride} AS INT)), "
        f"i -> concat_ws(' ', slice(t, i * {stride} + 1, {size})))"
    )
    expr = _bind(_bind(chunks_inner, "split(s, ' ')", var="t"), _norm_sql(col))
    # posexplode via the optimizer barrier: without it the tokenization +
    # per-chunk slice expression is inlined into the Generate and
    # re-evaluated once per emitted chunk (same hazard class as
    # rolling_fingerprints — VERDICT.md r3 items 1/8)
    out = posexplode_array_barrier(
        df.withColumn("__chunks", F.expr(expr)),
        "__chunks",
        "chunk_id",
        "chunk_text",
    )
    return out.withColumn(
        "chunk_tokens", F.size(F.split(F.col("chunk_text"), " "))
    )


def _shingle_case(tok_ref: str, n: int) -> str:
    """The one shingle template both forms share: distinct n-word
    shingles of the token array ``tok_ref`` (the dedup unit, empty
    below n tokens).  Single source of truth — the DuckDB oracles
    assert byte-equal shingle-derived outputs, so the expression-string
    and two-projection forms must never diverge."""
    return (
        f"CASE WHEN size({tok_ref}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({tok_ref}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({tok_ref}, i, {n})))) "
        "ELSE array() END"
    )


def shingles_expr(col: str, n: int = 3) -> str:
    """Distinct n-word shingles as ONE embeddable expression string
    (lambda-bound single tokenization) — for callers composing larger
    expressions.  Hot paths should use :func:`with_word_shingles`."""
    return _bind(_bind(_shingle_case("t", n), "split(s, ' ')", var="t"), _norm_sql(col))


def with_word_shingles(df, col: str, n: int = 3, out: str = "shingles"):
    """Two-projection form of :func:`shingles_expr`: the token array is
    a real column referenced THREE times by the shingle expression
    (size guard, sequence bound, slice), and CollapseProject only
    inlines single-reference or cheap aliases — so the normalization +
    split runs once per row with no lambda-binding wrapper.  Measured
    4x faster than the ``_bind`` single-expression form at sf0.1 (the
    single-element-transform `let` is interpreted per row, outside
    whole-stage codegen)."""
    tok = f"__toks_{out}"
    if tok in df.columns:
        raise ValueError(
            f"with_word_shingles scratch column {tok!r} already exists "
            "in the input — rename it or pick a different `out`"
        )
    if out in df.columns:
        # withColumn would silently REPLACE an existing column of this
        # name — same guard as the scratch column, symmetric
        raise ValueError(
            f"with_word_shingles output column {out!r} already exists "
            "in the input — pick a different `out`"
        )
    return (
        df.withColumn(tok, F.split(F.expr(_norm_sql(col)), " "))
        .withColumn(out, F.expr(_shingle_case(tok, n)))
        .drop(tok)
    )


def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition signals, per document, as exact integers
    (hash-stable across engines — no float ratios in the output):

    - ``n_tokens`` / ``n_distinct_tokens``: token multiset vs set size —
      their ratio is the classic duplicated-token fraction;
    - ``n_bigrams`` / ``top_bigram_count``: total word bigrams vs the
      multiplicity of the most frequent one — a high share flags
      boilerplate/templated text (Rae et al. 2021, "Gopher" §A1.1);
    - ``is_repetitive``: top bigram covers ≥ 20 % of all bigrams
      (integer predicate ``top * 5 >= n_bigrams``).

    Scale: the whole computation is ONE narrow per-row projection —
    tokenize once (lambda-bound, see ``_bind``), build bigrams, sort
    them, and take the max run length with ``aggregate`` (the
    multiset's max multiplicity equals the longest equal-run in any
    sorted order).  No explode, no shuffle, nothing leaves the JVM —
    at 100 TB this runs at parquet-scan speed, unlike the naive
    explode→groupBy(doc, bigram)→groupBy(doc) double shuffle."""
    bigrams_over_s = (
        "CASE WHEN size(s) >= 2 THEN transform(sequence(1, size(s) - 1), "
        "i -> concat(element_at(s, i), ' ', element_at(s, i + 1))) "
        "ELSE array() END"
    )
    top_over_b = (
        "aggregate(b, named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
        "(acc, x) -> named_struct("
        "'prev', x, "
        "'run', IF(x <=> acc.prev, acc.run + 1L, 1L), "
        "'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))), "
        "acc -> acc.best)"
    )
    inner_b = f"named_struct('n_bigrams', size(b), 'top', {top_over_b})"
    inner_s = (
        "named_struct('n_tokens', size(s), "
        "'n_distinct', size(array_distinct(s)), "
        f"'rep', {_bind(inner_b, f'array_sort({bigrams_over_s})', var='b')})"
    )
    st = df.select(
        F.col(id_col),
        F.expr(_bind(inner_s, f"split({_norm_sql(text_col)}, ' ')")).alias("__st"),
    )
    out = st.select(
        F.col(id_col),
        F.col("__st.n_tokens").cast("long").alias("n_tokens"),
        F.col("__st.n_distinct").cast("long").alias("n_distinct_tokens"),
        F.col("__st.rep.n_bigrams").cast("long").alias("n_bigrams"),
        F.col("__st.rep.top").cast("long").alias("top_bigram_count"),
    )
    return out.withColumn(
        "is_repetitive",
        (F.col("top_bigram_count") * 5 >= F.col("n_bigrams"))
        & (F.col("n_bigrams") > 0),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_token_len: int = 3,
    quantize: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the standard corpus keyword /
    topic-drift diagnostic between dedup and sampling.

    tf(d, t)  = occurrences of t in d (whitespace tokens of the
                normalized text, length >= min_token_len)
    idf(t)    = ln(N / df(t)), N = total documents, df = docs containing t
    score     = tf * idf (double), or with ``quantize=q`` the integer
                tf * round(idf · 10^q) — ranking then compares exact
                integers, so an oracle engine whose libm ln differs by
                an ulp still produces the identical ranking (the repo's
                integer-scale float-determinism rule)

    Output: (id, term, tf, score, rank), rank 1..k per document, ties
    broken by term (deterministic).

    Scale shape: ONE explode + (doc, term) count (map-side combined),
    the document-frequency relation is O(vocabulary) and joins back
    BROADCAST, and the per-doc top-k plans as a rank-pushed window
    (WindowGroupLimit) — the corpus is scanned once, never shuffled
    whole; only (doc, term) count rows cross an exchange.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.length("term") >= min_token_len)
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("__n"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.countDistinct("id").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.log(F.col("__n").cast("double") / F.col("__df").cast("double")).alias(
                "__idf"
            ),
        )
    )
    if quantize is not None:
        score = F.col("tf") * F.round(
            F.col("__idf") * F.lit(float(10**quantize))
        ).cast("bigint")
    else:
        score = F.col("tf").cast("double") * F.col("__idf")
    scored = tf.join(F.broadcast(dfreq), on="term").select(
        "id", "term", "tf", score.alias("score")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "term", "tf", "score", "rank"
        )
    )


# -- PII redaction ----------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 (DuckDB) interpret
# identically: no lookarounds, no backreferences, ASCII classes only.
# Order matters at redaction time: SSN (3-2-4) before phone (3-3-4) so a
# dashed SSN is never half-eaten by the phone rule; IP last (a dotted
# phone has only three octet groups, so the four-octet IP pattern never
# overlaps it).
#
# Supported formats (deliberately narrow, the RE2-portable core):
# - phone: US dashed/dotted 3-3-4 ONLY ("555-123-4567", "555.123.4567").
#   Parenthesized ("(555) 123-4567"), space-separated, and bare-10-digit
#   forms are NOT matched — extend the alternation if your corpus needs
#   them, keeping the oracle pattern in sync.
# - ip: any dotted quad of 1-3-digit groups; octets are NOT range-checked
#   (999.999.999.999 redacts, and a dotted version string like "1.2.3.4"
#   is indistinguishable from an address at this syntax level).  A
#   compliance pass prefers the false positive; constrain octets to
#   0-255 with an RE2-portable alternation if precision matters more.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df, id_col: str = "doc_id", text_col: str = "text"):
    """Scrub personally identifiable information from a text column —
    the compliance pass every production training-data pipeline runs
    before tokenization (emails, US-style SSNs/phone numbers, IPv4
    addresses → typed placeholder tokens).

    Output: (id, n_email, n_ssn, n_phone, n_ip, redacted) with counts
    measured on the ORIGINAL text (audit trail) and ``redacted`` the
    scrubbed text.  Because every count is taken on the original text
    while the replacements run sequentially on the evolving string, a
    count can EXCEED the number of substitutions its pattern performed
    when matches overlap (a phone-shaped token inside an email's local
    part counts toward n_phone but is consumed by the earlier <EMAIL>
    replacement).  The counts answer "how many pattern hits did the raw
    text contain", not "how many placeholders did this rule insert" —
    the former is the audit-trail quantity and is what the DuckDB
    oracle reproduces.

    Scale shape: a pure NARROW per-row projection — four
    ``regexp_replace`` + four ``regexp_count`` calls, all JVM-side
    inside whole-stage codegen, no UDF, no shuffle; at 100 TB the pass
    is scan-bound.  The patterns are Java/RE2-portable so the DuckDB
    oracle reproduces the outputs byte-for-byte (DuckDB needs the 'g'
    flag to match Spark's replace-all default)."""
    out = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        )
        out = F.regexp_replace(out, F.lit(pat), F.lit(repl))
    return df.select(F.col(id_col), *counts, out.alias("redacted"))


def boilerplate_ngram_coverage(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_df_pct: int = 5,
):
    """Corpus-relative boilerplate detection: an n-gram is *boilerplate*
    when it occurs in at least ``min_df_pct`` percent of ALL documents
    (headers, footers, navigation chrome, licence blurbs — the
    cross-document counterpart of the per-document Gopher repetition
    stats).  Per document: how many of its distinct n-grams are
    boilerplate.

    Output: (id, n_shingles, n_boiler) — exact integers (hash-stable);
    documents with fewer than ``n`` tokens have no n-grams and are NOT
    emitted (their coverage is undefined).  Callers derive the filter
    predicate, e.g. ``n_boiler * 2 >= n_shingles``.

    Scale shape: the inverted-index shape shared with the contamination
    checker — ONE explode of distinct per-doc n-grams, a (n-gram) count
    aggregation (map-side combined; O(vocabulary²) rows at n=2), the
    document-frequency threshold applied against a broadcast 1-row
    corpus count, and the boilerplate set joined back on the n-gram
    key.  The (id, shingle-array) relation goes through the explode
    barrier so the three consumers (df counts, per-doc totals, the
    boilerplate probe) share ONE tokenization instead of re-deriving
    the shingle subtree per branch; only (doc, n-gram) keys cross
    exchanges, never document bodies.

    Hot-key guard (the boilerplate analog of n-gram Jaccard's
    hot-shingle cap, dedup.ngram_jaccard_pairs): boilerplate grams are
    BY DEFINITION the hottest keys in the corpus — a shuffled join back
    would route every occurrence of a stop-gram to one reducer.  Unlike
    Jaccard's candidate generation they cannot be DROPPED (they are the
    output), but the boilerplate set is size-bounded by construction —
    Σ df ≤ total (doc, gram) rows and every member has df ≥ nd·pct/100,
    so |set| ≤ avg_grams_per_doc · 100/min_df_pct, INDEPENDENT of corpus
    size (~40k grams at 2k-gram docs and the 5% default).  It is
    therefore broadcast: the probe streams map-side, no shuffle of the
    (doc, n-gram) relation, no hot reducer."""
    sh = explode_array_barrier(
        with_word_shingles(
            df.select(F.col(id_col).alias("id"), F.col(text_col)),
            text_col,
            n=n,
            out="__sh",
        ).select("id", "__sh"),
        "__sh",
        "g",
    )
    nd = df.select(F.count("*").alias("__nd"))
    boiler_grams = (
        sh.groupBy("g")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") * 100 >= F.col("__nd") * min_df_pct)
        .select("g")
    )
    per_doc = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    boiler = sh.join(F.broadcast(boiler_grams), on="g").groupBy("id").agg(
        F.count("*").alias("__nb")
    )
    return (
        per_doc.join(boiler, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.coalesce(F.col("__nb"), F.lit(0)).cast("bigint").alias("n_boiler"),
        )
    )
