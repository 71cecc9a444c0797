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


def normalized(col: str) -> Column:
    """lowercase, strip non-alphanumerics, collapse whitespace."""
    return F.expr(
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9\\\\s]', ' '), '\\\\s+', ' '))"
    )


def tokens(col: str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalized(col), " ")


def token_count(col: str) -> Column:
    return F.size(tokens(col))


def char_count(col: str) -> Column:
    return F.length(F.col(col))


def fingerprint(col: str) -> Column:
    """Document fingerprint: md5 of the normalized text.  Stable across
    engines and runs; used for order-insensitive exact dedup."""
    return F.md5(normalized(col))


def _stopword_hits(col: str, words: tuple[str, ...]) -> Column:
    in_list = " OR ".join(f"w = '{w}'" for w in words)
    return F.expr(f"size(filter(__toks_{col}, w -> {in_list}))")


def lang_scores(col: str):
    """Per-language stopword hit counts. Internal: requires a
    ``__toks_<col>`` column (see with_lang_id)."""
    return {lang: _stopword_hits(col, STOPWORDS[lang]) for lang in LANG_ORDER}


def with_lang_id(df, col: str, out: str = "lang_pred"):
    """n-gram/stopword language-ID heuristic.  Deterministic: the first
    language in LANG_ORDER with the (strictly) highest hit count wins;
    'und' when no stopword hits at all."""
    df = df.withColumn(f"__toks_{col}", tokens(col))
    scores = lang_scores(col)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_ORDER:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return df.withColumn(out, expr).drop(f"__toks_{col}")


def quality_features(df, col: str):
    """Length / punctuation / stopword / digit ratios — the standard
    cheap quality signals for corpus filtering.  Ratios are rounded to
    6 decimals (hash-stable: numerators and denominators are exact ints)."""
    n_chars = F.length(F.col(col))
    n_alpha = F.length(F.regexp_replace(F.col(col), "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(F.col(col), "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(F.col(col), "[^.,;:!?]", ""))
    toks = tokens(col)
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: _w_in(w, STOPWORDS["en"])))
    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "alpha_ratio": F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6),
        "digit_ratio": F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(n_toks, F.lit(1)), 6),
        "mean_token_len": F.round(
            (F.length(normalized(col)) - n_toks + 1) / F.greatest(n_toks, F.lit(1)), 6
        ),
    }


def _w_in(w: Column, words: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for x in words:
        cond = cond | (w == F.lit(x))
    return cond


def with_quality(df, col: str):
    feats = quality_features(df, col)
    for name, c in feats.items():
        df = df.withColumn(name, c)
    # simple composite score in [0,1]: favors alphabetic, stopword-bearing,
    # medium-length documents (weights are arbitrary but fixed)
    score = F.round(
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.col("alpha_ratio") * 0.4
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.3,
        6,
    )
    return df.withColumn("quality_score", score)


def word_shingles(col: str, n: int = 3) -> Column:
    """Distinct n-word shingles (the dedup unit).  Empty array for
    documents shorter than n tokens."""
    return F.expr(
        f"""CASE WHEN size(__toks) >= {n} THEN
              array_distinct(transform(sequence(1, size(__toks) - {n - 1}),
                i -> concat_ws(' ', slice(__toks, i, {n}))))
            ELSE array() END"""
    )


def with_word_shingles(df, col: str, n: int = 3, out: str = "shingles"):
    return (
        df.withColumn("__toks", tokens(col))
        .withColumn(out, word_shingles(col, n))
        .drop("__toks")
    )
