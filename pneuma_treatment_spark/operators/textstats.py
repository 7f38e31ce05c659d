"""Text analysis: language-ID, quality scoring, token counting, fingerprint.

Training-data pipeline operators — all pure column expressions (whole-stage
codegen; no UDFs)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny deterministic stopword profiles for the n-gram-free language heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "pour", "dans"],
}

#: tie-break priority when several profiles share the max hit count — MUST
#: match the CASE order of the SQL oracle twin (en before de before fr)
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "fr")


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: highest stopword-profile hit count wins
    (deterministic tie-break by language code order); no hits → 'und'."""
    toks = _tokens(F.col(text_col))
    out = docs.where(F.col(text_col).isNotNull())
    score_cols = []

    def hits(words):
        # NB: a 2-param lambda here would make pyspark pass the ELEMENT INDEX
        # as the second argument (higher-order-function arity dispatch) —
        # bind the word list via closure factory instead.
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    for lang, words in sorted(LANG_PROFILES.items()):
        out = out.withColumn(f"__s_{lang}", hits(words))
        score_cols.append(f"__s_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    lang_expr = F.lit("und")
    # build inner→outer in REVERSED priority so the highest-priority language
    # ends up as the outermost when() — ties then resolve exactly like the
    # SQL oracle's CASE chain (en, then de, then fr)
    for lang in reversed(LANG_PRIORITY):
        lang_expr = F.when((best > 0) & (F.col(f"__s_{lang}") == best), F.lit(lang)).otherwise(
            lang_expr
        )
    return out.withColumn("lang_pred", lang_expr).drop(*score_cols)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-score features: lengths, token stats, punct/digit/stopword
    ratios, and a composite 0-1 score."""
    t = F.trim(F.col(text_col))
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(t)
    stop = F.size(F.filter(toks, lambda x: x.isin(LANG_PROFILES["en"])))
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double") / n_tok,
    )
    out = (
        docs.where(F.col(text_col).isNotNull() & (t != ""))
        .withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("stopword_ratio", stop.cast("double") / n_tok)
        .withColumn("punct_ratio", punct.cast("double") / n_chars)
        .withColumn("digit_ratio", digits.cast("double") / n_chars)
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.2).otherwise(1.0)
        * F.when(F.col("punct_ratio") > 0.3, 0.5).otherwise(1.0)
        * F.when(F.col("digit_ratio") > 0.3, 0.5).otherwise(1.0)
        * F.when(
            (F.col("stopword_ratio") > 0.02) & (F.col("stopword_ratio") < 0.7), 1.0
        ).otherwise(0.7)
    )
    return out.withColumn("quality_score", score)


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set
    (word-order-insensitive content identity) plus the exact-content hash."""
    toks = _tokens(F.col(text_col))
    return docs.where(F.col(text_col).isNotNull()).select(
        id_col,
        F.md5(F.trim(F.col(text_col)).cast("binary")).alias("content_hash"),
        F.md5(
            F.concat_ws(" ", F.sort_array(F.array_distinct(toks))).cast("binary")
        ).alias("token_set_hash"),
    )
