"""Text-analysis operators for corpus curation: language ID, quality
scoring, token counting, document fingerprinting.

All JVM-side column expressions (no Python UDFs in the hot path), all
deterministic so the DuckDB oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from datawave_spark.util import spread

TOKEN_RE = "[^a-z0-9]+"

# Tiny stopword profiles for n-gram/stopword-hit language ID.  Order
# matters for deterministic argmax tie-breaks (first wins).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "ein", "zu"],
    "es": ["el", "la", "de", "y", "los", "que", "un", "una", "es", "en"],
}


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_RE), lambda t: t != "")


def token_count(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace/punct token count + a BPE-ish subword estimate
    (≈ chars/4, the common LLM heuristic) per document."""
    df = spread(df)
    toks = tokens(F.col(text_col))
    return df.withColumn("n_tokens", F.size(toks)) \
             .withColumn("n_subwords_est",
                         F.ceil(F.length(F.col(text_col)) / 4).cast("bigint"))


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality features + composite score: mean word length,
    stopword ratio, alpha ratio.  Score = weighted sum, rounded —
    deterministic and oracle-reproducible."""
    df = spread(df)
    text = F.col(text_col)
    toks = tokens(text)
    n = F.size(toks)
    mean_len = F.when(n > 0, F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n).otherwise(F.lit(0.0))
    stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_position(stop, t) > 0))
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(F.length(text) > 0,
                         F.length(F.regexp_replace(text, "[^a-zA-Z]", "")) / F.length(text)) \
        .otherwise(F.lit(0.0))
    score = F.round(0.4 * F.least(mean_len / 8, F.lit(1.0))
                    + 0.3 * F.least(stop_ratio * 4, F.lit(1.0))
                    + 0.3 * alpha_ratio, 4)
    return (df.withColumn("mean_word_len", F.round(mean_len, 4))
              .withColumn("stopword_ratio", F.round(stop_ratio, 4))
              .withColumn("alpha_ratio", F.round(alpha_ratio, 4))
              .withColumn("quality", score))


def lang_id(df: DataFrame, text_col: str) -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit
    counts; 'und' (undetermined) when nothing matches."""
    df = spread(df)
    toks = tokens(F.col(text_col))

    def profile_hits(words: list[str]) -> Column:
        prof = F.array(*[F.lit(w) for w in words])
        # NB: single-arg lambda — a second parameter would receive the
        # array INDEX from Spark's higher-order filter, not a closure.
        return F.size(F.filter(toks, lambda t: F.array_position(prof, t) > 0))

    hit_cols = {lang: profile_hits(words) for lang, words in LANG_PROFILES.items()}
    langs = list(LANG_PROFILES)
    score = F.greatest(*[hit_cols[l] for l in langs]) if len(langs) > 1 else hit_cols[langs[0]]
    expr = F.lit("und")
    for lang in reversed(langs):  # first language wins ties
        expr = F.when((hit_cols[lang] > 0) & (hit_cols[lang] == score), F.lit(lang)) \
            .otherwise(expr)
    return df.withColumn("lang_pred", expr)


def fingerprint(df: DataFrame, text_col: str, mod: int = 1_000_000_007) -> DataFrame:
    """Order-sensitive polynomial rolling hash over tokens (each token
    contributes its length and first/last char codes) — a compact
    content fingerprint for shift-detection and grouping.  Same fold is
    expressible in DuckDB's list_reduce for the oracle."""
    df = spread(df)
    toks = tokens(F.col(text_col))
    fp = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 131 + F.length(t) * 7
                        + F.ascii(F.substring(t, 1, 1))) % mod)
    return df.withColumn("fingerprint", fp)
