"""#EXCERPT_FIELDS — ±N-token windows around term hits.

Reference: warehouse/query-core/src/main/java/datawave/query/
transformer/ExcerptTransform.java:49 + iterator/logic/
TermFrequencyExcerptIterator (971 LoC) — walks the tf column family
rebuilding a token window around each phrase hit.

Spark restatement: the document's token array is sliced around each hit
offset with pure higher-order functions — the 971-line iterator becomes
a dozen lines because the tokens are already a column."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = "[^a-z0-9]+"


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_RE), lambda t: t != "")


def excerpts(df: DataFrame, text_col: str, term: str, window: int = 5,
             out_col: str = "excerpts") -> DataFrame:
    """Add ``out_col``: array of ``±window``-token excerpt strings, one
    per occurrence of ``term`` (empty array when absent)."""
    # Materialize tokens once (see sources.ingest.tokenize for why).
    tmp = df.withColumn("__ex_toks", _tokens(F.col(text_col)))
    toks = F.col("__ex_toks")
    n = F.size(toks)
    positions = F.filter(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                         lambda i: F.get(toks, i) == term.lower())

    def win(p: Column) -> Column:
        start0 = F.greatest(p - window, F.lit(0))
        end0 = F.least(p + window, n - 1)
        return F.concat_ws(" ", F.slice(toks, start0 + 1, end0 - start0 + 1))

    ex = F.when(n > 0, F.transform(positions, win)) \
        .otherwise(F.array().cast("array<string>"))
    return tmp.withColumn(out_col, ex).drop("__ex_toks")


def excerpt_hits(df: DataFrame, text_col: str, term: str, window: int = 5,
                 out_col: str = "excerpts") -> DataFrame:
    """Only documents containing the term, with their excerpts — the
    shape an #EXCERPT_FIELDS result page shows."""
    out = excerpts(df, text_col, term, window, out_col)
    return out.filter(F.size(F.col(out_col)) > 0)
