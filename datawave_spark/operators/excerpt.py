"""#EXCERPT_FIELDS — ±N-token windows around term hits.

Reference: warehouse/query-core/src/main/java/datawave/query/
transformer/ExcerptTransform.java:49 + iterator/logic/
TermFrequencyExcerptIterator (971 LoC) — walks the tf column family
rebuilding a token window around each phrase hit.

Spark restatement: hit positions come from the SAME tf offset map the
content: functions use (built by sources.ingest.tokenize — an
aggregation pipeline, so positions are computed once per document), and
the token array is sliced only around those few positions.  Scanning
for positions with a per-index higher-order filter instead goes
quadratic per document after Catalyst's projection collapse."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from datawave_spark.sources.ingest import tokenize

TOKEN_RE = "[^a-z0-9]+"


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_RE), lambda t: t != "")


def excerpts(df: DataFrame, text_col: str, id_col: str, term: str,
             window: int = 5, out_col: str = "excerpts",
             direction: str = "both") -> DataFrame:
    """Add ``out_col``: array of ``window``-token excerpt strings, one
    per occurrence of ``term`` (empty array when absent); ``direction``
    trims the window to before/after the hit (see excerpts_from_tf)."""
    zone = "__excerpt"
    tokened = tokenize(df, text_col, id_col, zone=zone, emit_tokens=True)
    out = excerpts_from_tf(tokened, f"{zone}_tf", f"{zone}_tokens",
                           term, window, out_col, direction=direction)
    return out.drop(f"{zone}_tf", f"{zone}_tokens")


def excerpts_from_tf(df: DataFrame, tf_col: str, tokens_col: str,
                     term: str, window: int = 5,
                     out_col: str = "excerpts",
                     direction: str = "both") -> DataFrame:
    """Excerpts from ingest-materialized tf/token columns (the stored
    tf column family — queries slice, never re-tokenize).

    ``direction`` mirrors the reference's excerpt offset directions
    (TermFrequencyExcerptIterator / ExcerptFields START_OFFSET..
    direction trimming): ``both`` (±window, default), ``before``
    (window tokens up to and including the hit), ``after`` (the hit
    and window tokens following it)."""
    if direction not in ("both", "before", "after"):
        raise ValueError(f"direction must be both/before/after, "
                         f"got {direction!r}")
    tf = F.col(tf_col)
    toks = F.col(tokens_col)
    positions = F.coalesce(tf.getItem(term.lower()), F.array().cast("array<int>"))
    n = F.size(toks)

    def win(p: Column) -> Column:
        lo = p - window if direction in ("both", "before") else p
        hi = p + window if direction in ("both", "after") else p
        start0 = F.greatest(lo, F.lit(0))
        end0 = F.least(hi, n - 1)
        return F.concat_ws(" ", F.slice(toks, start0 + 1, end0 - start0 + 1))

    return df.withColumn(out_col, F.transform(positions, win))


def excerpt_hits(df: DataFrame, text_col: str, id_col: str, term: str,
                 window: int = 5, out_col: str = "excerpts") -> DataFrame:
    """Only documents containing the term, with their excerpts — the
    shape an #EXCERPT_FIELDS result page shows."""
    out = excerpts(df, text_col, id_col, term, window, out_col)
    return out.filter(F.size(F.col(out_col)) > 0)


def phrase_excerpts_from_tf(df: DataFrame, tf_col: str, tokens_col: str,
                            terms: list[str], window: int = 5,
                            out_col: str = "excerpts",
                            direction: str = "both") -> DataFrame:
    """PHRASE excerpts with bracketed hit terms — the exact
    HIT_EXCERPT shape ExcerptTest pins ('an offer [he] [cant]
    [refuse]', ExcerptTransform.java:49 + TermFrequencyExcerpt
    Iterator): the window counts tokens around the WHOLE phrase span,
    'before' ends at the last hit token, 'after' starts at the first,
    and every hit token renders bracketed.  One excerpt per phrase
    occurrence (adjacent offsets, content:phrase semantics)."""
    if direction not in ("both", "before", "after"):
        raise ValueError(f"direction must be both/before/after, "
                         f"got {direction!r}")
    tf = F.col(tf_col)
    toks = F.col(tokens_col)
    k = len(terms)
    starts = F.coalesce(tf.getItem(terms[0].lower()),
                        F.array().cast("array<int>"))
    for i, t in enumerate(terms[1:], start=1):
        off_i = F.coalesce(tf.getItem(t.lower()),
                           F.array().cast("array<int>"))

        def step(_o, _i):
            # close over the loop vars (a default arg would change the
            # lambda's arity for Spark's higher-order binding)
            return lambda s: F.array_contains(_o, s + _i)
        starts = F.filter(starts, step(off_i, i))
    n = F.size(toks)

    def render(s: Column) -> Column:
        first, last = s, s + (k - 1)
        lo = first - window if direction in ("both", "before") else first
        hi = last + window if direction in ("both", "after") else last
        start0 = F.greatest(lo, F.lit(0))
        end0 = F.least(hi, n - 1)
        return F.array_join(
            F.transform(
                F.sequence(start0, end0),
                lambda i: F.when((i >= first) & (i <= last),
                                 F.concat(F.lit("["),
                                          F.element_at(toks, i + 1),
                                          F.lit("]")))
                .otherwise(F.element_at(toks, i + 1))), " ")

    return df.withColumn(out_col, F.transform(starts, render))


def phrase_excerpts(df: DataFrame, text_col: str, id_col: str,
                    terms: list[str], window: int = 5,
                    out_col: str = "excerpts",
                    direction: str = "both") -> DataFrame:
    """phrase_excerpts_from_tf over ad-hoc text (tokenizes first)."""
    zone = "__excerpt"
    tokened = tokenize(df, text_col, id_col, zone=zone, emit_tokens=True)
    out = phrase_excerpts_from_tf(tokened, f"{zone}_tf",
                                  f"{zone}_tokens", terms, window,
                                  out_col, direction=direction)
    return out.drop(f"{zone}_tf", f"{zone}_tokens")
