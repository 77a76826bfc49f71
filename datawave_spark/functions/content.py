"""``content:`` namespace — phrase / proximity functions over term
offsets.

Reference: warehouse/query-core/src/main/java/datawave/query/jexl/
functions/ContentFunctions.java — ``phrase:184``, ``adjacent:141``,
``within:91,109,127`` — evaluated against per-document term-offset maps
(query/postprocessing/tf/TermOffsetMap.java:16) loaded from the tf
column family (ingest: ContentIndexingColumnBasedHandler.java:63,
TermWeight protobuf).

Spark-first data model: tokenization happens at ingest
(``datawave_spark.sources.ingest.tokenize``) producing, per text zone, a
``map<string, array<int>>`` column ``{zone}_tf`` of token → sorted
positions.  The functions below are pure higher-order-function column
expressions (JVM-side):

- ``phrase(t1..tk)``: shift each term's offset array by its phrase
  position and intersect — non-empty ⇔ the exact sequence occurs;
- ``adjacent(t1, t2)``: |o1−o2| == 1 for some pair;
- ``within(dist, t1..tk)``: some choice of one offset per term spans
  ≤ dist (exact via min-window check compiled over k nested EXISTS —
  for each anchor offset of t1, every other term must land in
  [anchor−dist, anchor+dist] and the chosen set must span ≤ dist; for
  k ≤ 3 this is exact and cheap, matching the reference's practical use).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from datawave_spark.compiler.columns import (
    CompileContext, register_function,
)
from datawave_spark.jexl.ast import Identifier, Literal

DEFAULT_ZONE = "text"


def _zone_and_terms(ctx: CompileContext, args) -> tuple[str, list[str]]:
    """First arg may be a zone Identifier (ContentFunctions accepts an
    optional zone); remaining literal args are terms."""
    args = list(args)
    zone = DEFAULT_ZONE
    if args and isinstance(args[0], Identifier):
        zone = args[0].name
        args = args[1:]
    terms = [str(a.value if isinstance(a, Literal) else a) for a in args]
    return zone, terms


def _tf_col(ctx: CompileContext, zone: str) -> Column:
    """Resolve the term-frequency map column for a zone: ``{zone}_tf``
    (case-insensitive), falling back to a bare ``tf`` column."""
    for cand in (f"{zone}_tf", "tf"):
        spec = ctx.resolve(cand)
        if spec is not None:
            return F.col(spec.column)
    raise ValueError(
        f"no term-offset column for zone {zone!r}: expected {zone}_tf "
        "(run datawave_spark.sources.ingest.tokenize at ingest)")


def _offsets(tf: Column, term: str) -> Column:
    return F.coalesce(tf.getItem(term.lower()), F.array())


@register_function("content", "phrase")
def c_phrase(ctx: CompileContext, args):
    """ContentFunctions.phrase:184 — terms appear as an exact adjacent
    sequence.  Shift-and-intersect: positions p where term_i occurs at
    p+i for all i."""
    zone, terms = _zone_and_terms(ctx, args)
    tf = _tf_col(ctx, zone)
    anchor = _offsets(tf, terms[0])

    def shift(offsets: Column, by: int) -> Column:
        # single-arg lambda: a second parameter would receive the array
        # INDEX from Spark's higher-order transform, not the closure.
        return F.transform(offsets, lambda o: o - by)

    shifted = [shift(_offsets(tf, t), i)
               for i, t in enumerate(terms[1:], start=1)]
    out = anchor
    for s in shifted:
        out = F.array_intersect(out, s)
    return F.size(out) > 0


@register_function("content", "adjacent")
def c_adjacent(ctx: CompileContext, args):
    """ContentFunctions.adjacent:141 — two terms at distance exactly 1
    (either order)."""
    zone, terms = _zone_and_terms(ctx, args)
    tf = _tf_col(ctx, zone)
    o1, o2 = _offsets(tf, terms[0]), _offsets(tf, terms[1])
    return F.exists(o1, lambda a: F.exists(
        o2, lambda b: (a - b == 1) | (b - a == 1)))


@register_function("content", "within")
def c_within(ctx: CompileContext, args):
    """ContentFunctions.within:91 — ``(dist, t1..tk)`` (optionally a
    leading zone Identifier): all terms occur within a window of size
    ``dist`` (max offset − min offset ≤ dist)."""
    args = list(args)
    zone = DEFAULT_ZONE
    if args and isinstance(args[0], Identifier):
        zone = args[0].name
        args = args[1:]
    dist = int(args[0].value)
    terms = [str(a.value if isinstance(a, Literal) else a) for a in args[1:]]
    tf = _tf_col(ctx, zone)
    offs = [_offsets(tf, t) for t in terms]
    if len(terms) == 2:
        return F.exists(offs[0], lambda a: F.exists(
            offs[1], lambda b: ((a - b <= dist) & (b - a <= dist))))
    if len(terms) == 3:
        return F.exists(offs[0], lambda a: F.exists(
            offs[1], lambda b: F.exists(
                offs[2], lambda c:
                (F.greatest(a, b, c) - F.least(a, b, c)) <= dist)))
    # k > 3: anchor on each offset of term 1; every other term must land
    # within [anchor-dist, anchor+dist].  (Conservative for k>3: a
    # qualifying window always satisfies this; rare anchor-spread
    # configurations can over-match by ≤ dist — documented bound.)
    def anchored(a: Column) -> Column:
        pred = None
        for o in offs[1:]:
            this = F.exists(o, lambda b: (b >= a - dist) & (b <= a + dist))
            pred = this if pred is None else pred & this
        return pred

    return F.exists(offs[0], anchored)


def _scores_col(ctx: CompileContext, zone: str) -> Column | None:
    for cand in (f"{zone}_scores", "scores"):
        spec = ctx.resolve(cand)
        if spec is not None:
            return F.col(spec.column)
    return None


@register_function("content", "scoredPhrase")
def c_scored_phrase(ctx: CompileContext, args):
    """ContentFunctions.scoredPhrase:214 — phrase restricted to terms
    whose ingest score clears the threshold.  Reference semantics
    (ContentOrderedEvaluator:119-122): a TermWeight position with
    ``score > minScore`` is SKIPPED (scores are negative log-prob-like;
    more-negative = rarer), so a term scoring above the threshold
    contributes no offsets and the phrase fails.  Scores come from the
    ``{zone}_scores`` map written by ``tokenize(emit_scores=True)``
    (one score per distinct token — the per-position refinement the
    TermWeight protobuf allows is collapsed per-token here, documented
    difference).  Without a scores column this degrades to ``phrase``.
    """
    args = list(args)
    zone = DEFAULT_ZONE
    if args and isinstance(args[0], Identifier):
        zone = args[0].name
        args = args[1:]
    min_score = None
    if args and isinstance(args[0], Literal) \
            and isinstance(args[0].value, (int, float)):
        min_score = float(args[0].value)
        args = args[1:]
    terms = [str(a.value if isinstance(a, Literal) else a) for a in args]
    tf = _tf_col(ctx, zone)
    scores = _scores_col(ctx, zone)

    def offsets(term: str) -> Column:
        offs = _offsets(tf, term)
        if scores is None or min_score is None:
            return offs
        ok = F.coalesce(scores.getItem(term.lower()) <= min_score,
                        F.lit(False))
        return F.when(ok, offs).otherwise(F.array().cast("array<int>"))

    anchor = offsets(terms[0])
    out = anchor
    for i, t in enumerate(terms[1:], start=1):
        shifted = F.transform(offsets(t), lambda o: o - i)
        out = F.array_intersect(out, shifted)
    return F.size(out) > 0
