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


def _phrase_match(offsets_of, terms: list[str]) -> Column:
    """ContentOrderedEvaluator semantics (content-referee r8): terms in
    order, each step within distance 1 — ∃ p1..pk, pi ∈ off(ti), with
    p_{i-1} <= p_i <= p_{i-1}+1 (an equal-position step IS a match for
    different terms — EvaluateTermPosition.isWithIn:330 low bound is
    the previous offset itself, zeroOffsetMatch default true), except a
    repeated term may not reuse its own position (isSameTerm advance,
    ContentOrderedEvaluator.trim:164).  Linear DP: filter each term's
    offsets to those reachable from the previous term's reachable set."""
    reach = offsets_of(terms[0])
    for i in range(1, len(terms)):
        off_i = offsets_of(terms[i])
        if terms[i].lower() == terms[i - 1].lower():
            # q <= p <= q+1 and p != q  ⇔  p == q+1
            step = (lambda prev: lambda p: F.exists(
                prev, lambda q: p == q + 1))(reach)
        else:
            step = (lambda prev: lambda p: F.exists(
                prev, lambda q: (q <= p) & (p <= q + 1)))(reach)
        if i == len(terms) - 1:
            # last term: the reachable SET is never consumed — an
            # EXISTS short-circuits where filter+size materializes
            # the array (bench r8)
            return F.coalesce(F.exists(off_i, step), F.lit(False))
        reach = F.filter(off_i, step)
    return F.size(reach) > 0


def _within_match(offsets_of, terms: list[str], dist: int) -> Column:
    """ContentUnorderedEvaluator / MultiOffsetMatcher semantics
    (content-referee r8): a REPEATED term's occurrences share one
    offset list, each consuming a distinct position
    (MultiOffsetMatcher termsSeen, ContentUnorderedEvaluator.java:199).
    Equivalent window form, exact for ANY k (replaces the old k>3
    conservative anchor bound): ∃ anchor position p (the selection's
    minimum — always one of the stored offsets) such that every
    distinct term has ≥ its multiplicity offsets inside [p, p+dist]."""
    from collections import Counter
    mult = Counter(t.lower() for t in terms)
    per_term = {t: offsets_of(t) for t in mult}
    cols = list(per_term.values())
    if len(mult) == 2 and set(mult.values()) == {1}:
        # two DISTINCT terms: ∃ selection spanning ≤ dist ⇔ some pair
        # is within dist — direct pairwise EXISTS, no anchor array
        # build (bench r8; equivalent to the window form for k=2)
        o1, o2 = cols
        return F.coalesce(
            F.exists(o1, lambda a: F.exists(
                o2, lambda b: (a - b <= dist) & (b - a <= dist))),
            F.lit(False))
    anchors = F.array_distinct(cols[0] if len(cols) == 1
                               else F.concat(*cols))

    def ok_at(p: Column) -> Column:
        cond = None
        for t, m in mult.items():
            cnt = F.size(F.filter(
                per_term[t], lambda v: (v >= p) & (v <= p + dist)))
            this = cnt >= m
            cond = this if cond is None else cond & this
        return cond

    return F.exists(anchors, ok_at)


@register_function("content", "phrase")
def c_phrase(ctx: CompileContext, args):
    """ContentFunctions.phrase:184 → ContentOrderedEvaluator with
    distance 1 (see _phrase_match for the exact step contract)."""
    zone, terms = _zone_and_terms(ctx, args)
    tf = _tf_col(ctx, zone)
    return _phrase_match(lambda t: _offsets(tf, t), terms)


@register_function("content", "adjacent")
def c_adjacent(ctx: CompileContext, args):
    """ContentFunctions.adjacent:141 — defined as
    ``within(terms.length - 1, terms...)`` (ContentFunctions.java:141),
    NOT a pairwise ±1 test: k terms spanning ≤ k−1 in any order, and
    two different terms at the SAME position are adjacent."""
    zone, terms = _zone_and_terms(ctx, args)
    tf = _tf_col(ctx, zone)
    return _within_match(lambda t: _offsets(tf, t), terms,
                         len(terms) - 1)


@register_function("content", "within")
def c_within(ctx: CompileContext, args):
    """ContentFunctions.within:91 — ``(dist, t1..tk)`` (optionally a
    leading zone Identifier): some choice of one offset per term slot
    spans ≤ dist (see _within_match for the repeated-term contract)."""
    args = list(args)
    zone = DEFAULT_ZONE
    if args and isinstance(args[0], Identifier):
        zone = args[0].name
        args = args[1:]
    dist = int(args[0].value)
    terms = [str(a.value if isinstance(a, Literal) else a) for a in args[1:]]
    tf = _tf_col(ctx, zone)
    return _within_match(lambda t: _offsets(tf, t), terms, dist)


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

    return _phrase_match(offsets, terms)
