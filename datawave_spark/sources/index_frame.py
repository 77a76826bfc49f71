"""Derived index frame — the global-index / field-index parity layer.

Reference: DataWave's planner walks a *global inverted index*
(``shardIndex``: normValue → field → shard/uid lists, SURVEY §1.1) to
turn each indexed term into candidate (shard, uid) ranges —
RangeStream (query/index/lookup/RangeStream.java:106) with
Intersection/Union stream merging (:377,425) over Uid.List protobufs
(IndexInfo.java:48).

On Spark, Catalyst's pushdown makes an index unnecessary for scans —
but the index FRAME itself powers parity features that want
(field, value) → documents without touching events: discovery,
ANYFIELD expansion against observed values, and index-intersection
candidate generation.  This module materializes it as an ordinary
DataFrame:

    (field, value, uid, event_date)   one row per field VALUE per event

and implements RangeStream over it: AND = inner join on uid (the
sort-merge index intersection of AndIterator.java:34), OR = union +
distinct (OrIterator.java:28), NOT = anti join against the universe
(NegationFilter).  At 100 TB the index frame is written bucketed by
``value`` so term lookups prune, exactly as the reference's
index-organized table does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datawave_spark.jexl.ast import (
    AndNode, CmpNode, JexlNode, NotNode, OrNode, RangeNode,
)
from datawave_spark.normalizers import get_normalizer


def build_reverse_index(index: DataFrame) -> DataFrame:
    """Reversed-value index (shardReverseIndex parity, SURVEY §1.1):
    leading-wildcard terms (``FIELD =~ '.*suffix'``) become PREFIX
    lookups on the reversed value — pushdown-able StartsWith instead of
    a full regex scan."""
    return index.withColumn("value", F.reverse(F.col("value")))


def suffix_uids(reverse_index: DataFrame, field: str, suffix: str) -> DataFrame:
    """Candidate uids for a trailing-wildcard term via the reverse
    index: value ends with ``suffix`` ⇔ reversed value starts with
    reversed suffix.

    Contract note (planner-referee r8): this is a case-SENSITIVE
    prefix lookup over the STORED (normalized) values.  The JEXL
    ``=~`` evaluation contract is case-insensitive, and index pruning
    cannot be undone by re-evaluation — so a caller routing
    ``F =~ '.*suffix'`` through here must either know the field's
    normalizer folds case (lc/lcNoDiacritics, the reference's usual
    indexed-text types, with the suffix folded the same way) or fall
    back to the forward index's regex predicate."""
    rev = suffix[::-1]
    return (reverse_index
            .filter((F.col("field") == field.upper())
                    & F.col("value").startswith(rev))
            .select("uid").distinct())


def build_index(events: DataFrame, fields: list[str], id_col: str,
                date_col: str | None = None,
                field_types: dict[str, str] | None = None) -> DataFrame:
    """Materialize the inverted-index frame for the given fields.
    Multi-valued (array) fields fan out one entry per value; values are
    stored normalized (the index stores normValue in the reference)."""
    ft = {k.upper(): v for k, v in (field_types or {}).items()}
    parts = []
    dtypes = dict(events.dtypes)
    for f in fields:
        norm = get_normalizer(ft.get(f.upper(), "noop"))
        date_expr = (F.to_date(F.col(date_col)) if date_col
                     else F.lit(None).cast("date"))
        if dtypes.get(f, "").startswith("array"):
            # explode must sit at the top level of a projection
            base = events.select(F.explode(F.col(f)).alias("__v"),
                                 F.col(id_col).alias("__id"),
                                 date_expr.alias("event_date"))
        else:
            base = events.select(F.col(f).alias("__v"),
                                 F.col(id_col).alias("__id"),
                                 date_expr.alias("event_date"))
        sel = base.select(
            F.lit(f.upper()).alias("field"),
            # explicit stringify: a typed normalizer (number) yields a
            # DOUBLE column, and the cross-field UNION would otherwise
            # coerce the STRING parts to double — an ANSI
            # CAST_INVALID_INPUT on the first alphabetic value of any
            # other field in the index (planner-referee r8)
            norm.col(F.col("__v").cast("string")).cast("string")
                .alias("value"),
            F.col("__id").cast("string").alias("uid"),
            "event_date",
        ).filter(F.col("value").isNotNull())
        parts.append(sel)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _index_value_pred(node: CmpNode,
                      field_types: dict[str, str] | None):
    """Predicate over the index frame's stored ``value`` column for one
    comparison leaf — shared by the plain and Uid.List-capped lookups
    (they MUST stay semantically identical for cap-invariance to
    hold).  Index values are stringified; numeric terms compare
    numerically ("25" must match stored "25.0")."""
    from datawave_spark.compiler.columns import (fold_query_pattern,
                                                 java_full_match)
    ft = {k.upper(): v for k, v in (field_types or {}).items()}
    norm = get_normalizer(ft.get(node.field.name.upper(), "noop"))
    v = F.col("value")
    if isinstance(node, RangeNode):
        # BOUNDED range: both bounds on ONE index row = the same-value
        # semantics the evaluator's compile_range applies — an AND of
        # two separate term lookups would intersect UID sets where
        # DIFFERENT values satisfy each bound (over-candidates, and
        # WRONG when every field is indexed and the fetch skips
        # re-evaluation)
        def bound(op: str, value):
            lit = norm.normalize_literal(value)
            cmp_col = (v.try_cast("double")
                       if isinstance(lit, (int, float))
                       and not isinstance(lit, bool) else v)
            lit_c = F.lit(lit)
            return {"<": cmp_col < lit_c, ">": cmp_col > lit_c,
                    "<=": cmp_col <= lit_c, ">=": cmp_col >= lit_c}[op]
        return bound(node.lo_op, node.lo.value) \
            & bound(node.hi_op, node.hi.value)
    value = node.value.value
    # try_cast throughout: stored index values are strings; one
    # malformed row must become a NULL non-match, not an ANSI
    # CAST_INVALID_INPUT that aborts the whole scan (planner-referee r8).
    if node.op == "==":
        lit = norm.normalize_literal(value)
        if isinstance(lit, (int, float)) and not isinstance(lit, bool):
            return v.try_cast("double") == float(lit)
        return v == str(lit)
    if node.op == "=~":
        # Same contract as the evaluation path (JexlPatternCache flags
        # + full-match anchors + normalizer pattern fold) — without the
        # (?is) flags a fully-indexed regex term silently DROPS the
        # case-insensitive / dot-matches-newline documents the
        # evaluator would return (planner-referee r8).
        return v.rlike(java_full_match(fold_query_pattern(value, norm)))
    if node.op in ("<", ">", "<=", ">="):
        lit = norm.normalize_literal(value)
        cmp_col = (v.try_cast("double")
                   if isinstance(lit, (int, float)) else v)
        lit_c = F.lit(lit)
        return {"<": cmp_col < lit_c, ">": cmp_col > lit_c,
                "<=": cmp_col <= lit_c, ">=": cmp_col >= lit_c}[node.op]
    raise ValueError(f"index lookup cannot serve op {node.op!r}")


def _term_uids(index: DataFrame, node: CmpNode,
               field_types: dict[str, str] | None) -> DataFrame:
    pred = _index_value_pred(node, field_types)
    return (index.filter((F.col("field") == node.field.name.upper()) & pred)
            .select("uid").distinct())


def _unindexed_terms(node: JexlNode, fields: set[str]) -> bool:
    """True when the subtree holds a comparison on a field the index
    does not cover — the fetch phase must then re-evaluate the full
    predicate (the reference's evaluation-only/_Delayed_ terms)."""
    if isinstance(node, (CmpNode, RangeNode)):
        return node.field.name.upper() not in fields
    if isinstance(node, (AndNode, OrNode)):
        return any(_unindexed_terms(t, fields) for t in node.terms)
    if isinstance(node, NotNode):
        return _unindexed_terms(node.term, fields)
    return True


def candidate_uids(index: DataFrame, node: JexlNode,
                   universe: DataFrame | None = None,
                   field_types: dict[str, str] | None = None,
                   fields: set[str] | None = None) -> DataFrame | None:
    """RangeStream: AST → candidate uid frame, or None when the index
    cannot serve the subtree.

    AND → inner join (index intersection), OR → union+distinct (index
    union), NOT → anti join vs the uid universe (context-required
    branch — the reference marks these _Delayed_ and evaluates lazily;
    with a universe frame we can resolve them in-plan).

    A term on a field the index does not cover is UNSERVABLE (None) —
    never an empty uid frame, which ANDed with an indexed term would
    wrongly empty the candidate set (the reference marks such terms
    evaluation-only instead; callers must re-evaluate the predicate
    over the fetched events).  Under AND the unservable term is simply
    skipped (siblings still narrow); under OR or NOT it taints the
    whole subtree."""
    if fields is None:
        fields = {r.field for r in index.select("field").distinct().collect()}
    if isinstance(node, (CmpNode, RangeNode)):
        if node.field.name.upper() not in fields:
            return None           # evaluation-only: field not indexed
        if isinstance(node, CmpNode) and node.op in ("!=", "!~"):
            pos = CmpNode("==" if node.op == "!=" else "=~",
                          node.field, node.value)
            return candidate_uids(index, NotNode(pos), universe,
                                  field_types, fields)
        return _term_uids(index, node, field_types)
    if isinstance(node, AndNode):
        out = None
        for t in node.terms:
            uids = candidate_uids(index, t, universe, field_types, fields)
            if uids is None:
                continue          # evaluation-only term: siblings narrow
            out = uids if out is None else out.join(uids, "uid", "inner")
        return out
    if isinstance(node, OrNode):
        out = None
        for t in node.terms:
            uids = candidate_uids(index, t, universe, field_types, fields)
            if uids is None:
                return None       # an unservable OR branch taints the union
            out = uids if out is None else out.union(uids)
        return out.distinct()
    if isinstance(node, NotNode):
        if universe is None:
            raise ValueError(
                "negation needs a uid universe (context-required branch)")
        # An unindexed term ANYWHERE under the negation poisons it: the
        # inner candidate set would be a SUPERSET of true inner matches
        # (AND skips unindexed conjuncts), so universe-minus-superset
        # UNDER-includes — and the fetch-phase re-evaluation cannot
        # resurrect rows the anti-join already dropped.  Unservable.
        if _unindexed_terms(node.term, fields):
            return None
        pos = candidate_uids(index, node.term, universe, field_types, fields)
        if pos is None:
            return None
        return universe.select("uid").distinct().join(pos, "uid", "left_anti")
    raise TypeError(f"index lookup cannot serve node {node!r}")


def index_query(events: DataFrame, index: DataFrame, jexl: str,
                id_col: str,
                field_types: dict[str, str] | None = None,
                fields: set[str] | None = None,
                shard_range: tuple | None = None,
                date_col: str | None = None,
                event_date_col: str | None = None) -> DataFrame:
    """Full index-driven query: candidate uids from the index frame,
    then fetch + (re)evaluate against the events — the two-phase
    index-then-evaluate shape of QueryIterator, as one Catalyst plan.
    Terms on unindexed fields never touch the index (evaluation-only):
    the semi-join narrows by the indexed siblings and the full JEXL
    predicate re-evaluates over the fetched rows; a query with no
    index-servable conjunct falls back to the full predicate scan.
    ``fields``: pass the indexed-field set when known (ingest config /
    cached metadata) to skip the per-plan distinct job.

    ``shard_range=(lo, hi)`` + ``date_col``: the query's begin/end
    dates bound the SHARDS consulted (RangeStream.java:377-513 —
    the reference never scans index rows outside the query's date
    range).  The bound applies to the index's ``event_date`` column
    AND to the events fetch via ``date_col``, keeping the uid universe
    consistent for negations.  On an index stored hive-partitioned by
    (field, event_date) — ``prepared``'s layout for the scale path —
    this is literal partition pruning: the scan never opens
    out-of-range files.

    ``event_date_col``: when the EVENTS table is itself date-partitioned
    (the README layout: events hive-partitioned on event_date), name
    that partition column and the events-side bound becomes a partition
    filter too — the post-index document fetch opens only in-range
    event files, the document-range narrowing after
    RangeStream.java:377-513 (VERDICT r9 #2: without this the fetch
    side scans the whole corpus even though the index side pruned)."""
    from datawave_spark.compiler import compile_query
    from datawave_spark.jexl.parser import parse
    node = parse(jexl)
    if shard_range is not None:
        if date_col is None:
            raise ValueError("shard_range requires date_col (the events "
                             "side must see the same bound as the index)")
        lo = F.lit(str(shard_range[0])).cast("date")
        hi = F.lit(str(shard_range[1])).cast("date")
        # an index built WITHOUT date_col stores event_date NULL —
        # those rows cannot be pruned, only kept (the events fetch
        # still applies the exact date bound, so answers stay correct;
        # dropping them would silently empty the query — review r9)
        index = index.filter(F.col("event_date").isNull()
                             | F.col("event_date").between(lo, hi))
        if event_date_col is not None:
            # partition-column bound: prunes at file-listing time
            events = events.filter(
                F.col(event_date_col).between(lo, hi))
        else:
            events = events.filter(
                F.col(date_col).cast("date").between(lo, hi))
    if fields is None:
        fields = {r.field for r in index.select("field").distinct().collect()}
    universe = events.select(F.col(id_col).cast("string").alias("uid"))
    cands = candidate_uids(index, node, universe, field_types, fields)
    if cands is None:
        return compile_query(events, jexl, field_types=field_types)
    fetched = events.join(
        cands, events[id_col].cast("string") == cands["uid"], "left_semi")
    if _unindexed_terms(node, fields):
        fetched = compile_query(fetched, jexl, field_types=field_types)
    return fetched


# --------------------------------------------------------------- Uid.List cap
#
# Reference: the global index's Uid.List value keeps explicit uids only
# below a cardinality cap, merged by a server-side combiner
# (GlobalIndexUidAggregator.java:25); above the cap it stores a count
# only, and RangeStream then emits a SHARD range (scan the whole shard,
# re-evaluate) instead of document ranges (IndexInfo.java:48,
# Intersection/Union streams at RangeStream.java:377,425).  This block
# restates that planning IR as a DataFrame of candidate rows
#
#     (event_date, uid)        uid NULL ⇒ "whole shard" range
#
# with intersect/union implemented exactly as IndexInfo's stream merge:
# explicit∩explicit matches on (shard, uid), explicit∩shard keeps the
# explicit side where its shard survives, shard∩shard stays a shard
# range.  Negated terms are never index-served (the reference marks
# them _Delayed_ / evaluation-only); the fetch phase re-evaluates the
# FULL predicate, so the cap changes plan shape, never answers.


def build_capped_index(events: DataFrame, fields: list[str], id_col: str,
                       date_col: str | None = None,
                       field_types: dict[str, str] | None = None,
                       max_uids: int = 20) -> DataFrame:
    """The capped global index: one row per (field, value, event_date)
    with ``uid_count`` and ``uids`` (NULL above ``max_uids`` — the
    Uid.List overflow form).

    Ingest shape: counts first (map-side combinable), then uids are
    collected ONLY for under-cap groups (semi-join before collect), so
    no aggregation buffer ever holds a hot value's full uid set — the
    incremental-merge-and-drop discipline of the reference's combiner,
    restated as two aggregations.
    """
    long = build_index(events, fields, id_col, date_col, field_types)
    key = ["field", "value", "event_date"]
    counts = long.groupBy(*key).agg(F.count(F.lit(1)).alias("uid_count"))
    small = counts.filter(F.col("uid_count") <= max_uids).select(*key)
    uids_small = (long.join(small, key, "left_semi")
                  .groupBy(*key)
                  .agg(F.sort_array(F.collect_set("uid")).alias("uids")))
    return counts.join(uids_small, key, "left")


def _capped_term_info(cidx: DataFrame, node: CmpNode,
                      field_types: dict[str, str] | None) -> DataFrame:
    """One EQ/range/regex leaf → candidate (event_date, uid) rows;
    overflow index rows surface as uid-NULL shard rows."""
    pred = _index_value_pred(node, field_types)
    rows = cidx.filter((F.col("field") == node.field.name.upper()) & pred)
    # explode_outer: explicit rows fan out per uid; overflow rows
    # (uids NULL) emit one uid-NULL row = shard range
    return (rows.select("event_date",
                        F.explode_outer("uids").alias("uid"))
            .distinct())


def _info_shards(info: DataFrame) -> DataFrame:
    return info.filter(F.col("uid").isNull()).select("event_date")


def info_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """IndexInfo.intersect (RangeStream.java:425): document ranges
    intersect on (shard, uid); a shard range on one side passes the
    other side's rows for that shard; two shard ranges stay one."""
    ae = a.filter(F.col("uid").isNotNull())
    be = b.filter(F.col("uid").isNotNull())
    parts = [
        ae.join(be, ["event_date", "uid"]),
        ae.join(_info_shards(b), "event_date", "left_semi"),
        be.join(_info_shards(a), "event_date", "left_semi"),
        _info_shards(a).join(_info_shards(b), "event_date")
        .select("event_date", F.lit(None).cast("string").alias("uid")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def info_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """IndexInfo.union (RangeStream.java:377): k-way merge = union;
    a shard range absorbs same-shard document ranges at fetch time, so
    no explicit absorption pass is needed for correctness."""
    return a.unionByName(b).distinct()


def indexed_fields(cidx: DataFrame) -> set[str]:
    """The capped index's field set — a bounded metadata read (one
    distinct over the small index frame, the same discipline as
    date_index._date_index_fields).  Compute ONCE per plan and pass to
    ``capped_candidates``."""
    return {r.field for r in cidx.select("field").distinct().collect()}


def capped_candidates(cidx: DataFrame, node: JexlNode,
                      field_types: dict[str, str] | None = None,
                      fields: set[str] | None = None
                      ) -> DataFrame | None:
    """AST → candidate (event_date, uid) frame, or None when the index
    cannot serve the subtree (negation under OR, unsupported leaf) —
    the ExecutableDeterminationVisitor outcome that forces a full-table
    scan (DefaultQueryPlanner getFullScanRange:2624).

    A comparison on a field ABSENT from the index is unservable
    (None), never an empty candidate frame: the reference marks
    non-indexed terms evaluation-only (delayed) rather than letting
    them emit empty index ranges — an empty frame ANDed with an
    indexed term would wrongly empty the whole candidate set and break
    the cap-invariance promise (the term still evaluates in phase 2)."""
    if fields is None:
        fields = indexed_fields(cidx)
    if isinstance(node, (CmpNode, RangeNode)):
        if isinstance(node, CmpNode) and node.op in ("!=", "!~"):
            return None
        if node.field.name.upper() not in fields:
            return None           # evaluation-only: field not indexed
        try:
            return _capped_term_info(cidx, node, field_types)
        except ValueError:
            return None
    if isinstance(node, NotNode):
        return None
    if isinstance(node, AndNode):
        out = None
        for t in node.terms:
            info = capped_candidates(cidx, t, field_types, fields)
            if info is None:
                continue          # negated/unservable term only narrows
            out = info if out is None else info_intersect(out, info)
        return out
    if isinstance(node, OrNode):
        out = None
        for t in node.terms:
            info = capped_candidates(cidx, t, field_types, fields)
            if info is None:
                return None       # an unservable OR branch taints the union
            out = info if out is None else info_union(out, info)
        return out
    return None


def capped_index_query(events: DataFrame, cidx: DataFrame, jexl: str,
                       id_col: str, date_col: str,
                       field_types: dict[str, str] | None = None,
                       fields: set[str] | None = None) -> DataFrame:
    """Index-driven fetch honoring the Uid.List cap: explicit rows
    become document lookups (semi-join on (shard, uid)), overflow rows
    become shard scans (semi-join on shard date), and the FULL JEXL
    predicate re-evaluates over the fetched events — exactly
    QueryIterator's two-phase shape, so results are cap-invariant.

    ``fields``: the index's field set when the caller already knows it
    (ingest config / a cached metadata read) — skips the per-plan
    distinct job, the reference's MetadataHelper-cache discipline."""
    from datawave_spark.compiler import compile_query
    from datawave_spark.jexl.parser import parse
    node = parse(jexl)
    info = capped_candidates(cidx, node, field_types, fields)
    ev = events.withColumn("__uid", F.col(id_col).cast("string")) \
               .withColumn("__shard", F.to_date(F.col(date_col)))
    if info is not None:
        explicit = (info.filter(F.col("uid").isNotNull())
                    .withColumnRenamed("event_date", "__shard")
                    .withColumnRenamed("uid", "__uid"))
        # The shard-range list is bounded by the number of shard DATES,
        # so collecting it at plan time is the same bounded read as
        # RangeStream materializing its ranges — and it lets the plan
        # drop the whole shard-scan branch (a second pass over events)
        # when every term resolved to explicit uids, and emit the shard
        # branch as a partition-prunable IN literal otherwise.
        # NULL shard dates (index built without a date column) carry
        # no range information — drop them, as the semi-join formulation
        # silently did.
        shard_dates = sorted(
            d for d in
            (r[0] for r in _info_shards(info).distinct().collect())
            if d is not None)
        doc_branch = ev.join(explicit, ["__shard", "__uid"], "left_semi")
        if shard_dates:
            fetched = doc_branch.unionByName(
                ev.filter(F.col("__shard").isin(shard_dates)))
        else:
            fetched = doc_branch
        # dedup UNCONDITIONALLY: results must be cap-invariant even for
        # non-unique ids (a doc matched by both branches, or duplicate
        # id rows, must not double under one cap and not another)
        fetched = fetched.dropDuplicates([id_col])
    else:
        fetched = ev
    return compile_query(fetched, node, field_types=field_types) \
        .drop("__uid", "__shard")


def index_hole_query(events: DataFrame, index: DataFrame, jexl: str,
                     id_col: str, date_col: str,
                     covered_until,
                     field_types: dict[str, str] | None = None
                     ) -> DataFrame:
    """Partial-index (index-hole) planning — PushdownMissingIndexRange
    NodesVisitor + IndexHoleMarkerJexlNode parity (DefaultQueryPlanner
    stage 20): when the stored index covers only shard dates up to a
    frontier (the steady state of an incremental ingest: index built
    through yesterday, today's partitions still raw), the plan is the
    UNION of

    - index-driven candidate fetch over the covered date range, and
    - a straight predicate scan over the uncovered partitions (the
      reference's full-scan range for the hole),

    both re-evaluating the full predicate.  The uncovered branch's
    date bound is a literal, so it partition-prunes to the hole —
    at 100 TB the hole is a day or two of partitions, not the corpus.
    """
    from datawave_spark.compiler import compile_query
    frontier = F.lit(covered_until).cast("date")
    shard = F.to_date(F.col(date_col))
    covered = events.filter(shard <= frontier)
    # NULL-dated rows fail BOTH date comparisons (null-false), so they
    # must be routed explicitly: an unsharded row cannot be in the
    # index (the index is keyed by shard date) — send it to the
    # predicate-scan branch so coverage stays invariant.
    uncovered = events.filter((shard > frontier) | shard.isNull())
    idx_branch = index_query(
        covered, index.filter(F.col("event_date") <= frontier),
        jexl, id_col, field_types)
    scan_branch = compile_query(uncovered, jexl, field_types=field_types)
    return idx_branch.unionByName(scan_branch)


def index_age_display(index: DataFrame, now,
                      buckets: tuple[int, ...] = (180, 90, 60, 30, 14, 7, 2)
                      ) -> DataFrame:
    """Index age report (ops-tools/index-validation
    AccumuloIndexAgeDisplay.java:5): count index entries per age
    bucket, each entry landing in the OLDEST bucket possible; bucket
    values < 2 days are ignored (setBuckets:55).  The age-off planning
    view — one map-side-combinable groupBy over the stored index."""
    bs = sorted({b for b in buckets if b >= 2}, reverse=True)
    if not bs:
        raise ValueError("no valid age buckets (all < 2 days)")
    age = F.datediff(F.lit(now).cast("date"), F.col("event_date"))
    expr = None
    for b in bs:                       # descending: oldest bucket wins
        cond = age >= b
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    expr = expr.otherwise(0)
    return (index.groupBy(expr.alias("age_bucket_days"))
            .agg(F.count(F.lit(1)).alias("n")))


def index_consistency(index: DataFrame, events: DataFrame,
                      fields: list[str], id_col: str,
                      date_col: str | None = None,
                      field_types: dict[str, str] | None = None
                      ) -> DataFrame:
    """Index-vs-data consistency report: (issue, field, n) where issue
    is ``orphaned_index`` (index entries whose event no longer exists —
    the age-off-ran-on-events-but-not-index drift the reference's
    index-validation ops tooling exists for) or ``missing_index``
    (event field values absent from the index — a failed ingest
    append).  Two anti-joins on the (field, value, uid) key, both
    co-partitioned on the same short columns; only nonzero issues
    produce rows."""
    expected = build_index(events, fields, id_col, date_col=date_col,
                           field_types=field_types) \
        .select("field", "value", "uid")
    # scope the stored side to the CHECKED fields — otherwise every
    # entry of an unchecked field counts as phantom orphan drift
    wanted = [f.upper() for f in fields]
    stored = (index.filter(F.col("field").isin(wanted))
              .select("field", "value", "uid"))
    orphaned = (stored.join(expected, ["field", "value", "uid"],
                            "left_anti")
                .groupBy("field").agg(F.count(F.lit(1)).alias("n"))
                .select(F.lit("orphaned_index").alias("issue"),
                        "field", "n"))
    missing = (expected.join(stored, ["field", "value", "uid"],
                             "left_anti")
               .groupBy("field").agg(F.count(F.lit(1)).alias("n"))
               .select(F.lit("missing_index").alias("issue"),
                       "field", "n"))
    return orphaned.union(missing)
