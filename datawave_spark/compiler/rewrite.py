"""AST→AST rewrite passes.

The analogue of DataWave's visitor pipeline (DefaultQueryPlanner.
updateQueryTree:701-849, visitors in query/jexl/visitors/).  Catalyst
re-optimizes whatever we emit, so most reference passes are unnecessary
for performance — these exist for (a) semantics (options extraction,
model expansion happen before compilation), (b) plan-string parity
tests, and (c) fail-fast threshold guards:

- ``flatten``          — TreeFlatteningRebuildingVisitor (1308)
- ``dedup_terms``      — UniqueExpressionTermsVisitor (1360)
- ``rewrite_negations``— RewriteNegationsVisitor (1332): != → !(==)
- ``prune``            — QueryPruningVisitor (1431): boolean constant
                         folding
- ``extract_options``  — QueryOptionsFromQueryVisitor (720): pull
                         f:groupby / f:unique / f:sum / ... out of the
                         expression into an options dict
- ``count_terms`` / ``depth`` / ``validate_thresholds`` —
  TermCountingVisitor / DepthVisitor / ShardQueryConfiguration guards
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datawave_spark.jexl.ast import (
    AndNode, CmpNode, FieldCmpNode, FuncNode, Identifier, JexlNode,
    Literal, NotNode, OrNode, RangeNode,
)

TRUE = Literal(True)
FALSE = Literal(False)


def _rebuild(node: JexlNode, terms: list[JexlNode], cls) -> JexlNode:
    if not terms:
        return TRUE if cls is AndNode else FALSE
    if len(terms) == 1:
        return terms[0]
    return cls(tuple(terms))


def flatten(node: JexlNode) -> JexlNode:
    """Collapse nested ANDs/ORs: (a && (b && c)) → (a && b && c)."""
    if isinstance(node, (AndNode, OrNode)):
        cls = type(node)
        out: list[JexlNode] = []
        for t in node.terms:
            ft = flatten(t)
            if isinstance(ft, cls):
                out.extend(ft.terms)
            else:
                out.append(ft)
        return _rebuild(node, out, cls)
    if isinstance(node, NotNode):
        return NotNode(flatten(node.term))
    return node


def dedup_terms(node: JexlNode) -> JexlNode:
    """A && A → A (UniqueExpressionTermsVisitor)."""
    if isinstance(node, (AndNode, OrNode)):
        cls = type(node)
        seen: list[JexlNode] = []
        for t in node.terms:
            dt = dedup_terms(t)
            if dt not in seen:
                seen.append(dt)
        return _rebuild(node, seen, cls)
    if isinstance(node, NotNode):
        return NotNode(dedup_terms(node.term))
    return node


def rewrite_negations(node: JexlNode) -> JexlNode:
    """``A != b`` → ``!(A == b)``; ``A !~ r`` → ``!(A =~ r)`` —
    RewriteNegationsVisitor parity (the compiler handles either form;
    this normalizes the tree for plan-string comparison)."""
    if isinstance(node, CmpNode) and node.op in ("!=", "!~"):
        pos = "==" if node.op == "!=" else "=~"
        return NotNode(CmpNode(pos, node.field, node.value))
    if isinstance(node, FieldCmpNode) and node.op == "!=":
        return NotNode(FieldCmpNode("==", node.left, node.right))
    if isinstance(node, (AndNode, OrNode)):
        return type(node)(tuple(rewrite_negations(t) for t in node.terms))
    if isinstance(node, NotNode):
        return NotNode(rewrite_negations(node.term))
    return node


def prune(node: JexlNode) -> JexlNode:
    """Boolean constant folding (QueryPruningVisitor): true && A → A,
    false && A → false, !true → false, etc."""
    if isinstance(node, NotNode):
        inner = prune(node.term)
        if isinstance(inner, Literal) and isinstance(inner.value, bool):
            return Literal(not inner.value)
        return NotNode(inner)
    if isinstance(node, (AndNode, OrNode)):
        is_and = isinstance(node, AndNode)
        unit, zero = (True, False) if is_and else (False, True)
        out: list[JexlNode] = []
        for t in node.terms:
            pt = prune(t)
            if isinstance(pt, Literal) and isinstance(pt.value, bool):
                if pt.value == zero:
                    return Literal(zero)
                continue  # drop identity element
            out.append(pt)
        return _rebuild(node, out, type(node))
    return node


def mark_bounded_ranges(node: JexlNode) -> JexlNode:
    """PLANNER-stage bounded-range coalescing (the reference detects
    unmarked same-field lo/hi conjunctions and marks them
    BOUNDED_RANGE — UnmarkedBoundedRangeDetectionVisitor +
    DefaultQueryPlanner's marking fix-up): within one AND, a field with
    exactly ONE lower-bound and ONE upper-bound comparison fuses into a
    RangeNode (same-value semantics on multi-valued fields, index-
    servable as a single value interval).  Raw ``compile_query``
    deliberately keeps the unmarked conjunction's independent any-value
    semantics (commons-JEXL evaluation parity, test_compiler_referee);
    this pass is the PLANNED-query behavior, applied in the
    QueryPlanner pipeline like the reference's."""
    if isinstance(node, AndNode):
        terms = [mark_bounded_ranges(t) for t in node.terms]
        by_field: dict[str, list[CmpNode]] = {}
        for t in terms:
            if isinstance(t, CmpNode) and t.op in ("<", ">", "<=", ">="):
                by_field.setdefault(t.field.name.upper(), []).append(t)
        fused: dict[int, JexlNode] = {}
        drop: set[int] = set()
        for cmps in by_field.values():
            los = [c for c in cmps if c.op in (">", ">=")]
            his = [c for c in cmps if c.op in ("<", "<=")]
            if len(los) == 1 and len(his) == 1:
                lo, hi = los[0], his[0]
                rng = RangeNode(lo.field, lo.op, lo.value,
                                hi.op, hi.value)
                i_lo, i_hi = terms.index(lo), terms.index(hi)
                fused[min(i_lo, i_hi)] = rng
                drop.add(max(i_lo, i_hi))
        if fused:
            out = [fused.get(i, t) for i, t in enumerate(terms)
                   if i not in drop]
            return _rebuild(node, out, AndNode)
        return AndNode(tuple(terms))
    if isinstance(node, OrNode):
        return OrNode(tuple(mark_bounded_ranges(t) for t in node.terms))
    if isinstance(node, NotNode):
        return NotNode(mark_bounded_ranges(node.term))
    return node


def default_pipeline(node: JexlNode) -> JexlNode:
    """The standard rewrite chain applied before compilation."""
    return mark_bounded_ranges(prune(dedup_terms(flatten(node))))


# ---------------------------------------------------------------- options

# f: functions that are OPTIONS, not predicates (QueryOptionsFromQuery
# Visitor.java:58-64 + UniqueFunction granularity forms).
OPTION_FUNCS = {
    "groupby", "unique", "most_recent_unique", "sum", "min", "max",
    "average", "count", "rename", "excerpt_fields", "limit_fields",
    "noexpansion", "lenient", "strict", "options",
}


@dataclass
class QueryOptions:
    """Extracted post-query options — drives the transform chain
    (GroupingTransform / UniqueTransform / LimitFields / Excerpt)."""
    groupby: list[str] = dc_field(default_factory=list)
    unique: dict[str, str] = dc_field(default_factory=dict)  # field → granularity
    most_recent_unique: bool = False
    aggregations: list[tuple[str, str]] = dc_field(default_factory=list)  # (op, field)
    rename: dict[str, str] = dc_field(default_factory=dict)
    excerpt_fields: list[str] = dc_field(default_factory=list)
    limit_fields: dict[str, int] = dc_field(default_factory=dict)
    noexpansion: list[str] = dc_field(default_factory=list)  # fields exempt from model expansion
    # f:lenient('F1','F2',...) / f:strict(...) take FIELD LISTS
    # (QueryOptionsFromQueryVisitor.java:40,258-266): lenient fields DROP
    # terms whose literal fails normalization; strict fields force the
    # raw term to evaluation (see apply_lenient_fields).
    lenient: list[str] = dc_field(default_factory=list)
    strict: list[str] = dc_field(default_factory=list)
    # f:options key/value pairs (Options.java / QueryFunctions
    # OPTIONS_FUNCTION) — free-form query parameters; recognized keys
    # are folded into the typed fields above, the rest kept here.
    extra: dict[str, str] = dc_field(default_factory=dict)


def _arg_str(a: JexlNode) -> str:
    return a.name if isinstance(a, Identifier) else str(a.value)


def _parse_unique_arg(raw: str) -> tuple[str, str]:
    # '$'-prefixed = JEXL-escaped field name (UniqueTest passes
    # "$DEATH_DATE,BIRTH_DATE"); granularity suffix [DAY] optional
    raw = raw.lstrip("$")
    if "[" in raw and raw.endswith("]"):
        f, g = raw[:-1].split("[", 1)
        return f, g.upper()
    return raw, "ALL"


def extract_options(node: JexlNode) -> tuple[JexlNode, QueryOptions]:
    """Pull option f: functions out of the tree; the remaining tree is
    pruned (options contribute no predicate)."""
    opts = QueryOptions()

    def walk(n: JexlNode) -> JexlNode:
        if isinstance(n, FuncNode) and n.namespace == "f" \
                and n.name in OPTION_FUNCS:
            args = [_arg_str(a) for a in n.args]
            if n.name == "groupby":
                # '$'-prefixed = JEXL-escaped field name
                # (GroupingTest.testGroupByLuceneFunction passes
                # '#GROUPBY('AGE','$GENDER')'); deconstruct like the
                # unique args do
                opts.groupby.extend(a.lstrip("$") for a in args)
            elif n.name in ("unique", "most_recent_unique"):
                opts.most_recent_unique |= n.name == "most_recent_unique"
                for raw in args:
                    f, g = _parse_unique_arg(raw)
                    opts.unique[f] = g
            elif n.name in ("sum", "min", "max", "average", "count"):
                opts.aggregations.extend((n.name.upper(), a.lstrip("$"))
                                         for a in args)
            elif n.name == "rename":
                for raw in args:
                    old, new = raw.split("=", 1)
                    opts.rename[old] = new
            elif n.name == "excerpt_fields":
                opts.excerpt_fields.extend(args)
            elif n.name == "limit_fields":
                for raw in args:
                    f, lim = raw.split("=", 1)
                    opts.limit_fields[f] = int(lim)
            elif n.name == "noexpansion":
                opts.noexpansion.extend(args)
            elif n.name == "lenient":
                opts.lenient.extend(args)
            elif n.name == "strict":
                opts.strict.extend(args)
            elif n.name == "options":
                # #OPTIONS key/value pairs; known keys map onto the
                # typed option fields (the reference folds them into
                # the query's parameter map the same way).  An odd
                # argument count means a dangling key — reject it (the
                # LUCENE front-end does; silently dropping the key
                # would make a typo'd option vanish without error).
                if len(args) % 2:
                    raise ValueError(
                        f"f:options takes key/value PAIRS; got odd "
                        f"argument count {len(args)}: {args!r}")
                for k, v in zip(args[0::2], args[1::2]):
                    key = k.lower()
                    if key in ("group.fields", "groupby"):
                        opts.groupby.extend(x.lstrip("$")
                                            for x in v.split(","))
                    elif key in ("unique.fields", "unique"):
                        for raw in v.split(","):
                            f, g = _parse_unique_arg(raw)
                            opts.unique[f] = g
                    elif key == "limit.fields":
                        for raw in v.split(","):
                            f, lim = raw.split("=", 1)
                            opts.limit_fields[f] = int(lim)
                    elif key == "excerpt.fields":
                        opts.excerpt_fields.extend(v.split(","))
                    else:
                        opts.extra[k] = v
            return TRUE
        if isinstance(n, (AndNode, OrNode)):
            return type(n)(tuple(walk(t) for t in n.terms))
        if isinstance(n, NotNode):
            return NotNode(walk(n.term))
        return n

    return prune(walk(node)), opts


# ------------------------------------------------------------- validators

def count_terms(node: JexlNode) -> int:
    """TermCountingVisitor: leaf comparisons + function calls."""
    if isinstance(node, (CmpNode, FieldCmpNode, FuncNode)):
        return 1
    if isinstance(node, (AndNode, OrNode)):
        return sum(count_terms(t) for t in node.terms)
    if isinstance(node, NotNode):
        return count_terms(node.term)
    return 0


def depth(node: JexlNode) -> int:
    """DepthVisitor."""
    kids = node.children()
    if not kids:
        return 1
    return 1 + max(depth(k) for k in kids)


class ThresholdExceeded(ValueError):
    pass


def validate_thresholds(node: JexlNode, max_terms: int = 2500,
                        max_depth: int = 2500) -> None:
    """ShardQueryConfiguration maxTermThreshold / maxDepthThreshold
    fail-fast guards."""
    n = count_terms(node)
    if n > max_terms:
        raise ThresholdExceeded(f"query has {n} terms > maxTermThreshold {max_terms}")
    d = depth(node)
    if d > max_depth:
        raise ThresholdExceeded(f"query depth {d} > maxDepthThreshold {max_depth}")


def apply_lenient_fields(node: JexlNode, lenient: list[str],
                         strict: list[str],
                         fails) -> JexlNode:
    """LENIENT / STRICT field semantics
    (ExpandMultiNormalizedTerms.java:296-420 + QueryModelVisitor.java:
    316-351): when a comparison's literal fails the field's
    normalization,

    - a LENIENT field's term is DROPPED — REMOVED from its parent
      connective.  User-visible result semantics pinned by
      LenientFieldsTest.java:245-279: a dropped term generates NO index
      candidates, so an OR whose branches all dropped returns ZERO rows
      ("AG > 'abc10'" → []), and an OR with surviving branches returns
      only THEIR matches ("NAM == 'abc40'" → [], not all rows) — while
      under an AND the marker evaluates truthy over the siblings'
      candidates (DroppedExpression.java:70-82 — assignments are
      truthy), so the dropped conjunct simply vanishes.  Both shapes
      are exactly "remove from parent; a fully-dropped query is empty";
    - a STRICT field keeps the original raw term evaluation-only
      (:394-399).  Our compiler's cannot-match FALSE is equivalent over
      typed storage: a stored value that fails the same normalization
      is NULL col-side (try_cast) and never matches the raw literal —
      so strict terms are left untouched;
    - a field marked BOTH gets neither (the reference warns and applies
      neither, :303-307) — also left untouched.

    ``fails(field_name, op, value) -> bool`` is the compile-side
    normalization check (the planner binds it to the same
    ``_typed_literal`` path ``compile_cmp`` uses, so pass and compiler
    cannot drift)."""
    len_set = {f.upper() for f in lenient}
    both = len_set & {f.upper() for f in strict}
    len_set -= both

    def walk(n: JexlNode) -> JexlNode | None:
        """→ rewritten node, or None when the whole subtree dropped."""
        if isinstance(n, CmpNode) and n.field.name.upper() in len_set \
                and n.value.value is not None \
                and fails(n.field.name, n.op, n.value.value):
            return None
        if isinstance(n, RangeNode) and n.field.name.upper() in len_set:
            lo_bad = fails(n.field.name, ">=", n.lo.value)
            hi_bad = fails(n.field.name, "<=", n.hi.value)
            if lo_bad and hi_bad:
                return None
            if lo_bad or hi_bad:
                # only the failing bound drops — the surviving bound
                # keeps evaluating (ExpandMultiNormalizedTerms drops
                # per-term, review r9)
                keep_op, keep_val = ((n.hi_op, n.hi) if lo_bad
                                     else (n.lo_op, n.lo))
                return CmpNode(keep_op, n.field, keep_val)
        if isinstance(n, (AndNode, OrNode)):
            kept = [w for w in (walk(t) for t in n.terms) if w is not None]
            if not kept:
                return None
            return _rebuild(n, kept, type(n))
        if isinstance(n, NotNode):
            # the DROPPED marker evaluates truthy at the evaluation
            # phase (DroppedExpression assignments), so a NEGATED
            # dropped term is FALSE, never removed (review r9)
            inner = walk(n.term)
            return FALSE if inner is None else NotNode(inner)
        return n

    if not len_set:
        return node
    out = walk(node)
    # a fully-dropped query has no executable term → no candidates →
    # empty results (LenientFieldsTest's first case)
    return FALSE if out is None else prune(out)


def whindex(node: JexlNode, mappings: dict[tuple[str, object], str]) -> JexlNode:
    """Value-specific field remapping (WhindexVisitor parity,
    DefaultQueryPlanner.java:1384, visitors/whindex/): configured
    (field, value) pairs rewrite to a value-specific field — e.g. a
    generic GEO field queried with a known landmark value remaps to the
    per-type field that actually indexes it.  Keys are (FIELD_UPPER,
    value)."""
    def walk(n: JexlNode) -> JexlNode:
        if isinstance(n, CmpNode):
            target = mappings.get((n.field.name.upper(), n.value.value))
            if target:
                return CmpNode(n.op, Identifier(target), n.value)
            return n
        if isinstance(n, (AndNode, OrNode)):
            return type(n)(tuple(walk(t) for t in n.terms))
        if isinstance(n, NotNode):
            return NotNode(walk(n.term))
        return n

    return walk(node)


def expand_composites(node: JexlNode,
                      composites: dict[tuple[str, ...], str],
                      sep: str = "\x00",
                      array_fields: set[str] | None = None) -> JexlNode:
    """Composite-field expansion (ExpandCompositeTerms parity,
    DefaultQueryPlanner.java:1550, query/composite/Composite.java:12):
    an AND of equality terms on co-indexed fields collapses into ONE
    equality on the generated composite column (value = joined parts),
    turning a multi-predicate scan into a single sortable term —
    build the column at ingest with ``composite_column``.

    The collapse is skipped when a member field appears more than once
    in the AND (A=='1' && A=='2' && B=='3' is unsatisfiable on a scalar
    / multi-match on an array — collapsing on the last value would be
    silently wrong), when a member value is null, or when a member
    field is array-typed (``array_fields``; the ingest composite column
    concatenates the cast array, which never equals the joined scalar
    parts)."""
    ordered = {tuple(f.upper() for f in k): v for k, v in composites.items()}
    arr = {f.upper() for f in (array_fields or ())}

    def walk(n: JexlNode) -> JexlNode:
        if isinstance(n, AndNode):
            terms = [walk(t) for t in n.terms]
            eq_counts: dict[str, int] = {}
            eqs = {}
            for t in terms:
                if isinstance(t, CmpNode) and t.op == "==":
                    fname = t.field.name.upper()
                    eq_counts[fname] = eq_counts.get(fname, 0) + 1
                    eqs[fname] = t
            for fields, target in ordered.items():
                if not set(fields) <= set(eqs):
                    continue
                if any(eq_counts[f] != 1 for f in fields):
                    continue
                if set(fields) & arr:
                    continue
                if any(eqs[f].value.value is None for f in fields):
                    continue
                value = sep.join(str(eqs[f].value.value) for f in fields)
                keep = [t for t in terms
                        if not (isinstance(t, CmpNode) and t.op == "=="
                                and t.field.name.upper() in fields)]
                keep.append(CmpNode("==", Identifier(target), Literal(value)))
                return _rebuild(n, keep, AndNode)
            return _rebuild(n, terms, AndNode)
        if isinstance(n, OrNode):
            return _rebuild(n, [walk(t) for t in n.terms], OrNode)
        if isinstance(n, NotNode):
            return NotNode(walk(n.term))
        return n

    return walk(node)


# ------------------------------------------------------------- cost ordering

# Node-class base costs mirror the reference's comparator family
# (jexl/nodes/DefaultJexlNodeComparator.java, FieldCostComparator,
# TermCostComparator, wired by visitors/order/OrderByCostVisitor.java:36):
# equality < range < regex < field-compare < functions; negations last
# within their operand's class.
_COST_EQ, _COST_RANGE, _COST_REGEX, _COST_FIELDCMP, _COST_FUNC = 0, 1, 2, 3, 4


def _term_cost(n: JexlNode, stats: dict[str, int]) -> tuple[int, float]:
    """(class_cost, estimated match fraction).  The fraction for an
    equality term is 1/field-cardinality from the index-stats table —
    higher-cardinality fields are MORE selective, so they sort first in
    an AND and the codegen'd short-circuit skips the expensive tail for
    most rows."""
    if isinstance(n, CmpNode):
        if n.op == "==":
            card = stats.get(n.field.name.upper(), 0)
            return (_COST_EQ, 1.0 / card if card > 0 else 0.5)
        if n.op in ("<", ">", "<=", ">="):
            return (_COST_RANGE, 0.33)
        return (_COST_REGEX, 0.5)          # =~ / !~
    if isinstance(n, RangeNode):
        # two bounds on one value: tighter than a single bound
        return (_COST_RANGE, 0.2)
    if isinstance(n, FieldCmpNode):
        return (_COST_FIELDCMP, 0.6)
    if isinstance(n, FuncNode):
        return (_COST_FUNC, 0.9)
    if isinstance(n, NotNode):
        base, sel = _term_cost(n.term, stats)
        return (base, min(1.0, 1.0 - sel + 1e-9))
    if isinstance(n, AndNode):
        costs = [_term_cost(t, stats) for t in n.terms]
        frac = 1.0
        for _, s in costs:
            frac *= s
        return (max(c for c, _ in costs), frac)
    if isinstance(n, OrNode):
        costs = [_term_cost(t, stats) for t in n.terms]
        return (max(c for c, _ in costs),
                min(1.0, sum(s for _, s in costs)))
    return (_COST_FUNC, 1.0)


def order_by_cost(node: JexlNode, stats: dict[str, int]) -> JexlNode:
    """OrderByCostVisitor parity (visitors/order/OrderByCostVisitor.java:36,
    DefaultQueryPlanner stage 28): order AND/OR children by estimated
    cost so cheap, selective terms evaluate first.  Spark's codegen'd
    boolean operators short-circuit left-to-right, so on a 100 TB scan
    this ordering decides how many rows reach the expensive tail terms
    (regexes, geo UDFs).  ``stats`` maps FIELD (upper) → distinct-value
    cardinality — the ingest-built index-stats table
    (sources/prepared.index_stats, StatsJob parity).

    ANDs put low-match-fraction (selective) terms first; ORs put
    high-match-fraction terms first (each row stops at the first true
    disjunct).  The sort is stable: equal-cost terms keep author order.
    """
    def walk(n: JexlNode) -> JexlNode:
        if isinstance(n, (AndNode, OrNode)):
            terms = [walk(t) for t in n.terms]
            if isinstance(n, AndNode):
                key = lambda t: _term_cost(t, stats)            # noqa: E731
            else:
                key = lambda t: (_term_cost(t, stats)[0],       # noqa: E731
                                 -_term_cost(t, stats)[1])
            return type(n)(tuple(sorted(terms, key=key)))
        if isinstance(n, NotNode):
            return NotNode(walk(n.term))
        return n

    return walk(node)


def order_by_implied_cost(node: JexlNode) -> JexlNode:
    """DefaultJexlNodeComparator parity (jexl/nodes/
    DefaultJexlNodeComparator.java:26, the sortQueryPreIndexWith
    ImpliedCounts path): terms order by node-class cost, then
    leaf-before-junction, then LEXICOGRAPHICALLY on the term's query
    string — the deterministic no-stats ordering ShapesTest pins
    ('TYPE == ...' after 'SHAPE == ...')."""
    def key(t: JexlNode):
        cls, _ = _term_cost(t, {})
        return (cls, isinstance(t, (AndNode, OrNode)), str(t))

    def walk(n: JexlNode) -> JexlNode:
        if isinstance(n, (AndNode, OrNode)):
            return type(n)(tuple(sorted((walk(t) for t in n.terms),
                                        key=key)))
        if isinstance(n, NotNode):
            return NotNode(walk(n.term))
        return n

    return walk(node)


def expand_regex_from_index(node: JexlNode, index, *,
                            max_expansion: int = 50) -> JexlNode:
    """Regex→index expansion (RegexIndexExpansionVisitor /
    ExpandMultiNormalizedTerms parity, wired at DefaultQueryPlanner's
    regex-expansion stage): each positive ``FIELD =~ 're'`` whose field
    is present in the stored global-index frame is replaced by the OR
    of the concrete indexed values matching the regex — turning an
    unpushable full-scan regex into an IN-shaped disjunction Catalyst
    pushes into the parquet scan.

    The index lookup is a bounded plan-time read (``max_expansion + 1``
    rows max — the reference's ScannerStream against shardIndex with
    MAX_UNFIELDED_EXPANSION); a regex matching more values than the
    threshold stays an evaluation-phase regex, exactly the reference's
    ExceededValueThresholdMarker fallback.  Negated regexes (under
    ``!``/NOT) are left for evaluation: expanding them against the
    index would change semantics for unindexed values.

    A regex matching ZERO indexed values compiles to FALSE — the index
    is authoritative for indexed fields (an empty global-index range
    returns no documents in the reference, RangeStream.java:106).
    """
    from pyspark.sql import functions as F

    fields_in_index = None  # lazy: only read when a regex term exists

    def lookup(field: str, regex: str) -> list[str] | None:
        nonlocal fields_in_index
        if fields_in_index is None:
            fields_in_index = {
                r[0] for r in index.select("field").distinct().collect()}
        if field.upper() not in fields_in_index:
            return None
        rows = (index.filter((F.col("field") == field.upper())
                             & F.col("value").rlike(f"^(?:{regex})$"))
                .select("value").distinct()
                .limit(max_expansion + 1).collect())
        if len(rows) > max_expansion:
            return None
        return sorted(r.value for r in rows)

    def walk(n: JexlNode, positive: bool) -> JexlNode:
        if isinstance(n, CmpNode) and n.op == "=~" and positive:
            vals = lookup(n.field.name, str(n.value.value))
            if vals is None:
                return n
            if not vals:
                return Literal(False)
            terms = tuple(CmpNode("==", Identifier(n.field.name), Literal(v))
                          for v in vals)
            return terms[0] if len(terms) == 1 else OrNode(terms)
        if isinstance(n, (AndNode, OrNode)):
            return type(n)(tuple(walk(t, positive) for t in n.terms))
        if isinstance(n, NotNode):
            return NotNode(walk(n.term, not positive))
        return n

    return walk(node, True)
