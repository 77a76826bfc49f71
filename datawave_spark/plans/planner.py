"""The query lifecycle: parse → rewrite → extract options → compile →
post-transforms → paged results.

This is the Spark restatement of DataWave's 3-tier flow (SURVEY §3.1):
REST create → DefaultQueryPlanner.process (ShardQueryLogic.initialize,
query/planner/DefaultQueryPlanner.java:387) → tserver QueryIterator →
DocumentTransformer pages.  Here: the planner emits one DataFrame whose
Catalyst plan subsumes RangeStream range generation (partition pruning)
and the iterator tree (whole-stage codegen); paging is
``toLocalIterator``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from datawave_spark.compiler.columns import CompileContext, compile_node
from datawave_spark.compiler.rewrite import (
    QueryOptions, default_pipeline, extract_options, validate_thresholds,
)
from datawave_spark.jexl.ast import JexlNode
from datawave_spark.operators.grouping import group_by
from datawave_spark.operators.limit_fields import limit_fields
from datawave_spark.operators.unique import unique

# Spark's stringToTimestamp / stringToDate grammar (sql/catalyst
# DateTimeUtils) — the driver-side validator _normalization_fails uses
# instead of a one-row plan-time Spark job (advice r9).  Re-derived
# empirically against pyspark 4.1.2 try_cast (advice r10: the old
# single regex diverged on hour-only, T-prefixed/time-only, and
# zone-after-hh:mm shapes); tests/test_datetime_parity.py pins a
# 150+-shape corpus against try_cast itself.
import re as _re

_DATE_RE = _re.compile(
    r"([+-]?)(\d{4,6})(?:-(\d{1,2})(?:-(\d{1,2}))?)?")
_TIME_RE = _re.compile(
    r"(\d{1,2})(?::(\d{1,2})(?::(\d{1,2})(\.\d*)?)?)?")
_ZONE_NAMES: set | None = None


def _known_zone(name: str) -> bool:
    """Java ``ZoneId.of`` acceptance for a trailing named zone: the Z /
    UTC / GMT / UT specials, offset forms (also UTC±hh / GMT±hh
    prefixed), or an exact-case IANA region id — Spark's try_cast
    REJECTS unknown names ('XYZ', 'Foo/Bar'), so shape-only matching
    wrongly keeps terms."""
    global _ZONE_NAMES
    if name in ("Z", "UTC", "GMT", "UT"):
        return True
    m = _re.fullmatch(r"(?:UTC?|GMT)?([+-]\d{1,2}(?::\d{1,2}"
                      r"(?::\d{1,2})?)?)", name)
    if m:
        parts = [int(p) for p in _re.findall(r"\d+", m.group(1))]
        return parts[0] <= 18 and all(p <= 59 for p in parts[1:])
    if _ZONE_NAMES is None:
        try:
            from zoneinfo import available_timezones
            _ZONE_NAMES = set(available_timezones())
        except Exception:
            _ZONE_NAMES = set()
    return name in _ZONE_NAMES


def _valid_date_fields(yr: int, mo, dy, max_year: int) -> bool:
    if yr > max_year:
        return False
    if mo is not None and not 1 <= mo <= 12:
        return False
    if dy is not None:
        if mo in (4, 6, 9, 11):
            mx = 30
        elif mo == 2:
            leap = yr % 4 == 0 and (yr % 100 != 0 or yr % 400 == 0)
            mx = 29 if leap else 28
        else:
            mx = 31
        if not 1 <= dy <= mx:
            return False
    return True


def _valid_time_match(m) -> tuple:
    """(ok, complete): complete = full hh:mm:ss[.frac] (the only form
    a zone may follow)."""
    hh, mi, ss, _fr = m.groups()
    if int(hh) > 23:
        return False, False
    if mi is not None and int(mi) > 59:
        return False, False
    if ss is not None and int(ss) > 59:
        return False, False
    return True, ss is not None


def _spark_datetime_parseable(s: str, date_only: bool = False) -> bool:
    """True when ``try_cast(s as timestamp)`` (or ``as date`` when
    ``date_only``) would be non-null — a faithful driver-side port of
    DateTimeUtils.stringToTimestamp / stringToDate acceptance:

    - date part ``[+-]yyyy[-m[m][-d[d]]]`` with proleptic-Gregorian
      day validity and VALUE-capped years (timestamp micros fit a
      long → |year| ≲ 294246; date days fit an int → larger cap);
    - stringToDate then accepts ONE ' '/'T' separator plus ANY tail;
    - stringToTimestamp accepts hour-only / hh:mm / hh:mm:ss[.frac]
      time segments, a zone ONLY after the full hh:mm:ss form, and
      time-only inputs (``12:30``, ``T12``) with NO zone;
    - named zones must resolve in the tz database (exact case)."""
    s = s.strip()
    if not s:
        return False
    m = _DATE_RE.match(s)
    if m and (m.group(3) is not None or len(s) == m.end()
              or s[m.end()] in " T"):
        yr = int(m.group(2))
        mo = int(m.group(3)) if m.group(3) is not None else None
        dy = int(m.group(4)) if m.group(4) is not None else None
        if not _valid_date_fields(yr, mo, dy,
                                  5877610 if date_only else 294246):
            return False
        if len(s) == m.end():
            return True
        if s[m.end()] not in " T":
            return False
        if date_only:        # stringToDate: any tail after the sep
            return True
        return _time_with_optional_zone(s[m.end() + 1:])
    if date_only:
        return False
    # time-only: requires a ':' or a 'T' prefix
    if not s.startswith("T") and ":" not in s:
        return False
    return _time_with_optional_zone(s[1:] if s.startswith("T") else s)


def _time_with_optional_zone(rest: str) -> bool:
    tm = _TIME_RE.match(rest)
    if not tm:
        return False
    ok, complete = _valid_time_match(tm)
    if not ok:
        return False
    tail = rest[tm.end():]
    if not tail:
        return True
    if not complete:         # zone only after full hh:mm:ss[.frac]
        return False
    return _known_zone(tail.lstrip(" "))


@dataclass
class QueryResult:
    """A planned, executable query."""
    df: DataFrame
    options: QueryOptions
    plan_string: str          # rewritten JEXL — the EXPLAIN-style string
                              # (QueryPlanTest asserts on this in the
                              # reference); spark_plan() gives Catalyst's.

    def spark_plan(self) -> str:
        return self.df._jdf.queryExecution().executedPlan().toString()

    def to_view(self, name: str):
        """CachedResults parity (web-services/cached-results/.../
        CachedResultsBean.java:143-172): the reference copies results
        into MySQL so users can run SQL (ORDER BY / GROUP BY / joins)
        over them; here the result already IS a DataFrame — register it
        and use Spark SQL.  The whole subsystem dissolves into one
        line."""
        self.df.createOrReplaceTempView(name)
        return self.df.sparkSession

    def pages(self, page_size: int = 100) -> Iterator[list]:
        """RunningQuery.next() paging (RunningQuery.java:408) without
        collecting the whole result on the driver."""
        page = []
        for row in self.df.toLocalIterator():
            page.append(row)
            if len(page) >= page_size:
                yield page
                page = []
        if page:
            yield page


class QueryPlanner:
    """Plans JEXL or LUCENE queries against an event DataFrame.

    ``field_types`` binds normalizers per field (the metadata-table type
    registry, SURVEY §1.4); ``model`` maps query aliases to concrete
    fields (QueryModelVisitor).  Thresholds mirror
    ShardQueryConfiguration's fail-fast guards.
    """

    def __init__(self, df: DataFrame, *,
                 field_types: dict[str, str] | None = None,
                 model: dict[str, list[str]] | None = None,
                 reverse_model: dict[str, list[str]] | None = None,
                 whindex_mappings: dict[tuple[str, object], str] | None = None,
                 composites: dict[tuple[str, ...], str] | None = None,
                 stats: dict[str, int] | None = None,
                 index: DataFrame | None = None,
                 max_value_expansion: int = 50,
                 max_terms: int = 2500, max_depth: int = 2500,
                 rules: list | None = None,
                 date_index: DataFrame | None = None,
                 shard_col: str = "event_date",
                 allowed_fields: list[str] | None = None,
                 included_values: dict[str, list[str]] | None = None,
                 excluded_values: dict[str, list[str]] | None = None,
                 uuid_types: list | None = None,
                 max_results: int | None = None,
                 dn_result_limits: dict[str, int] | None = None,
                 system_from_limits: dict[str, int] | None = None,
                 document_permutations: list | None = None):
        self.df = df
        self.field_types = field_types
        self.model = model
        # DocumentPermutation hooks (function/DocumentPermutation.java,
        # applied by QueryIterator before evaluation;
        # BooksQueryTest.AuthorNameParts): DataFrame → DataFrame
        # transforms deriving evaluation-only fields — plain
        # withColumn lambdas here, so the derived columns stay inside
        # Catalyst's plan (no UDF unless the hook itself adds one).
        self.document_permutations = list(document_permutations or [])
        # The reference's model table carries SEPARATE forward and
        # reverse directions (WiseGuysIngest.java:950-1035 writes
        # "forward" and "reverse" mutations independently) — reverse
        # (result-column → alias renaming) defaults to mirroring the
        # forward map but can be overridden (pass {} to disable).
        self.reverse_model = reverse_model
        # WhindexVisitor config: (FIELD, value) → value-specific field
        # (DefaultQueryPlanner.java:1384, visitors/whindex/)
        self.whindex_mappings = whindex_mappings
        # ExpandCompositeTerms config: (member fields...) → composite
        # column created at ingest (DefaultQueryPlanner.java:1550)
        self.composites = composites
        # OrderByCostVisitor config: FIELD → distinct-value cardinality
        # (the index-stats table; DefaultQueryPlanner stage 28)
        self.stats = {k.upper(): v for k, v in stats.items()} if stats else None
        # RegexIndexExpansionVisitor config: the stored global-index
        # frame (sources.prepared.index_frame); positive regex terms on
        # indexed fields expand to pushable value disjunctions, capped
        # at max_value_expansion (MAX_UNFIELDED_EXPANSION analog)
        self.index = index
        self.max_value_expansion = max_value_expansion
        self.max_terms = max_terms
        self.max_depth = max_depth
        # Pluggable AST→AST transforms — the configurable pushdown-rule
        # hook (DefaultQueryPlanner.applyRules:2174, planner/rules/ +
        # planner/pushdown/rules/): deployment-specific rewrites run
        # after the default pipeline, in list order.
        self.rules = list(rules or [])
        # Date-index hint source (DateIndexHelper; stage 5 of the
        # rewrite pipeline): load-date conjuncts consult this frame and
        # inject a shard_col partition-prune next to the exact filter.
        self.date_index = date_index
        self.shard_col = shard_col
        # Restricted-parser config (syntax="LUCENE-CONTROLLED" /
        # "LUCENE-UUID"): parse-time field allow-list, deployment
        # include/exclude value clauses, registered UUID lookup types.
        self.allowed_fields = allowed_fields
        self.included_values = included_values
        self.excluded_values = excluded_values
        self.uuid_types = list(uuid_types or [])
        # Result-limit config (QueryLogic.getResultLimit,
        # core/query/.../logic/QueryLogic.java:412 + BaseQueryLogic
        # dnResultLimits:34): baseline max_results, overridden by a
        # systemFrom-keyed limit, then by the MINIMUM limit matching
        # any of the caller's DNs.
        self.max_results = max_results
        self.dn_result_limits = dn_result_limits
        self.system_from_limits = system_from_limits

    def result_limit(self, user_dns: list[str] | None = None,
                     system_from: str | None = None) -> int | None:
        """The row cap for one caller (QueryLogic.java:412 semantics);
        None = uncapped."""
        mx = self.max_results
        if self.system_from_limits and system_from is not None:
            mx = self.system_from_limits.get(system_from, mx)
        if self.dn_result_limits and user_dns:
            caps = [self.dn_result_limits[d] for d in user_dns
                    if d in self.dn_result_limits]
            if caps:
                mx = min(caps)
        return mx

    @classmethod
    def from_metadata(cls, df: DataFrame, metadata: DataFrame,
                      **kwargs) -> "QueryPlanner":
        """Bind field normalizers from the ingest metadata frame
        (sources.ingest.field_metadata) — the planner consulting the
        metadata table for types, exactly the reference's
        MetadataHelper-driven planning (SURVEY §1.4)."""
        rows = metadata.select("field", "normalizer").collect()
        field_types = {r.field: r.normalizer for r in rows
                       if r.normalizer and r.normalizer != "noop"}
        return cls(df, field_types=field_types, **kwargs)

    @classmethod
    def from_stats(cls, df: DataFrame, stats_df: DataFrame,
                   **kwargs) -> "QueryPlanner":
        """Bind cost-ordering cardinalities from the ingest-built
        index-stats table (sources.prepared.index_stats — the StatsJob
        HLL summary the reference's OrderByCostVisitor consults).  The
        stats frame is field-count-sized; collecting it is the same
        bounded metadata read the reference does at plan time."""
        rows = stats_df.select("field", "cardinality").collect()
        return cls(df, stats={r.field: int(r.cardinality) for r in rows},
                   **kwargs)

    def _test_nonexistent_fields(self, node) -> None:
        """FieldMissingFromSchemaVisitor.getNonExistentFields semantics
        (DefaultQueryPlanner.java:1442): query fields must exist in the
        data dictionary — here the frame's columns, the field-type
        registry, and query-model aliases; special fields
        (_ANYFIELD_/_NOFIELD_, HIT_TERM, property-marker labels) and
        grouping-context suffixes (deconstructIdentifier) pass."""
        from datawave_spark.plans.catalog import (_collect_fields,
                                                  InvalidQueryException)
        import re as _re
        df = self.df
        for permute in self.document_permutations:
            df = permute(df)       # lazy — schema only
        known = {c.upper() for c in df.columns}
        known |= {k.upper() for k in (self.field_types or {})}
        known |= {k.upper() for k in (self.model or {})}
        known |= {"_NOFIELD_", "NOFIELD", "HIT_TERM", "RECORD_ID"}
        missing = set()
        for f in _collect_fields(node):
            base = f.split("[", 1)[0].split(".", 1)[0]
            if base in known or f in known \
                    or _re.fullmatch(r"_[A-Za-z]+_", f):
                continue
            missing.add(f)
        if missing:
            raise InvalidQueryException(
                "the query contains fields not in the data dictionary: "
                + ", ".join(sorted(missing)))

    def parse(self, query: str, syntax: str = "JEXL") -> JexlNode:
        """Dialects: JEXL, LUCENE, and the reference's restricted
        parser variants — LUCENE-CONTROLLED (parse-time field
        allow-list + deployment include/exclude value clauses,
        LuceneToJexlControlledQueryParser.java; configure via planner
        attrs ``allowed_fields`` / ``included_values`` /
        ``excluded_values``) and LUCENE-UUID (fielded lookups on
        registered ``uuid_types`` only,
        LuceneToJexlUUIDQueryParser.java)."""
        syntax = syntax.upper()
        if syntax == "LUCENE":
            from datawave_spark.lucene.parser import parse_lucene
            return parse_lucene(query)
        if syntax == "LUCENE-CONTROLLED":
            from datawave_spark.lucene.controlled import parse_controlled
            return parse_controlled(
                query, allowed_fields=getattr(self, "allowed_fields", None),
                included_values=getattr(self, "included_values", None),
                excluded_values=getattr(self, "excluded_values", None))
        if syntax == "LUCENE-UUID":
            from datawave_spark.lucene.controlled import parse_uuid_query
            return parse_uuid_query(query,
                                    getattr(self, "uuid_types", []) or [])
        if syntax == "JEXL":
            from datawave_spark.jexl.parser import parse as parse_jexl
            return parse_jexl(query)
        raise ValueError(f"unknown syntax {syntax!r} (JEXL, LUCENE, "
                         "LUCENE-CONTROLLED or LUCENE-UUID)")

    def plan(self, query: str, syntax: str = "JEXL",
             return_fields: list[str] | None = None,
             disallowed_fields: list[str] | None = None,
             user_dns: list[str] | None = None,
             system_from: str | None = None,
             ignore_nonexistent_fields: bool = False) -> QueryResult:
        import datawave_spark.functions  # noqa: F401  (register compilers)
        from pyspark.sql import types as T
        from datawave_spark.compiler.rewrite import (expand_composites,
                                                     whindex)
        node = self.parse(query, syntax)
        node = default_pipeline(node)
        for rule in self.rules:
            node = rule(node)
        # Reference pass order: whindex (1384) before composite
        # expansion (1550) — a whindex remap may complete a composite.
        if self.whindex_mappings:
            node = whindex(node, self.whindex_mappings)
        if self.composites:
            arr = {f.name.upper() for f in self.df.schema.fields
                   if isinstance(f.dataType, T.ArrayType)}
            node = expand_composites(node, self.composites,
                                     array_fields=arr)
        if self.stats:
            from datawave_spark.compiler.rewrite import order_by_cost
            node = order_by_cost(node, self.stats)
        if self.index is not None:
            from datawave_spark.compiler.rewrite import (
                expand_regex_from_index)
            node = default_pipeline(expand_regex_from_index(
                node, self.index, max_expansion=self.max_value_expansion))
        node, opts = extract_options(node)
        if not ignore_nonexistent_fields:
            # DefaultQueryPlanner.timedTestForNonExistentFields:1434
            # (gated by QueryParameters.IGNORE_NONEXISTENT_FIELDS,
            # ShardQueryLogic.java:1077; MiscQueryTest
            # .testFieldIgnoreParam1): a query naming a field the data
            # dictionary has never seen is a BadRequest, not an empty
            # result.  Runs AFTER option extraction and the rewrite
            # passes — the reference validates at :884, after its own
            # model/whindex stages — so option arguments (granularity
            # suffixes), rule-introduced synthetic fields, and whindex
            # remaps never trip it.  Special fields and model aliases
            # pass.
            self._test_nonexistent_fields(node)
        validate_thresholds(node, self.max_terms, self.max_depth)

        src = self._ensure_tf_columns(self.df, node)
        for permute in self.document_permutations:
            src = permute(src)
        if self.date_index is not None:
            hint = self._date_index_hint(node)
            if hint is not None:
                src = src.filter(
                    F.col(self.shard_col).cast("date").isin(hint)
                    if hint else F.lit(False))
        model = self.model
        if opts.noexpansion and model:
            # #NOEXPANSION(fields): listed aliases bypass query-model
            # expansion (QueryOptionsFromQueryVisitor's noexpansion)
            skip = {f.upper() for f in opts.noexpansion}
            model = {k: v for k, v in model.items() if k.upper() not in skip}
        ctx = CompileContext.for_dataframe(
            src, field_types=self.field_types, model=model)
        if opts.lenient:
            from datawave_spark.compiler.rewrite import apply_lenient_fields
            node = apply_lenient_fields(
                node, opts.lenient, opts.strict,
                lambda f, op, v: self._normalization_fails(ctx, f, op, v))
        out = src.filter(compile_node(node, ctx))

        # Post-transform chain — GroupingTransform / UniqueTransform /
        # LimitFields order mirrors QueryIterator's pipeline (:467-887).
        if opts.limit_fields:
            out = limit_fields(out, opts.limit_fields)
        if opts.groupby:
            aggs = [(op, f, f"{op.lower()}_{f}".lower())
                    for op, f in opts.aggregations]
            out = group_by(out, [g for g in opts.groupby], aggs)
        elif opts.aggregations:
            # #SUM/#MIN/... without #GROUPBY: global aggregation
            from datawave_spark.operators.grouping import _AGGS
            exprs = [_AGGS[op](F.col(f)).alias(f"{op.lower()}_{f}".lower())
                     for op, f in opts.aggregations]
            out = out.agg(*exprs)
        elif opts.unique:
            ts_cols = [c for c, t in self.df.dtypes if t == "timestamp"]
            most_recent = ts_cols[:1] if opts.most_recent_unique else None
            out = unique(out, opts.unique, most_recent_by=most_recent)
        if opts.excerpt_fields:
            out = self._apply_excerpts(out, node, opts.excerpt_fields)
        if opts.rename:
            for old, new in opts.rename.items():
                if old in out.columns:
                    out = out.withColumnRenamed(old, new)
        reverse = self.reverse_model if self.reverse_model is not None \
            else model
        if reverse:
            out = self._apply_reverse_model(out, reverse)
        # Projection (QueryIterator.java:864 + ShardQueryLogic
        # returnFields / disallowlistedFields): a whitelist keeps listed
        # columns, a disallowlist drops listed columns — expressed as a
        # select so Catalyst prunes the parquet scan down to what the
        # page actually returns (ReadSchema shrinks; asserted in
        # tests/test_plan_quality.py).
        if return_fields:
            want = {f.upper() for f in return_fields}
            out = out.select(*[c for c in out.columns if c.upper() in want])
        if disallowed_fields:
            deny = {f.upper() for f in disallowed_fields}
            out = out.select(*[c for c in out.columns
                               if c.upper() not in deny])
        # Per-caller row cap (RunningQuery.java:159 applies
        # logic.getResultLimit at query start; truncation order is
        # stream-arbitrary there and partition-arbitrary here)
        cap = self.result_limit(user_dns, system_from)
        if cap is not None:
            out = out.limit(cap)

        return QueryResult(df=out, options=opts, plan_string=str(node))

    def _normalization_fails(self, ctx, field: str, op: str, value) -> bool:
        """True when ``value`` fails the field's literal normalization —
        the SAME ``_typed_literal`` path ``compile_cmp`` takes to its
        cannot-match branch, so ``apply_lenient_fields`` and the
        compiler agree by construction.  A model alias fails only when
        EVERY concrete expansion fails (a partially-viable expansion
        already keeps its good branches: failing ones compile FALSE and
        Catalyst prunes them from the OR).  Regex terms never fail
        (patterns only string-fold, never type-normalize)."""
        from datawave_spark.compiler.columns import (
            _element_type, _typed_literal, get_normalizer)
        positive = {"!=": "==", "!~": "=~"}.get(op, op)
        if positive == "=~":
            return False
        from pyspark.sql import types as T
        fields = ctx.model.get(field.upper(), [field])
        any_checked = False
        for f in fields:
            spec = ctx.resolve(f)
            if spec is None:
                continue
            any_checked = True
            et = _element_type(ctx.spark_type(spec))
            norm = get_normalizer(spec.normalizer)
            if isinstance(et, (T.TimestampType, T.TimestampNTZType,
                               T.DateType)):
                # datetime literals validate through Spark's own cast
                # (one constant-folded row — a bounded plan-time check,
                # like the reference's plan-time normalization); a
                # literal the field's normalizer itself rejects is a
                # failed normalization, not a planner crash (review r9)
                try:
                    lit = str(norm.normalize_literal(value))
                except (TypeError, ValueError):
                    continue
                # driver-side port of Spark's stringToTimestamp /
                # stringToDate accepted grammar (no per-term Spark job
                # at plan time — advice r9; per-type grammars r11)
                if _spark_datetime_parseable(
                        lit, date_only=isinstance(et, T.DateType)):
                    return False
                continue
            try:
                _typed_literal(value, norm, et)
                return False
            except (ValueError, TypeError):
                continue
        return any_checked

    _LOAD_DATE_FNS = {"betweenLoadDates": "between",
                      "afterLoadDate": "after",
                      "beforeLoadDate": "before"}

    def _date_index_hint(self, node) -> list | None:
        """Shards-and-days hint (DateIndexHelper parity, wired at
        DefaultQueryPlanner stage 5): walk the query's REQUIRED
        conjuncts for load-date filter functions with literal ISO /
        yyyyMMdd bounds, look each range up in the date index, and
        intersect the hints.  Returns None when no conjunct constrains
        a load date (no pruning), else the sorted shard-date list
        (possibly empty → always-false)."""
        import datetime
        from datawave_spark.jexl.ast import (AndNode, FuncNode, Identifier,
                                             Literal)
        from datawave_spark.sources.date_index import shards_for_range

        def parse_date(v):
            s = str(v)
            for fmt in ("%Y-%m-%d", "%Y%m%d"):
                try:
                    return datetime.datetime.strptime(s, fmt).date()
                except ValueError:
                    continue
            return None

        def conjuncts(n):
            if isinstance(n, AndNode):
                for t in n.terms:
                    yield from conjuncts(t)
            else:
                yield n

        hint: set | None = None
        for term in conjuncts(node):
            if not (isinstance(term, FuncNode)
                    and term.namespace == "filter"
                    and term.name in self._LOAD_DATE_FNS):
                continue
            args = list(term.args)
            field = "LOAD_DATE"
            if args and isinstance(args[0], Identifier):
                field = args[0].name.upper()
                args = args[1:]
            lits = [a.value for a in args if isinstance(a, Literal)]
            kind = self._LOAD_DATE_FNS[term.name]
            if kind == "between" and len(lits) >= 2:
                lo, hi = parse_date(lits[0]), parse_date(lits[1])
            elif kind == "after" and lits:
                lo, hi = parse_date(lits[0]), datetime.date(9999, 12, 31)
            elif kind == "before" and lits:
                lo, hi = datetime.date(1970, 1, 1), parse_date(lits[0])
            else:
                continue
            if lo is None or hi is None:
                continue          # unparseable pattern → no hint, stay safe
            if field not in self._date_index_fields():
                # The index was not built over this date field — absence
                # of index rows means "unknown", never "no shards"
                # (mirrors expand_regex_from_index's fields_in_index
                # guard).  Skip: the exact predicate still evaluates.
                continue
            shards = set(shards_for_range(self.date_index, field, lo, hi))
            hint = shards if hint is None else hint & shards
        return sorted(hint) if hint is not None else None

    def _date_index_fields(self) -> set[str]:
        """Distinct FIELD values the date index covers — one bounded
        metadata read, cached per planner."""
        if not hasattr(self, "_didx_fields"):
            self._didx_fields = {
                r.field for r in
                self.date_index.select("field").distinct().collect()}
        return self._didx_fields

    def predict(self, query: str, syntax: str = "JEXL",
                total_rows: int | None = None) -> dict:
        """Pre-execution cost prediction (QueryExecutorBean.predict:993
        — the reference estimates a query's cost from table stats
        before running it).  Selectivity model over the stats table
        (per-field distinct counts, ``prepared.index_stats``):

        - ``F == v``   → 1/cardinality(F) (uniform-values assumption)
        - range/regex  → fixed fractions (1/3, 1/10)
        - AND → product (independence), OR → inclusion-exclusion,
          NOT → complement

        Returns {"estimated_rows", "selectivity", "total_rows",
        "plan_string"}.  A heuristic, not a promise — the reference's
        predictor is the same kind of stats lookup."""
        from datawave_spark.jexl.ast import (AndNode, CmpNode, FieldCmpNode,
                                             FuncNode, NotNode, OrNode)
        node = default_pipeline(self.parse(query, syntax))

        def sel(n) -> float:
            if isinstance(n, CmpNode):
                if n.op in ("!=", "!~"):
                    pos = CmpNode("==" if n.op == "!=" else "=~",
                                  n.field, n.value)
                    return 1.0 - sel(pos)
                if n.op == "==":
                    card = (self.stats or {}).get(n.field.name.upper())
                    return 1.0 / card if card else 0.1
                if n.op == "=~":
                    return 0.1
                return 1.0 / 3.0          # range ops
            if isinstance(n, AndNode):
                out = 1.0
                for t in n.terms:
                    out *= sel(t)
                return out
            if isinstance(n, OrNode):
                miss = 1.0
                for t in n.terms:
                    miss *= 1.0 - sel(t)
                return 1.0 - miss
            if isinstance(n, NotNode):
                return 1.0 - sel(n.term)
            if isinstance(n, (FuncNode, FieldCmpNode)):
                return 0.5                # evaluation-only terms
            return 1.0

        if total_rows is None:
            total_rows = self.df.count()
        s = max(0.0, min(1.0, sel(node)))
        return {"estimated_rows": int(round(s * total_rows)),
                "selectivity": round(s, 6),
                "total_rows": total_rows,
                "plan_string": str(node)}

    @staticmethod
    def _apply_reverse_model(df: DataFrame,
                             model: dict[str, list[str]]) -> DataFrame:
        """Reverse query-model mapping on OUTPUT (QueryModelVisitor /
        DocumentTransformer parity, DefaultQueryPlanner.java:1342): the
        user queried in model-alias vocabulary, so result columns whose
        physical names are model members are renamed BACK to the alias.
        Where an alias expands to several concrete fields that all
        survive into the result, the reference's attribute bag holds
        duplicates under one name; DataFrame columns must be unique, so
        subsequent members get ``ALIAS_2``, ``ALIAS_3``, ... (a
        documented representational divergence, not a semantic one)."""
        reverse: dict[str, str] = {}
        for alias, fields in model.items():
            for f in fields:
                reverse.setdefault(f.upper(), alias)
        taken = {c.upper() for c in df.columns}
        for c in list(df.columns):
            alias = reverse.get(c.upper())
            if alias is None:
                continue
            target, i = alias, 1
            while target.upper() in taken - {c.upper()}:
                i += 1
                target = f"{alias}_{i}"
            taken.discard(c.upper())
            taken.add(target.upper())
            df = df.withColumnRenamed(c, target)
        return df

    @staticmethod
    def _ensure_tf_columns(df: DataFrame, node) -> DataFrame:
        """content: functions need ``{zone}_tf`` offset maps.  Ingest
        builds them once (the scale path); for ad-hoc queries over raw
        text the planner tokenizes on the fly."""
        from datawave_spark.functions.content import DEFAULT_ZONE
        from datawave_spark.jexl.ast import FuncNode, Identifier
        from datawave_spark.sources.ingest import tokenize

        zones: set[str] = set()
        scored_zones: set[str] = set()

        def walk(n):
            if isinstance(n, FuncNode) and n.namespace == "content":
                zone = (n.args[0].name
                        if n.args and isinstance(n.args[0], Identifier)
                        else DEFAULT_ZONE)
                zones.add(zone)
                if n.name == "scoredPhrase":
                    scored_zones.add(zone)
            for c in n.children():
                walk(c)

        walk(node)
        cols = {c.upper(): c for c in df.columns}
        out = df
        id_col = None
        for zone in zones:
            if f"{zone.upper()}_TF" in cols or "TF" in cols:
                continue
            src = cols.get(zone.upper())
            if src is None:
                continue
            if id_col is None:
                out, id_col = QueryPlanner._doc_id(out)
            out = tokenize(out, src, id_col=id_col, zone=src,
                           emit_scores=zone in scored_zones)
        if id_col == "__doc_id":
            out = out.drop("__doc_id")
        return out

    @staticmethod
    def _doc_id(df: DataFrame) -> tuple[DataFrame, str]:
        """A real unique document id for tokenize's join-back.  The
        first column is NOT assumed to be a key — if it weren't unique,
        tokenize's groupBy would merge token offset maps across distinct
        rows and content:phrase could match documents that never
        contained the terms.  Prefers a ``uid`` column (the ingest
        standard); otherwise derives a deterministic surrogate hash over
        the whole row (identical duplicate rows collide harmlessly —
        their token maps are identical)."""
        for c in df.columns:
            if c.upper() == "UID":
                return df, c
        surrogate = F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
        return df.withColumn("__doc_id", surrogate), "__doc_id"

    @staticmethod
    def _apply_excerpts(out: DataFrame, node, fields: list[str]) -> DataFrame:
        """#EXCERPT_FIELDS: for each requested text field, attach
        ±5-token windows around the query's content/equality terms on
        that field (ExcerptTransform semantics — excerpts are computed
        for the terms that drove the hit)."""
        from datawave_spark.jexl.ast import CmpNode, FuncNode, Identifier, Literal
        from datawave_spark.operators.excerpt import excerpts

        def terms_for(field: str) -> list[str]:
            found: list[str] = []

            def walk(n):
                if isinstance(n, FuncNode) and n.namespace == "content":
                    args = list(n.args)
                    zone = None
                    if args and isinstance(args[0], Identifier):
                        zone = args[0].name
                        args = args[1:]
                    if zone is None or zone.upper() == field.upper():
                        found.extend(str(a.value) for a in args
                                     if isinstance(a, Literal)
                                     and isinstance(a.value, str))
                elif isinstance(n, CmpNode) and n.op == "==" \
                        and n.field.name.upper() == field.upper() \
                        and isinstance(n.value.value, str):
                    found.append(n.value.value)
                for c in n.children():
                    walk(c)

            walk(node)
            return found

        out, id_col = QueryPlanner._doc_id(out)
        for field in fields:
            src = next((c for c in out.columns
                        if c.upper() == field.upper()), None)
            if src is None:
                continue
            for i, term in enumerate(terms_for(field)):
                out = excerpts(out, src, id_col, term, window=5,
                               out_col=f"{src}_excerpt_{i}")
        if id_col == "__doc_id":
            out = out.drop("__doc_id")
        return out
