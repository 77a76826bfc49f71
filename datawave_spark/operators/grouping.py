"""#GROUPBY + aggregator surface.

Reference: warehouse/query-core/src/main/java/datawave/query/common/
grouping/DocumentGrouper.java:118 with per-group aggregators
(SumAggregator.java:18, CountAggregator.java:17, AverageAggregator.java:20,
MinAggregator.java:15, MaxAggregator.java:15), executed partial-on-tserver
(GroupingIterator, wired at QueryIterator.java:476) and final-on-webserver
(GroupingTransform.java:34).

Spark restatement: ``df.groupBy(...).agg(...)`` — Catalyst's partial
aggregation (map-side combine) + final aggregation reproduces the
reference's two-phase scheme automatically, and at 100 TB the map-side
partial keeps the shuffle proportional to group cardinality, not row
count.  Multi-valued (ArrayType) group fields are exploded first: DataWave
groups on each VALUE of a field, not on the value-set (DocumentGrouper
"grouping context" semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_AGGS = {
    "SUM": F.sum, "COUNT": F.count, "AVERAGE": F.avg, "AVG": F.avg,
    "MIN": F.min, "MAX": F.max,
}


def group_by(df: DataFrame, group_fields: list[str],
             aggregations: list[tuple[str, str, str]] | None = None,
             count_alias: str = "record_count") -> DataFrame:
    """#GROUPBY(group_fields) with #SUM/#COUNT/#AVERAGE/#MIN/#MAX.

    ``aggregations`` is ``[(op, field, alias), ...]``; a row count per
    group (the reference's implicit group cardinality) is always emitted
    as ``count_alias``.  ArrayType fields — group AND aggregated —
    explode PAIRED BY POSITION (one ``arrays_zip`` explode), the
    DocumentGrouper grouping-context pairing: AGE,GENDER groups the
    (AGE.i, GENDER.i) instance pairs, never their cartesian product
    (GroupingTest.testGroupByAgeAndGenderWithBatchSizeOfSix's expected
    counts require exactly this).
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    agg_fields = [fld for _, fld, _ in (aggregations or [])]
    involved = list(dict.fromkeys(list(group_fields) + agg_fields))
    arr = [c for c in involved if isinstance(schema.get(c), T.ArrayType)]
    out = df
    if len(arr) > 1:
        out = out.withColumn(
            "__ctx", F.explode_outer(F.arrays_zip(*[F.col(c) for c in arr])))
        for c in arr:
            out = out.withColumn(c, F.col(f"__ctx.{c}"))
        out = out.drop("__ctx")
    elif arr:
        out = out.withColumn(arr[0], F.explode_outer(arr[0]))
    exprs = [F.count(F.lit(1)).alias(count_alias)]
    for op, fld, alias in (aggregations or []):
        fn = _AGGS[op.upper()]
        col = F.col(fld)
        et = schema.get(fld)
        et = et.elementType if isinstance(et, T.ArrayType) else et
        if op.upper() != "COUNT" and isinstance(et, T.StringType):
            # try_cast: unparseable values drop out of the aggregate
            # (Spark aggregates skip NULL) instead of ANSI-aborting (r8)
            col = col.try_cast("double")
        exprs.append(fn(col).alias(alias))
    return out.groupBy(*group_fields).agg(*exprs)


def group_by_context(df: DataFrame, group_col: str, group_fields: list[str],
                     aggregations: list[tuple[str, str, str]] | None = None,
                     count_alias: str = "record_count") -> DataFrame:
    """Grouping-context #GROUPBY (DocumentGrouper.java:118's sibling
    semantics): ``group_col`` is an ``array<struct>`` column where each
    struct is one sibling group; the group key is the TUPLE of
    ``group_fields`` taken from the SAME struct — the pairing DataWave
    reconstructs from FIELD.context.instance names, which the nested
    representation gives us directly.  Aggregated fields also come from
    the struct."""
    exploded = df.select("*", F.explode(F.col(group_col)).alias("__g"))
    keys = [F.col(f"__g.{f}").alias(f) for f in group_fields]
    exprs = [F.count(F.lit(1)).alias(count_alias)]
    for op, fld, alias in (aggregations or []):
        exprs.append(_AGGS[op.upper()](
            F.col(f"__g.{fld}").try_cast("double")).alias(alias))
    return exploded.groupBy(*keys).agg(*exprs)


# ---- DocumentGrouper: ad-hoc grouped documents (name-encoded contexts)

def _parse_entry_name(name: str):
    """FIELD[.GROUP[.junk...]][.INSTANCE] → (field, group, instance).
    The commonality token is the FIRST part after the field, the
    instance the trailing integer; intermediate parts are nesting junk
    (DocumentGrouperTest's 'AGE.FOO.A.B.C.1' → (AGE, FOO, 1))."""
    parts = name.split(".")
    field, rest = parts[0], parts[1:]
    inst = rest[-1] if rest and rest[-1].isdigit() else None
    mid = rest[:-1] if inst is not None else rest
    group = mid[0] if mid else None
    return field, group, inst


def _group_one_document(entries, gf: list[str], af: list[str]):
    """Pure port of DocumentGrouper.java:118's pairing rules, pinned by
    common/grouping/DocumentGrouperTest:

    - entries in the same (non-empty GROUP, INSTANCE) context across
      group fields DIRECT-MATCH into one tuple;
    - a field with direct matches drops its unmatched-context entries;
    - a field with NO direct matches cross-products its VALUES with
      the matched tuples (or with the other unmatched fields);
    - aggregation fields attach their direct-match context's value to
      the group key built from that context — or ALL values to every
      key when no contexts are shared.

    → dict: key tuple (per gf order, None for absent) →
      [count, {agg_field: [values]}]
    """
    import itertools

    per_field: dict[str, list] = {}
    for e in entries:
        f, g, i = _parse_entry_name(e["name"])
        ctx = (g, i) if (g is not None and i is not None) else None
        vals = e["values"]             # Arrow hands a numpy array —
        vals = [] if vals is None else list(vals)   # no truthiness
        for v in vals:
            per_field.setdefault(f, []).append((ctx, v))

    present = [f for f in gf if f in per_field]
    ctxs = {f: {c for c, _ in per_field[f] if c} for f in present}
    shared: set = set()
    for a_i in range(len(present)):
        for b_i in range(a_i + 1, len(present)):
            shared |= ctxs[present[a_i]] & ctxs[present[b_i]]
    matched = [f for f in present if ctxs[f] & shared]
    unmatched = [f for f in present if f not in matched]

    tuples: list[tuple[dict, object]] = []   # ({field: value}, ctx)
    if matched and shared:
        for c in sorted(shared):
            vals = {f: [v for cc, v in per_field[f] if cc == c]
                    for f in matched}
            here = [f for f in matched if vals[f]]
            for combo in itertools.product(*[vals[f] for f in here]):
                tuples.append((dict(zip(here, combo)), c))
    else:
        tuples = [({}, None)]
    for f in unmatched:
        # carry the VALUE's own context when the tuple has none yet —
        # a single group field's keys are backed by their entries'
        # contexts (aggregation attaches per direct-match context)
        tuples = [({**t, f: v}, c if c is not None else vc)
                  for t, c in tuples for vc, v in per_field[f]]
    tuples = [(t, c) for t, c in tuples if t]

    out: dict[tuple, list] = {}
    for t, c in tuples:
        key = tuple(t.get(f) for f in gf)
        rec = out.setdefault(key, [0, {a: [] for a in af}, set()])
        rec[0] += 1
        if c is not None:
            rec[2].add(c)           # contexts backing this key
    for a in af:
        if a not in per_field:
            continue
        a_ctxs = {c for c, _ in per_field[a] if c}
        group_ctxs = set().union(*(ctxs[f] for f in present)) \
            if present else set()
        direct = a_ctxs & group_ctxs
        for key, rec in out.items():
            if direct:
                vals = [v for c, v in per_field[a] if c in direct
                        and (not rec[2] or c in rec[2])]
            else:
                vals = [v for _, v in per_field[a]]
            rec[1][a].extend(vals)
    return out


def document_grouper(df: DataFrame, entries_col: str,
                     group_fields: list[str],
                     agg_fields: list[str] | None = None,
                     count_alias: str = "record_count") -> DataFrame:
    """DocumentGrouper over ad-hoc grouped documents: ``entries_col``
    is ``array<struct<name:string, values:array<string>>>`` — field
    names carry the grouping context/instance encoding
    (SimpleGroupFieldNameParser's shapes).  Per-document pairing runs
    in ``mapInPandas`` (genuinely per-document custom logic — the
    DocumentGrouper itself); the cross-document combine is a plain
    Catalyst groupBy, so the shuffle carries only per-document partial
    aggregates (group-cardinality-sized, 100 TB-safe)."""
    import pandas as pd
    af = list(agg_fields or [])
    gf = [f.upper() for f in group_fields]
    cols = [f"g_{i}" for i in range(len(gf))]
    fields = ", ".join(f"`{c}` string" for c in cols)
    aggs = ", ".join(
        f"`{a}_sum` double, `{a}_min` double, `{a}_max` double, "
        f"`{a}_cnt` long" for a in af)
    schema = fields + f", `{count_alias}` long" + (", " + aggs if aggs else "")

    def gen(batches):
        for pdf in batches:
            rows = []
            for ents in pdf[entries_col]:
                grouped = _group_one_document(list(ents), gf, af)
                for key, (cnt, avals, _c) in grouped.items():
                    row = list(key) + [cnt]
                    for a in af:
                        nums = [float(v) for v in avals[a]]
                        row += [sum(nums) if nums else None,
                                min(nums) if nums else None,
                                max(nums) if nums else None,
                                len(nums)]
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=cols + [count_alias] + [
                    f"{a}_{s}" for a in af
                    for s in ("sum", "min", "max", "cnt")])

    # spread before the per-document Python pass: a one-split local
    # scan would serialize the whole pairing stage onto one task (r11;
    # no-op on already-wide scans)
    from datawave_spark.util import spread
    inter = spread(df.select(entries_col)).mapInPandas(gen, schema)
    exprs = [F.sum(count_alias).alias(count_alias)]
    for a in af:
        exprs += [F.sum(f"{a}_sum").alias(f"{a}_sum"),
                  F.min(f"{a}_min").alias(f"{a}_min"),
                  F.max(f"{a}_max").alias(f"{a}_max"),
                  F.sum(f"{a}_cnt").alias(f"{a}_cnt")]
    out = inter.groupBy(*cols).agg(*exprs)
    for c, f in zip(cols, gf):
        out = out.withColumnRenamed(c, f)
    for a in af:
        out = out.withColumn(
            f"{a}_avg", F.col(f"{a}_sum") / F.col(f"{a}_cnt"))
    return out
