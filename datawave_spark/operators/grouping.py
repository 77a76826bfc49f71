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
