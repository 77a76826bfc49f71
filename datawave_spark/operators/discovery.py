"""Discovery + facets + field-index counts — the index-derived
aggregation family.

Reference:
- DiscoveryLogic (warehouse/query-core/src/main/java/datawave/query/
  discovery/DiscoveryLogic.java:71 + DiscoveryIterator) — term →
  per-field/datatype/date frequencies read from the global index;
- FacetedQueryLogic (query/tables/facets/FacetedQueryLogic.java:41,
  ingest FacetHandler.java:52) — per-field value counts for a query,
  from a precomputed facet table;
- FieldIndexCountQueryLogic (query/tables/shard/
  FieldIndexCountQueryLogic.java:52) — index-entry counts per
  field/value/datatype without fetching documents.

Spark-first: there is no materialized inverted index — these become a
single unpivot (``stack``) + groupBy over the event frame.  The unpivot
is map-side (no shuffle); the one shuffle is the count groupBy keyed on
(field, value), whose cardinality is vocabulary-sized, not corpus-sized
— map-side partial aggregation keeps it small at 100 TB.  A 100 TB
deployment that runs discovery constantly would materialize the result
once per ingest batch as a real "index frame" table; the operator is the
same code either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _unpivot(df: DataFrame, fields: list[str],
             keep: list[str] | None = None) -> DataFrame:
    """(field, value[, keep...]) long frame from wide columns, nulls
    dropped.  ``keep`` columns are renamed ``__keep_{c}`` to avoid
    colliding with unpivoted field names."""
    pairs = ", ".join(f"'{f}', cast(`{f}` as string)" for f in fields)
    exprs = [f"stack({len(fields)}, {pairs}) as (field, value)"]
    exprs += [f"`{c}` as `__keep_{c}`" for c in (keep or [])]
    return df.selectExpr(*exprs).filter(F.col("value").isNotNull())


def facets(df: DataFrame, fields: list[str]) -> DataFrame:
    """Per-field value counts over a (possibly pre-filtered) frame →
    (field, value, cnt)."""
    return (_unpivot(df, fields)
            .groupBy("field", "value")
            .agg(F.count(F.lit(1)).alias("cnt")))


def discovery(df: DataFrame, fields: list[str], date_col: str) -> DataFrame:
    """Term frequencies per field per day → (field, value, day, cnt),
    DiscoveryLogic's (term, field, date → count) shape."""
    return (_unpivot(df, fields, keep=[date_col])
            .withColumn("day", F.to_date(F.col(f"__keep_{date_col}")))
            .groupBy("field", "value", "day")
            .agg(F.count(F.lit(1)).alias("cnt")))


def field_index_counts(df: DataFrame, fields: list[str],
                       datatype_col: str | None = None) -> DataFrame:
    """FieldIndexCountQueryLogic: counts per field/value (/datatype)."""
    long_df = _unpivot(df, fields)
    keys = ["field", "value"] + ([datatype_col] if datatype_col else [])
    return long_df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def facets_with_cardinality(df: DataFrame, facet_fields: list[str],
                            cardinality_of: str) -> DataFrame:
    """Facet counts + per-facet-value cardinality sketch of another
    field — the precomputed facet table's (count, HLL) pair
    (FacetHandler.java:52 stores cardinality sketches alongside
    counts).  Uses Spark's native HLL++ (``approx_count_distinct``),
    whose sketch is engine-private — accuracy is unit-tested; the
    DRIVER-GATED variant is :func:`facets_with_cardinality_det`."""
    return (_unpivot(df, facet_fields, keep=[cardinality_of])
            .groupBy("field", "value")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.approx_count_distinct(F.col(f"__keep_{cardinality_of}"))
                 .alias("cardinality")))


def facets_with_cardinality_det(df: DataFrame, facet_fields: list[str],
                                cardinality_of: str, b: int = 8) -> DataFrame:
    """:func:`facets_with_cardinality` with the HOUSE md5-bit HLL
    (sketches.hll_group_estimate) instead of the engine-private HLL++,
    so the whole (count, cardinality-estimate) pair is replayable in
    DuckDB and hash-checkable by the driver gate.  Two
    facet-table-sized aggregates joined on (field, value): the count
    covers ALL rows (null ``cardinality_of`` included, matching the
    approx variant's count semantics) while the sketch drops nulls, so
    a single groupBy cannot produce both — the join input is
    vocabulary-sized either way."""
    from datawave_spark.operators.sketches import hll_group_estimate
    long_df = _unpivot(df, facet_fields, keep=[cardinality_of])
    cnt = (long_df.groupBy("field", "value")
           .agg(F.count(F.lit(1)).alias("cnt")))
    sk = hll_group_estimate(
        long_df.select("field", "value",
                       F.col(f"__keep_{cardinality_of}").alias("v")),
        ["field", "value"], "v", b=b)
    return (cnt.join(sk.select("field", "value",
                               F.col("estimate").alias("cardinality")),
                     ["field", "value"], "left")
            .select("field", "value", "cnt", "cardinality"))


def cardinality(df: DataFrame, fields: list[str]) -> DataFrame:
    """Index-stats HLL parity (StatsHyperLogMapper → HyperLogFieldSummary):
    per-field approximate cardinality via HyperLogLog++."""
    rows = [F.struct(F.lit(f).alias("field"),
                     F.approx_count_distinct(F.col(f)).alias("cardinality"))
            for f in fields]
    return df.agg(F.array(*rows).alias("a")).selectExpr(
        "inline(a)")
