"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship JEXL-compiled query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Query keys are grouped by the SURVEY §2 area they cover:
  jexl_*      — the JEXL→Column compiler spine (§2.2)
  filter_*    — filter:/f: evaluation-phase functions (§2.2)
  geo_*       — geo: functions (§2.2)
  groupby_*   — #GROUPBY aggregators (§2.4)
  unique_*    — #UNIQUE granularities (§2.4)
  discovery_* / facet_* / count_* — index-derived aggregations (§2.4)
  tpch_*      — CachedResults-style SQL surface (§2.1 sink; free on Spark)
  edge_*      — graph/edge queries (§2.3/§3.3)
  ssdeep_*    — similarity join (§2.3)
  dedup_* / ann_* / text_* — training-data pipeline ops
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datawave_spark.entries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: JEXL-compiled predicate + groupBy over events at
    sf0.001 — exercises parser, compiler, multi-value semantics and the
    aggregation transform in one plan."""
    return QUERIES["flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v for k, v in QUERIES.items() if k != "flagship"}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
