"""Query metrics — per-query execution statistics.

Reference: DataWave records per-stage planner timers
(DefaultQueryPlanner config.getTimers():452) and a query-metrics
service (query/metrics/) capturing scan counts, results returned,
elapsed time per query page.

Spark restatement: Catalyst/Tungsten already expose everything per
plan node; this module surfaces the useful subset without a metrics
service: wall time, output rows, and plan-shape counters (scans,
shuffles, broadcasts, whole-stage-codegen spans) read from the executed
plan — the numbers you check when deciding whether a plan would survive
a 100× scale-up."""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, functions as F


@dataclass
class QueryMetrics:
    wall_sec: float
    rows: int
    n_scans: int
    n_shuffles: int
    n_broadcasts: int
    n_codegen_spans: int
    pushed_filters: list[str] = dc_field(default_factory=list)

    def summary(self) -> str:
        return (f"{self.rows} rows in {self.wall_sec:.2f}s | "
                f"{self.n_scans} scans, {self.n_shuffles} shuffles, "
                f"{self.n_broadcasts} broadcasts, "
                f"{self.n_codegen_spans} codegen spans")


def plan_counters(df: DataFrame) -> dict[str, int | list[str]]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # FileScan.toString truncates long lists ("..., GreaterThan(value,250...")
    # without a closing bracket — capture to the first ] OR end-of-line
    pushed = re.findall(r"PushedFilters: \[([^\]\n]*)", plan)
    return {
        "n_scans": len(re.findall(r"FileScan|Scan parquet|BatchScan", plan)),
        "n_shuffles": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)),
        "n_broadcasts": len(re.findall(r"BroadcastExchange|BroadcastHashJoin", plan)),
        # codegen spans appear as "WholeStageCodegen (i)" in formatted
        # explain and as "*(i)" operator prefixes in plan toString
        "n_codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
                               or set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": [p for p in pushed if p.strip()],
    }


def run_with_metrics(df: DataFrame) -> tuple[int, QueryMetrics]:
    """Execute and collect metrics — the query-metrics record for one
    query.  Uses collect() so the DataFrame's own QueryExecution
    finalizes (AQE ``isFinalPlan=true`` exposes the codegen span ids);
    intended for result-sized frames, like the reference's metrics
    service which also materializes the page it measures."""
    t0 = time.perf_counter()
    rows = len(df.collect())
    wall = time.perf_counter() - t0
    c = plan_counters(df)
    return rows, QueryMetrics(
        wall_sec=round(wall, 4), rows=rows,
        n_scans=c["n_scans"], n_shuffles=c["n_shuffles"],
        n_broadcasts=c["n_broadcasts"],
        n_codegen_spans=c["n_codegen_spans"],
        pushed_filters=c["pushed_filters"])


def dashboard_summary(metrics: DataFrame,
                      latency_col: str = "latency_ms",
                      error_col: str = "error",
                      results_col: str = "result_count",
                      terms_col: str = "selector_count",
                      group_cols: list[str] | None = None) -> DataFrame:
    """DashboardQueryLogic parity (query/dashboard/DashboardFields.java,
    DashboardSummary.java): aggregate a frame of per-query metric rows
    into the dashboard's bucketed summary — latency buckets (≤3 s,
    ≤10 s, ≤60 s, >60 s), result-count buckets (0, ≤10K, ≤1M, >1M),
    term-count buckets (1, ≤16, ≤100, ≤1000, >1000), plus query /
    result / selector / error totals.  One groupBy of CASE sums —
    map-side combinable, so a metrics store of any size rolls up in a
    single shuffle of (groups × 1) rows."""
    g = group_cols or []
    lat, res, trm = (F.col(latency_col), F.col(results_col),
                     F.col(terms_col))

    def bucket(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return metrics.groupBy(*g).agg(
        F.count(F.lit(1)).alias("query_count"),
        F.sum(res).alias("result_count"),
        F.sum(trm).alias("selector_count"),
        F.sum(F.when(F.col(error_col), 1).otherwise(0))
         .alias("error_count"),
        bucket(lat <= 3000, "up_to_3sec"),
        bucket((lat > 3000) & (lat <= 10_000), "up_to_10sec"),
        bucket((lat > 10_000) & (lat <= 60_000), "up_to_60sec"),
        bucket(lat > 60_000, "more_than_60sec"),
        bucket(res == 0, "zero_results"),
        bucket((res > 0) & (res <= 10_000), "up_to_10k_results"),
        bucket((res > 10_000) & (res <= 1_000_000), "up_to_1m_results"),
        bucket(res > 1_000_000, "up_to_inf_results"),
        bucket(trm == 1, "one_term"),
        bucket((trm > 1) & (trm <= 16), "up_to_16_terms"),
        bucket((trm > 16) & (trm <= 100), "up_to_100_terms"),
        bucket((trm > 100) & (trm <= 1000), "up_to_1000_terms"),
        bucket(trm > 1000, "up_to_inf_terms"))


def ingest_daily_summary(file_latency: DataFrame,
                         day_col: str = "day") -> DataFrame:
    """Daily ingest-metrics rollup (warehouse/metrics-core
    IngestMetricsSummaryLoader.java + MetricsDailySummaryReducer,
    FileLatency.java:19-26 phase model): per day, how many files landed,
    how many events they carried, and the latency profile of the
    receive→transform→ingest→load pipeline.  One map-side-combinable
    groupBy over the file-latency log; the log itself is file-count
    sized, never event-sized."""
    total = (F.col("transform_ms") + F.col("ingest_ms")
             + F.col("loader_ms"))
    return (file_latency.groupBy(day_col)
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum("event_count").alias("n_events"),
                 F.sum(total).alias("sum_latency_ms"),
                 F.max(total).alias("max_latency_ms"),
                 # try_divide: a day whose phases all recorded 0 ms
                 # (sub-ms granularity) must yield NULL, not abort the
                 # whole rollup with an ANSI DIVIDE_BY_ZERO
                 (F.floor(F.try_divide(F.sum("event_count"),
                                       F.sum(total) / 1000.0)
                          * 10000 + F.lit(0.5))
                  / 10000.0).alias("events_per_sec")))
