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

from pyspark.sql import DataFrame


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
