"""As-of (point-in-time) join — for every left row, the most recent
right row at-or-before its timestamp per key.

Spark has no ASOF JOIN operator (DuckDB/kdb/Timescale do); the naive
range-join formulation (``l.ts >= r.ts`` + per-left max) is a
quadratic-per-key disaster at scale.  The Spark-native shape is the
UNION + WINDOW carry-forward:

    tag both sides → union on (key, ts) → one window per key ordered by
    (ts, tag) carrying ``last(right_value, ignoreNulls=True)`` forward →
    keep left rows.

ONE shuffle on the key (the window exchange), no join at all, and the
carried value is exactly the latest right row with ``r.ts <= l.ts``
(right rows sort before left rows at equal ts, so at-or-before
includes ties — ASOF's standard inclusive semantics).  At 100 TB this
is the same partition-by-key/sort-by-time pass a sessionization does;
skewed keys fall under AQE's skew handling like any window.

Right-side duplicates at the same (key, ts) are pre-aggregated by the
caller-supplied ``dedup`` expressions so the carried value is
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each ``left`` row, attach the most recent ``right`` row's
    ``value_cols`` with ``right.ts <= left.ts`` within the same
    ``key`` (NULL when no prior right row exists).  Output: all left
    columns + ``<col><suffix>`` per value column."""
    # deterministic right side: one row per (key, ts), max per value col
    r = (right.groupBy(key, ts)
         .agg(*[F.max(c).alias(c) for c in value_cols]))
    l_tag = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(f"__r_{c}")
          for c in value_cols])
    r_tag = r.select(
        *[F.lit(None).cast(t).alias(c) if c not in (key, ts) else F.col(c)
          for c, t in left.dtypes],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols])
    u = l_tag.unionByName(r_tag)
    w = Window.partitionBy(key).orderBy(ts, "__side") \
        .rowsBetween(Window.unboundedPreceding, 0)
    for c in value_cols:
        u = u.withColumn(f"{c}{suffix}",
                         F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (u.filter(F.col("__side") == 1)
            .drop("__side", *[f"__r_{c}" for c in value_cols]))


def range_join(points: DataFrame, ts_col: str, intervals: DataFrame,
               start_col: str, end_col: str) -> DataFrame:
    """Interval-containment join WITHOUT an equi-key: every (point,
    interval) pair with ``start <= ts <= end``.

    A bare BETWEEN join gives Catalyst nothing to hash on →
    BroadcastNestedLoopJoin (fine for a small interval dim, fatal
    large×large).  This bucketizes time: each interval explodes into
    the day buckets it spans, points key by their day bucket, and the
    join becomes a plain hash equi-join on the bucket plus the exact
    BETWEEN residual — the standard interval-bucketing rewrite
    (fanout = interval span in buckets, which the caller sizes)."""
    pts = points.withColumn("__b", F.date_trunc("day", F.col(ts_col)))
    iv = intervals.withColumn("__b", F.explode(F.sequence(
        F.date_trunc("day", F.col(start_col)),
        F.date_trunc("day", F.col(end_col)),
        F.expr("interval 1 day"))))
    return (pts.join(iv, "__b")
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) <= F.col(end_col)))
            .drop("__b"))
