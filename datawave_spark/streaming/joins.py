"""Stream-stream joins — a capability the reference cannot express.

DataWave's "live ingest" is micro-batched MapReduce (IngestJob.java:
115-127,483); correlating two live feeds requires landing both and
re-querying.  Structured Streaming joins them in-flight: with
watermarks on both sides and a time-bound join condition, state is
bounded and late rows beyond the watermark are dropped deterministically
(SURVEY §2.7 maps this as a new capability next to session windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str = "ts", right_ts: str = "ts",
                  within: str = "10 minutes",
                  join_type: str = "inner") -> DataFrame:
    """Watermarked stream-stream interval join: pair each left row with
    right rows sharing ``key`` whose timestamp falls inside
    [left_ts, left_ts + within] — the attribution-join shape
    (click → purchase within N minutes).

    Both sides are watermarked by ``within``, which lets Spark expire
    join state once the slower watermark passes the interval end — the
    state-bound guarantee that makes this viable on an unbounded
    100 TB/day feed.  ``left_ts``/``right_ts`` must be distinct column
    names (rename before calling); output carries both.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names "
                         "(rename one side before joining)")
    lw = left.withWatermark(left_ts, within)
    rw = right.withWatermark(right_ts, within)
    lk, rk = f"__lk_{key}", key
    lw = lw.withColumnRenamed(key, lk)
    cond = ((F.col(lk) == F.col(rk))
            & (F.col(right_ts) >= F.col(left_ts))
            & (F.col(right_ts) <= F.col(left_ts) + F.expr(
                f"INTERVAL {within}")))
    return (lw.join(rw, cond, join_type)
            .withColumnRenamed(lk, f"{key}_left"))
