"""Query-level checkpoint/resume — CheckpointableQueryLogic parity.

Reference: long-running DataWave queries checkpoint their state (plan +
range cursor) so paging can resume in a different web-server instance
(CheckpointableQueryLogic, implemented by
query/tables/ShardQueryLogic.java:174, ShardIndexQueryTable.java:88).

Spark restatement: the planned result is materialized ONCE to a parquet
"spool" with a unique monotonic row id, and a tiny JSON sidecar records
the paging cursor (last row id emitted).  Any later process — a new
SparkSession, a new planner instance — loads the spool and continues
paging after the cursor.  This is the same snapshot-then-cursor shape
as the reference's CachedResults+checkpoint combination, and it is the
scale-correct one: the expensive query runs exactly once; each resumed
page is a TakeOrdered over a cursor-pruned parquet scan (``__row >
cursor`` pushes down to row-group stats because the spool is written in
__row order).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_META = "meta.json"
_SPOOL = "spool"
_ROW = "__row"


class CheckpointedQuery:
    """A materialized, resumable query result."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    # -------------------------------------------------------- lifecycle

    @classmethod
    def create(cls, df: DataFrame, path: str,
               query: str | None = None) -> "CheckpointedQuery":
        """Materialize the result frame as the spool and start a
        cursor.  ``monotonically_increasing_id`` is unique and
        ascending per partition — written once, it becomes a STABLE
        total order for paging (the id is data in the spool, not
        recomputed on read)."""
        spool = df.withColumn(_ROW, F.monotonically_increasing_id())
        spool.write.mode("overwrite").parquet(os.path.join(path, _SPOOL))
        meta = {"cursor": -1, "pages_emitted": 0, "query": query,
                "columns": df.columns}
        cls._write_meta(path, meta)
        return cls(df.sparkSession, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "CheckpointedQuery":
        """Resume from a checkpoint written by any prior process."""
        with open(os.path.join(path, _META)) as f:
            return cls(spark, path, json.load(f))

    @staticmethod
    def _write_meta(path: str, meta: dict) -> None:
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, _META))  # atomic cursor update

    # ----------------------------------------------------------- paging

    def _spool(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, _SPOOL))

    def next_page(self, page_size: int = 100) -> list:
        """The next page after the persisted cursor; advances and
        persists the cursor (RunningQuery.next() parity, resumable)."""
        rows = (self._spool()
                .filter(F.col(_ROW) > self.meta["cursor"])
                .orderBy(_ROW)
                .limit(page_size)
                .collect())
        if rows:
            self.meta["cursor"] = rows[-1][_ROW]
            self.meta["pages_emitted"] += 1
            self._write_meta(self.path, self.meta)
        cols = self.meta["columns"]
        return [tuple(r[c] for c in cols) for r in rows]

    def pages(self, page_size: int = 100):
        while True:
            page = self.next_page(page_size)
            if not page:
                return
            yield page

    def remaining(self) -> DataFrame:
        """Everything after the cursor as a DataFrame (for callers that
        want to finish with one bulk operation instead of pages)."""
        return (self._spool()
                .filter(F.col(_ROW) > self.meta["cursor"])
                .drop(_ROW))
