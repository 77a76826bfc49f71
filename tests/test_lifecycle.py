"""Async query lifecycle (QueryExecutorBean.java:1058 create/next,
:1574 cancel, :1686 close): submit runs under a Spark job group;
cancel uses cancelJobGroup — Spark's cooperative task interrupt."""

import time

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans.lifecycle import QueryState, submit


class TestLifecycle:
    def test_submit_finish_and_page(self, spark):
        df = spark.range(250).select(F.col("id"))
        q = submit(df)
        assert q.wait(30) == QueryState.FINISHED
        pages = []
        while (p := q.next_page(100)) is not None:
            pages.append(len(p))
        assert pages == [100, 100, 50]

    def test_cancel_interrupts_running_job(self, spark):
        # a cartesian big enough to run for minutes on local[*]
        big = spark.range(200_000)
        df = big.crossJoin(big.withColumnRenamed("id", "id2")) \
            .agg(F.count(F.lit(1)).alias("n"))
        q = submit(df)
        time.sleep(1.0)               # let tasks start
        t0 = time.time()
        q.cancel()
        assert q.wait(60) == QueryState.CANCELED
        assert time.time() - t0 < 30  # interrupted, not run to completion
        with pytest.raises(RuntimeError, match="CANCELED"):
            q.next_page()

    def test_close_releases_results(self, spark):
        q = submit(spark.range(10))
        q.wait(30)
        q.close()
        assert q.state == QueryState.CLOSED
        with pytest.raises(RuntimeError, match="CLOSED"):
            q.next_page()

    def test_cancel_after_finish_is_noop(self, spark):
        q = submit(spark.range(5))
        q.wait(30)
        q.cancel()
        assert q.state == QueryState.FINISHED
