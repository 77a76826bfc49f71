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

    def test_max_results_bounds_driver_materialization(self, spark):
        """An over-limit async query materializes exactly the cap on
        the driver (the planner's result_limit applied to the async
        path) — never the full result."""
        q = submit(spark.range(10_000), max_results=250)
        assert q.wait(30) == QueryState.FINISHED
        total = 0
        while (p := q.next_page(100)) is not None:
            total += len(p)
        assert total == 250

    def test_default_max_results_is_bounded(self, spark):
        from datawave_spark.plans.lifecycle import DEFAULT_MAX_RESULTS
        q = submit(spark.range(50))
        assert q.max_results == DEFAULT_MAX_RESULTS
        assert q.wait(30) == QueryState.FINISHED
        assert len(q.next_page(100)) == 50
        assert q.truncated is False

    def test_truncated_flag_marks_capped_results(self, spark):
        """A capped result is distinguishable from a complete one —
        the reference web tier's PARTIAL-results marker."""
        q = submit(spark.range(300), max_results=250)
        assert q.wait(30) == QueryState.FINISHED
        assert q.truncated is True
        q2 = submit(spark.range(250), max_results=250)
        assert q2.wait(30) == QueryState.FINISHED
        assert q2.truncated is False


# -------------------------------------------- selector chunking / dashboard

def test_selector_query_in_vs_join_paths_agree(spark):
    from datawave_spark.plans.selectors import selector_query
    from datawave_spark.sources.parquet import read_parquet
    ev = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    sels = list(range(0, 300, 3))
    via_in = selector_query(ev, "user_id", sels, in_threshold=10_000)
    via_join = selector_query(ev, "user_id", sels, in_threshold=10)
    assert sorted(r.event_id for r in via_in.collect()) == \
        sorted(r.event_id for r in via_join.collect())
    # small path pushes an In filter to the scan
    plan = via_in._jdf.queryExecution().executedPlan().toString()
    assert "In(user_id" in plan or "in(user_id" in plan.lower()
    # large path broadcasts the selector frame (no cartesian)
    jplan = via_join._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in jplan and "CartesianProduct" not in jplan


def test_selector_query_duplicate_selectors_no_row_dup(spark):
    from datawave_spark.plans.selectors import selector_query
    from datawave_spark.sources.parquet import read_parquet
    ev = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    out = selector_query(ev, "user_id", [1, 1, 1, 2], in_threshold=1)
    base = ev.filter(F.col("user_id").isin([1, 2]))
    assert out.count() == base.count()


def test_dashboard_summary_buckets_partition_rows(spark):
    """Every query lands in exactly one bucket per dimension."""
    from datawave_spark.plans.metrics import dashboard_summary
    rows = [(500, False, 0, 1), (5000, True, 50, 8),
            (30_000, False, 20_000, 40), (90_000, False, 2_000_000, 2000)]
    log = spark.createDataFrame(
        rows, "latency_ms long, error boolean, result_count long, "
              "selector_count long")
    s = dashboard_summary(log).collect()[0]
    assert s.query_count == 4
    assert (s.up_to_3sec + s.up_to_10sec + s.up_to_60sec
            + s.more_than_60sec) == 4
    assert (s.zero_results + s.up_to_10k_results + s.up_to_1m_results
            + s.up_to_inf_results) == 4
    assert (s.one_term + s.up_to_16_terms + s.up_to_100_terms
            + s.up_to_1000_terms + s.up_to_inf_terms) == 4
    assert s.error_count == 1 and s.more_than_60sec == 1
    assert s.up_to_inf_results == 1 and s.up_to_inf_terms == 1


class TestResultLimit:
    """QueryLogic.getResultLimit parity (QueryLogic.java:412)."""

    def _planner(self, spark, **kw):
        from datawave_spark.plans import QueryPlanner
        df = spark.createDataFrame(
            [(i, "view", float(i)) for i in range(100)],
            "event_id int, event_type string, value double")
        return QueryPlanner(df, **kw)

    def test_min_over_matching_dns(self, spark):
        pl = self._planner(spark, max_results=1000,
                           dn_result_limits={"a": 30, "b": 10, "c": 5})
        assert pl.result_limit(user_dns=["a", "b"]) == 10
        assert pl.result_limit(user_dns=["zz"]) == 1000
        assert pl.result_limit() == 1000

    def test_system_from_override_then_dn_wins(self, spark):
        pl = self._planner(spark, max_results=1000,
                           system_from_limits={"feed1": 200},
                           dn_result_limits={"a": 50})
        assert pl.result_limit(system_from="feed1") == 200
        assert pl.result_limit(system_from="other") == 1000
        # DN minimum is applied AFTER the systemFrom override
        assert pl.result_limit(user_dns=["a"], system_from="feed1") == 50

    def test_plan_applies_cap(self, spark):
        pl = self._planner(spark, dn_result_limits={"a": 7})
        res = pl.plan("EVENT_TYPE == 'view'", user_dns=["a"])
        assert res.df.count() == 7
        # uncapped when no config matches
        res2 = pl.plan("EVENT_TYPE == 'view'", user_dns=["x"])
        assert res2.df.count() == 100
