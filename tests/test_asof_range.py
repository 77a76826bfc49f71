"""Temporal join semantics: as-of carry-forward correctness (vs a
brute-force referee), tie handling, and range-join bucketing
equivalence to the nested-loop formulation."""

from datetime import datetime

from pyspark.sql import functions as F

from datawave_spark.operators.asof import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def test_most_recent_at_or_before(self, spark):
        left = spark.createDataFrame(
            [(1, "u1", _ts("2024-01-01 10:00:00")),
             (2, "u1", _ts("2024-01-01 12:00:00")),
             (3, "u2", _ts("2024-01-01 09:00:00"))],
            "id long, k string, ts timestamp")
        right = spark.createDataFrame(
            [("u1", _ts("2024-01-01 09:30:00"), 5.0),
             ("u1", _ts("2024-01-01 11:00:00"), 7.0),
             ("u2", _ts("2024-01-01 09:30:00"), 9.0)],   # after left
            "k string, ts timestamp, v double")
        got = {r.id: r.v_asof for r in
               asof_join(left, right, "k", "ts", ["v"]).collect()}
        assert got == {1: 5.0, 2: 7.0, 3: None}

    def test_equal_ts_is_inclusive(self, spark):
        left = spark.createDataFrame(
            [(1, "u", _ts("2024-01-01 10:00:00"))],
            "id long, k string, ts timestamp")
        right = spark.createDataFrame(
            [("u", _ts("2024-01-01 10:00:00"), 3.0)],
            "k string, ts timestamp, v double")
        [row] = asof_join(left, right, "k", "ts", ["v"]).collect()
        assert row.v_asof == 3.0

    def test_same_ts_duplicates_deterministic(self, spark):
        left = spark.createDataFrame(
            [(1, "u", _ts("2024-01-01 10:00:00"))],
            "id long, k string, ts timestamp")
        right = spark.createDataFrame(
            [("u", _ts("2024-01-01 09:00:00"), 2.0),
             ("u", _ts("2024-01-01 09:00:00"), 8.0)],
            "k string, ts timestamp, v double")
        [row] = asof_join(left, right, "k", "ts", ["v"]).collect()
        assert row.v_asof == 8.0          # max per (key, ts)

    def test_matches_brute_force(self, spark):
        left = spark.range(0, 200).select(
            F.col("id"), (F.col("id") % 5).cast("string").alias("k"),
            F.timestamp_seconds(1700000000 + F.col("id") * 37).alias("ts"))
        right = spark.range(0, 300).select(
            (F.col("id") % 5).cast("string").alias("k"),
            F.timestamp_seconds(1700000000 + F.col("id") * 23).alias("ts"),
            (F.col("id") * 1.5).alias("v"))
        got = {r.id: r.v_asof for r in
               asof_join(left, right, "k", "ts", ["v"]).collect()}
        r2 = right.groupBy("k", "ts").agg(F.max("v").alias("v"))
        brute = (left.alias("l").join(
            r2.alias("r"), (F.col("l.k") == F.col("r.k"))
            & (F.col("r.ts") <= F.col("l.ts")), "left")
            .groupBy("l.id", "l.ts")
            .agg(F.max_by("r.v", "r.ts").alias("v")))
        expect = {r.id: r.v for r in brute.collect()}
        assert got == expect


class TestRangeJoin:
    def test_matches_nested_loop(self, spark):
        pts = spark.range(0, 500).select(
            F.col("id"),
            F.timestamp_seconds(1700000000 + F.col("id") * 3600).alias("ts"))
        iv = spark.createDataFrame(
            [("a", 1700000000 + 50 * 3600, 1700000000 + 120 * 3600),
             ("b", 1700000000 + 300 * 3600, 1700000000 + 310 * 3600)],
            "name string, s long, e long") \
            .select("name", F.timestamp_seconds("s").alias("s"),
                    F.timestamp_seconds("e").alias("e"))
        got = sorted((r.name, r.id) for r in
                     range_join(pts, "ts", iv, "s", "e").collect())
        brute = sorted((r.name, r.id) for r in pts.crossJoin(iv)
                       .filter((F.col("ts") >= F.col("s"))
                               & (F.col("ts") <= F.col("e"))).collect())
        assert got == brute and len(got) > 0

    def test_no_nested_loop_in_plan(self, spark):
        pts = spark.range(0, 100).select(
            F.col("id"),
            F.timestamp_seconds(1700000000 + F.col("id") * 3600).alias("ts"))
        iv = spark.createDataFrame(
            [("a", 1700003600, 1700040000)], "name string, s long, e long") \
            .select("name", F.timestamp_seconds("s").alias("s"),
                    F.timestamp_seconds("e").alias("e"))
        plan = range_join(pts, "ts", iv, "s", "e") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
