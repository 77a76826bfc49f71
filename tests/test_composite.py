"""CompositeQueryLogic analog (CompositeQueryLogic.java:51): fan one
query across logics, merge aligned results; init-failure policy and
short-circuit mode."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans.composite import composite_query


@pytest.fixture()
def ev(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, t string, v double")


class TestComposite:
    def test_union_tags_logic_name(self, spark, ev):
        out = composite_query({
            "la": lambda: ev.filter("t = 'a'").select("id", "v"),
            "lb": lambda: ev.filter("t = 'b'").select("id", "v"),
        }).collect()
        got = {(r.id, r.logic_name) for r in out}
        assert got == {(1, "la"), (3, "la"), (2, "lb")}

    def test_schema_alignment_null_fills(self, spark, ev):
        out = composite_query({
            "la": lambda: ev.select("id", "v"),
            "lb": lambda: ev.select("id", "t"),
        })
        assert set(out.columns) == {"id", "v", "t", "logic_name"}
        rows = out.filter(F.col("logic_name") == "lb").collect()
        assert all(r.v is None and r.t is not None for r in rows)

    def test_failed_logic_skipped_by_default(self, spark, ev):
        def boom():
            raise ValueError("no such table")
        out = composite_query({
            "bad": boom,
            "good": lambda: ev.select("id"),
        })
        assert out.count() == 3

    def test_all_must_initialize_raises(self, spark, ev):
        def boom():
            raise ValueError("no such table")
        with pytest.raises(ValueError):
            composite_query({"bad": boom,
                             "good": lambda: ev.select("id")},
                            all_must_initialize=True)

    def test_all_failed_raises(self, spark):
        def boom():
            raise ValueError("nope")
        with pytest.raises(RuntimeError, match="no composite logic"):
            composite_query({"a": boom, "b": boom})

    def test_short_circuit_returns_first_nonempty(self, spark, ev):
        out = composite_query({
            "empty": lambda: ev.filter("t = 'zzz'").select("id"),
            "hit": lambda: ev.filter("t = 'a'").select("id"),
            "never": lambda: ev.select("id"),
        }, short_circuit=True).collect()
        assert {r.logic_name for r in out} == {"hit"}
        assert {r.id for r in out} == {1, 3}
