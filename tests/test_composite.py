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


class TestFilteredLogic:
    """FilteredQueryLogic + filter predicates (FilteredQueryLogic.java)."""

    def test_filter_by_parameter_boolean_and_equality(self):
        from datawave_spark.plans.composite import FilterByParameter
        assert FilterByParameter("go").can_run({"go": "true"})
        assert not FilterByParameter("go").can_run({"go": "false"})
        assert not FilterByParameter("go").can_run({})
        assert FilterByParameter("mode", "fast").can_run({"mode": "fast"})
        assert not FilterByParameter("mode", "fast").can_run({"mode": "slow"})
        assert FilterByParameter("mode", "fast", negated=True).can_run(
            {"mode": "slow"})

    def test_filter_by_auth_match_types(self):
        from datawave_spark.plans.composite import FilterByAuth
        two = [{"A", "B"}, {"A"}]
        assert FilterByAuth("A").can_run(None, two)
        assert not FilterByAuth("A&B").can_run(None, two)      # ALL fails
        assert FilterByAuth("A&B", match_type="ANY").can_run(None, two)
        assert FilterByAuth("A&B", negated=True).can_run(None, two)
        assert not FilterByAuth("A", match_type="ALL").can_run(None, [])
        import pytest as _pt
        with _pt.raises(ValueError):
            FilterByAuth("A", match_type="SOME").can_run(None, two)

    def test_filtered_logic_empty_keeps_schema(self, spark):
        from datawave_spark.plans.composite import (FilterByParameter,
                                                    filtered_logic)
        df = spark.createDataFrame([(1, "x")], "a int, b string")
        out = filtered_logic(lambda: df, [FilterByParameter("go")], {}, [])
        assert out.count() == 0
        assert out.schema == df.schema
        ok = filtered_logic(lambda: df, [FilterByParameter("go")],
                            {"go": "true"}, [])
        assert ok.count() == 1
