"""MiscQueryTest corpus port (reference warehouse/query-core/src/test/
java/datawave/query/MiscQueryTest.java over the generic-cities corpus)
— the IGNORE_NONEXISTENT_FIELDS contract (ShardQueryLogic.java:1077 →
DefaultQueryPlanner.timedTestForNonExistentFields:1434) plus the
anyfield regex threshold shapes.

testFieldOpField (full-table-scan rejection) is n/a by design: a
field-op-field predicate is an ordinary Catalyst filter here, not a
disallowed index-less scan (SURVEY §4)."""

import pytest

from datawave_spark.plans import QueryPlanner
from datawave_spark.plans.catalog import InvalidQueryException

from test_anyfield_cities import ANY, FT, ROWS, SCHEMA, expected


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


class TestIgnoreNonexistentFields:
    def test_unknown_field_raises(self, cities):
        # testFieldIgnoreParam1: ignore=false (the DEFAULT) — a field
        # the data dictionary has never seen is a BadRequest
        with pytest.raises(InvalidQueryException, match="FOO"):
            QueryPlanner(cities, field_types=FT).plan(
                "_ANYFIELD_ =~ '.*a' && FOO == 'bar2'")

    def test_unknown_field_ignored_runs(self, cities):
        # testFieldIgnoreParam2: ignore=true — the query runs; the
        # nonexistent-field term evaluates false (both engines)
        res = QueryPlanner(cities, field_types=FT).plan(
            "_ANYFIELD_ =~ '.*a' && FOO == 'bar2'",
            ignore_nonexistent_fields=True)
        assert res.df.count() == 0

    def test_known_fields_pass_strict(self, cities):
        # testFieldIgnoreParam3: every named field exists — strict mode
        # accepts, the query just matches nothing ('sta' is no STATE)
        res = QueryPlanner(cities, field_types=FT).plan(
            "_ANYFIELD_ =~ '.*a' && STATE == 'sta'")
        assert res.df.count() == 0

    def test_marker_and_special_fields_pass(self, cities):
        # _Bounded_ markers, _ANYFIELD_ and grouping-context suffixes
        # are not data-dictionary fields — strict mode must not trip
        res = QueryPlanner(cities, field_types=FT).plan(
            "((_Bounded_ = true) && (NUM >= 20 && NUM <= 40))")
        assert res.df.count() > 0

    def test_model_alias_passes_strict(self, cities):
        res = QueryPlanner(cities, field_types=FT,
                           model={"TOWN": ["CITY"]}).plan(
            "TOWN == 'rome'")
        assert res.df.count() > 0


class TestAnyFieldThresholds:
    def test_event_threshold_regex(self, cities):
        # testEventThreshold / testShardThreshold: the anyfield regex
        # '.*a' sweeps the expansion set regardless of how many events
        # per shard it hits
        import re
        from datawave_spark.compiler import compile_query
        out = compile_query(cities, "_ANYFIELD_ =~ '.*a'",
                            field_types=FT, anyfield=ANY)
        got = {r.EVENT_ID for r in out.select("EVENT_ID").collect()}
        want = expected(lambda row: any(
            re.match(r"(?is)^.*a$", str(row[f]))
            for f in ("CITY", "STATE", "CONTINENT")))
        assert got == want and want
