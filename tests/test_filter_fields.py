"""FilterFieldsQueryTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/FilterFieldsQueryTest.java over the
generic-cities corpus — data shared with tests/test_anyfield_cities.py).

Covers the evaluation semantics the reference exercises: fielded
conjunctions, _ANYFIELD_ conjunction/disjunction shapes,
filter:includeRegex(_ANYFIELD_, ...) (testAnyFieldFilterIncludeRegex),
the LUCENE #INCLUDE(_ANYFIELD_, v) and unfielded one-arg #TEXT(v)
forms, filter:occurrence over a scalar field, and the
RETURN_FIELDS / DISALLOWLISTED_FIELDS projection contract
(ResponseFieldChecker → column presence/absence on the planned frame).
Expected row sets come from the same referee evaluation the reference's
QueryJexl/RawDataManager performs over the raw tuples."""

import pytest

from datawave_spark.compiler import compile_query
from datawave_spark.plans import QueryPlanner

from test_anyfield_cities import ANY, CITIES, FT, ROWS, SCHEMA, expected

COLS = ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY",
        "CONTINENT", "CODE", "ACCESS", "NUM", "GEO")


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT, anyfield=ANY)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


def city_eq(c):
    return lambda row: str(row["CITY"]).lower() == c


def any_eq(v):
    return lambda row: any(str(row[f]).lower() == v for f in ANY)


class TestFieldedConjunctions:
    def test_eq_city_and_eq_state(self, cities):
        # testEqCityAndEqState: CITY == '<city>' && STATE == 'ohio'
        for c in CITIES:
            want = expected(lambda row: city_eq(c)(row)
                            and row["STATE"].lower() == "ohio")
            assert run(cities, f"CITY == '{c}' && STATE == 'ohio'") \
                == want, c

    def test_eq_city_and_eq_continent(self, cities):
        # testEqCityAndEqContinentHitList (row set; HIT_TERM tracking
        # is pinned in tests/test_compiler.py hit_terms)
        for c in CITIES:
            want = expected(
                lambda row: city_eq(c)(row)
                and row["CONTINENT"].lower() == "north america")
            q = f"CITY == '{c}' && CONTINENT == 'north america'"
            assert run(cities, q) == want and want, c

    def test_eq_city_and_state_disjunction(self, cities):
        # testEqCityAndEqContinentDisallowList row sets
        for c in CITIES:
            want = expected(
                lambda row: city_eq(c)(row)
                and row["STATE"].lower() in ("ohio", "missouri"))
            q = (f"CITY == '{c}' && (STATE == 'ohio' || "
                 f"STATE == 'missouri')")
            assert run(cities, q) == want and want, c


class TestAnyFieldShapes:
    def test_disjunction_no_match(self, cities):
        # testDisjunctionAnyField
        q = ("_ANYFIELD_ == 'no-match-found' || "
             "_ANYFIELD_ == 'nothing-here'")
        assert run(cities, q) == set()

    def test_disjunction_with_match(self, cities):
        q = "_ANYFIELD_ == 'no-match-found' || _ANYFIELD_ == 'rome'"
        assert run(cities, q) == expected(any_eq("rome"))

    def test_conjunction_no_match(self, cities):
        q = ("_ANYFIELD_ == 'no-match-found' && "
             "_ANYFIELD_ == 'nothing-here'")
        assert run(cities, q) == set()

    def test_conjunction_with_match(self, cities):
        # one matching + one non-matching phrase conjoined → empty
        q = "_ANYFIELD_ == 'no-match-found' && _ANYFIELD_ == 'rome'"
        assert run(cities, q) == set()


class TestAnyFieldFunctionArg:
    def test_filter_include_regex_anyfield(self, cities):
        # testAnyFieldFilterIncludeRegex: _ANYFIELD_ as a filter
        # function argument sweeps the expansion set (r10)
        for c in CITIES:
            want = expected(city_eq(c)) & expected(any_eq("ohio"))
            q = (f"CITY == '{c}' && "
                 f"filter:includeRegex(_ANYFIELD_, 'ohio')")
            assert run(cities, q) == want, c
        assert run(cities, "CITY == 'paris' && "
                           "filter:includeRegex(_ANYFIELD_, 'ohio')") \
            == {"par-usa-oh-8", "par-usa-oh-9"}

    def test_lucene_include_anyfield(self, cities):
        # testAnyFieldLuceneInclude: #INCLUDE(_ANYFIELD_, ohio)
        from datawave_spark.lucene.parser import parse_lucene
        for c in CITIES:
            want = expected(city_eq(c)) & expected(any_eq("ohio"))
            node = parse_lucene(f"CITY:{c} AND #INCLUDE(_ANYFIELD_, ohio)")
            out = compile_query(cities, node, field_types=FT,
                                anyfield=ANY)
            assert {r.EVENT_ID for r in out.select("EVENT_ID")
                    .collect()} == want, c

    def test_lucene_text_unfielded(self, cities):
        # testAnyFieldLuceneText: one-arg #TEXT(Ohio) →
        # f:includeText(_ANYFIELD_, 'Ohio') — RAW value equality
        from datawave_spark.lucene.parser import parse_lucene
        for c in CITIES:
            want = expected(city_eq(c)) & expected(
                lambda row: any(str(row[f]) == "Ohio" for f in ANY))
            node = parse_lucene(f"CITY:{c} AND #TEXT(Ohio)")
            out = compile_query(cities, node, field_types=FT,
                                anyfield=ANY)
            assert {r.EVENT_ID for r in out.select("EVENT_ID")
                    .collect()} == want and want, c
        # raw match is case-sensitive: lowercase finds nothing
        node = parse_lucene("CITY:rome AND #TEXT(ohio)")
        out = compile_query(cities, node, field_types=FT, anyfield=ANY)
        assert out.count() == 0


class TestOccurrence:
    def test_occurrence_scalar_lt(self, cities):
        # testOccurrenceFunction: scalar CONTINENT binds as ONE object
        q = ("CONTINENT == 'europe' && "
             "filter:occurrence(CONTINENT, '<', 2)")
        assert run(cities, q) == expected(
            lambda row: row["CONTINENT"].lower() == "europe")

    def test_occurrence_scalar_gt_empty(self, cities):
        # testZeroOccurrenceFunction
        q = ("CONTINENT == 'europe' && "
             "filter:occurrence(CONTINENT, '>', 1)")
        assert run(cities, q) == set()


class TestProjection:
    """RETURN_FIELDS / DISALLOWLISTED_FIELDS (ResponseFieldChecker:
    returned documents carry exactly the allowlist — or everything
    minus the disallowlist)."""

    def test_allowlist(self, cities):
        res = QueryPlanner(cities, field_types=FT).plan(
            "CITY == 'rome' && CONTINENT == 'north america'",
            return_fields=["EVENT_ID", "CITY", "STATE"])
        assert sorted(res.df.columns) == ["CITY", "EVENT_ID", "STATE"]
        assert {r.EVENT_ID for r in res.df.collect()} == {
            "rom-usa-oh-8", "rom-usa-mo-8", "rom-usa-ms-10"}

    def test_disallowlist(self, cities):
        res = QueryPlanner(cities, field_types=FT).plan(
            "CITY == 'rome' && CONTINENT == 'north america'",
            disallowed_fields=["GEO", "NUM", "ACCESS"])
        assert sorted(res.df.columns) == sorted(
            c for c in COLS if c not in ("GEO", "NUM", "ACCESS"))
        assert {r.EVENT_ID for r in res.df.collect()} == {
            "rom-usa-oh-8", "rom-usa-mo-8", "rom-usa-ms-10"}

    def test_allowlist_multivalue_excluded(self, cities):
        # testAllowlistWithMultiValueExcluded: STATE dropped from the
        # allowlist — rows still match on it, columns just don't return
        res = QueryPlanner(cities, field_types=FT).plan(
            "CITY == 'paris' && STATE == 'ohio'",
            return_fields=["EVENT_ID", "CITY"])
        assert sorted(res.df.columns) == ["CITY", "EVENT_ID"]
        assert {r.EVENT_ID for r in res.df.collect()} == {"par-usa-oh-8",
                                                          "par-usa-oh-9"}
