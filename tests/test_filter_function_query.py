"""FilterFunctionQueryTest corpus port (reference warehouse/query-
core/src/test/java/datawave/query/FilterFunctionQueryTest.java over
the generic-cities corpus) — the filter: function family at query
level: includeRegex (single / union / _ANYFIELD_ / wildcard /
negated), excludeRegex (incl. the anyfield form, which conjoins NO-
field-matches), getAllMatches as a predicate, isNull / isNotNull, and
matchesAtLeastCountOf.  includeRegex shapes shared with
MatchRegexTest live in tests/test_match_regex.py."""

import re

import pytest

from datawave_spark.compiler import compile_query

from test_anyfield_cities import ANY, CITIES, FT, ROWS, SCHEMA, expected


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT, anyfield=ANY)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


def rx(pattern, v):
    return bool(re.match(r"(?is)^(?:" + pattern + r")$", str(v)))


def f(row, field):
    return str(row[field]).lower()


class TestFilterFunctions:
    def test_include_regex_union_both_orders(self, cities):
        # testExerciseBugWithHowOrNodesAreHandled: the union argument
        # fans to a DISJUNCTION regardless of member order
        want = expected(lambda r: f(r, "CITY") == "london"
                        and (rx("110", r["STATE"])
                             or float(r["NUM"]) == 110))
        got1 = run(cities, "CITY == 'london' && "
                           "filter:includeRegex(STATE||NUM, '110')")
        got2 = run(cities, "CITY == 'london' && "
                           "filter:includeRegex(NUM||STATE, '110')")
        assert got1 == got2 == want

    def test_exclude_regex(self, cities):
        # testExcludeRegex / testExcludeRegexWildCard
        for pat in ("ohio", ".*o.*"):
            q = f"CODE == 'uSa' && filter:excludeRegex(CITY, '{pat}')"
            want = expected(lambda r: f(r, "CODE") == "usa"
                            and not rx(pat, r["CITY"]))
            assert run(cities, q) == want, pat

    def test_exclude_regex_any_field(self, cities):
        # testExcludeRegexAnyField: NO expansion-set field matches
        # (convertAnyField joins with AND for the negated op)
        q = "CODE == 'uSa' && filter:excludeRegex(_ANYFIELD_, 'usa')"
        want = expected(lambda r: f(r, "CODE") == "usa" and not any(
            rx("usa", r[fl]) for fl in ("CITY", "STATE", "CONTINENT")))
        assert run(cities, q) == want

    def test_get_all_matches_predicate(self, cities):
        # testGetAllMatches: as a predicate ≡ includeRegex
        for c in CITIES:
            q = (f"CITY == '{c}' && "
                 f"filter:getAllMatches(STATE, 'mi.*')")
            want = expected(lambda r: f(r, "CITY") == c
                            and rx("mi.*", r["STATE"]))
            assert run(cities, q) == run(
                cities, f"CITY == '{c}' && STATE =~ 'mi.*'") == want, c

    def test_is_null_on_populated_field(self, cities):
        # testIsNull: every row carries STATE → empty
        for c in CITIES:
            q = f"CITY == '{c}' && filter:isNull(STATE)"
            assert run(cities, q) == set(), c

    def test_not_is_null_with_dead_anyfield(self, cities):
        # testAnyFieldIsNull: dead anyfield disjunction && !isNull → ∅
        q = ("(_ANYFIELD_ == 'none' || _ANYFIELD_ == 'none again') && "
             "!(filter:isNull(ACCESS))")
        assert run(cities, q) == set()

    def test_is_not_null(self, cities):
        # testIsNotNull / testIsNotNullState: all rows populated
        for c in CITIES:
            for fld in ("CONTINENT", "STATE"):
                q = f"CITY == '{c}' && filter:isNotNull({fld})"
                assert run(cities, q) == expected(
                    lambda r: f(r, "CITY") == c), (c, fld)

    def test_matches_at_least_count_of(self, cities):
        # testMatchesCountValid / Invalid: the CITY value list holds
        # exactly one of the three test cities per row
        for c in CITIES:
            base = expected(lambda r: f(r, "CITY") == c)
            q1 = (f"CITY == '{c}' && filter:matchesAtLeastCountOf("
                  f"'1', CITY, 'london', 'paris', 'rome')")
            assert run(cities, q1) == base and base, c
            q2 = (f"CITY == '{c}' && filter:matchesAtLeastCountOf("
                  f"'2', CITY, 'london', 'paris', 'rome')")
            assert run(cities, q2) == set(), c
