"""RangeQueryTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/RangeQueryTest.java over the generic-cities
corpus) — evaluation-level semantics of BOUNDED ranges: degenerate
lo==hi ranges reduce to equality, string ranges compare
lexicographically over the lc-normalized value, numeric ranges
numerically, and unbounded ops in DIFFERENT subtrees are independent
any-value terms (never coalesced).

The reference's plan-string assertions (+cE1 normalized bounds,
_Delayed_ markers) and FullTableScansDisallowedException policy are
Accumulo planner internals — n/a by design here (Catalyst owns the
scan strategy, SURVEY §4)."""

import pytest

from datawave_spark.compiler import compile_query

from test_anyfield_cities import CITIES, FT, ROWS, SCHEMA, expected


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


def f(row, field):
    return str(row[field]).lower()


class TestRangeQuery:
    def test_single_value_range(self, cities):
        # testSingleValue: bounded lo==hi ≡ equality
        for c in CITIES:
            q = (f"((_Bounded_ = true) && (CITY <= '{c}' && "
                 f"CITY >= '{c}'))")
            assert run(cities, q) == expected(
                lambda r: f(r, "CITY") == c) == run(
                    cities, f"CITY == '{c}'"), c

    def test_range_with_term(self, cities):
        for c in CITIES:
            q = ("((_Bounded_ = true) && (NUM <= 100 && NUM >= 100)) "
                 f"&& CITY == '{c}'")
            assert run(cities, q) == expected(
                lambda r: r["NUM"] == 100 and f(r, "CITY") == c), c

    def test_two_bounded_ranges_conjoined(self, cities):
        # testSingleValueAndMultiFieldWithParens
        for c in CITIES:
            q = (f"((_Bounded_ = true) && (CITY <= '{c}' && "
                 f"CITY >= '{c}')) && ((_Bounded_ = true) && "
                 "(NUM <= 20 && NUM >= 20))")
            assert run(cities, q) == expected(
                lambda r: f(r, "CITY") == c and r["NUM"] == 20), c

    def test_bounded_ranges_disjoined(self, cities):
        # testSingleValueOrMultiFieldWithParens
        for c in CITIES:
            q = (f"((_Bounded_ = true) && (CITY <= '{c}' && "
                 f"CITY >= '{c}')) || ((_Bounded_ = true) && "
                 "(NUM <= 100 && NUM >= 100))")
            got = run(cities, q)
            assert got == expected(
                lambda r: f(r, "CITY") == c or r["NUM"] == 100) \
                and got, c

    def test_multi_fields_no_results(self, cities):
        # testMultiFieldsNoResults: no row is simultaneously ohio +
        # europe
        for c in CITIES:
            q = (f"((_Bounded_ = true) && (CITY <= '{c}' && "
                 f"CITY >= '{c}')) && ((_Bounded_ = true) && "
                 "(STATE <= 'ohio' && STATE >= 'ohio')) && "
                 "((_Bounded_ = true) && (CONTINENT <= 'europe' && "
                 "CONTINENT >= 'europe')) && ((_Bounded_ = true) && "
                 "(NUM <= 100 && NUM >= 100))")
            assert run(cities, q) == set(), c

    def test_range_ops_in_diff_subtrees(self, cities):
        # testRangeOpsInDiffSubTree: NOT coalesced — independent terms
        q = "(NUM <= 100 && CITY == 'rome') && NUM >= 100"
        assert run(cities, q) == expected(
            lambda r: r["NUM"] == 100 and f(r, "CITY") == "rome")

    def test_string_bounded_range(self, cities):
        # testRangeOrExp: lexicographic STATE range over lc values
        for c in CITIES:
            q = (f"(CITY == '{c}' || CITY == '{c}-extra') && "
                 "((_Bounded_ = true) && (STATE >= 'e' && "
                 "STATE <= 'r'))")
            got = run(cities, q)
            assert got == expected(
                lambda r: f(r, "CITY") == c
                and "e" <= f(r, "STATE") <= "r") and got, c
