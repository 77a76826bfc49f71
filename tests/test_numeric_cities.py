"""JexlNumericQueryTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/JexlNumericQueryTest.java over the
generic-cities corpus — NUM is a NumberType field).

Pins JexlArithmetic numeric coercion: a QUOTED numeric literal
('110') compares equal to the numeric value (testNumInQuotes expects
the same rows as the bare 110), bounded ranges over numbers are
numeric (not lexicographic), and !=/NOT combine with the null-total
semantics."""

import pytest

from datawave_spark.compiler import compile_query

from test_anyfield_cities import CITIES, FT, ROWS, SCHEMA, expected


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


def num(row):
    return float(row["NUM"])


class TestJexlNumeric:
    def test_num_in_quotes(self, cities):
        # testNumInQuotes: '110' coerces numerically — identical rows
        # to the unquoted form
        for c in CITIES:
            quoted = run(cities, f"NUM == '110' && CITY != '{c}'")
            bare = run(cities, f"NUM == 110 && CITY != '{c}'")
            want = expected(lambda r: num(r) == 110
                            and str(r["CITY"]).lower() != c)
            assert quoted == bare == want, c

    def test_num_and_not(self, cities):
        # testNumWithoutQuotesAndNot
        for c in CITIES:
            got = run(cities, f"NUM == 110 && !(CITY == '{c}')")
            want = expected(lambda r: num(r) == 110
                            and str(r["CITY"]).lower() != c)
            assert got == want, c

    def test_bounds(self, cities):
        # testLteGteBound / testGteLteBound / testGtLtBound
        cases = [
            ("((_Bounded_ = true) && (NUM <= 20 && NUM >= 20))",
             lambda r: num(r) == 20),
            ("((_Bounded_ = true) && (NUM >= 20 && NUM <= 40))",
             lambda r: 20 <= num(r) <= 40),
            ("((_Bounded_ = true) && (NUM > 24 && NUM < 105))",
             lambda r: 24 < num(r) < 105),
        ]
        for q, pred in cases:
            got = run(cities, q)
            assert got == expected(pred) and got, q

    def test_multi_bound(self, cities):
        # testMultiBound: disjunction of two bounded ranges
        q = ("((_Bounded_ = true) && (NUM > 15 && NUM < 24)) || "
             "((_Bounded_ = true) && (NUM > 31 && NUM < 42))")
        want = expected(lambda r: 15 < num(r) < 24 or 31 < num(r) < 42)
        assert run(cities, q) == want and want

    def test_and_or_with_city(self, cities):
        # testAnd / testOr
        for c in CITIES:
            is_city = lambda r: str(r["CITY"]).lower() == c  # noqa: E731
            assert run(cities, f"NUM == 100 && CITY == '{c}'") == \
                expected(lambda r: num(r) == 100 and is_city(r)), c
            assert run(cities, f"NUM == 30 || CITY == '{c}'") == \
                expected(lambda r: num(r) == 30 or is_city(r)), c

    def test_or_multi_values(self, cities):
        # testOrMulti
        vals = (100, 110, 120, 130)
        for c in CITIES:
            q = ("(NUM == 100 || NUM == 110 || NUM == 120 || "
                 f"NUM == 130) && CITY == '{c}'")
            want = expected(lambda r: num(r) in vals
                            and str(r["CITY"]).lower() == c)
            assert run(cities, q) == want and want, c

    def test_bounded_and_city(self, cities):
        # testAndGteLte
        for c in CITIES:
            q = ("((_Bounded_ = true) && (NUM >= 100 && NUM <= 130)) "
                 f"&& CITY == '{c}'")
            want = expected(lambda r: 100 <= num(r) <= 130
                            and str(r["CITY"]).lower() == c)
            assert run(cities, q) == want and want, c

    def test_or_gt_lt(self, cities):
        # testOrGtLt: UNBOUNDED disjunction of one-sided ranges
        for c in CITIES:
            q = f"(NUM < 100 || NUM > 110) && CITY == '{c}'"
            want = expected(lambda r: (num(r) < 100 or num(r) > 110)
                            and str(r["CITY"]).lower() == c)
            assert run(cities, q) == want, c

    def test_or_not_eq(self, cities):
        # testOrNotEq: != disjunction is a tautology on this corpus
        for c in CITIES:
            q = f"(NUM != 100 || NUM != 110) && CITY == '{c}'"
            want = expected(lambda r: (num(r) != 100 or num(r) != 110)
                            and str(r["CITY"]).lower() == c)
            assert run(cities, q) == want and want, c

    def test_range_with_not_eq(self, cities):
        # testLtGtNotEq
        for c in CITIES:
            q = (f"(NUM > 99 && NUM < 121 && NUM != 110) && "
                 f"CITY == '{c}'")
            want = expected(lambda r: 99 < num(r) < 121
                            and num(r) != 110
                            and str(r["CITY"]).lower() == c)
            assert run(cities, q) == want, c
