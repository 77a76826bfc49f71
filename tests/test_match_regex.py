"""MatchRegexTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/MatchRegexTest.java over the generic-cities
corpus) — f:matchRegex (QueryFunctions.MATCH_REGEX) over a single
field, a FIELD UNION argument (STATE||NUM), _ANYFIELD_, and under
negation; equivalent to the =~ regex in every case (the reference's
expectQuery)."""

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


class TestMatchRegex:
    def test_standard(self, cities):
        for c in CITIES:
            q = f"CITY == '{c}' && f:matchRegex(STATE, 'ohio')"
            want = expected(lambda r: f(r, "CITY") == c
                            and rx("ohio", r["STATE"]))
            assert run(cities, q) == run(
                cities, f"CITY == '{c}' && STATE =~ 'ohio'") == want, c

    def test_field_union_with_numeric(self, cities):
        # testStandardQueryWithNumeric: STATE||NUM union argument —
        # '110' regex-matches the numeric value's normalized form
        for c in CITIES:
            q = f"CITY == '{c}' && f:matchRegex(STATE||NUM, '110')"
            want = expected(
                lambda r: f(r, "CITY") == c
                and (rx("110", r["STATE"])
                     or float(r["NUM"]) == 110))
            assert run(cities, q) == want, c

    def test_any_field(self, cities):
        for c in CITIES:
            q = f"CITY == '{c}' && f:matchRegex(_ANYFIELD_, 'usa')"
            want = expected(lambda r: f(r, "CITY") == c and any(
                rx("usa", r[fl]) for fl in ("CITY", "STATE",
                                            "CONTINENT")))
            assert run(cities, q) == want, c

    def test_wildcard(self, cities):
        q = "CODE == 'uSa' && f:matchRegex(CITY, '.*o.*')"
        want = expected(lambda r: f(r, "CODE") == "usa"
                        and rx(".*o.*", r["CITY"]))
        assert run(cities, q) == want and want

    def test_not_wildcard(self, cities):
        q = "CODE == 'uSa' && !f:matchRegex(CITY, '.*o.*')"
        want = expected(lambda r: f(r, "CODE") == "usa"
                        and not rx(".*o.*", r["CITY"]))
        assert run(cities, q) == want and want

    def test_wildcard_any_field(self, cities):
        q = "CODE == 'uSa' && f:matchRegex(_ANYFIELD_, '.*isS.*')"
        want = expected(lambda r: f(r, "CODE") == "usa" and any(
            rx(".*isS.*", r[fl]) for fl in ("CITY", "STATE",
                                            "CONTINENT")))
        assert run(cities, q) == want and want
