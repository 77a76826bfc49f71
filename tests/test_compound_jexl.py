"""CompoundJexlQueryTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/CompoundJexlQueryTest.java over the
generic + italy cities corpora — nested and/or/not shapes with
mixed-case literals, scalar numeric terms, and a bounded range).

Each case is the reference query (for every TestCities city) plus a
python referee predicate over the raw tuples — the same expected-side
evaluation the reference's QueryJexl performs."""

import pytest

from datawave_spark.compiler import compile_query

from test_anyfield_cities import FT, ROWS as GENERIC_ROWS, SCHEMA

# italy-cities.csv (CityEntry.italy)
ITALY_ROWS = [
    ("20150707", "italy-rome-7", "Rome", "Lazio", "Italy", "Europe",
     "ITA", "Euro", 30.0, "0_0"),
    ("20150707", "italy-milan-7", "Milan", "Lombardia", "Italy",
     "Europe", "ITA", "Euro", 31.0, "0_0"),
    ("20150808", "italy-turin-7", "Turin", "Piemonte", "Italy",
     "Europe", "ITA", "Euro", 32.0, "0_0"),
    ("20150808", "italy-florence-7", "Florance", "Toscana", "Italy",
     "Europe", "ITA", "Euro", 33.0, "0_0"),
    ("20150909", "italy-naples-7", "Naples", "Campania", "Italy",
     "Europe", "ITA", "Euro", 34.0, "0_0"),
    ("20150909", "italy-venice-7", "Venice", "Veneto", "Italy",
     "Europe", "ITA", "Euro", 35.0, "0_0"),
    ("20151010", "italy-palermo-7", "Palermo", "Sicilia", "Italy",
     "Europe", "ITA", "Euro", 36.0, "0_0"),
]
ROWS = GENERIC_ROWS + ITALY_ROWS
COLS = ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY",
        "CONTINENT", "CODE", "ACCESS", "NUM", "GEO")
CITIES = ("london", "paris", "rome")


def rows():
    return [dict(zip(COLS, r)) for r in ROWS]


def expected(pred):
    return {r["EVENT_ID"] for r in rows() if pred(r)}


def f(row, field):
    return str(row[field]).lower()


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


def check(df, q, pred, ctxt=None):
    got = run(df, q)
    want = expected(pred)
    assert got == want, (q, ctxt)
    return got


class TestCompoundJexl:
    def test_or_or(self, cities):
        for c in CITIES:
            check(cities,
                  f"CITY == '{c}' || (CONTINENT == 'eurOpe' || "
                  f"NUM == 120)",
                  lambda r: f(r, "CITY") == c
                  or f(r, "CONTINENT") == "europe" or r["NUM"] == 120, c)

    def test_oror_and(self, cities):
        for c in CITIES:
            check(cities,
                  "(STATE == 'oHio' || STATE == 'miSSouri' || "
                  f"CONTINENT == 'eurOpe') && (CITY != '{c}')",
                  lambda r: (f(r, "STATE") in ("ohio", "missouri")
                             or f(r, "CONTINENT") == "europe")
                  and f(r, "CITY") != c, c)

    def test_oror_and_and(self, cities):
        for c in CITIES:
            check(cities,
                  "(STATE == 'oHio' || STATE == 'miSSouri' || "
                  "(COUNTRY == 'italy' && CONTINENT == 'eurOpe')) && "
                  f"(CITY != '{c}')",
                  lambda r: (f(r, "STATE") in ("ohio", "missouri")
                             or (f(r, "COUNTRY") == "italy"
                                 and f(r, "CONTINENT") == "europe"))
                  and f(r, "CITY") != c, c)

    def test_or_or_and_and_nested(self, cities):
        for c in CITIES:
            check(cities,
                  "(STATE == 'oHio' || (STATE == 'miSSouri' || "
                  "(COUNTRY == 'italy' && CONTINENT == 'eurOpe'))) && "
                  f"(CITY != '{c}')",
                  lambda r: (f(r, "STATE") in ("ohio", "missouri")
                             or (f(r, "COUNTRY") == "italy"
                                 and f(r, "CONTINENT") == "europe"))
                  and f(r, "CITY") != c, c)

    def test_or_and(self, cities):
        for c in CITIES:
            check(cities,
                  f"(CITY == '{c}' || CONTINENT == 'eurOpe') && "
                  "CODE != 'uSa'",
                  lambda r: (f(r, "CITY") == c
                             or f(r, "CONTINENT") == "europe")
                  and f(r, "CODE") != "usa", c)

    def test_and_or(self, cities):
        for c in CITIES:
            check(cities,
                  f"CODE == 'uSa' && (CITY == '{c}' || "
                  "STATE == 'miSSouri')",
                  lambda r: f(r, "CODE") == "usa"
                  and (f(r, "CITY") == c
                       or f(r, "STATE") == "missouri"), c)

    def test_and_not_or(self, cities):
        for c in CITIES:
            check(cities,
                  f"CITY == '{c}' && !(STATE == 'MissouRi' || "
                  "CODE == 'ita')",
                  lambda r: f(r, "CITY") == c
                  and not (f(r, "STATE") == "missouri"
                           or f(r, "CODE") == "ita"), c)

    def test_or_and_or(self, cities):
        for c in CITIES:
            check(cities,
                  f"(CITY == '{c}' || STATE == 'miSSissippi') && "
                  "(CONTINENT == 'europe' || NUM < 104)",
                  lambda r: (f(r, "CITY") == c
                             or f(r, "STATE") == "mississippi")
                  and (f(r, "CONTINENT") == "europe"
                       or r["NUM"] < 104), c)

    def test_orand_or_precedence(self, cities):
        # testOrAnd_Or: && binds tighter inside the left group
        for c in CITIES:
            check(cities,
                  f"(CITY == '{c}' || STATE == 'miSSissippi' && "
                  "CONTINENT == 'europe') || (NUM == 50)",
                  lambda r: (f(r, "CITY") == c
                             or (f(r, "STATE") == "mississippi"
                                 and f(r, "CONTINENT") == "europe"))
                  or r["NUM"] == 50, c)

    def test_multi_or(self, cities):
        for c in CITIES:
            check(cities,
                  f"CITY == '{c}' && ((NUM == 100 || NUM == 110 || "
                  "NUM == 120 || NUM < 20) || (COUNTRY == 'FrAnce' || "
                  "COUNTRY == 'iTaLy' || COUNTRY == 'UniTED kIngdom'))",
                  lambda r: f(r, "CITY") == c
                  and (r["NUM"] in (100, 110, 120) or r["NUM"] < 20
                       or f(r, "COUNTRY") in ("france", "italy",
                                              "united kingdom")), c)

    def test_and_or_and(self, cities):
        for c in CITIES:
            check(cities,
                  f"(CITY == '{c}' && STATE == 'miSSouri') || "
                  f"(CONTINENT == 'euroPe' && CITY == '{c}')",
                  lambda r: (f(r, "CITY") == c
                             and f(r, "STATE") == "missouri")
                  or (f(r, "CONTINENT") == "europe"
                      and f(r, "CITY") == c), c)

    def test_andand_or_and(self, cities):
        for c in CITIES:
            check(cities,
                  f"(CITY == '{c}' && CODE == 'usA' && "
                  "STATE == 'miSSouri') || (CONTINENT == 'euroPe' && "
                  f"CITY == '{c}')",
                  lambda r: (f(r, "CITY") == c and f(r, "CODE") == "usa"
                             and f(r, "STATE") == "missouri")
                  or (f(r, "CONTINENT") == "europe"
                      and f(r, "CITY") == c), c)

    def test_andand_or_and_or(self, cities):
        for c in CITIES:
            check(cities,
                  f"(CITY == '{c}' && CODE == 'usA' && "
                  "STATE == 'miSSouri') || (CONTINENT == 'euroPe' && "
                  f"CITY == '{c}') || (STATE == 'oHIo')",
                  lambda r: (f(r, "CITY") == c and f(r, "CODE") == "usa"
                             and f(r, "STATE") == "missouri")
                  or (f(r, "CONTINENT") == "europe"
                      and f(r, "CITY") == c)
                  or f(r, "STATE") == "ohio", c)

    def test_and_oror(self, cities):
        for c in CITIES:
            check(cities,
                  f"CITY == '{c}' && (CODE == 'iTa' || "
                  "COUNTRY == 'united states' || NUM == 100)",
                  lambda r: f(r, "CITY") == c
                  and (f(r, "CODE") == "ita"
                       or f(r, "COUNTRY") == "united states"
                       or r["NUM"] == 100), c)

    def test_and_or_and_or_and(self, cities):
        for c in CITIES:
            check(cities,
                  f"(CITY == '{c}' && CODE == 'iTa') || "
                  f"(CITY == '{c}' && STATE == 'miSSouri') || "
                  f"(CITY == '{c}' && NUM == 100)",
                  lambda r: f(r, "CITY") == c
                  and (f(r, "CODE") == "ita"
                       or f(r, "STATE") == "missouri"
                       or r["NUM"] == 100), c)

    def test_numeric_bounded_range(self, cities):
        check(cities,
              "((_Bounded_ = true) && (NUM >= 30 && NUM <= 105))",
              lambda r: 30 <= r["NUM"] <= 105)

    def test_and_or_with_composite(self, cities):
        for c in CITIES:
            check(cities,
                  f"CITY == '{c}' && (CODE == 'iTa' || "
                  "STATE == 'miSSouri')",
                  lambda r: f(r, "CITY") == c
                  and (f(r, "CODE") == "ita"
                       or f(r, "STATE") == "missouri"), c)
