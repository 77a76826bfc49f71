"""MultiValueQueryTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/MultiValueQueryTest.java; data verbatim
from src/test/resources/input/multivalue-cities.csv — CITY and STATE
are MULTI-VALUED (';'-separated in the CSV, arrays here,
MultiValueCityFields.java:19)).

Any-value equality over the multi-valued fields, composite
conjunctions (CITY+STATE is a composite pair, CITY+CONTINENT a virtual
pair — both evaluate as plain conjunctions; the composite column is a
planner acceleration, semantics pinned in tests/test_composite.py),
case-insensitive literal normalization, and lexicographic '>' over a
scalar.  Expected sets referee-evaluated like the reference's
QueryJexl over the raw tuples."""

import pytest

from datawave_spark.compiler import compile_query

# multivalue-cities.csv: START_DATE, EVENT_ID, CITY*, STATE*, COUNTRY,
# CONTINENT, CODE, ACCESS, NUM, GEO  (* = multi-valued)
ROWS = [
    ("20150707", "multi-usa-pi*-7", ["Paris"],
     ["Indiana", "Illinois", "Idaho", "Iowa"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20150707", "multi-usa-rm*-7", ["Rome"],
     ["Maine", "Mississippi", "Missouri"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20150707", "multi-usa-la*-7", ["London"], ["Alabama", "Arkansas"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20150808", "multi-usa-plt*-8", ["Paris", "London"],
     ["Texas", "Tennessee"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20150808", "multi-usa-prm*-8", ["Paris", "Rome"],
     ["Maine", "Mississippi"],
     "United States", "North America", "USA", "NA", 120.0, "0_0"),
    ("20150909", "multi-usa-o*-9", ["Paris", "London", "Rome"],
     ["Ohio", "Oregon"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20150909", "multi-usa-m*-9", ["Paris", "London", "Rome"],
     ["Missouri"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20151010", "multi-usa-pi-10", ["Paris"], ["Idaho"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20151010", "multi-usa-ri-10", ["Rome"], ["Iowa"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
    ("20151010", "multi-usa-li-10", ["London"], ["Indiana"],
     "United States", "North America", "USA", "NA", 100.0, "0_0"),
]
SCHEMA = ("START_DATE string, EVENT_ID string, CITY array<string>, "
          "STATE array<string>, COUNTRY string, CONTINENT string, "
          "CODE string, ACCESS string, NUM double, GEO string")
FT = {f: "lcNoDiacritics" for f in
      ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY", "CONTINENT",
       "CODE", "ACCESS")} | {"NUM": "number"}

CITIES = ("london", "paris", "rome")
STATES = ("ohio", "missouri", "alabama", "idaho")
COLS = ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY",
        "CONTINENT", "CODE", "ACCESS", "NUM", "GEO")


def expected(pred):
    out = set()
    for r in ROWS:
        row = dict(zip(COLS, r))
        if pred(row):
            out.add(row["EVENT_ID"])
    return out


def has(row, field, value):
    vals = row[field]
    if not isinstance(vals, list):
        vals = [vals]
    return any(str(v).lower() == value.lower() for v in vals)


@pytest.fixture(scope="module")
def multi(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


class TestMultiValue:
    def test_multi_value_eq(self, multi):
        # testMultiValue: any-value equality over the CITY array
        for c in CITIES:
            got = run(multi, f"CITY == '{c}'")
            assert got == expected(lambda r: has(r, "CITY", c)) and got, c

    def test_composite_pair(self, multi):
        # testComposite: CITY+STATE conjunction (a composite pair in
        # the reference's index config — same row semantics)
        for c in CITIES:
            for st in STATES:
                q = f"CITY == '{c}' && STATE == '{st}'"
                want = expected(lambda r: has(r, "CITY", c)
                                and has(r, "STATE", st))
                assert run(multi, q) == want, (c, st)

    def test_composite_or_term(self, multi):
        # testCompositeOrTerm: mixed-case literal 'uSA' normalizes
        for c in CITIES:
            for st in STATES:
                q = (f"CITY == '{c}' && (STATE == '{st}' || "
                     f"CODE == 'uSA')")
                want = expected(lambda r: has(r, "CITY", c)
                                and (has(r, "STATE", st)
                                     or has(r, "CODE", "usa")))
                assert run(multi, q) == want and want, (c, st)

    def test_composite_with_virtual(self, multi):
        # testCompositeWithVirtual: + CONTINENT == 'NORth AMerica'
        for c in CITIES:
            for st in STATES:
                q = (f"CITY == '{c}' && STATE == '{st}' && "
                     f"CONTINENT == 'NORth AMerica'")
                want = expected(lambda r: has(r, "CITY", c)
                                and has(r, "STATE", st))
                assert run(multi, q) == want, (c, st)

    def test_virtual_lexicographic_gt(self, multi):
        # testVirtual: CONTINENT > 'e' — lexicographic over the
        # lc-normalized value ('north america' > 'e' everywhere)
        for c in CITIES:
            q = f"CITY == '{c}' && CONTINENT > 'e'"
            want = expected(lambda r: has(r, "CITY", c))
            assert run(multi, q) == want and want, c

    def test_single_term(self, multi):
        # testSingleTerm
        for st in STATES:
            got = run(multi, f"STATE == '{st}'")
            assert got == expected(lambda r: has(r, "STATE", st)) \
                and got, st

    def test_not_match(self, multi):
        # testNotMatch
        for st in ("no-match", "no-ohio"):
            assert run(multi, f"STATE == '{st}'") == set(), st
