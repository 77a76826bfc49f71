"""RegexQueryTest corpus port (reference warehouse/query-core/src/test/
java/datawave/query/RegexQueryTest.java, over the generic-cities
corpus shared with tests/test_anyfield_cities.py).

The backslash duality this port pins (r10): the reference's
JexlASTHelper backslash-placeholder pass gives an escaped ``\\\\`` ONE
backslash for equality nodes and TWO for ER/NR regex nodes
(JexlASTHelper.java:271 — "if not a regex, use single backslash.
otherwise, use double"), so the SAME literal spelling is the unescaped
VALUE under ``==`` and the regex-escaped PATTERN under ``=~``.  The
engine realizes this with _EscStr raw-body literals in the JEXL
parser."""

import re

import pytest

from datawave_spark.compiler import compile_query
from test_anyfield_cities import FT, ROWS, SCHEMA

CITIES = ("london", "paris", "rome")
COLS = ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY",
        "CONTINENT", "CODE", "ACCESS", "NUM", "GEO")


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


def expect(pred):
    out = set()
    for r in ROWS:
        row = dict(zip(COLS, r))
        if pred(row):
            out.add(row["EVENT_ID"])
    return out


def rx(pattern, field):
    compiled = re.compile("(?is)^(?:" + pattern + ")$")
    return lambda row: bool(compiled.match(str(row[field])))


class TestRegexQueries:
    def test_basic(self, cities):
        # CODE =~ 'fR.*' — case-insensitive: FRA
        got = run(cities, "CODE =~ 'fR.*'")
        assert got == expect(rx("fR.*", "CODE"))
        assert got == {"par-fra-lle-7", "ldn-fra-lle-11"}

    def test_index_no_match(self, cities):
        assert run(cities, "CODE =~ 'x.*'") == set()

    def test_reverse(self, cities):
        # trailing-anchor regex (reverse-index shape): STATE '.*i'
        for c in CITIES:
            q = f"CITY == '{c}' && STATE =~ '.*i'"
            want = expect(lambda row: row["CITY"].lower() == c) \
                & expect(rx(".*i", "STATE"))
            assert run(cities, q) == want, c

    def test_missing_index_field(self, cities):
        # ACCESS is unindexed — evaluation-phase regex, same answers
        for c in CITIES:
            q = f"CITY == '{c}' && ACCESS =~ '.*?o'"
            want = expect(lambda row: row["CITY"].lower() == c) \
                & expect(rx(".*?o", "ACCESS"))
            assert run(cities, q) == want and want, c

    def test_reluctant_zero_or_more(self, cities):
        assert run(cities, "STATE =~ 'x.*?'") == set()
        got = run(cities, "STATE =~ 'lA.*?'")
        assert got == expect(rx("lA.*?", "STATE")) and got

    def test_infinite(self, cities):
        for c in CITIES:
            q = f"CITY == '{c}' && STATE =~ '.*'"
            assert run(cities, q) == expect(
                lambda row: row["CITY"].lower() == c), c

    def test_full_table_scan_regex(self, cities):
        got = run(cities, "CONTINENT =~ '.*uro.*'")
        assert got == expect(rx(".*uro.*", "CONTINENT")) and len(got) == 6

    def test_and_not(self, cities):
        for c in CITIES:
            q = f"CITY == '{c}' && not (STATE =~ '.*o')"
            want = expect(lambda row: row["CITY"].lower() == c) \
                - expect(rx(".*o", "STATE"))
            assert run(cities, q) == want, c

    def test_neg_regex_numeric_guard(self, cities):
        # testAndNotAgain's run shape: numeric ORs && negated regex
        got = run(cities, "(NUM == '20' || NUM == '30') && CITY !~ '.*iS.*'")
        want = (expect(lambda row: row["NUM"] == 20.0)
                | expect(lambda row: row["NUM"] == 30.0)) \
            - expect(rx(".*iS.*", "CITY"))
        assert got == want and got


class TestBackslashDuality:
    """test{1,2,3}{Leading,Trailing,Middle}Backslash{Equals,Regex} —
    the SAME query spelling must match under both operators."""

    # (source spelling of the literal body, expected EVENT_ID)
    CASES_LEADING = [
        (r"\\Edge-City-1", "edge-case-id-1"),
        (r"\\\\Edge-City-2", "edge-case-id-2"),
        (r"\\\\\\Edge-City-3", "edge-case-id-3"),
    ]
    CASES_TRAILING = [
        (r"Edge-City-4\\", "edge-case-id-4"),
        (r"Edge-City-5\\\\", "edge-case-id-5"),
        (r"Edge-City-6\\\\\\", "edge-case-id-6"),
    ]
    CASES_MIDDLE = [
        (r"Edge-C\\ity-7", "edge-case-id-7"),
        (r"Edge-C\\\\ity-8", "edge-case-id-8"),
        (r"Edge-C\\\\\\ity-9", "edge-case-id-9"),
    ]

    @pytest.mark.parametrize("body,eid",
                             CASES_LEADING + CASES_TRAILING + CASES_MIDDLE)
    def test_equals(self, cities, body, eid):
        assert run(cities, f"CITY == '{body}'") == {eid}, body

    @pytest.mark.parametrize("body,eid",
                             CASES_LEADING + CASES_TRAILING + CASES_MIDDLE)
    def test_regex(self, cities, body, eid):
        assert run(cities, f"CITY =~ '{body}'") == {eid}, body

    def test_single_backslash_regex_stays_regex_syntax(self, cities):
        # 'C\d+'-style: an UNPAIRED backslash escape in a regex literal
        # is regex syntax, not a literal backslash
        got = run(cities, r"EVENT_ID =~ 'edge-case-id-\d'")
        assert len(got) == 9 and all(e.startswith("edge-case") for e in got)
