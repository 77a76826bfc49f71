"""AnyFieldQueryTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/AnyFieldQueryTest.java, data verbatim from
src/test/resources/input/generic-cities.csv — 25 events incl. the nine
backslash edge-city rows).

The reference's _ANYFIELD_ expansion goes against the INDEX
(GenericCityFields: CITY, STATE, CONTINENT, GEO), and its expected
side (RawDataManager.convertAnyField) ORs the phrase over the indexed
non-geo fields.  This port forced the `anyfield=` expansion-set
restriction on CompileContext (r10) — before it, _ANYFIELD_ swept
every schema field and an unfielded regex could match EVENT_ID.

Functional tests are ported with a tiny independent referee evaluator
(plain `re` over the raw tuples — the convertAnyField semantics);
plan-assertion tests tied to Accumulo planner internals (composite
expansion markers, _Delayed_, pushdown thresholds) are out of scope
by design: Catalyst owns those stages here (SURVEY §4)."""

import re

import pytest

from datawave_spark.compiler import compile_query

# generic-cities.csv: START_DATE, EVENT_ID, CITY, STATE, COUNTRY,
# CONTINENT, CODE, ACCESS, NUM, GEO
ROWS = [
    ("20150707", "ldn-uk-7", "London", "London", "United Kingdom",
     "Europe", "GBR", "Euro", 10.0, "51.51_-0.13"),
    ("20150707", "par-fra-lle-7", "Paris", "lle-de-France", "France",
     "Europe", "FRA", "Euro", 20.0, "48.86_2.21"),
    ("20150707", "rom-ita-7", "Rome", "Lazio", "Italy",
     "Europe", "ITA", "Euro", 30.0, "41.91_12.26"),
    ("20150808", "par-usa-oh-8", "Paris", "Ohio", "United States",
     "North America", "USA", "NA", 100.0, "40.80_-81.18"),
    ("20150808", "rom-usa-oh-8", "Rome", "Ohio", "United States",
     "North America", "USA", "NA", 100.0, "41.60_-80.88"),
    ("20150808", "ldn-usa-oh-8", "London", "Ohio", "United States",
     "North America", "USA", "NA", 100.0, "39.89_-83.50"),
    ("20150808", "par-usa-mo-8", "Paris", "Missouri", "United States",
     "North America", "USA", "NA", 110.0, "39.48_-92.02"),
    ("20150808", "rom-usa-mo-8", "Rome", "Missouri", "United States",
     "North America", "USA", "NA", 110.0, "36.84_-92.79"),
    ("20150808", "ldn-usa-mo-8", "London", "Missouri", "United States",
     "North America", "USA", "NA", 110.0, "39.58_-91.42"),
    ("20150909", "par-usa-oh-9", "Paris", "Ohio", "United States",
     "North America", "USA", "NA", 100.0, "40.80_-81.18"),
    ("20151010", "par-usa-ma-10", "Paris", "Maine", "United States",
     "North America", "USA", "NA", 120.0, "44.24_-70.56"),
    ("20151010", "rom-usa-ms-10", "Rome", "Mississippi", "United States",
     "North America", "USA", "NA", 130.0, "33.96_-90.50"),
    ("20151010", "ldn-usa-mi-10", "London", "Michigan", "United States",
     "North America", "USA", "NA", 140.0, "42.04_-83.67"),
    ("20151111", "par-ita-11", "Paris", "Lazio", "Italy",
     "Europe", "ITA", "Euro", 30.0, "41.91_12.26"),
    ("20151111", "rom-bel-11", "Rome", "Hainaut", "Belgium",
     "Europe", "BEL", "Euro", 50.0, "50.54_3.25"),
    ("20151111", "ldn-fra-lle-11", "London", "lle-de-France", "France",
     "Europe", "FRA", "Euro", 20.0, "46.63_5.08"),
    ("20151111", "edge-case-id-1", "\\Edge-City-1", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 110.0, "0_0"),
    ("20151111", "edge-case-id-2", "\\\\Edge-City-2", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 220.0, "0_0"),
    ("20151111", "edge-case-id-3", "\\\\\\Edge-City-3", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 330.0, "0_0"),
    ("20151111", "edge-case-id-4", "Edge-City-4\\", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 110.0, "0_0"),
    ("20151111", "edge-case-id-5", "Edge-City-5\\\\", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 220.0, "0_0"),
    ("20151111", "edge-case-id-6", "Edge-City-6\\\\\\", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 330.0, "0_0"),
    ("20151111", "edge-case-id-7", "Edge-C\\ity-7", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 110.0, "0_0"),
    ("20151111", "edge-case-id-8", "Edge-C\\\\ity-8", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 220.0, "0_0"),
    ("20151111", "edge-case-id-9", "Edge-C\\\\\\ity-9", "Edgeville",
     "Edgeland", "Edgeope", "EDG", "NA", 330.0, "0_0"),
]
SCHEMA = ("START_DATE string, EVENT_ID string, CITY string, STATE string, "
          "COUNTRY string, CONTINENT string, CODE string, ACCESS string, "
          "NUM double, GEO string")
FT = {f: "lcNoDiacritics" for f in
      ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY", "CONTINENT",
       "CODE", "ACCESS")} | {"NUM": "number"}
# convertAnyField: indexed fields minus geo-normalized ones
ANY = {"CITY", "STATE", "CONTINENT"}
CITIES = ("london", "paris", "rome")


def referee_eq(value: str):
    v = value.lower()
    return lambda row: any(str(row[f]).lower() == v for f in ANY)


def referee_re(pattern: str):
    rx = re.compile("(?is)^(?:" + pattern + ")$")
    return lambda row: any(rx.match(str(row[f])) for f in ANY)


def expected(pred):
    cols = ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY",
            "CONTINENT", "CODE", "ACCESS", "NUM", "GEO")
    out = set()
    for r in ROWS:
        row = dict(zip(cols, r))
        if pred(row):
            out.add(row["EVENT_ID"])
    return out


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT, anyfield=ANY)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


class TestAnyFieldQueries:
    def test_equal(self, cities):
        for c in CITIES:
            got = run(cities, f"_ANYFIELD_ == '{c}'")
            assert got == expected(referee_eq(c)) and got, c

    def test_equal_is_index_restricted(self, cities):
        # EVENT_ID is NOT in the expansion set: an unfielded term that
        # only an unindexed field holds matches nothing
        assert run(cities, "_ANYFIELD_ == 'ldn-uk-7'") == set()

    def test_and(self, cities):
        for c in CITIES:
            q = f"_ANYFIELD_ == '{c}' && _ANYFIELD_ == 'europe'"
            want = expected(referee_eq(c)) & expected(referee_eq("europe"))
            assert run(cities, q) == want and want, c

    def test_or(self, cities):
        for c in CITIES:
            q = f"_ANYFIELD_ == '{c}' || _ANYFIELD_ == 'mississippi'"
            want = expected(referee_eq(c)) \
                | expected(referee_eq("mississippi"))
            assert run(cities, q) == want, c

    def test_or_or_with_nofield_term(self, cities):
        # the 'none' disjunct matches NO field anywhere (_NOFIELD_):
        # it contributes nothing, never an error
        for c in CITIES:
            q = (f"(_ANYFIELD_ == '{c}' || _ANYFIELD_ == 'mississippi')"
                 f" || _ANYFIELD_ == 'none'")
            want = expected(referee_eq(c)) \
                | expected(referee_eq("mississippi"))
            assert run(cities, q) == want, c

    def test_or_and_precedence_and_case(self, cities):
        # && binds tighter than ||; literals normalize case-insensitive
        for c in CITIES:
            q = (f"_ANYFIELD_ == '{c}' || _ANYFIELD_ == 'missISsippi' "
                 f"&& _ANYFIELD_ == 'EUrope'")
            want = expected(referee_eq(c)) \
                | (expected(referee_eq("mississippi"))
                   & expected(referee_eq("europe")))
            assert run(cities, q) == want, c

    def test_equal_no_match(self, cities):
        assert run(cities, "_ANYFIELD_ == 'nothing'") == set()

    def test_and_no_match(self, cities):
        for c in CITIES:
            q = f"CITY == '{c}' && _ANYFIELD_ == 'nothing'"
            assert run(cities, q) == set()

    def test_regex(self, cities):
        got = run(cities, "_ANYFIELD_ =~ 'ro.*'")
        assert got == expected(referee_re("ro.*"))
        assert got == {"rom-ita-7", "rom-usa-oh-8", "rom-usa-mo-8",
                       "rom-usa-ms-10", "rom-bel-11"}

    def test_regex_leading_wildcard(self, cities):
        # reverse-index shape: '.*o' hits STATE lazio/ohio only
        got = run(cities, "_ANYFIELD_ =~ '.*o'")
        assert got == expected(referee_re(".*o"))

    def test_regex_or(self, cities):
        q = "_ANYFIELD_ =~ 'ro.*' || _ANYFIELD_ =~ '.*o'"
        want = expected(referee_re("ro.*")) | expected(referee_re(".*o"))
        assert run(cities, q) == want

    def test_regex_and_field(self, cities):
        q = "_ANYFIELD_ =~ 'ro.*' && STATE =~ '.*o'"
        want = expected(referee_re("ro.*")) & expected(
            lambda row: bool(re.match("(?is)^(?:.*o)$", row["STATE"])))
        assert run(cities, q) == want and want

    def test_regex_zero_results(self, cities):
        for c in CITIES:
            q = f"CITY == '{c}' && _ANYFIELD_ =~ 'zero.*'"
            assert run(cities, q) == set()

    def test_neg_regex(self, cities):
        # !~ over _ANYFIELD_: NO indexed value matches (convertAnyField
        # with AND_OP) — drops the North America continent rows
        got = run(cities, "_ANYFIELD_ !~ '.*ica'")
        want = expected(lambda row: not any(
            re.match(r"(?is)^(?:.*ica)$", str(row[f])) for f in ANY))
        assert got == want
        assert all("usa" not in e for e in got)

    def test_neg_regex_and(self, cities):
        for c in CITIES:
            q = f"CITY == '{c}' && _ANYFIELD_ !~ '.*ica'"
            want = expected(lambda row: row["CITY"].lower() == c) \
                & expected(lambda row: not any(
                    re.match(r"(?is)^(?:.*ica)$", str(row[f]))
                    for f in ANY))
            assert run(cities, q) == want, c

    def test_reverse_index_shape(self, cities):
        # testReverseIndex: '.*ica' expands (via the reverse index in
        # the reference) to CONTINENT == 'north america'
        got = run(cities, "_ANYFIELD_ =~ '.*ica'")
        want = expected(
            lambda row: row["CONTINENT"].lower() == "north america")
        assert got == want and len(got) == 10


class TestAnyFieldEdgeCities:
    """The nine backslash edge-city rows — CITY values carrying 1-3
    literal backslashes at the start, end, and middle.  JEXL string
    literals escape backslashes by doubling (commons-jexl StringParser:
    only the delimiter and '\\\\' unescape — the r10 parser fix)."""

    def test_leading_backslashes(self, cities):
        # CITY = \Edge-City-1 — JEXL literal doubles the backslash
        got = run(cities, r"CITY == '\\edge-city-1'")
        assert got == {"edge-case-id-1"}
        got = run(cities, r"CITY == '\\\\edge-city-2'")
        assert got == {"edge-case-id-2"}

    def test_trailing_and_middle_backslashes(self, cities):
        got = run(cities, r"CITY == 'edge-city-4\\'")
        assert got == {"edge-case-id-4"}
        got = run(cities, r"CITY == 'edge-c\\ity-7'")
        assert got == {"edge-case-id-7"}

    def test_edge_regex(self, cities):
        # =~ keeps the raw backslashes as the PATTERN
        # (JexlASTHelper.java:271 double-backslash rule, pinned by the
        # RegexQueryTest port): 2 source backslashes = regex '\\' = one
        # literal backslash; 4 = two.
        got = run(cities, r"_ANYFIELD_ =~ '\\edge-city-.*'")
        assert got == {"edge-case-id-1"}
        got = run(cities, r"_ANYFIELD_ =~ '\\\\edge-city-.*'")
        assert got == {"edge-case-id-2"}
