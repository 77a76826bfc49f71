"""LuceneQueryTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/LuceneQueryTest.java over the generic-cities
corpus) — LUCENE front-end row semantics: fielded phrases, the
composite-pair conjunction, #EVALUATION_ONLY / #JEXL eval-only
subtrees, one-arg and _ANYFIELD_ #INCLUDE, same-field LUCENE ranges,
the bare-wildcard 'FIELD:*' term (≡ not-null,
testAnyFieldNotNullLiteral's '!(CITY == null)' expansion), and
#COMPARE.  The reference's plan-string assertions (_Value_/_Eval_
marker spellings) are Accumulo planner output — row results are the
contract here."""

import pytest

from datawave_spark.compiler import compile_query
from datawave_spark.lucene.parser import parse_lucene

from test_anyfield_cities import ANY, FT, ROWS, SCHEMA, expected


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, lucene):
    node = parse_lucene(lucene)
    out = compile_query(df, node, field_types=FT, anyfield=ANY)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


def low(r, f):
    return str(r[f]).lower()


class TestLuceneQuery:
    def test_simple_eq(self, cities):
        got = run(cities, 'CITY:"rome"')
        assert got == expected(lambda r: low(r, "CITY") == "rome") \
            and got

    def test_simple_and_eq(self, cities):
        # testSimpleAndEq plans through the CITY_STATE composite; the
        # row semantics are the plain conjunction
        got = run(cities, 'CITY:"rome" AND STATE:"lazio"')
        assert got == expected(lambda r: low(r, "CITY") == "rome"
                               and low(r, "STATE") == "lazio") and got

    def test_evaluation_only(self, cities):
        # testSimpleAndEqEvalOnly: the _Eval_ subtree still filters
        got = run(cities,
                  'CITY:"rome" AND #EVALUATION_ONLY(\'COUNTRY:"italy"\')')
        assert got == expected(lambda r: low(r, "CITY") == "rome"
                               and low(r, "COUNTRY") == "italy") and got

    def test_one_arg_include(self, cities):
        # testAnyFieldInclude: #INCLUDE(lazio) sweeps _ANYFIELD_
        got = run(cities, 'CONTINENT:"europe" AND #INCLUDE(lazio)')
        want = expected(lambda r: low(r, "CONTINENT") == "europe"
                        and any(low(r, f) == "lazio" for f in ANY))
        assert got == want and want
        # testExplicitAnyFieldInclude / testAnyFieldWithRegex
        assert run(cities, 'CONTINENT:"europe" AND '
                           '#INCLUDE(_ANYFIELD_, laz.*)') == want

    def test_jexl_eval_only_regex_and_range(self, cities):
        # testExplicitFieldEvaluationOnlyWithRegex / WithRange
        got = run(cities, 'CONTINENT:"europe" AND '
                          '#JEXL("((_Eval_ = true) && STATE =~ \'laz.*\')")')
        assert got == expected(
            lambda r: low(r, "CONTINENT") == "europe"
            and low(r, "STATE").startswith("laz")) and got
        got = run(cities,
                  'CONTINENT:"europe" AND #JEXL("((_Eval_ = true) && '
                  "STATE >= 'l' && STATE <= 'm')\")")
        assert got == expected(
            lambda r: low(r, "CONTINENT") == "europe"
            and "l" <= low(r, "STATE") <= "m") and got

    def test_multi_range_same_field(self, cities):
        # testMultiRangeSameField: two LUCENE ranges on STATE conjoin
        got = run(cities, 'CONTINENT:"europe" AND STATE:[l TO m] '
                          'AND STATE:[la TO le]')
        assert got == expected(
            lambda r: low(r, "CONTINENT") == "europe"
            and "l" <= low(r, "STATE") <= "m"
            and "la" <= low(r, "STATE") <= "le") and got

    def test_bare_wildcard_is_not_null(self, cities):
        # testAnyFieldNotNullLiteral: 'CITY:*' ≡ !(CITY == null)
        got = run(cities, 'CONTINENT:"europe" AND CITY:* AND '
                          '#INCLUDE(_ANYFIELD_, laz.*)')
        want = expected(lambda r: low(r, "CONTINENT") == "europe"
                        and r["CITY"] is not None
                        and any(low(r, f).startswith("laz")
                                for f in ANY))
        assert got == want and want

    def test_compare_function(self, cities):
        # testCompareFunction: field-vs-field through #COMPARE
        got = run(cities, 'CITY:"rome" AND #COMPARE(CITY, <, ANY, STATE)')
        assert got == expected(lambda r: low(r, "CITY") == "rome"
                               and low(r, "CITY") < low(r, "STATE"))
