"""TextFunctionQueryTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/TextFunctionQueryTest.java over the
generic-cities corpus) — the LUCENE #TEXT function: RAW
(case-sensitive, un-normalized) value equality, in the unfielded
one-arg form, the explicit _ANYFIELD_ form, and the multi-pair
OR-combiner form (AbstractEvaluationPhaseFunction argument shape,
r10)."""

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


def any_raw(v):
    return lambda r: any(str(r[f]) == v for f in ANY)


def europe(r):
    return str(r["CONTINENT"]).lower() == "europe"


class TestTextFunction:
    def test_any_field_text(self, cities):
        # testAnyFieldText: raw value must match case EXACTLY
        got = run(cities, 'CONTINENT:"europe" AND #TEXT(Lazio)')
        want = expected(lambda r: europe(r) and any_raw("Lazio")(r))
        assert got == want and want
        # incorrect case misses
        assert run(cities, 'CONTINENT:"europe" AND #TEXT(lazio)') \
            == set()

    def test_any_field_text_no_hits_or(self, cities):
        # testAnyFieldTextNoHits: the dead #TEXT disjunct contributes
        # nothing — the continent term still returns its rows
        got = run(cities, 'CONTINENT:"europe" OR #TEXT(blah)')
        assert got == expected(europe) and got

    def test_explicit_any_field(self, cities):
        # testExplicitAnyFieldText: #TEXT(_ANYFIELD_, Lazio)
        got = run(cities,
                  'CONTINENT:"europe" AND #TEXT(_ANYFIELD_, Lazio)')
        assert got == expected(
            lambda r: europe(r) and any_raw("Lazio")(r))

    def test_multi_field_or_pairs(self, cities):
        # testMultiFieldText: #TEXT(OR, STATE, v1, STATE, v2)
        got = run(cities, 'CONTINENT:"europe" AND '
                          '#TEXT(OR, STATE, Lazio, STATE, London)')
        want = expected(lambda r: europe(r)
                        and str(r["STATE"]) in ("Lazio", "London"))
        assert got == want and want
        # one pair wrong-cased → only the other pair's rows
        got = run(cities, 'CONTINENT:"europe" AND '
                          '#TEXT(OR, STATE, Lazio, STATE, london)')
        assert got == expected(lambda r: europe(r)
                               and str(r["STATE"]) == "Lazio")
        # both wrong-cased → empty
        assert run(cities, 'CONTINENT:"europe" AND '
                           '#TEXT(OR, STATE, lazio, STATE, london)') \
            == set()
