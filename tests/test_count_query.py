"""CountQueryTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/CountQueryTest.java over the generic-cities
corpus — CountingShardQueryLogic: the query returns ONE record whose
value is the matching-event count)."""

import re

import pytest

from pyspark.sql import functions as F

from datawave_spark.compiler import compile_query

from test_anyfield_cities import FT, ROWS, SCHEMA, expected


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def count_of(df, q):
    hits = compile_query(df, q, field_types=FT)
    rows = hits.agg(F.count(F.lit(1)).alias("cnt")).collect()
    return rows[0].cnt


def rx(pattern, v):
    return bool(re.match(r"(?is)^(?:" + pattern + r")$", str(v)))


class TestCountQuery:
    def test_regex(self, cities):
        q = "CODE == 'usA' && STATE =~ 'mISs.*'"
        want = expected(lambda r: str(r["CODE"]).lower() == "usa"
                        and rx("mISs.*", r["STATE"]))
        assert count_of(cities, q) == len(want) > 0

    def test_regex_multi_wildcard(self, cities):
        q = "CODE == 'usA' && STATE =~ 'm.*si.*'"
        want = expected(lambda r: str(r["CODE"]).lower() == "usa"
                        and rx("m.*si.*", r["STATE"]))
        assert count_of(cities, q) == len(want) > 0

    def test_equal(self, cities):
        want = expected(lambda r: str(r["STATE"]).lower() == "missouri")
        assert count_of(cities, "STATE == 'Missouri'") == len(want) > 0

    def test_not_equal(self, cities):
        q = "STATE != 'Missouri' && CONTINENT =~ 'north.*'"
        want = expected(lambda r: str(r["STATE"]).lower() != "missouri"
                        and rx("north.*", r["CONTINENT"]))
        assert count_of(cities, q) == len(want) > 0

    def test_or_of_conjunctions(self, cities):
        q = ("(CITY == 'paris' && CODE == 'frA') || "
             "(CITY == 'paris' && CODE == 'UsA') || "
             "(CITY == 'paris' && CODE == 'iTa')")
        want = expected(lambda r: str(r["CITY"]).lower() == "paris"
                        and str(r["CODE"]).lower() in ("fra", "usa",
                                                       "ita"))
        assert count_of(cities, q) == len(want) > 0
