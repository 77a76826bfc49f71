"""Reference-pattern functional tests — a CitiesDataType-style corpus
(warehouse/query-core/src/test/java/datawave/query/testframework/
CitiesDataType.java:82-93: multi-valued CITY/STATE, NumberType NUM,
GeoType GEO, LcNoDiacritics text fields) driven through the public
planner with the query shapes the reference's functional suites cover
(AnyFieldQueryTest, CompositeFunctionsTest, IpAddressQueryTest,
LuceneQueryTest, GroupsQueryTest patterns)."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans import QueryPlanner

ROWS = [
    # uid, CITY(multi), STATE(multi), CONTINENT, NUM, FOUNDED, IP, GEO
    ("c1", ["rome"], ["lazio"], "Europe", 120.0, "19400110", "10.2.3.4", "41.9,12.5"),
    ("c2", ["paris", "lodève"], ["hérault", "idf"], "Europe", 110.0, "19230416", "10.2.3.9", "48.9,2.3"),
    ("c3", ["london"], ["greater-london"], "Europe", 30.0, "19001001", "192.168.1.1", "51.5,-0.1"),
    ("c4", ["austin", "rome"], ["texas", "georgia"], "NorthAmerica", 60.0, "18391227", "10.100.9.20", "30.3,-97.7"),
    ("c5", ["tokyo"], ["kanto"], "Asia", 900.0, "14570707", "172.16.0.5", "35.7,139.7"),
]
SCHEMA = ("uid string, CITY array<string>, STATE array<string>, "
          "CONTINENT string, NUM double, FOUNDED string, IP string, GEO string")

FIELD_TYPES = {"CONTINENT": "lcNoDiacritics", "IP": "ipAddress"}


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def qp(cities):
    return QueryPlanner(cities, field_types=FIELD_TYPES,
                        model={"LOCATION": ["CITY", "STATE"]})


def uids(res):
    return sorted(r.uid for r in res.df.select("uid").collect())


class TestReferenceQueryShapes:
    def test_multivalue_any_semantics(self, qp):
        # CitiesDataType: 'rome' appears in CITY of c1 AND c4 (multi)
        assert uids(qp.plan("CITY == 'rome'")) == ["c1", "c4"]

    def test_anyfield(self, qp):
        assert uids(qp.plan("_ANYFIELD_ == 'rome'")) == ["c1", "c4"]
        assert uids(qp.plan("_ANYFIELD_ == 'texas'")) == ["c4"]

    def test_normalized_diacritics(self, qp):
        # lodève/hérault survive accent-folding via lcNoDiacritics —
        # but CITY/STATE are untyped here; CONTINENT is typed:
        assert uids(qp.plan("CONTINENT == 'EUROPE'")) == ["c1", "c2", "c3"]

    def test_bounded_range_marker(self, qp):
        # _Bounded_ ranges: (NUM > x && NUM < y)
        assert uids(qp.plan("NUM > 50 && NUM < 200")) == ["c1", "c2", "c4"]

    def test_regex_on_multivalue(self, qp):
        assert uids(qp.plan("STATE =~ 'tex.*'")) == ["c4"]
        # every city list contains an 'o' somewhere (lodève included)
        assert uids(qp.plan("CITY !~ '.*o.*'")) == []
        assert uids(qp.plan("CITY !~ '.*r.*'")) == ["c3", "c5"]

    def test_ip_normalization(self, qp):
        # IpAddressQueryTest pattern: query a padded IP form
        assert uids(qp.plan("IP == '010.002.003.004'")) == ["c1"]

    def test_date_filter_function(self, qp):
        q = "filter:betweenDates(FOUNDED, '19000101', '19991231', 'yyyyMMdd')"
        assert uids(qp.plan(q)) == ["c1", "c2", "c3"]

    def test_geo_bbox_function(self, qp):
        q = "geo:within_bounding_box(GEO, '35.0,-10.0', '55.0,15.0')"
        assert uids(qp.plan(q)) == ["c1", "c2", "c3"]

    def test_model_alias_expansion(self, qp):
        assert uids(qp.plan("LOCATION == 'georgia'")) == ["c4"]

    def test_lucene_front_end_same_results(self, qp):
        assert uids(qp.plan("CITY:rome", syntax="LUCENE")) == ["c1", "c4"]
        assert uids(qp.plan("NUM:[50 TO 200] AND CONTINENT:EUROPE",
                            syntax="LUCENE")) == ["c1", "c2"]

    def test_negation_with_missing_values(self, qp):
        # c5 has no 'rome' anywhere: negation admits it
        assert uids(qp.plan("!(CITY == 'rome') && NUM > 100")) == ["c2", "c5"]

    def test_composed_options_pipeline(self, qp):
        res = qp.plan(
            "CONTINENT:EUROPE #GROUPBY(CONTINENT) #SUM(NUM) #COUNT(NUM)",
            syntax="LUCENE")
        row = res.df.collect()[0]
        assert row.record_count == 3 and row.sum_num == 260.0

    def test_occurrence_counts_values(self, qp):
        assert uids(qp.plan("filter:occurrence(STATE, '>', 1)")) == ["c2", "c4"]

    def test_matches_at_least_count(self, qp):
        q = "filter:matchesAtLeastCountOf(2, CITY, 'AUSTIN', 'ROME', 'OSLO')"
        assert uids(qp.plan(q)) == ["c4"]
