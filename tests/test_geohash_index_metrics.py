"""Geohash acceleration, index-frame RangeStream parity, and query
metrics tests."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.functions.geohash import (
    add_geohash, bbox_filter_accelerated, bbox_prefixes, geohash_py,
)
from datawave_spark.plans.metrics import plan_counters, run_with_metrics
from datawave_spark.sources.index_frame import (
    build_index, candidate_uids, index_query,
)
from datawave_spark.jexl.parser import parse as jexl


class TestGeohash:
    def test_known_value(self):
        # canonical example: Jutland coast ~ (57.64911, 10.40744) → u4pruyd...
        assert geohash_py(57.64911, 10.40744, 6).startswith("u4pruy")

    def test_col_matches_py(self, spark):
        pts = [(i, -80.0 + i * 7.3, -170.0 + i * 17.1) for i in range(20)]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        out = add_geohash(df, "lat", "lon", precision=6)
        for r in out.collect():
            assert r.geohash == geohash_py(r.lat, r.lon, 6), (r.lat, r.lon)

    def test_bbox_prefixes_cover(self):
        ps = bbox_prefixes(40.0, 10.0, 41.0, 11.0, precision=3)
        assert 1 <= len(ps) <= 64
        # a point inside the bbox must hash under one of the prefixes
        gh = geohash_py(40.5, 10.5, 6)
        assert any(gh.startswith(p) for p in ps)

    def test_accelerated_filter_equals_exact(self, spark):
        import random
        rnd = random.Random(7)
        pts = [(i, rnd.uniform(-90, 90), rnd.uniform(-180, 180))
               for i in range(500)]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        df = add_geohash(df, "lat", "lon", precision=6).cache()
        got = bbox_filter_accelerated(df, "lat", "lon", 10.0, 20.0, 35.0, 60.0)
        exact = df.filter((F.col("lat").between(10.0, 35.0))
                          & (F.col("lon").between(20.0, 60.0)))
        assert sorted(r.id for r in got.collect()) == \
            sorted(r.id for r in exact.collect())


class TestIndexFrame:
    @pytest.fixture(scope="class")
    def events(self, spark):
        rows = [
            ("a", ["rome", "milan"], 10.0, "2024-01-01"),
            ("b", ["rome"], 25.0, "2024-01-02"),
            ("c", ["paris"], 5.0, "2024-01-02"),
            ("d", ["oslo"], 25.0, "2024-01-03"),
        ]
        return spark.createDataFrame(
            rows, "uid string, CITY array<string>, NUM double, D string").cache()

    @pytest.fixture(scope="class")
    def index(self, events):
        return build_index(events, ["CITY", "NUM"], "uid", date_col="D").cache()

    def test_index_shape(self, index):
        rows = index.filter((F.col("field") == "CITY")
                            & (F.col("value") == "rome")).collect()
        assert sorted(r.uid for r in rows) == ["a", "b"]

    def test_intersection_union_negation(self, events, index):
        uids = lambda node: sorted(
            r.uid for r in candidate_uids(
                index, node, events.select("uid")).collect())
        assert uids(jexl("CITY == 'rome' && NUM == 25")) == ["b"]
        assert uids(jexl("CITY == 'paris' || CITY == 'oslo'")) == ["c", "d"]
        assert uids(jexl("NUM == 25 && !(CITY == 'rome')")) == ["d"]

    def test_index_query_end_to_end(self, events, index):
        out = index_query(events, index, "CITY =~ 'ro.*' && NUM > 20", "uid")
        assert [r.uid for r in out.collect()] == ["b"]


class TestMetrics:
    def test_counters_and_run(self, spark, tables):
        li = tables["lineitem"]
        df = (li.groupBy("l_returnflag")
              .agg(F.sum("l_quantity").alias("q")))
        rows, m = run_with_metrics(df)
        assert rows == 3 or rows > 0
        assert m.n_scans >= 1
        assert m.n_shuffles >= 1
        assert m.n_codegen_spans >= 1
        assert "rows in" in m.summary()

    def test_pushed_filters_visible(self, spark, tables):
        df = tables["lineitem"].filter(F.col("l_quantity") > 49.0) \
            .select("l_orderkey")
        c = plan_counters(df)
        assert any("l_quantity" in p for p in c["pushed_filters"])
