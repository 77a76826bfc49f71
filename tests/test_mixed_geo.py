"""MixedGeoAndGeoWaveTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/MixedGeoAndGeoWaveTest.java — 17 events:
six GeoType "lat_lon" points, six PointType WKT points, five POLYGON
values; the query model aliases GEO → {GEO, POINT} so one geo query
sweeps both representations).

Forced open in r10: '_'-separated GeoType values and literals
(GeoNormalizer accepts , _ |), WKT POINT evaluation under the geo:
functions, and the ANTIMERIDIAN bounding-box split (GeoFunctions.
evaluate — minLon > maxLon means two longitude ranges).  Expected
counts are verbatim from the Java asserts."""

import pytest

from datawave_spark.compiler import compile_query

GEOS = ["0_0", "3_0", "2_0", "1_0", "1_1", "2_1"]
POINTS = ["POINT (2 2)", "POINT (2 1)", "POINT (2 3)", "POINT (1 3)",
          "POINT (2 0)", "POINT (1 0)"]
POLYS = ["POLYGON((-4 -4, 0 -4, 0 0, -4 0, -4 -4))",
         "POLYGON((0 -4, 4 -4, 4 0, -4 0, 0 -4))",
         "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))",
         "POLYGON((-4 0, 0 0, 0 4, -4 4, -4 0))",
         "POLYGON((-2 -2, 2 -2, 2 2, -2 2, -2 -2))"]

MODEL = {"GEO": ["GEO", "POINT"]}
FT = {"GEO": "geo"}


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [(f"geo-{i + 1}", g, None, None) for i, g in enumerate(GEOS)]
    rows += [(f"point-{i + 1}", None, p, None)
             for i, p in enumerate(POINTS)]
    rows += [(f"poly-{i + 1}", None, None, p) for i, p in enumerate(POLYS)]
    return spark.createDataFrame(
        rows, "uid string, GEO string, POINT string, POLY_POINT string") \
        .cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT, model=MODEL)
    return {r.uid for r in out.select("uid").collect()}


class TestMixedGeo:
    def test_within_small_bounding_box(self, mixed):
        # lat [2,10], lon [0.5,1.5]: GEO '2_1' + POINT (1 3)
        got = run(mixed, "geo:within_bounding_box(GEO, '2_0.5', '10_1.5')")
        assert got == {"geo-6", "point-4"}

    def test_intersects_small_bounding_box(self, mixed):
        got = run(mixed, "geowave:intersects(GEO, "
                         "'POLYGON((0.5 2, 1.5 2, 1.5 10, 0.5 10, 0.5 2))')")
        assert got == {"geo-6", "point-4"}

    def test_within_small_bbox_evaluation_only_conjunct(self, mixed):
        # the reference duplicates the term under an _Eval_ marker —
        # results identical
        q = ("geo:within_bounding_box(GEO, '2_0.5', '10_1.5') && "
             "((_Eval_ = true) && "
             "geo:within_bounding_box(GEO, '2_0.5', '10_1.5'))")
        assert run(mixed, q) == {"geo-6", "point-4"}

    def test_within_large_bounding_box(self, mixed):
        got = run(mixed, "geo:within_bounding_box(GEO, '-90_-180', "
                         "'90_180')")
        assert len(got) == 12
        assert not any(u.startswith("poly") for u in got)

    def test_intersects_large_bounding_box(self, mixed):
        got = run(mixed, "geowave:intersects(GEO, 'POLYGON((-180 -90, "
                         "180 -90, 180 90, -180 90, -180 -90))')")
        assert len(got) == 12

    def test_within_large_circle(self, mixed):
        got = run(mixed, "geo:within_circle(GEO, '0_0', 90)")
        assert len(got) == 12

    def test_antimeridian_bounding_box(self, mixed):
        # minLon 0.01 > maxLon -0.01: the box wraps the antimeridian —
        # everything EXCEPT lon in (-0.01, 0.01) matches; GEO values
        # with lon 0 drop, all six WKT points with lon >= 1 match
        got = run(mixed,
                  "geo:within_bounding_box(GEO, '-90_0.01', '90_-0.01')")
        assert len(got) == 8
        assert got == {"geo-5", "geo-6"} | {f"point-{i}"
                                            for i in range(1, 7)}

    def test_poly_point_field_never_matches_geo(self, mixed):
        # PointType cannot hold POLYGON wkt (the reference rejects it
        # at ingest; the query raises InvalidQueryException there) —
        # here the polygon values simply never satisfy a point
        # predicate
        got = run(mixed,
                  "geo:within_bounding_box(POLY_POINT, '-1_-1', '1_1')")
        assert got == set()

    def test_comma_and_underscore_literals_agree(self, mixed):
        a = run(mixed, "geo:within_bounding_box(GEO, '2_0.5', '10_1.5')")
        b = run(mixed, "geo:within_bounding_box(GEO, '2,0.5', '10,1.5')")
        assert a == b
