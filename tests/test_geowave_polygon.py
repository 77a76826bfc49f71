"""geowave: predicates over WKT polygon DATA (GeometryType fields) —
the reference evaluates full JTS predicates between stored geometry and
the query geometry (jexl/functions/GeoWaveFunctions.java:137-335);
these tests pin the dependency-free restatement on hand-built cases.
"""

import pytest

from datawave_spark.functions._geowave_purepy import (
    geometry_predicate, parse_wkt, poly_covers, poly_intersects)

SQUARE = [(0, 0), (10, 0), (10, 10), (0, 10)]          # 10x10 at origin
INNER = [(2, 2), (4, 2), (4, 4), (2, 4)]               # fully inside
SHIFTED = [(8, 8), (14, 8), (14, 14), (8, 14)]         # overlaps corner
OUTSIDE = [(20, 20), (22, 20), (22, 22), (20, 22)]     # disjoint
CROSS_V = [(4, -5), (6, -5), (6, 15), (4, 15)]         # vertical bar through
TRIANGLE = [(1, 1), (5, 1), (3, 6)]
PENTAGON = [(5, 0), (9, 3), (7, 8), (3, 8), (1, 3)]


class TestPolyPoly:
    def test_intersects_contained(self):
        assert poly_intersects(SQUARE, INNER)
        assert poly_intersects(INNER, SQUARE)

    def test_intersects_partial_overlap(self):
        assert poly_intersects(SQUARE, SHIFTED)

    def test_intersects_disjoint(self):
        assert not poly_intersects(SQUARE, OUTSIDE)

    def test_intersects_cross_shape_no_vertices_inside(self):
        # the vertical bar's vertices are all outside the square and
        # vice versa — only the strict edge-crossing test catches it
        assert poly_intersects(SQUARE, CROSS_V)
        assert poly_intersects(CROSS_V, SQUARE)

    def test_covers(self):
        assert poly_covers(SQUARE, INNER)
        assert not poly_covers(INNER, SQUARE)
        assert not poly_covers(SQUARE, SHIFTED)
        assert poly_covers(SQUARE, TRIANGLE)
        assert poly_covers(SQUARE, PENTAGON)  # all vertices within 0..10

    def test_covers_boundary_touching(self):
        # shares the left edge — still covered (JTS covers, not contains-proper)
        edge_hugger = [(0, 2), (3, 2), (3, 5), (0, 5)]
        assert poly_covers(SQUARE, edge_hugger)


class TestGeometryPredicate:
    def test_polygon_data_vs_polygon_query(self):
        assert geometry_predicate("intersects", "polygon", SHIFTED,
                                  "polygon", SQUARE)
        assert geometry_predicate("within", "polygon", INNER,
                                  "polygon", SQUARE)
        assert geometry_predicate("covered_by", "polygon", INNER,
                                  "polygon", SQUARE)
        assert geometry_predicate("contains", "polygon", SQUARE,
                                  "polygon", INNER)
        assert geometry_predicate("covers", "polygon", SQUARE,
                                  "polygon", TRIANGLE)
        assert geometry_predicate("overlaps", "polygon", SHIFTED,
                                  "polygon", SQUARE)
        assert not geometry_predicate("overlaps", "polygon", INNER,
                                      "polygon", SQUARE)
        assert not geometry_predicate("crosses", "polygon", CROSS_V,
                                      "polygon", SQUARE)

    def test_polygon_data_vs_point_query(self):
        assert geometry_predicate("contains", "polygon", SQUARE,
                                  "point", (5, 5))
        assert geometry_predicate("intersects", "polygon", SQUARE,
                                  "point", (0, 0))   # boundary counts
        assert not geometry_predicate("within", "polygon", SQUARE,
                                      "point", (5, 5))

    def test_point_data_vs_polygon_query(self):
        assert geometry_predicate("within", "point", (5, 5),
                                  "polygon", SQUARE)
        assert not geometry_predicate("contains", "point", (5, 5),
                                      "polygon", SQUARE)

    def test_point_point(self):
        assert geometry_predicate("intersects", "point", (1.0, 2.0),
                                  "point", (1.0, 2.0))
        assert not geometry_predicate("intersects", "point", (1.0, 2.1),
                                      "point", (1.0, 2.0))


class TestWktParse:
    def test_negative_coords(self):
        kind, geom = parse_wkt("POLYGON((-20 -10, 60 -10, 60 40, -20 40, -20 -10))")
        assert kind == "polygon" and geom[0] == (-20.0, -10.0)

    def test_point(self):
        assert parse_wkt("POINT(-3.5 7)") == ("point", (-3.5, 7.0))


class TestEndToEnd:
    def test_polygon_column_compiled_query(self, spark):
        from datawave_spark.compiler import compile_query
        rows = [
            (1, "POLYGON((2 2, 4 2, 4 4, 2 4, 2 2))"),      # inside
            (2, "POLYGON((20 20, 22 20, 22 22, 20 22, 20 20))"),  # out
            (3, "POLYGON((8 8, 14 8, 14 14, 8 14, 8 8))"),  # overlap
            (4, "5,5"),                                     # lat,lon inside
            (5, "50,50"),                                   # lat,lon outside
            (6, None),
        ]
        df = spark.createDataFrame(rows, "id long, GEOM string")
        q = "geowave:intersects(GEOM, 'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')"
        got = {r.id for r in compile_query(df, q).select("id").collect()}
        assert got == {1, 3, 4}
        w = "geowave:within(GEOM, 'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')"
        got_w = {r.id for r in compile_query(df, w).select("id").collect()}
        assert got_w == {1, 4}


class TestLinestringMulti:
    """LINESTRING / MULTIPOLYGON WKT surface (GeoWaveFunctions.java
    evaluates arbitrary JTS geometry; these cover the simple-chain and
    disjoint-shell cases the pure-python path supports)."""

    def test_parse_linestring(self):
        kind, pts = parse_wkt("LINESTRING(0 0, 5 5, 10 0)")
        assert kind == "linestring" and pts == [(0, 0), (5, 5), (10, 0)]

    def test_parse_multipolygon(self):
        kind, rings = parse_wkt(
            "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0)), "
            "((10 10, 12 10, 12 12, 10 12, 10 10)))")
        assert kind == "multipolygon" and len(rings) == 2
        assert rings[1][0] == (10.0, 10.0)

    def test_parse_polygon_with_hole_keeps_shell(self):
        kind, ring = parse_wkt(
            "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
        assert kind == "polygon" and len(ring) == 5

    def test_line_vs_polygon(self):
        square = [(0, 0), (10, 0), (10, 10), (0, 10)]
        inside = [(2, 2), (8, 8)]
        through = [(-5, 5), (15, 5)]
        outside = [(20, 20), (30, 30)]
        assert geometry_predicate("within", "linestring", inside,
                                  "polygon", square)
        assert geometry_predicate("intersects", "linestring", through,
                                  "polygon", square)
        assert geometry_predicate("crosses", "linestring", through,
                                  "polygon", square)
        assert not geometry_predicate("crosses", "linestring", inside,
                                      "polygon", square)
        assert not geometry_predicate("intersects", "linestring", outside,
                                      "polygon", square)
        # swapped operands: polygon data, linestring query
        assert geometry_predicate("intersects", "polygon", square,
                                  "linestring", through)
        assert geometry_predicate("contains", "polygon", square,
                                  "linestring", inside)

    def test_line_vs_line(self):
        a = [(0, 0), (10, 10)]
        b = [(0, 10), (10, 0)]
        c = [(20, 0), (30, 0)]
        assert geometry_predicate("intersects", "linestring", a,
                                  "linestring", b)
        assert geometry_predicate("crosses", "linestring", a,
                                  "linestring", b)
        assert not geometry_predicate("intersects", "linestring", a,
                                      "linestring", c)

    def test_point_vs_linestring(self):
        line = [(0, 0), (10, 10)]
        assert geometry_predicate("intersects", "point", (5, 5),
                                  "linestring", line)
        assert not geometry_predicate("intersects", "point", (5, 6),
                                      "linestring", line)

    def test_multipolygon_vs_polygon(self):
        parts = [[(0, 0), (2, 0), (2, 2), (0, 2)],
                 [(10, 10), (12, 10), (12, 12), (10, 12)]]
        probe = [(11, 11), (13, 11), (13, 13), (11, 13)]
        far = [(30, 30), (31, 30), (31, 31), (30, 31)]
        assert geometry_predicate("intersects", "multipolygon", parts,
                                  "polygon", probe)
        assert not geometry_predicate("intersects", "multipolygon", parts,
                                      "polygon", far)

    def test_linestring_column_end_to_end(self, spark):
        from datawave_spark.compiler import compile_query
        rows = [
            (1, "LINESTRING(2 2, 8 8)"),            # inside
            (2, "LINESTRING(-5 5, 15 5)"),          # crosses through
            (3, "LINESTRING(20 20, 30 30)"),        # outside
            (4, "MULTIPOLYGON(((2 2, 4 2, 4 4, 2 4, 2 2)))"),  # inside part
        ]
        df = spark.createDataFrame(rows, "id long, GEOM string")
        q = "geowave:intersects(GEOM, 'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')"
        got = {r.id for r in compile_query(df, q).select("id").collect()}
        assert got == {1, 2, 4}
        c = "geowave:crosses(GEOM, 'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')"
        got_c = {r.id for r in compile_query(df, c).select("id").collect()}
        assert got_c == {2}


class TestLineRowsVectorized:
    def test_line_batch_matches_scalar(self):
        """line_rows_predicate (padded-chain numpy batch) must agree
        bit-for-bit with the scalar geometry_predicate on random
        segments and multi-vertex chains, for every op it handles."""
        import random
        import pandas as pd
        from datawave_spark.functions._geowave_purepy import (
            geometry_predicate, line_rows_predicate)
        rng = random.Random(99)
        qring = [(-10.5, -8.5), (12.5, -8.5), (12.5, 9.5), (-10.5, 9.5),
                 (-10.5, -8.5)]
        chains = []
        for _ in range(400):
            k = rng.choice([2, 2, 2, 3, 4])
            pts = [(rng.randint(-20, 20), rng.randint(-15, 15))]
            for _ in range(k - 1):
                x, y = pts[-1]
                pts.append((x + rng.randint(-6, 6), y + rng.randint(-6, 6)))
            chains.append(pts)
        flat = pd.Series([[c for p in pts for c in p] for pts in chains])
        for op in ("intersects", "within", "covered_by", "crosses",
                   "contains", "covers", "overlaps"):
            got = line_rows_predicate(flat, op, qring)
            want = [geometry_predicate(op, "linestring", pts,
                                       "polygon", qring)
                    for pts in chains]
            mism = [i for i, (g, w) in enumerate(zip(got, want))
                    if bool(g) != bool(w)]
            assert not mism, (op, mism[:5], [chains[i] for i in mism[:3]])
