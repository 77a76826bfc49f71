"""Geowave referee (round 8): ``geowave:<op>`` Spark compilation —
JVM-side coarse bounding-box prefilter + exact pandas-UDF geometry
(the GeoWavePruningVisitor coarse/exact split,
``functions/_geowave_purepy.py``) — fuzzed against an INDEPENDENT
python geometry implementation (nonzero-winding containment + a
separating-axis test for convex polygon pairs; the engine uses
ray-casting + edge-crossing tables, so agreement is two independent
algorithms concurring).

The property that matters at scale: the coarse prefilter must never
DROP a row the exact predicate accepts — over-pruning silently loses
documents.  Boundary-exact points/edges are excluded from comparison
(the two algorithms may legitimately disagree within float epsilon ON
the boundary; random data hits it with probability ~0, and the pinned
corpora here are checked not to).

The r8 sweeps (175 point queries + 75 convex polygon-pair queries,
/tmp exploratory) found zero divergences; this test pins reduced
deterministic versions of both.
"""

from __future__ import annotations

import random

import pytest

from datawave_spark.compiler import compile_query


# -------- independent geometry: winding number + separating axis -----
def winding_inside(px, py, ring):
    pts = ring if ring[0] == ring[-1] else ring + [ring[0]]
    w = 0
    for i in range(len(pts) - 1):
        (x1, y1), (x2, y2) = pts[i], pts[i + 1]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if abs(cross) < 1e-12 \
                and min(x1, x2) - 1e-12 <= px <= max(x1, x2) + 1e-12 \
                and min(y1, y2) - 1e-12 <= py <= max(y1, y2) + 1e-12:
            return "on"
        if y1 <= py:
            if y2 > py and cross > 0:
                w += 1
        elif y2 <= py and cross < 0:
            w -= 1
    return "in" if w != 0 else "out"


def ref_point_op(op, px, py, qring):
    pos = winding_inside(px, py, qring)
    if op == "intersects":
        return pos in ("in", "on")
    if op == "within":                 # interiors must intersect
        return pos == "in"
    if op == "covered_by":
        return pos in ("in", "on")
    return False                       # contains/covers/crosses/overlaps


def sat_intersect(a, b):
    for ring in (a, b):
        for i in range(len(ring) - 1):
            (x1, y1), (x2, y2) = ring[i], ring[i + 1]
            nx, ny = y1 - y2, x2 - x1
            pa = [nx * px + ny * py for px, py in a[:-1]]
            pb = [nx * px + ny * py for px, py in b[:-1]]
            if max(pa) < min(pb) - 1e-9 or max(pb) < min(pa) - 1e-9:
                return False
    return True


def all_verts_in(a, b):
    return all(winding_inside(px, py, b) != "out" for px, py in a[:-1])


def convex_hull(pts):
    pts = sorted(set(pts))
    if len(pts) < 3:
        return None

    def half(ps):
        h = []
        for p in ps:
            while len(h) >= 2 and \
                    (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1]) - \
                    (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0]) <= 0:
                h.pop()
            h.append(p)
        return h

    ring = half(pts)[:-1] + half(reversed(pts))[:-1]
    if len(ring) < 3:
        return None
    return ring + [ring[0]]


def wkt_poly(ring):
    return "POLYGON((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"


def _star_poly(rng, cx, cy, r, n):
    import math
    pts = []
    for a in sorted(rng.uniform(0, 6.28318) for _ in range(n)):
        rr = r * rng.uniform(0.5, 1.0)
        pts.append((round(cx + rr * math.cos(a), 3),
                    round(cy + rr * math.sin(a), 3)))
    return pts + [pts[0]]


OPS = ["intersects", "within", "covered_by", "contains", "covers",
       "crosses", "overlaps"]


@pytest.fixture(scope="module")
def points(spark):
    rng = random.Random(99)
    rows = []
    for i in range(60):
        x = round(rng.uniform(-10, 10), 3)
        y = round(rng.uniform(-10, 10), 3)
        v = (f"{y},{x}" if rng.random() < 0.5 else f"POINT ({x} {y})")
        rows.append((f"d{i}", v, x, y))
    rows.append(("dnull", None, None, None))
    rows.append(("dbad", "not-a-geom", None, None))
    df = spark.createDataFrame([(u, v) for u, v, _, _ in rows],
                               "uid string, GEO string").cache()
    df.count()
    yield rows, df
    df.unpersist()


def test_point_data_vs_star_polygons(spark, points):
    rows, df = points
    rng = random.Random(7)
    mismatches = []
    for _ in range(6):
        qring = _star_poly(rng, rng.uniform(-8, 8), rng.uniform(-8, 8),
                           rng.uniform(1, 6), rng.randint(3, 7))
        wkt = wkt_poly(qring)
        for op in OPS:
            got = {r.uid for r in
                   compile_query(df, f"geowave:{op}(GEO, '{wkt}')")
                   .select("uid").collect()}
            want = {u for u, v, x, y in rows
                    if x is not None and ref_point_op(op, x, y, qring)}
            real = {u for u in want ^ got
                    if winding_inside(
                        next(r[2] for r in rows if r[0] == u),
                        next(r[3] for r in rows if r[0] == u),
                        qring) != "on"}
            if real:
                mismatches.append((op, wkt[:60], sorted(real)[:4]))
    assert not mismatches, mismatches[:4]


def test_convex_polygon_pairs(spark):
    rng = random.Random(42)
    prows = []
    for i in range(30):
        ring = convex_hull([(round(rng.uniform(-4, 4), 3),
                             round(rng.uniform(-4, 4), 3))
                            for _ in range(8)])
        if ring:
            cx, cy = rng.uniform(-6, 6), rng.uniform(-6, 6)
            ring = [(round(x + cx, 3), round(y + cy, 3)) for x, y in ring]
            prows.append((f"p{i}", wkt_poly(ring), ring))
    df = spark.createDataFrame([(u, w) for u, w, _ in prows],
                               "uid string, GEO string")
    mismatches = []
    for _ in range(4):
        qring = convex_hull([(round(rng.uniform(-6, 6), 3),
                              round(rng.uniform(-6, 6), 3))
                             for _ in range(8)])
        wkt = wkt_poly(qring)
        for op in ("intersects", "within", "covered_by",
                   "contains", "covers"):
            got = {r.uid for r in
                   compile_query(df, f"geowave:{op}(GEO, '{wkt}')")
                   .select("uid").collect()}
            want = set()
            for u, _, ring in prows:
                if op == "intersects":
                    ok = sat_intersect(ring, qring)
                elif op in ("within", "covered_by"):
                    ok = all_verts_in(ring, qring)
                else:
                    ok = all_verts_in(qring, ring)
                if ok:
                    want.add(u)
            if want != got:
                mismatches.append((op, sorted(want ^ got)[:4]))
    assert not mismatches, mismatches[:4]


def test_malformed_and_null_geometry_nonmatch(spark, points):
    """One bad stored geometry must be a non-match, never a scan abort."""
    _, df = points
    wkt = "POLYGON((-20 -20, 20 -20, 20 20, -20 20, -20 -20))"
    got = {r.uid for r in
           compile_query(df, f"geowave:intersects(GEO, '{wkt}')")
           .select("uid").collect()}
    assert "dbad" not in got and "dnull" not in got
    assert len(got) == 60              # every real point is inside
