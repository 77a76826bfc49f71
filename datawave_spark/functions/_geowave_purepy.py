"""Pure-python geometry support for the geowave: namespace.

Reference: jexl/functions/GeoWaveFunctions.java evaluates JTS predicates
(intersects/contains/within/...) between a WKT query geometry and point
fields.  Shapely is not in this image; for the dominant case — POINT
data against POLYGON/BBOX query geometry — a dependency-free ray-cast
suffices and keeps the surface functional.  The evaluation path is a
vectorized pandas UDF over the point field, ALWAYS behind a JVM-side
bounding-box prefilter (GeoWavePruningVisitor's coarse/exact split), so
Python sees candidate rows only.

Supported geometries (query and data): ``POINT``, ``POLYGON`` (outer
ring; holes ignored), ``LINESTRING``, ``MULTIPOLYGON``, plus the
reference's bbox form via geo:within_bounding_box and "lat,lon" point
strings (GeoType form).  Single-ring POLYGON data rows evaluate on the
vectorized batch path (padded numpy edge tables, one pass per Arrow
batch); LINESTRING/MULTIPOLYGON/nested shapes take the per-row numpy
fallback.  A full-JTS deployment adds shapely via functions/geo.py's
gated path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

_WKT_POINT = re.compile(r"POINT\s*\(\s*([-\d.]+)\s+([-\d.]+)\s*\)", re.I)
_WKT_POLY = re.compile(r"POLYGON\s*\(\s*\(([^)]*)\)", re.I)
_WKT_LINE = re.compile(r"LINESTRING\s*\(([^()]*)\)", re.I)
_WKT_MPOLY = re.compile(r"MULTIPOLYGON\s*\((.*)\)\s*$", re.I | re.S)
_MPOLY_PART = re.compile(r"\(\s*\(([^()]*)\)")


def _coords(body: str) -> list[tuple[float, float]]:
    pts = []
    for pair in body.split(","):
        x, y = pair.split()
        pts.append((float(x), float(y)))
    return pts


def parse_wkt(wkt: str):
    """→ ('point', (x, y)) | ('polygon', ring) | ('linestring', pts) |
    ('multipolygon', [ring, ...]).  Rings are outer shells; interior
    holes are ignored (adequate for the prune-then-exact evaluation
    split — a hole can only turn a would-be hit into a miss, and the
    fixtures/tests use hole-free geometry; a full-JTS deployment swaps
    in shapely via functions/geo.py)."""
    s = wkt.strip()
    m = _WKT_POINT.match(s)
    if m:
        return "point", (float(m.group(1)), float(m.group(2)))
    m = _WKT_POLY.match(s)
    if m:
        return "polygon", _coords(m.group(1))
    m = _WKT_LINE.match(s)
    if m:
        return "linestring", _coords(m.group(1))
    m = _WKT_MPOLY.match(s)
    if m:
        rings = [_coords(p.group(1)) for p in _MPOLY_PART.finditer(m.group(1))]
        if rings:
            return "multipolygon", rings
    raise ValueError(
        f"unsupported WKT (POINT/POLYGON/LINESTRING/MULTIPOLYGON): {wkt[:60]}")


def _is_point_typed(ctx, fname: str) -> bool:
    """True when the metadata registry declares the field a POINT type
    (normalizer 'geo' — the GeoType z-order normalizer).  The reference
    distinguishes GeoType (lat,lon points) from GeometryType (arbitrary
    WKT) in GeoWaveFunctionsDescriptor; only point-typed fields may
    take the rectangle short-circuit, because a polygon-valued row can
    bbox-overlap a rectangle it does not truly intersect."""
    spec = getattr(ctx, "fields", {}).get(fname.upper())
    return spec is not None and getattr(spec, "normalizer", None) == "geo"


def _is_axis_rect(ring: list[tuple[float, float]]) -> bool:
    """True iff the ring is an axis-aligned rectangle (the dominant
    query shape — bbox queries stated as POLYGON WKT).  For such a
    query, point-in-polygon IS the bbox test, so point-typed rows can
    skip the exact pandas-UDF stage entirely (GeoWavePruningVisitor's
    envelope==geometry short-circuit)."""
    pts = set(ring)
    if len(pts) != 4:
        return False
    xs = {p[0] for p in pts}
    ys = {p[1] for p in pts}
    return len(xs) == 2 and len(ys) == 2 and \
        pts == {(x, y) for x in xs for y in ys}


def point_in_polygon(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    """Ray casting; boundary points count as inside (JTS 'covers'
    semantics — adequate for the intersects/contains point case)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        # on-edge check (collinear + within segment bbox)
        if (min(x1, x2) <= x <= max(x1, x2) and min(y1, y2) <= y <= max(y1, y2)
                and abs((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)) < 1e-12):
            return True
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return inside


def point_in_polygon_vec(x: np.ndarray, y: np.ndarray,
                         ring: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized ray cast: the whole Arrow batch against each ring
    edge with numpy array ops (the ring is small, the batch is big —
    loop over edges, never over points).  Bit-for-bit the same verdict
    as the scalar ``point_in_polygon``."""
    inside = np.zeros(x.shape, dtype=bool)
    on_edge = np.zeros(x.shape, dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        on_edge |= ((x >= min(x1, x2)) & (x <= max(x1, x2))
                    & (y >= min(y1, y2)) & (y <= max(y1, y2))
                    & (np.abs(cross) < 1e-12))
        crossing = (y1 > y) != (y2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        inside ^= crossing & (x < xin)
    return inside | on_edge


def _bbox(kind, geom):
    if kind == "point":
        x, y = geom
        return x, y, x, y
    xs = [p[0] for p in geom]
    ys = [p[1] for p in geom]
    return min(xs), min(ys), max(xs), max(ys)


# --------------------------------------------------------------- polygon data
# Polygon-vs-polygon predicates for WKT geometry FIELDS (GeometryType
# data, not just point data) — reference GeoWaveFunctions.java evaluates
# full JTS semantics; this is the dependency-free restatement for simple
# (single-ring, non-self-intersecting) polygons.  Tangent-only contact
# degenerate cases (collinear edge overlap with no vertex incidence)
# follow the vertex/edge tests below and are exercised in
# tests/test_geowave_polygon.py.

def _ring_arrays(ring):
    P = np.asarray(ring, dtype=float)
    if len(P) > 1 and np.allclose(P[0], P[-1]):
        P = P[:-1]                      # drop closing vertex
    return P, np.roll(P, -1, axis=0)


def _proper_crossings(ring_a, ring_b) -> bool:
    """True if any edge of A strictly crosses any edge of B (interiors
    intersect at a single point) — all edge pairs at once via numpy
    broadcasting; rings are small, so the (n·m) table is tiny."""
    a1, a2 = _ring_arrays(ring_a)
    b1, b2 = _ring_arrays(ring_b)

    def cross(o, p, q):
        return ((p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1])
                - (p[..., 1] - o[..., 1]) * (q[..., 0] - o[..., 0]))

    a1e, a2e = a1[:, None, :], a2[:, None, :]
    b1e, b2e = b1[None, :, :], b2[None, :, :]
    d1 = cross(a1e, a2e, b1e)
    d2 = cross(a1e, a2e, b2e)
    d3 = cross(b1e, b2e, a1e)
    d4 = cross(b1e, b2e, a2e)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def _verts_in(ring_pts, ring) -> np.ndarray:
    P, _ = _ring_arrays(ring_pts)
    return point_in_polygon_vec(P[:, 0], P[:, 1], ring)


def poly_intersects(ring_a, ring_b) -> bool:
    """A∩B ≠ ∅: a vertex of either inside the other, or a strict edge
    crossing (covers the no-vertex-inside 'X overlap' case)."""
    return (bool(_verts_in(ring_a, ring_b).any())
            or bool(_verts_in(ring_b, ring_a).any())
            or _proper_crossings(ring_a, ring_b))


def poly_covers(ring_a, ring_b) -> bool:
    """A covers B (JTS covers: every point of B in A incl. boundary):
    all B vertices inside-or-on A and no strict edge crossing."""
    return (bool(_verts_in(ring_b, ring_a).all())
            and not _proper_crossings(ring_a, ring_b))


def _segments_intersect(pts_a, closed_a, pts_b, closed_b) -> bool:
    """Any segment of chain A touches any segment of chain B (proper
    crossing, collinear overlap, or endpoint contact) — all pairs at
    once via numpy broadcasting."""
    a1, a2 = _chain_arrays(pts_a, closed_a)
    b1, b2 = _chain_arrays(pts_b, closed_b)

    def cross(o, p, q):
        return ((p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1])
                - (p[..., 1] - o[..., 1]) * (q[..., 0] - o[..., 0]))

    a1e, a2e = a1[:, None, :], a2[:, None, :]
    b1e, b2e = b1[None, :, :], b2[None, :, :]
    d1, d2 = cross(a1e, a2e, b1e), cross(a1e, a2e, b2e)
    d3, d4 = cross(b1e, b2e, a1e), cross(b1e, b2e, a2e)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    # touching / collinear: a zero cross with bbox overlap
    def on(o, p, q, d):
        return ((np.abs(d) < 1e-12)
                & (q[..., 0] >= np.minimum(o[..., 0], p[..., 0]) - 1e-12)
                & (q[..., 0] <= np.maximum(o[..., 0], p[..., 0]) + 1e-12)
                & (q[..., 1] >= np.minimum(o[..., 1], p[..., 1]) - 1e-12)
                & (q[..., 1] <= np.maximum(o[..., 1], p[..., 1]) + 1e-12))
    touch = (on(a1e, a2e, b1e, d1) | on(a1e, a2e, b2e, d2)
             | on(b1e, b2e, a1e, d3) | on(b1e, b2e, a2e, d4))
    return bool(np.any(proper | touch))


def _chain_arrays(pts, closed: bool):
    P = np.asarray(pts, dtype=float)
    if closed:
        if len(P) > 1 and np.allclose(P[0], P[-1]):
            P = P[:-1]
        return P, np.roll(P, -1, axis=0)
    return P[:-1], P[1:]


def _line_poly_predicate(op: str, line, ring) -> bool:
    """LINESTRING data vs POLYGON query (GeoWaveFunctions.java evaluates
    full JTS here; this covers the simple-chain/simple-ring case)."""
    L = np.asarray(line, dtype=float)
    v_in = point_in_polygon_vec(L[:, 0], L[:, 1], ring)
    touches = _segments_intersect(line, False, ring, True)
    if op == "intersects":
        return bool(v_in.any()) or touches
    if op in ("within", "covered_by"):
        return bool(v_in.all()) and not _proper_crossings_chain(line, False,
                                                               ring, True)
    if op == "crosses":
        # JTS line/area crosses: the line has points in the interior
        # AND points in the exterior of the polygon — a vertex on each
        # side, or a proper boundary crossing (which implies both).
        proper = _proper_crossings_chain(line, False, ring, True)
        return proper or (bool(v_in.any()) and not bool(v_in.all()))
    return False                            # contains/covers/overlaps


def _proper_crossings_chain(pts_a, closed_a, pts_b, closed_b) -> bool:
    a1, a2 = _chain_arrays(pts_a, closed_a)
    b1, b2 = _chain_arrays(pts_b, closed_b)

    def cross(o, p, q):
        return ((p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1])
                - (p[..., 1] - o[..., 1]) * (q[..., 0] - o[..., 0]))

    a1e, a2e = a1[:, None, :], a2[:, None, :]
    b1e, b2e = b1[None, :, :], b2[None, :, :]
    d1, d2 = cross(a1e, a2e, b1e), cross(a1e, a2e, b2e)
    d3, d4 = cross(b1e, b2e, a1e), cross(b1e, b2e, a2e)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def geometry_predicate(op: str, dk: str, dg, qk: str, qg) -> bool:
    """Evaluate ``geowave:<op>`` between a data geometry (dk, dg) and
    the query geometry (qk, qg); kinds are 'point' | 'polygon' |
    'linestring' | 'multipolygon'."""
    # multipolygon operands: decompose into parts (covers/within require
    # a single part to cover — adequate for disjoint shells, which is
    # what valid MULTIPOLYGONs are)
    if dk == "multipolygon":
        return any(geometry_predicate(op, "polygon", r, qk, qg) for r in dg)
    if qk == "multipolygon":
        return any(geometry_predicate(op, dk, dg, "polygon", r) for r in qg)
    if dk == "linestring" and qk == "polygon":
        return _line_poly_predicate(op, dg, qg)
    if dk == "polygon" and qk == "linestring":
        swap = {"within": "contains", "covered_by": "covers",
                "contains": "within", "covers": "covered_by"}.get(op, op)
        if swap == "crosses":
            return _line_poly_predicate("crosses", qg, dg)
        return _line_poly_predicate(swap, qg, dg)
    if dk == "linestring" and qk == "linestring":
        if op == "intersects":
            return _segments_intersect(dg, False, qg, False)
        if op == "crosses":
            return _proper_crossings_chain(dg, False, qg, False)
        return False
    if dk == "linestring" and qk == "point":
        return op in ("intersects", "contains", "covers") \
            and _point_on_chain(qg, dg)
    if dk == "point" and qk == "linestring":
        return op in ("intersects", "within", "covered_by") \
            and _point_on_chain(dg, qg)
    if op == "crosses":
        # point/point, point/polygon and polygon/polygon never 'cross'
        # in JTS (crosses needs an intersection of lower dimension than
        # both operands — only line operands can).
        return False
    if dk == "point" and qk == "point":
        eq = abs(dg[0] - qg[0]) < 1e-9 and abs(dg[1] - qg[1]) < 1e-9
        return eq if op != "overlaps" else False
    if dk == "point":                       # point data vs polygon query
        inside = point_in_polygon(dg[0], dg[1], qg)
        if op in ("intersects", "within", "covered_by"):
            return inside
        return False                        # contains/covers/overlaps
    if qk == "point":                       # polygon data vs point query
        inside = point_in_polygon(qg[0], qg[1], dg)
        if op in ("intersects", "contains", "covers"):
            return inside
        return False                        # within/covered_by/overlaps
    if op == "intersects":
        return poly_intersects(dg, qg)
    if op in ("contains", "covers"):
        return poly_covers(dg, qg)
    if op in ("within", "covered_by"):
        return poly_covers(qg, dg)
    if op == "overlaps":
        return (poly_intersects(dg, qg) and not poly_covers(dg, qg)
                and not poly_covers(qg, dg))
    raise ValueError(f"geowave:{op} unsupported")


def _point_on_chain(pt, chain) -> bool:
    x, y = pt
    C = np.asarray(chain, dtype=float)
    for (x1, y1), (x2, y2) in zip(C[:-1], C[1:]):
        if (min(x1, x2) - 1e-12 <= x <= max(x1, x2) + 1e-12
                and min(y1, y2) - 1e-12 <= y <= max(y1, y2) + 1e-12
                and abs((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)) < 1e-12):
            return True
    return False


def polygon_rows_predicate(coord_lists: pd.Series, op: str,
                           qring) -> np.ndarray:
    """Vectorized geowave predicate for a BATCH of single-ring POLYGON
    rows against one query ring.  ``coord_lists`` holds each row's flat
    [x0, y0, x1, y1, ...] coordinate list (extracted JVM-side by
    ``regexp_extract_all`` — no Python regex); the batch is packed into
    padded numpy vertex tables and vertex-in / edge-crossing tests
    broadcast over (rows × edges).  Bit-for-bit the same verdict as the
    scalar ``geometry_predicate('polygon', ...)`` path."""
    n = len(coord_lists)
    arrs = [np.asarray(v, dtype=float) if v is not None
            else np.zeros(0) for v in coord_lists]
    lens = np.array([len(a) // 2 for a in arrs], dtype=int)
    flat = np.concatenate(arrs) if arrs else np.zeros(0)
    counts = np.array([len(a) for a in arrs], dtype=int)
    offs = np.concatenate([[0], np.cumsum(counts)])
    row_of = np.repeat(np.arange(n), counts)
    idx_in_row = np.arange(len(flat)) - np.repeat(offs[:-1], counts)
    V = max(int(lens.max()) if n else 1, 1)
    X = np.zeros((n, V))
    Y = np.zeros((n, V))
    even = idx_in_row % 2 == 0
    X[row_of[even], idx_in_row[even] // 2] = flat[even]
    Y[row_of[~even], idx_in_row[~even] // 2] = flat[~even]
    cnt = np.maximum(lens, 1)
    rows = np.arange(n)[:, None]
    last = cnt - 1
    closing = (cnt > 1) & (X[np.arange(n), last] == X[:, 0]) \
        & (Y[np.arange(n), last] == Y[:, 0])
    cnt = np.where(closing, cnt - 1, cnt)
    # pad the tail with each row's last vertex (degenerate edges are
    # inert in every test below), then edge successor with ring wrap
    ar = np.arange(V)[None, :]
    gather = np.minimum(ar, (cnt - 1)[:, None])
    X = X[rows, gather]
    Y = Y[rows, gather]
    nxt = np.where(ar + 1 < cnt[:, None], ar + 1,
                   np.where(ar < cnt[:, None], 0, ar))
    X2 = X[rows, nxt]
    Y2 = Y[rows, nxt]

    # 1. data vertices vs the query ring (on-boundary counts as inside)
    din = point_in_polygon_vec(X, Y, qring)
    any_dvert_in, all_dvert_in = din.any(axis=1), din.all(axis=1)

    # 2. query vertices vs each data ring
    Q, _ = _ring_arrays(qring)
    q_in = np.zeros((n, len(Q)), dtype=bool)
    for qi, (qx, qy) in enumerate(Q):
        crossing = (Y > qy) != (Y2 > qy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = (X2 - X) * (qy - Y) / (Y2 - Y) + X
        inside = ((crossing & (qx < xin)).sum(axis=1) % 2).astype(bool)
        crs = (X2 - X) * (qy - Y) - (Y2 - Y) * (qx - X)
        on = ((np.abs(crs) < 1e-12)
              & (qx >= np.minimum(X, X2)) & (qx <= np.maximum(X, X2))
              & (qy >= np.minimum(Y, Y2)) & (qy <= np.maximum(Y, Y2))) \
            .any(axis=1)
        q_in[:, qi] = inside | on
    any_qvert_in, all_qvert_in = q_in.any(axis=1), q_in.all(axis=1)

    # 3. strict edge crossings: data edges (n,V) × query edges (M)
    B1, B2 = _ring_arrays(qring)
    b1x, b1y = B1[:, 0][None, None, :], B1[:, 1][None, None, :]
    b2x, b2y = B2[:, 0][None, None, :], B2[:, 1][None, None, :]
    ax1, ay1 = X[..., None], Y[..., None]
    ax2, ay2 = X2[..., None], Y2[..., None]
    d1 = (ax2 - ax1) * (b1y - ay1) - (ay2 - ay1) * (b1x - ax1)
    d2 = (ax2 - ax1) * (b2y - ay1) - (ay2 - ay1) * (b2x - ax1)
    d3 = (b2x - b1x) * (ay1 - b1y) - (b2y - b1y) * (ax1 - b1x)
    d4 = (b2x - b1x) * (ay2 - b1y) - (b2y - b1y) * (ax2 - b1x)
    proper = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=(1, 2))

    intersects = any_dvert_in | any_qvert_in | proper
    if op == "intersects":
        return intersects
    if op in ("contains", "covers"):        # data covers query
        return all_qvert_in & ~proper
    if op in ("within", "covered_by"):      # query covers data
        return all_dvert_in & ~proper
    if op == "overlaps":
        return (intersects & ~(all_qvert_in & ~proper)
                & ~(all_dvert_in & ~proper))
    return np.zeros(n, dtype=bool)          # crosses: never for areas


def line_rows_predicate(coord_lists: pd.Series, op: str,
                        qring) -> np.ndarray:
    """Vectorized geowave predicate for a BATCH of LINESTRING rows
    against one query ring (the chain counterpart of
    ``polygon_rows_predicate`` — padded vertex tables, vertex-in and
    edge-crossing tests broadcast over (rows × edges)).  Bit-for-bit
    the same verdicts as the scalar ``_line_poly_predicate`` for
    intersects / within / covered_by / crosses; other ops are False for
    line-vs-area in JTS."""
    n = len(coord_lists)
    arrs = [np.asarray(v, dtype=float) if v is not None
            else np.zeros(0) for v in coord_lists]
    lens = np.array([len(a) // 2 for a in arrs], dtype=int)
    flat = np.concatenate(arrs) if arrs else np.zeros(0)
    counts = np.array([len(a) for a in arrs], dtype=int)
    offs = np.concatenate([[0], np.cumsum(counts)])
    row_of = np.repeat(np.arange(n), counts)
    idx_in_row = np.arange(len(flat)) - np.repeat(offs[:-1], counts)
    V = max(int(lens.max()) if n else 1, 2)
    X = np.zeros((n, V))
    Y = np.zeros((n, V))
    even = idx_in_row % 2 == 0
    X[row_of[even], idx_in_row[even] // 2] = flat[even]
    Y[row_of[~even], idx_in_row[~even] // 2] = flat[~even]
    cnt = np.maximum(lens, 1)
    rows = np.arange(n)[:, None]
    ar = np.arange(V)[None, :]
    # pad the tail with each row's LAST vertex: padded duplicates are
    # degenerate (zero-length) edges — inert in the crossing tests, and
    # a contact at the duplicated point is a REAL chain contact
    gather = np.minimum(ar, (cnt - 1)[:, None])
    X = X[rows, gather]
    Y = Y[rows, gather]
    mask = ar < cnt[:, None]

    # rows with NO coordinates (None / empty chain) must be False for
    # every op — the padded (0,0) vertex is a placeholder, not geometry
    nonempty = lens > 0

    vin = point_in_polygon_vec(X, Y, qring)
    any_in = (vin & mask).any(axis=1) & nonempty
    all_in = (vin | ~mask).all(axis=1) & nonempty

    # chain edges (V-1 per row) × ring edges
    B1, B2 = _ring_arrays(qring)
    ax1, ay1 = X[:, :-1, None], Y[:, :-1, None]
    ax2, ay2 = X[:, 1:, None], Y[:, 1:, None]
    b1x, b1y = B1[:, 0][None, None, :], B1[:, 1][None, None, :]
    b2x, b2y = B2[:, 0][None, None, :], B2[:, 1][None, None, :]
    d1 = (ax2 - ax1) * (b1y - ay1) - (ay2 - ay1) * (b1x - ax1)
    d2 = (ax2 - ax1) * (b2y - ay1) - (ay2 - ay1) * (b2x - ax1)
    d3 = (b2x - b1x) * (ay1 - b1y) - (b2y - b1y) * (ax1 - b1x)
    d4 = (b2x - b1x) * (ay2 - b1y) - (b2y - b1y) * (ax2 - b1x)
    proper = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=(1, 2))

    if op == "crosses":
        return proper | (any_in & ~all_in)
    if op in ("within", "covered_by"):
        return all_in & ~proper
    if op == "intersects":
        def on(ox, oy, px, py, qx, qy, d):
            return ((np.abs(d) < 1e-12)
                    & (qx >= np.minimum(ox, px) - 1e-12)
                    & (qx <= np.maximum(ox, px) + 1e-12)
                    & (qy >= np.minimum(oy, py) - 1e-12)
                    & (qy <= np.maximum(oy, py) + 1e-12))
        touch = (on(ax1, ay1, ax2, ay2, b1x, b1y, d1)
                 | on(ax1, ay1, ax2, ay2, b2x, b2y, d2)
                 | on(b1x, b1y, b2x, b2y, ax1, ay1, d3)
                 | on(b1x, b1y, b2x, b2y, ax2, ay2, d4)).any(axis=(1, 2))
        return (any_in | proper | touch) & nonempty
    return np.zeros(n, dtype=bool)      # contains/covers/overlaps


def compile_geowave(ctx, op: str, args):
    """Compile ``geowave:<op>(FIELD, 'WKT')``.

    Data forms supported per row: "lat,lon" point strings (GeoType form)
    and WKT ``POINT``/``POLYGON``/``LINESTRING``/``MULTIPOLYGON``
    strings (GeometryType form — GeoWaveFunctions.java:137-335).  WKT
    coordinates are (lon lat) = (x y) per WKT convention; "lat,lon"
    strings are y-first.  Evaluation is split coarse→exact like the
    reference's GeoWavePruningVisitor: a JVM-side bounding-box test over
    codegen'd expressions prunes the scan, and the exact geometry
    pandas UDF sees candidate rows only ("lat,lon" point rows and
    single-ring polygon rows both vectorized across the whole Arrow
    batch; other WKT shapes per-row numpy)."""
    from datawave_spark.compiler.columns import field_pred
    from datawave_spark.functions.filter_functions import _ident, _lit

    fname = _ident(args[0])
    wkt = str(_lit(args[1]))
    qk, qg = parse_wkt(wkt)
    q_minx, q_miny, q_maxx, q_maxy = _bbox(qk, qg)

    @pandas_udf("boolean")
    def exact(vals: pd.Series) -> pd.Series:
        """Exact geometry verdict from the raw value string — the ONE
        UDF argument (r11, guide §4.1/§4.2).  Number extraction and the
        coarse bbox test moved INTO the batch (numpy over the whole
        Arrow batch): the previous 4-argument form made the JVM
        evaluate the interpreted regexp/higher-order-function subtree
        once per argument (EvalPython's argument projection does no
        subexpression elimination — measured ~2.2 s of the 3.5 s key
        cost), and shipped coordinates for every row.  The extraction
        regexes mirror the JVM ones with engine-identical classes
        ([0-9], the Java \\s set) so the verdicts are bit-identical."""
        n = len(vals)
        out = np.zeros(n, dtype=bool)
        notnull = vals.notna().to_numpy(dtype=bool)
        s = vals.fillna("")
        # JVM rlike '^\\s*(?i)(POINT|...)': Java \s is [ \t\n\x0B\f\r],
        # and Java (?i) folds ASCII only — re.ASCII pins Python's
        # IGNORECASE to the same ASCII-only folding (plain case=False
        # would Unicode-fold, e.g. the Kelvin sign U+212A matches 'k')
        wk = (s.str.match(
            r"[ \t\n\x0B\f\r]*(?:POINT|POLYGON|LINESTRING|MULTIPOLYGON)",
            flags=re.IGNORECASE | re.ASCII).to_numpy(dtype=bool) & notnull)
        # JVM regexp_extract_all '(-?\d+\.?\d*)': Java \d is [0-9]
        arrs = [np.asarray(v, dtype=float)
                for v in s.str.findall(r"-?[0-9]+\.?[0-9]*")]
        nums = pd.Series(arrs)
        # per-row data bbox: WKT alternates x y; "lat,lon" is y-first
        # (exactly the JVM leaf's xs/ys selection — a row whose
        # min/max would have been NULL there has a NaN bbox here, and
        # NaN comparisons are False = excluded, the same totalization)
        bbox = np.full((n, 4), np.nan)       # minx, maxx, miny, maxy
        for i in range(n):
            a = arrs[i]
            if not notnull[i] or a.size == 0:
                continue
            if wk[i]:
                xs, ys = a[0::2], a[1::2]
                if xs.size and ys.size:
                    bbox[i] = (xs.min(), xs.max(), ys.min(), ys.max())
            elif a.size >= 2:
                bbox[i] = (a[1], a[1], a[0], a[0])
        if op in ("contains", "covers"):
            cand = (bbox[:, 0] <= q_minx) & (bbox[:, 1] >= q_maxx) \
                & (bbox[:, 2] <= q_miny) & (bbox[:, 3] >= q_maxy)
        elif op in ("within", "covered_by"):
            cand = (bbox[:, 0] >= q_minx) & (bbox[:, 1] <= q_maxx) \
                & (bbox[:, 2] >= q_miny) & (bbox[:, 3] <= q_maxy)
        else:                               # intersects / overlaps / crosses
            cand = (bbox[:, 0] <= q_maxx) & (bbox[:, 1] >= q_minx) \
                & (bbox[:, 2] <= q_maxy) & (bbox[:, 3] >= q_miny)
        # vectorized "lat,lon" candidates: nums = [lat, lon]
        pidx = np.flatnonzero(cand & ~wk)
        if len(pidx):
            pl = nums.iloc[pidx]
            lat = np.array([v[0] if v is not None and len(v) > 0 else np.nan
                            for v in pl], dtype=float)
            lon = np.array([v[1] if v is not None and len(v) > 1 else np.nan
                            for v in pl], dtype=float)
            valid = ~(np.isnan(lat) | np.isnan(lon))
            if qk == "point":
                res = valid & (np.abs(lon - qg[0]) < 1e-9) \
                    & (np.abs(lat - qg[1]) < 1e-9)
                if op not in ("intersects", "within", "covered_by",
                              "contains", "covers"):
                    res &= False
            elif qk == "polygon" and op in ("intersects", "within",
                                            "covered_by"):
                res = valid & point_in_polygon_vec(lon, lat, qg)
            elif qk == "linestring" and op in ("intersects", "within",
                                               "covered_by"):
                res = np.array([bool(v) and _point_on_chain((x, y), qg)
                                for v, x, y in zip(valid, lon, lat)])
            else:
                res = np.zeros(lat.shape, dtype=bool)
            out[pidx] = res
        # WKT candidates (bbox-pruned above, in this batch)
        widx = np.flatnonzero(cand & wk)
        if len(widx):
            wv = vals.iloc[widx].astype(str)
            # vectorized fast path: single-ring POLYGON rows vs a
            # polygon query — the whole candidate set in one padded
            # numpy edge-table pass over the batch-extracted coordinates
            # (re.ASCII: same ASCII-only fold + \s set as the JVM)
            spoly = (wv.str.match(r"\s*POLYGON",
                                  flags=re.IGNORECASE | re.ASCII)
                     & ~wv.str.contains(r"\)\s*,\s*\(", regex=True)
                     ).to_numpy()
            sline = wv.str.match(r"\s*LINESTRING",
                                 flags=re.IGNORECASE | re.ASCII).to_numpy()
            handled = np.zeros(len(wv), dtype=bool)
            if qk == "polygon" and spoly.any():
                out[widx[spoly]] = polygon_rows_predicate(
                    nums.iloc[widx[spoly]], op, qg)
                handled |= spoly
            if qk == "polygon" and sline.any():
                # vectorized chain path (r9 — the crosses gate key's
                # 600k candidate rows were per-row numpy before)
                out[widx[sline]] = line_rows_predicate(
                    nums.iloc[widx[sline]], op, qg)
                handled |= sline
            fallback = np.flatnonzero(~handled) if qk == "polygon" \
                else np.arange(len(wv))
            for j in fallback:
                try:
                    dk, dg = parse_wkt(wv.iloc[j])
                except ValueError:
                    continue
                out[widx[j]] = geometry_predicate(op, dk, dg, qk, qg)
        return pd.Series(out)

    # The verdict is deterministic, but the flag stops the optimizer
    # pushing the UDF-bearing filter through a repartition (guide §4.4
    # family): without it, a spread() on the input is hoisted ABOVE the
    # filter and the whole Arrow/Python pass collapses back onto the
    # single scan task it was meant to parallelize (r11 measured: plan
    # showed Exchange above Filter(ArrowEvalPython), 1.2 s single-core).
    exact = exact.asNondeterministic()

    def leaf(v: Column) -> Column:
        vs = v.cast("string")
        # Rectangle short-circuit for POINT-TYPED fields: when the
        # query polygon is an axis-aligned rectangle AND the field is
        # declared a point type in the metadata registry (GeoType, as
        # opposed to GeometryType — the reference draws exactly this
        # distinction in GeoWaveFunctionsDescriptor), the bbox test IS
        # the exact test, so the predicate is pure JVM — no pandas UDF,
        # no Arrow transfer, no Python workers.
        if (qk == "polygon" and _is_axis_rect(qg)
                and op in ("intersects", "within", "covered_by")
                and _is_point_typed(ctx, fname)):
            is_wkt = vs.rlike(
                r"^\s*(?i)(POINT|POLYGON|LINESTRING|MULTIPOLYGON)")
            nums = F.transform(
                F.regexp_extract_all(vs, F.lit(r"(-?\d+\.?\d*)"),
                                     F.lit(1)),
                lambda e: e.cast("double"))

            def bbox_pred(nm: Column) -> Column:
                # evaluated over a BOUND copy of ``nums`` (1-element
                # array transform = a let-binding): the regexp
                # extraction runs once per row instead of once per
                # min/max reference — NULL propagation is unchanged
                xs = F.when(is_wkt,
                            F.filter(nm, lambda e, i: i % 2 == F.lit(0))) \
                    .otherwise(F.slice(nm, 2, 1))
                ys = F.when(is_wkt,
                            F.filter(nm, lambda e, i: i % 2 == F.lit(1))) \
                    .otherwise(F.slice(nm, 1, 1))
                return (F.array_min(xs) >= q_minx) \
                    & (F.array_max(xs) <= q_maxx) \
                    & (F.array_min(ys) >= q_miny) \
                    & (F.array_max(ys) <= q_maxy) \
                    if op in ("within", "covered_by") else \
                    (F.array_min(xs) <= q_maxx) \
                    & (F.array_max(xs) >= q_minx) \
                    & (F.array_min(ys) <= q_maxy) \
                    & (F.array_max(ys) >= q_miny)

            return F.get(F.transform(F.array(nums), bbox_pred), 0)
        # General path: ONE string argument; extraction + coarse bbox
        # prune + exact geometry all happen batch-vectorized in Python
        # (see ``exact`` — the multi-argument form paid the interpreted
        # JVM expression tree once PER ARGUMENT).
        return exact(vs)

    return field_pred(ctx, fname, leaf)
