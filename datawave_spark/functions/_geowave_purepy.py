"""Pure-python geometry support for the geowave: namespace.

Reference: jexl/functions/GeoWaveFunctions.java evaluates JTS predicates
(intersects/contains/within/...) between a WKT query geometry and point
fields.  Shapely is not in this image; for the dominant case — POINT
data against POLYGON/BBOX query geometry — a dependency-free ray-cast
suffices and keeps the surface functional.  The evaluation path is a
vectorized pandas UDF over the point field, ALWAYS behind a JVM-side
bounding-box prefilter (GeoWavePruningVisitor's coarse/exact split), so
Python sees candidate rows only.

Supported query geometries: ``POINT(x y)``, ``POLYGON((x y, ...))``
(single ring), and the reference's bbox form via geo:within_bounding_box.
Supported data: point fields ("lat,lon" strings).  Anything else raises
— a real deployment adds shapely and uses functions/geo.py's gated path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

_WKT_POINT = re.compile(r"POINT\s*\(\s*([-\d.]+)\s+([-\d.]+)\s*\)", re.I)
_WKT_POLY = re.compile(r"POLYGON\s*\(\s*\(([^)]*)\)\s*\)", re.I)


def parse_wkt(wkt: str):
    """→ ('point', (x, y)) or ('polygon', [(x, y), ...])."""
    m = _WKT_POINT.match(wkt.strip())
    if m:
        return "point", (float(m.group(1)), float(m.group(2)))
    m = _WKT_POLY.match(wkt.strip())
    if m:
        pts = []
        for pair in m.group(1).split(","):
            x, y = pair.split()
            pts.append((float(x), float(y)))
        return "polygon", pts
    raise ValueError(f"unsupported WKT (POINT/POLYGON only): {wkt[:60]}")


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


def geometry_predicate(op: str, dk: str, dg, qk: str, qg) -> bool:
    """Evaluate ``geowave:<op>`` between a data geometry (dk, dg) and
    the query geometry (qk, qg); kinds are 'point' | 'polygon'."""
    if op == "crosses":
        # point/point, point/polygon and polygon/polygon never 'cross'
        # in JTS (crosses needs an intersection of lower dimension than
        # both operands — only line operands can, and WKT LINESTRING
        # data is out of scope here).
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


def compile_geowave(ctx, op: str, args):
    """Compile ``geowave:<op>(FIELD, 'WKT')``.

    Data forms supported per row: "lat,lon" point strings (GeoType form)
    and WKT ``POINT``/``POLYGON`` strings (GeometryType form).  WKT
    coordinates are (lon lat) = (x y) per WKT convention; "lat,lon"
    strings are y-first.  Evaluation is split coarse→exact like the
    reference's GeoWavePruningVisitor: a JVM-side bounding-box test over
    codegen'd expressions prunes the scan, and the exact geometry
    pandas UDF sees candidate rows only (point rows vectorized across
    the whole Arrow batch; polygon rows — already candidate-only —
    evaluated per row with numpy edge tables)."""
    from datawave_spark.compiler.columns import field_pred
    from datawave_spark.functions.filter_functions import _ident, _lit

    fname = _ident(args[0])
    wkt = str(_lit(args[1]))
    qk, qg = parse_wkt(wkt)
    q_minx, q_miny, q_maxx, q_maxy = _bbox(qk, qg)

    @pandas_udf("boolean")
    def exact(vals: pd.Series) -> pd.Series:
        sv = vals.astype(str)
        is_wkt = sv.str.match(r"\s*(POINT|POLYGON)", case=False)
        out = np.zeros(len(sv), dtype=bool)
        # vectorized fast path: all "lat,lon" point rows at once
        pts = sv[~is_wkt]
        if len(pts):
            parts = pts.str.split(",", n=1, expand=True)
            lat = pd.to_numeric(parts[0], errors="coerce").to_numpy(dtype=float)
            if parts.shape[1] > 1:
                lon = pd.to_numeric(parts[1], errors="coerce").to_numpy(dtype=float)
            else:
                lon = np.full(lat.shape, np.nan)
            valid = ~(np.isnan(lat) | np.isnan(lon))
            if qk == "point":
                res = valid & (np.abs(lon - qg[0]) < 1e-9) \
                    & (np.abs(lat - qg[1]) < 1e-9)
                if op not in ("intersects", "within", "covered_by",
                              "contains", "covers"):
                    res &= False
            elif op in ("intersects", "within", "covered_by"):
                res = valid & point_in_polygon_vec(lon, lat, qg)
            else:
                res = np.zeros(lat.shape, dtype=bool)
            out[(~is_wkt).to_numpy()] = res
        # WKT rows: Spark's AND does not short-circuit into the UDF, so
        # re-apply the bbox prune HERE, vectorized (one C-regex extract
        # + a groupby min/max), and run the per-row geometry loop on
        # bbox-passing candidates only.
        wkt_idx = np.flatnonzero(is_wkt.to_numpy())
        if len(wkt_idx):
            wv = sv.iloc[wkt_idx]
            nums = wv.str.extractall(r"(-?\d+\.?\d*)")[0].astype(float)
            xs = nums[nums.index.get_level_values(1) % 2 == 0].groupby(level=0)
            ys = nums[nums.index.get_level_values(1) % 2 == 1].groupby(level=0)
            bb = pd.DataFrame({"minx": xs.min(), "maxx": xs.max(),
                               "miny": ys.min(), "maxy": ys.max()}) \
                .reindex(wv.index)
            if op in ("contains", "covers"):
                cand = (bb.minx <= q_minx) & (bb.maxx >= q_maxx) \
                    & (bb.miny <= q_miny) & (bb.maxy >= q_maxy)
            elif op in ("within", "covered_by"):
                cand = (bb.minx >= q_minx) & (bb.maxx <= q_maxx) \
                    & (bb.miny >= q_miny) & (bb.maxy <= q_maxy)
            else:
                cand = (bb.minx <= q_maxx) & (bb.maxx >= q_minx) \
                    & (bb.miny <= q_maxy) & (bb.maxy >= q_miny)
            cand = cand.fillna(False).to_numpy()
            for j in np.flatnonzero(cand):
                try:
                    dk, dg = parse_wkt(wv.iloc[j])
                except ValueError:
                    continue
                out[wkt_idx[j]] = geometry_predicate(op, dk, dg, qk, qg)
        return pd.Series(out)

    def leaf(v: Column) -> Column:
        if op == "crosses":
            # no supported operand pair can 'cross' (see
            # geometry_predicate); constant-fold to false.
            return F.lit(False)
        vs = v.cast("string")
        is_wkt = vs.rlike(r"^\s*(?i)(POINT|POLYGON)")
        # data bbox, JVM-side for both forms: "lat,lon" is y-first; WKT
        # alternates x y, so even-index numbers are x, odd are y.
        parts = F.split(vs, ",")
        nums = F.regexp_extract_all(vs, F.lit(r"(-?\d+\.?\d*)"), F.lit(1))
        xs = F.transform(F.filter(nums, lambda e, i: i % 2 == F.lit(0)),
                         lambda e: e.cast("double"))
        ys = F.transform(F.filter(nums, lambda e, i: i % 2 == F.lit(1)),
                         lambda e: e.cast("double"))
        d_minx = F.when(is_wkt, F.array_min(xs)).otherwise(parts[1].cast("double"))
        d_maxx = F.when(is_wkt, F.array_max(xs)).otherwise(parts[1].cast("double"))
        d_miny = F.when(is_wkt, F.array_min(ys)).otherwise(parts[0].cast("double"))
        d_maxy = F.when(is_wkt, F.array_max(ys)).otherwise(parts[0].cast("double"))
        if op in ("contains", "covers"):
            # data must at least bbox-contain the query geometry
            coarse = (d_minx <= q_minx) & (d_maxx >= q_maxx) \
                & (d_miny <= q_miny) & (d_maxy >= q_maxy)
        elif op in ("within", "covered_by"):
            coarse = (d_minx >= q_minx) & (d_maxx <= q_maxx) \
                & (d_miny >= q_miny) & (d_maxy <= q_maxy)
        else:                               # intersects / overlaps
            coarse = (d_minx <= q_maxx) & (d_maxx >= q_minx) \
                & (d_miny <= q_maxy) & (d_maxy >= q_miny)
        return coarse & exact(vs)

    return field_pred(ctx, fname, leaf)
