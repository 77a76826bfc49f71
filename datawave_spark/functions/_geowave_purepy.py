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


def compile_geowave(ctx, op: str, args):
    """Compile ``geowave:<op>(FIELD, 'WKT')`` for point fields.  The
    point field holds "lat,lon" (GeoType string form); WKT coordinates
    are (lon lat) per WKT convention."""
    from datawave_spark.compiler.columns import field_pred
    from datawave_spark.functions.filter_functions import _ident, _lit

    fname = _ident(args[0])
    wkt = str(_lit(args[1]))
    kind, geom = parse_wkt(wkt)
    if op in ("contains", "covers") and kind != "point":
        # point data can only contain/cover a point geometry
        pass
    min_x, min_y, max_x, max_y = _bbox(kind, geom)

    @pandas_udf("boolean")
    def exact(points: pd.Series) -> pd.Series:
        # whole-batch numpy: split once, coerce once, one vectorized
        # geometry test — no per-row Python loop.
        parts = points.astype(str).str.split(",", n=1, expand=True)
        lat = pd.to_numeric(parts[0], errors="coerce").to_numpy(dtype=float)
        if parts.shape[1] > 1:
            lon = pd.to_numeric(parts[1], errors="coerce").to_numpy(dtype=float)
        else:
            lon = np.full(lat.shape, np.nan)
        valid = ~(np.isnan(lat) | np.isnan(lon))
        if kind == "point":
            res = valid & (np.abs(lon - geom[0]) < 1e-9) \
                & (np.abs(lat - geom[1]) < 1e-9)
        else:
            res = valid & point_in_polygon_vec(lon, lat, geom)
        return pd.Series(res)

    def leaf(v: Column) -> Column:
        parts = F.split(v.cast("string"), ",")
        lat = parts[0].cast("double")
        lon = parts[1].cast("double")
        # JVM-side bbox prefilter (GeoWavePruningVisitor's coarse cut);
        # the pandas UDF sees candidates only.
        coarse = (lon >= min_x) & (lon <= max_x) & (lat >= min_y) & (lat <= max_y)
        if op in ("intersects", "within", "covered_by", "contains",
                  "covers", "overlaps"):
            return coarse & exact(v.cast("string"))
        if op == "crosses":
            # a point cannot cross anything (JTS: always false for dim-0)
            return F.lit(False)
        raise ValueError(f"geowave:{op} unsupported for point data")

    return field_pred(ctx, fname, leaf)
