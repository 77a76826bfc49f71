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
        out = []
        for p in points:
            try:
                lat_s, lon_s = str(p).split(",")
                lon, lat = float(lon_s), float(lat_s)
            except (ValueError, AttributeError):
                out.append(False)
                continue
            if kind == "point":
                out.append(abs(lon - geom[0]) < 1e-9 and abs(lat - geom[1]) < 1e-9)
            else:
                out.append(point_in_polygon(lon, lat, geom))
        return pd.Series(out)

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
