"""``geo:`` and ``geowave:`` namespaces.

Reference: warehouse/query-core/src/main/java/datawave/query/jexl/
functions/GeoFunctions.java — ``within_bounding_box:69,102`` (point
field "lat,lon" or separate lon/lat field pair), ``within_circle:149``;
GeoWaveFunctions.java — JTS predicates (``intersects:269``,
``contains:137``, ``within:335``, ...) against WKT geometry.

Spark-first design: the ``geo:`` predicates are pure column arithmetic
(JVM-side, codegen).  The ``geowave:`` JTS predicates over WKT need a
geometry library; shapely is not in this image, so they are gated behind
an import-try — with the bounding-box prefilter (the reference's geohash
index acceleration, GeoWavePruningVisitor) always applied JVM-side so
the slow path only sees candidate rows.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from datawave_spark.compiler.columns import (
    CompileContext, field_pred, register_function,
)
from datawave_spark.functions.filter_functions import _ident, _lit


def _latlon(v: Column) -> tuple[Column, Column]:
    """Point value → (lat, lon) columns.  Two stored forms, per the
    reference's GeoType/PointType pair (MixedGeoAndGeoWaveTest queries
    geo: functions over BOTH through a query-model alias):

    - "lat,lon" / "lat_lon" / "lat|lon" — the GeoNormalizer-accepted
      GeoType string forms (y-first);
    - "POINT (x y)" WKT — PointType's raw form (x-first: lon lat).

    F.get + try_cast: one malformed stored point must be a NULL
    non-match (field_pred totalizes NULL → false), not an ANSI
    CAST_INVALID_INPUT / invalidArrayIndexError scan abort (r8)."""
    s = v.cast("string")
    is_pt = s.rlike(r"^\s*(?i)POINT\s*\(")
    nums = F.transform(
        F.regexp_extract_all(s, F.lit(r"(-?\d+\.?\d*(?:[eE]-?\d+)?)"),
                             F.lit(1)),
        lambda e: e.cast("double"))
    parts = F.split(s, "[,_|]")
    lat = F.when(is_pt, F.try_element_at(nums, F.lit(2))) \
        .otherwise(F.get(parts, 0).try_cast("double"))
    lon = F.when(is_pt, F.try_element_at(nums, F.lit(1))) \
        .otherwise(F.get(parts, 1).try_cast("double"))
    return lat, lon


def _latlon_lit(s: str) -> tuple[float, float]:
    """Query-literal point — same separators as _latlon."""
    import re
    lat_s, lon_s = re.split(r"[,_|]", str(s).strip(), maxsplit=1)
    return float(lat_s), float(lon_s)


def _lon_in(lon: Column, lon1: float, lon2: float) -> Column:
    """Longitude-in-range with the reference's antimeridian split
    (GeoFunctions.evaluate: minLon > maxLon means the box crosses the
    antimeridian and the bound becomes two ranges)."""
    if lon1 > lon2:
        return ((lon >= lon1) & (lon <= 180.0)) \
            | ((lon >= -180.0) & (lon <= lon2))
    return (lon >= lon1) & (lon <= lon2)


@register_function("geo", "within_bounding_box")
def g_within_bbox(ctx: CompileContext, args):
    """GeoFunctions.within_bounding_box:69 (point field) / :102
    (lon-field, lat-field pair).

    3-arg: (POINT_FIELD, 'minLat,minLon' lower-left, 'maxLat,maxLon'
    upper-right); 6-arg: (LON_FIELD, LAT_FIELD, minLon, minLat, maxLon,
    maxLat).
    """
    if len(args) == 3:
        fname = _ident(args[0])
        lat1, lon1 = _latlon_lit(str(_lit(args[1])))
        lat2, lon2 = _latlon_lit(str(_lit(args[2])))

        def leaf(v: Column) -> Column:
            lat, lon = _latlon(v)
            return (lat >= lat1) & (lat <= lat2) & _lon_in(lon, lon1, lon2)

        return field_pred(ctx, fname, leaf)
    lon_f, lat_f = _ident(args[0]), _ident(args[1])
    min_lon, min_lat = float(_lit(args[2])), float(_lit(args[3]))
    max_lon, max_lat = float(_lit(args[4])), float(_lit(args[5]))
    lon_ok = field_pred(ctx, lon_f,
                        lambda v: _lon_in(v.try_cast("double"),
                                          min_lon, max_lon))
    lat_ok = field_pred(ctx, lat_f,
                        lambda v: (v.try_cast("double") >= min_lat)
                        & (v.try_cast("double") <= max_lat))
    return lon_ok & lat_ok


@register_function("geo", "within_circle")
def g_within_circle(ctx: CompileContext, args):
    """GeoFunctions.within_circle:149 — (POINT_FIELD, 'lat,lon' center,
    radius in degrees, planar distance — parity with the reference's
    naive euclidean check)."""
    fname = _ident(args[0])
    clat, clon = _latlon_lit(str(_lit(args[1])))
    radius = float(_lit(args[2]))

    def leaf(v: Column) -> Column:
        lat, lon = _latlon(v)
        return ((lat - clat) ** 2 + (lon - clon) ** 2) <= radius ** 2

    return field_pred(ctx, fname, leaf)


def _geowave_predicate(op: str):
    def compiler(ctx: CompileContext, args):
        # Dependency-free path: POINT/POLYGON WKT against point fields
        # via ray casting (bbox prefilter JVM-side, pandas-UDF exact —
        # the GeoWaveFunctionsDescriptor coarse/exact split).  A shapely
        # deployment would swap in full JTS geometry support here.
        from datawave_spark.functions._geowave_purepy import compile_geowave
        return compile_geowave(ctx, op, args)
    return compiler


for _op in ("contains", "covers", "covered_by", "crosses", "intersects",
            "overlaps", "within"):
    # GeoWaveFunctions.java:137-335
    register_function("geowave", _op)(_geowave_predicate(_op))
