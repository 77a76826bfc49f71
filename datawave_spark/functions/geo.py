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
    """Split a "lat,lon" point value (GeoType string form).
    F.get + try_cast: one malformed stored point must be a NULL
    non-match (field_pred totalizes NULL → false), not an ANSI
    CAST_INVALID_INPUT / invalidArrayIndexError scan abort (r8)."""
    parts = F.split(v.cast("string"), ",")
    return (F.get(parts, 0).try_cast("double"),
            F.get(parts, 1).try_cast("double"))


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
        lat1, lon1 = (float(x) for x in str(_lit(args[1])).split(","))
        lat2, lon2 = (float(x) for x in str(_lit(args[2])).split(","))

        def leaf(v: Column) -> Column:
            lat, lon = _latlon(v)
            return (lat >= lat1) & (lat <= lat2) & (lon >= lon1) & (lon <= lon2)

        return field_pred(ctx, fname, leaf)
    lon_f, lat_f = _ident(args[0]), _ident(args[1])
    min_lon, min_lat = float(_lit(args[2])), float(_lit(args[3]))
    max_lon, max_lat = float(_lit(args[4])), float(_lit(args[5]))
    lon_ok = field_pred(ctx, lon_f,
                        lambda v: (v.try_cast("double") >= min_lon)
                        & (v.try_cast("double") <= max_lon))
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
    clat, clon = (float(x) for x in str(_lit(args[1])).split(","))
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
