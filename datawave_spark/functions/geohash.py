"""Geohash encoding + bounding-box prefix acceleration.

Reference: DataWave's GeoType normalizer maps lat/lon to z-order index
strings and the planner expands geo functions into index range
predicates (GeoWaveFunctionsDescriptor / FunctionIndexQueryExpansion
Visitor at DefaultQueryPlanner.java:1390, pruned by
GeoWavePruningVisitor:1557) — the composite/DiscreteIndexType family
(ExpandCompositeTerms:1550).

Spark restatement: ``geohash_col`` is a generated column (pure JVM bit
math — no UDF); a bounding-box query becomes

    startswith(geohash, any covering prefix)  AND  exact bbox predicate

The StartsWith prefix predicates push into parquet row-group stats (and
prune partitions if the table partitions/Z-ORDERs by geohash prefix) —
the same coarse-filter-then-exact shape as the reference's geo index
ranges.  At 100 TB, storing events sorted/partitioned by
``substr(geohash, 1, k)`` makes every geo query prune to the covering
cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BITS_Q = 20  # quantization bits per axis (enough for precision ≤ 8)


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Standard geohash (base32, lon-first bit interleave) as a pure
    column expression."""
    assert 1 <= precision <= 8
    lat_q = F.floor((lat + 90.0) / 180.0 * (1 << _BITS_Q)).cast("long")
    lon_q = F.floor((lon + 180.0) / 360.0 * (1 << _BITS_Q)).cast("long")
    # clamp the open upper edge (lat=90 / lon=180)
    lat_q = F.least(lat_q, F.lit((1 << _BITS_Q) - 1))
    lon_q = F.least(lon_q, F.lit((1 << _BITS_Q) - 1))
    total_bits = 5 * precision
    # morton: bit i (from msb, i=0..) comes from lon (even i) / lat (odd)
    morton = F.lit(0).cast("long")
    for i in range(total_bits):
        axis, k = (lon_q, i // 2) if i % 2 == 0 else (lat_q, i // 2)
        src_bit = _BITS_Q - 1 - k
        bit = F.shiftright(axis, src_bit) % 2
        morton = morton + F.shiftleft(bit, total_bits - 1 - i)
    alphabet = F.array(*[F.lit(ch) for ch in _BASE32])
    out = None
    for c in range(precision):
        idx = (F.shiftright(morton, 5 * (precision - 1 - c)) % 32).cast("int")
        ch = F.element_at(alphabet, idx + 1)
        out = ch if out is None else F.concat(out, ch)
    return out


def geohash_py(lat: float, lon: float, precision: int = 8) -> str:
    """Driver-side geohash (same quantized algorithm — bit-identical to
    ``geohash_col``) for prefix planning."""
    lat_q = min(int((lat + 90.0) / 180.0 * (1 << _BITS_Q)), (1 << _BITS_Q) - 1)
    lon_q = min(int((lon + 180.0) / 360.0 * (1 << _BITS_Q)), (1 << _BITS_Q) - 1)
    total_bits = 5 * precision
    morton = 0
    for i in range(total_bits):
        axis, k = (lon_q, i // 2) if i % 2 == 0 else (lat_q, i // 2)
        bit = (axis >> (_BITS_Q - 1 - k)) & 1
        morton |= bit << (total_bits - 1 - i)
    return "".join(_BASE32[(morton >> (5 * (precision - 1 - c))) & 31]
                   for c in range(precision))


_CELL_DEG = {  # approx (lat_deg, lon_deg) per geohash cell by precision
    1: (45.0, 45.0), 2: (5.625, 11.25), 3: (1.40625, 1.40625),
    4: (0.17578125, 0.3515625), 5: (0.0439453125, 0.0439453125),
    6: (0.0054931640625, 0.010986328125),
    7: (0.00137329101562, 0.00137329101562),
    8: (0.000171661376953, 0.000343322753906),
}


def bbox_prefixes(min_lat: float, min_lon: float, max_lat: float,
                  max_lon: float, precision: int = 4,
                  max_cells: int = 64) -> list[str]:
    """Covering geohash prefixes for a bbox (GeoWave range-decomposition
    analog): step the bbox at the cell size of ``precision``, collecting
    distinct cell hashes; fall back to a coarser precision if the cover
    would exceed ``max_cells``."""
    for p in range(precision, 0, -1):
        dlat, dlon = _CELL_DEG[p]
        cells: set[str] = set()
        lat = min_lat
        overflow = False
        while lat <= max_lat + dlat and not overflow:
            lon = min_lon
            while lon <= max_lon + dlon:
                cells.add(geohash_py(min(lat, max_lat), min(lon, max_lon), p))
                if len(cells) > max_cells:
                    overflow = True
                    break
                lon += dlon
            lat += dlat
        if not overflow:
            return sorted(cells)
    return [""]


def add_geohash(df: DataFrame, lat_col: str, lon_col: str,
                precision: int = 8, out_col: str = "geohash") -> DataFrame:
    """Generated geohash column (the composite-field analog) — compute
    at ingest and sort/partition by a prefix of it for pruning."""
    return df.withColumn(out_col,
                         geohash_col(F.col(lat_col), F.col(lon_col), precision))


def bbox_filter_accelerated(df: DataFrame, lat_col: str, lon_col: str,
                            min_lat: float, min_lon: float,
                            max_lat: float, max_lon: float,
                            geohash_col_name: str = "geohash",
                            prefix_precision: int = 4,
                            stored: bool = False) -> DataFrame:
    """Bounding-box query with geohash prefix acceleration: coarse
    StartsWith prefix predicates (pushdown/row-group-skippable) AND the
    exact bbox check.

    ``stored=True`` means the geohash column is real table data (built
    at ingest, e.g. ``sources.prepared.geo_events``): the coarse test is
    emitted as an OR of ``startswith`` predicates, which Spark pushes to
    parquet as StringStartsWith and row-group-skips on a
    geohash-clustered table.  With a DERIVED geohash (stored=False) each
    startswith copy would re-inline the whole ~30-step Morton expression
    when Catalyst pushes the filter through the generating projection —
    there the coarse test is ONE substring + isin instead."""
    prefixes = bbox_prefixes(min_lat, min_lon, max_lat, max_lon,
                             prefix_precision)
    coarse = _coarse_prefix_pred(prefixes, geohash_col_name, stored)
    exact = (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat) \
        & (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon)
    return df.filter(coarse & exact)


def _coarse_prefix_pred(prefixes: list[str], geohash_col_name: str,
                        stored: bool):
    gh = F.col(geohash_col_name)
    if stored:
        coarse = gh.startswith(prefixes[0])
        for p in prefixes[1:]:
            coarse = coarse | gh.startswith(p)
        return coarse
    # All covering cells share one precision → one substring + isin.
    plen = len(prefixes[0])
    return F.substring(gh, 1, plen).isin(*prefixes)


def circle_filter_accelerated(df: DataFrame, lat_col: str, lon_col: str,
                              center_lat: float, center_lon: float,
                              radius: float,
                              geohash_col_name: str = "geohash",
                              prefix_precision: int = 4,
                              stored: bool = False) -> DataFrame:
    """geo:within_circle with geohash prefix acceleration: the coarse
    cover is the circle's bounding square (GeoWave decomposes circles
    the same way — tiered ranges over the envelope,
    GeoWaveFunctionsDescriptor), pushed as StartsWith on the stored
    geohash; the exact planar-distance check (GeoFunctions.
    within_circle:149 semantics) runs on survivors only."""
    prefixes = bbox_prefixes(center_lat - radius, center_lon - radius,
                             center_lat + radius, center_lon + radius,
                             prefix_precision)
    coarse = _coarse_prefix_pred(prefixes, geohash_col_name, stored)
    exact = ((F.col(lat_col) - center_lat) ** 2
             + (F.col(lon_col) - center_lon) ** 2) <= radius ** 2
    return df.filter(coarse & exact)


def polygon_filter_accelerated(df: DataFrame, lat_col: str, lon_col: str,
                               vertices: list[tuple[float, float]],
                               geohash_col_name: str = "geohash",
                               prefix_precision: int = 4,
                               stored: bool = True) -> DataFrame:
    """geowave:intersects-style POLYGON query with geohash prefix
    acceleration over a stored geohash column: the coarse cover is the
    polygon's ENVELOPE decomposed to prefixes (exactly GeoWave's
    tiered-range decomposition — ranges cover the envelope, the exact
    geometry test runs on survivors), pushed as StartsWith.

    ``vertices``: the ring as (lon, lat) pairs, first != last (closed
    implicitly).  CONVEX rings get an all-JVM exact test — one
    half-plane sign per edge, whole-stage-codegen, boundary inclusive —
    so no Python appears anywhere in the plan.  Non-convex rings raise:
    route those through functions/geo.py's vectorized ray-cast path."""
    xs = [float(v[0]) for v in vertices]
    ys = [float(v[1]) for v in vertices]
    n = len(vertices)
    if n < 3:
        raise ValueError("polygon needs >= 3 vertices")
    crosses = []
    for i in range(n):
        x1, y1 = xs[i], ys[i]
        x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
        x3, y3 = xs[(i + 2) % n], ys[(i + 2) % n]
        crosses.append((x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2))
    if not (all(c >= 0 for c in crosses) or all(c <= 0 for c in crosses)):
        raise ValueError(
            "non-convex ring: use the exact ray-cast path "
            "(functions/geo.py geowave:intersects) instead")
    sign = 1.0 if sum(crosses) >= 0 else -1.0
    prefixes = bbox_prefixes(min(ys), min(xs), max(ys), max(xs),
                             prefix_precision)
    coarse = _coarse_prefix_pred(prefixes, geohash_col_name, stored)
    x, y = F.col(lon_col), F.col(lat_col)
    exact = None
    for i in range(n):
        x1, y1 = xs[i], ys[i]
        x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
        half = (F.lit(sign) * ((F.lit(x2 - x1) * (y - F.lit(y1)))
                               - (F.lit(y2 - y1) * (x - F.lit(x1))))) >= 0
        exact = half if exact is None else exact & half
    return df.filter(coarse & exact)
