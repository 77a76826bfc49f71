"""Type normalizers as Spark column expressions.

DataWave's type system (datawave.data.type.*, e.g. LcNoDiacriticsType,
NumberType, DateType, IpAddressType, GeoType — enumerated in
warehouse/query-core/src/test/java/datawave/query/testframework/
CitiesDataType.java:82-93) exists to map raw values to *index-sortable
canonical strings* so that Accumulo's lexicographic index can answer
typed range queries.  On Spark the storage layer compares natively, so a
normalizer here has two jobs only:

1. ``normalize_literal`` — canonicalise a query literal the same way the
   ingest path canonicalised the stored value (so equality matches);
2. ``col`` — the column expression applying the same canonicalisation to
   a raw-valued column when the table was NOT ingested normalized.

Both stay JVM-side (built-in functions, no Python UDFs) so they inline
into whole-stage codegen.
"""

from __future__ import annotations

import ipaddress
import unicodedata
from typing import Any, Callable

from pyspark.sql import Column, functions as F

# Latin accent fold for the JVM-side expression path; covers the Latin-1 +
# Latin Extended-A repertoire (same practical coverage as the reference's
# LcNoDiacriticsType, which NFD-decomposes and strips combining marks).
_ACCENTS = "àáâãäåāăąçćĉċčèéêëēĕėęěìíîïĩīĭįıñńņňòóôõöøōŏőšśŝşùúûüũūŭůűųýÿŷžźż"
_PLAIN = "aaaaaaaaaccccceeeeeeeeeiiiiiiiiinnnnooooooooossssuuuuuuuuuuyyyzzz"
assert len(_ACCENTS) == len(_PLAIN)


class Normalizer:
    """A named normalizer: python-side literal fn + spark-side column fn."""

    # one raw value → MANY normalized values?  (OneToManyNormalizerType)
    one_to_many = False

    def __init__(self, name: str,
                 literal_fn: Callable[[Any], Any],
                 col_fn: Callable[[Column], Column]):
        self.name = name
        self._literal_fn = literal_fn
        self._col_fn = col_fn

    def normalize_literal(self, value: Any) -> Any:
        if value is None:
            return None
        return self._literal_fn(value)

    def col(self, c: Column) -> Column:
        return self._col_fn(c)


class ListNormalizer(Normalizer):
    """One-to-many list normalizer (OneToManyNormalizerType — SURVEY
    §1.3; ingest fan-out at BaseIngestHelper.java:722-737 +
    normalize:793, query-side unwrap at ValueToAttributes.java:280):
    ONE raw delimited value ('Rome;Paris') normalizes to MANY values,
    each canonicalised by the ELEMENT normalizer.  The list variants
    the reference enumerates — ListType, LcNoDiacriticsListType,
    NumberListType — share the ``,|;`` delimiter and differ only in
    the element type.

    Spark restatement: ``col`` yields an ARRAY column (split → trim →
    drop empties → per-element normalize), so an at-rest ingest stores
    the normalized array and the compiler's existing ArrayType
    any-value path applies; for raw-at-query columns the compiler
    wraps this expression in ``F.exists`` so ``FIELD == 'x'`` matches
    any element.  Query literals are single values and fold through
    the element normalizer."""

    one_to_many = True

    def __init__(self, name: str, element: Normalizer,
                 delimiter: str = "[,;]"):
        self.element = element
        self.delimiter = delimiter
        super().__init__(name, element._literal_fn, self._array_col)

    def _array_col(self, c: Column) -> Column:
        # NB: the lambda must be single-arg — F.transform also offers
        # (element, index), and a bare F.trim would bind the index as
        # its trim-string argument and silently not trim
        parts = F.transform(F.split(c.cast("string"), self.delimiter),
                            lambda e: F.trim(e))
        # drop elements that FAIL element normalization (NULL out of
        # try_cast): the reference's per-value ingest normalize drops
        # the failing value and keeps the rest (error counter), so
        # '1;x;3' stores [1.0, 3.0] — not a NULL hole in the array
        # (list-normalizer parity, r8)
        return F.filter(
            F.transform(F.filter(parts, lambda e: e != ""),
                        self.element.col),
            lambda e: e.isNotNull())

    def normalize_to_many(self, value: Any) -> list:
        """Python-side fan-out (normalizeToMany parity) — the ingest
        helper's per-value expansion for driver-side metadata.  An
        element that fails the element normalizer is DROPPED, the rest
        kept (the reference's per-value ingest normalize error-counts
        and continues — list-normalizer parity, r8; matches the
        column side's null-filter)."""
        if value is None:
            return []
        import re as _re
        out = []
        for p in (s.strip()
                  for s in _re.split(self.delimiter, str(value))):
            if p == "":
                continue
            try:
                out.append(self.element.normalize_literal(p))
            except (ValueError, TypeError):
                continue
        return out


def _lc_no_diacritics_py(v: Any) -> str:
    s = str(v).lower()
    nfd = unicodedata.normalize("NFD", s)
    return "".join(ch for ch in nfd if not unicodedata.combining(ch))


def _lc_no_diacritics_col(c: Column) -> Column:
    return F.translate(F.lower(c.cast("string")), _ACCENTS, _PLAIN)


def _number_py(v: Any) -> float:
    return float(v)


def _ip_py(v: Any) -> str:
    # Canonical dotted-quad (strips leading zeros); parity with
    # datawave.data.type.IpAddressType normalization intent.  Padded
    # octets ('010.002.003.004') are legal query forms in the reference;
    # python's ipaddress treats them as ambiguous-octal, so strip first.
    s = str(v).strip()
    if "." in s and all(p.isdigit() for p in s.split(".")):
        s = ".".join(str(int(p)) for p in s.split("."))
    return str(ipaddress.ip_address(s))


_DATE_FORMATS = ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S.%f",
                 "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S",
                 "%Y-%m-%d %H:%M", "%Y-%m-%dT%H:%M", "%Y-%m-%d")


def _date_py(v: Any) -> str:
    """Query-literal side of the date normalizer: the same
    'yyyy-MM-dd HH:mm:ss.SSS' canonical form the column side emits
    (milliseconds, not micros), over the subset of Spark's default
    timestamp parse a query literal realistically uses.  An
    unparseable literal raises (query compile error beats a silently
    unmatchable term)."""
    import datetime as _dt
    s = str(v).strip()
    for fmt in _DATE_FORMATS:
        try:
            d = _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
        return d.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    raise ValueError(f"unparseable date literal: {v!r}")


# 0* prefix: padded octets ('010.002.003.004') are legal and
# canonicalize by the int cast, matching _ip_py
_IP_OCTET = r"(?:0*(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9]))"
_IP_RE = "^" + r"\.".join([_IP_OCTET] * 4) + "$"


def _ip_col(c: Column) -> Column:
    # Rebuild dotted-quad from int-parsed octets; IPv4 JVM-side.
    # ONE regex validates shape + octet range up front (malformed →
    # NULL, never an ANSI abort / a concat_ws null-skip — planner-
    # referee r8); the int-cast canonicalization (strips leading
    # zeros) then runs only on validated rows, so the expression tree
    # stays a single guard + one transform instead of the 13-term
    # per-octet guard chain the first fix used (bench r8: 3.5x on the
    # ipv4 key).
    s = F.trim(c.cast("string"))     # _ip_py strips too
    return F.when(
        s.rlike(_IP_RE),
        F.array_join(F.transform(F.split(s, r"\."),
                                 lambda o: o.cast("int").cast("string")),
                     "."))


def _geo_py(v: Any) -> str:
    # GeoType parity (datawave.data.type.GeoType): a "lat,lon" /
    # "lat_lon" / "lat|lon" point (GeoNormalizer accepts all three —
    # MixedGeoAndGeoWaveTest ingests the underscore form) normalizes
    # to a z-order index string — here the geohash (same Morton
    # interleave family), bit-identical to the column form.
    import re as _re
    from datawave_spark.functions.geohash import geohash_py
    lat_s, lon_s = _re.split(r"[,_|]", str(v).strip(), maxsplit=1)
    return geohash_py(float(lat_s), float(lon_s), 8)


def _geo_col(c: Column) -> Column:
    from datawave_spark.functions.geohash import geohash_col
    # F.get + try_cast + explicit null guard: malformed "lat,lon" must
    # yield NULL — parts[1] on a comma-less value ANSI-throws
    # invalidArrayIndexError, and geohash_col does NOT propagate null
    # (its bit clamping turns null into a REAL geohash, indexing the
    # bad value at an actual location — normalizer-parity referee r8)
    parts = F.split(c.cast("string"), "[,_|]")
    lat = F.get(parts, 0).try_cast("double")
    lon = F.get(parts, 1).try_cast("double")
    return F.when(lat.isNotNull() & lon.isNotNull(),
                  geohash_col(lat, lon, 8))


NORMALIZERS: dict[str, Normalizer] = {
    "noop": Normalizer("noop", lambda v: v, lambda c: c),
    "lc": Normalizer("lc", lambda v: str(v).lower(), lambda c: F.lower(c.cast("string"))),
    "lcNoDiacritics": Normalizer("lcNoDiacritics", _lc_no_diacritics_py, _lc_no_diacritics_col),
    # try_cast, not cast: a malformed stored value must normalize to
    # NULL (dropped from the index / a non-match at evaluation), not
    # abort the scan under ANSI — the reference's ingest likewise drops
    # values that fail type normalization (BaseIngestHelper error
    # counters) and its evaluator treats them as non-matches.
    "number": Normalizer("number", _number_py,
                         lambda c: c.try_cast("double")),
    # Both sides must canonicalize IDENTICALLY (normalizer-parity
    # referee r8): the old identity-py / to_timestamp-col pair meant an
    # indexed date field missed every equality lookup ('2024-01-05' vs
    # stored '2024-01-05 00:00:00'), and to_timestamp ANSI-throws on
    # the first malformed stored value.  Canonical form is
    # 'yyyy-MM-dd HH:mm:ss.SSS' — fixed width, so lexicographic range
    # compares stay chronological.
    "date": Normalizer("date", _date_py,
                       lambda c: F.date_format(
                           F.try_to_timestamp(c.cast("string")),
                           "yyyy-MM-dd HH:mm:ss.SSS")),
    "ipAddress": Normalizer("ipAddress", _ip_py, _ip_col),
    "trimLeadingZeros": Normalizer("trimLeadingZeros",
                                   lambda v: str(v).lstrip("0") or "0",
                                   lambda c: F.regexp_replace(c.cast("string"), r"^0+(?=.)", "")),
    "hexString": Normalizer("hexString", lambda v: str(v).lower(),
                            lambda c: F.lower(c.cast("string"))),
    "macAddress": Normalizer("macAddress",
                             lambda v: str(v).lower().replace("-", ":"),
                             lambda c: F.regexp_replace(F.lower(c.cast("string")), "-", ":")),
    "geo": Normalizer("geo", _geo_py, _geo_col),
}

# OneToManyNormalizerType list variants (registered after the scalar
# table so elements can reference it).  "list" keeps raw element bytes
# (trim/split only); the typed variants bind the matching element
# normalizer, mirroring ListType / LcNoDiacriticsListType /
# NumberListType.
NORMALIZERS["list"] = ListNormalizer("list", NORMALIZERS["noop"])
NORMALIZERS["lcNoDiacriticsList"] = ListNormalizer(
    "lcNoDiacriticsList", NORMALIZERS["lcNoDiacritics"])
NORMALIZERS["numberList"] = ListNormalizer("numberList",
                                           NORMALIZERS["number"])


def get_normalizer(name: str) -> Normalizer:
    try:
        return NORMALIZERS[name]
    except KeyError:
        raise KeyError(f"unknown normalizer {name!r}; known: {sorted(NORMALIZERS)}") from None


def _normalize_ipv4_literal(value: Any) -> str:
    """``normalize:ipv4`` literal canonicalization — parity with
    NormalizationFunctions.java:23-52 (namespace registered at
    JexlFunctionNamespaceRegistry.java:13-21).  The reference zero-pads
    octets because its at-rest index encoding is the padded form; our
    at-rest canon is the stripped dotted-quad (see ``_ip_py``), so the
    literal folds to THAT form — same invariant (literal canon ==
    stored canon), different byte encoding.  Wildcard queries
    (``'192.168.1..*'``) canonicalize the octet prefix and keep the
    trailing ``..*`` for the regex comparison, as the reference does."""
    s = str(value).strip()
    i = s.find("..*")
    if i != -1:
        prefix = s[:i]
        octets = [str(int(p)) for p in prefix.split(".") if p != ""]
        return ".".join(octets) + "..*"
    return _ip_py(s)


# normalize: namespace — literal-folding functions applied at parse
# time (the reference resolves them during query normalization, before
# index lookup).
NORMALIZE_FUNCTIONS: dict[str, Any] = {
    "ipv4": _normalize_ipv4_literal,
}


def normalize_function(name: str, *args: Any) -> Any:
    try:
        fn = NORMALIZE_FUNCTIONS[name]
    except KeyError:
        raise KeyError(
            f"unknown normalize function {name!r}; "
            f"known: {sorted(NORMALIZE_FUNCTIONS)}") from None
    return fn(*args)
