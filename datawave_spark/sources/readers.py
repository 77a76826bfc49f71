"""Format readers: CSV, JSON (flattened), XML.

Reference (SURVEY §2.1):
- CSV: warehouse/ingest-csv/.../config/helper/ExtendedCSVIngestHelper —
  header-configured CSV → field multimap (multi-valued via delimiter);
- JSON: warehouse/ingest-json/.../config/helper/JsonDataTypeHelper —
  flattens arbitrary JSON into dotted field names;
- XML (Wikipedia): warehouse/ingest-wikipedia/.../
  WikipediaDataTypeHandler — record-per-<page> XML dumps.

Spark restatement: ``spark.read.csv/json`` with a flatten pass for
nested structs (dotted names, arrays preserved as multi-values — the
natural representation of the reference's field multimap), and an
ElementTree-based mapInPandas XML reader (spark-xml is not in this
image; the record-split + parse shape is identical).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten StructType columns into top-level columns
    with joined names (JsonDataTypeHelper's dotted flattening; ``_``
    keeps names JEXL-identifier-safe).  Arrays survive as ArrayType
    multi-values; arrays-of-structs are left intact for the grouping:
    functions (SURVEY §2.2 grouping context)."""
    while True:
        struct_cols = [f.name for f in df.schema.fields
                       if isinstance(f.dataType, T.StructType)]
        if not struct_cols:
            return df
        selects = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                selects.extend(
                    F.col(f"`{f.name}`.`{sub.name}`")
                    .alias(f"{f.name}{sep}{sub.name}")
                    for sub in f.dataType.fields)
            else:
                selects.append(F.col(f"`{f.name}`"))
        df = df.select(*selects)


def flatten_simple(df: DataFrame) -> DataFrame:
    """JsonObjectFlattener.FlattenMode.SIMPLE
    (ingest-json/util/JsonObjectFlattener.java:35): only TOP-LEVEL
    primitives survive; nested objects are dropped entirely (the
    reference's SimpleFlattenQueryTest corpus exposes only STATE /
    STARTDATE / EVENTID)."""
    keep = [f.name for f in df.schema.fields
            if not isinstance(f.dataType, T.StructType)]
    return df.select(*[F.col(f"`{c}`") for c in keep])


def _grouped_exprs(df: DataFrame) -> dict[str, "F.Column"]:
    """GROUPED leaf-name → value-array Column expressions over the
    (un-flattened) frame — shared by flatten_grouped and
    GROUPED_AND_NORMAL."""
    def leaf_arrays(prefix_col, dtype):
        out = []
        for sub in dtype.fields:
            c = prefix_col.getField(sub.name)
            if isinstance(sub.dataType, T.StructType):
                out.extend(leaf_arrays(c, sub.dataType))
            elif isinstance(sub.dataType, T.ArrayType):
                out.append((sub.name.upper(), F.coalesce(c, F.array())))
            else:
                out.append((sub.name.upper(),
                            F.filter(F.array(c),
                                     lambda v: v.isNotNull())))
        return out

    groups: dict[str, list] = {}
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            pieces = leaf_arrays(F.col(f"`{f.name}`"), f.dataType)
        elif isinstance(f.dataType, T.ArrayType):
            pieces = [(f.name.upper(), F.coalesce(F.col(f"`{f.name}`"),
                                                  F.array()))]
        else:
            pieces = [(f.name.upper(), F.filter(
                F.array(F.col(f"`{f.name}`")), lambda v: v.isNotNull()))]
        for name, expr in pieces:
            groups.setdefault(name, []).append(expr)
    out = {}
    for name, exprs in groups.items():
        arr = exprs[0]
        for e in exprs[1:]:
            arr = F.concat(arr, e)
        out[name] = arr
    return out


def flatten_grouped(df: DataFrame) -> DataFrame:
    """JsonObjectFlattener.FlattenMode.GROUPED (:60): the query field
    is the LEAF name, the path becomes the grouping context
    (CITY.CAPITAL_0 / CITY.LARGE_0 / CITY.SMALL_0 all answer CITY) —
    realized as a parallel value ARRAY per leaf name, the engine's
    grouped representation: CITY = [capital, large, small].  Scalar
    and array leaves from different contexts concatenate; names
    uppercase (the reference flattener canonicalizes case)."""
    exprs = _grouped_exprs(df)
    return df.select(*[c.alias(n) for n, c in exprs.items()])


def read_csv_events(spark: SparkSession, path: str, *,
                    header: bool = True,
                    schema: T.StructType | str | None = None,
                    multi_value_delim: dict[str, str] | None = None) -> DataFrame:
    """Header-configured CSV with per-field multi-value splitting
    (ExtendedCSVIngestHelper's 'multivalued fields' config)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    for col_name, delim in (multi_value_delim or {}).items():
        if col_name in df.columns:
            df = df.withColumn(col_name, F.split(F.col(col_name), delim))
    return df


def read_json_events(spark: SparkSession, path: str,
                     schema: T.StructType | str | None = None,
                     mode: str = "normal") -> DataFrame:
    """JSON with nested-struct flattening to JEXL-addressable fields.
    ``mode`` selects the JsonObjectFlattener.FlattenMode: 'simple'
    (top-level primitives only), 'normal' (path-prefixed names,
    CAPITAL_CITY), 'grouped' (leaf-name fields over grouped value
    arrays), or 'grouped_and_normal' (both sets of columns)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return flatten_json(df, mode)


def flatten_json(df: DataFrame, mode: str = "normal") -> DataFrame:
    m = mode.lower()
    if m == "simple":
        return flatten_simple(df)
    if m == "normal":
        return flatten_structs(df)
    if m == "grouped":
        return flatten_grouped(df)
    if m == "grouped_and_normal":
        # FlattenMode.GROUPED_AND_NORMAL (:71): both name sets on one
        # frame — the NORMAL path-prefixed columns plus the GROUPED
        # leaf arrays (a leaf whose name collides with a NORMAL name,
        # e.g. a top-level primitive, keeps the NORMAL column)
        normal_names = {c.upper() for c in flatten_structs(df).columns}
        extras = [c.alias(n) for n, c in _grouped_exprs(df).items()
                  if n not in normal_names]
        return flatten_structs(df.select("*", *extras))
    raise ValueError(f"unknown flatten mode {mode!r}")


def read_xml_events(spark: SparkSession, path: str, record_tag: str,
                    fields: dict[str, str]) -> DataFrame:
    """Record-oriented XML (e.g. Wikipedia <page> dumps): whole files in
    via ``wholetext``, records split + parsed with ElementTree inside
    mapInPandas (Arrow-batched), ``fields`` maps output column →
    relative element path."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True)
    out_schema = ", ".join(f"`{name}` string" for name in fields)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {name: [] for name in fields}
            for blob in pdf["value"]:
                try:
                    root = ET.fromstring(blob)
                except ET.ParseError:
                    root = ET.fromstring(f"<__root__>{blob}</__root__>")
                for rec in root.iter(record_tag):
                    for name, rel in fields.items():
                        el = rec.find(rel) if rel != "." else rec
                        rows[name].append(None if el is None else
                                          (el.text or "").strip())
            yield pd.DataFrame(rows)

    return raw.mapInPandas(parse, out_schema)


# ------------------------------------------------ Wikipedia-dump ingest

# ISO 639-1 prefix → language name(s) — the dump-name language guess
# (reference: ingest-wikipedia ISO_639_Codes.java; representative
# subset, same keying: the code before "wiki" in the datatype name).
ISO_639_1 = {
    "en": ["ENGLISH"], "de": ["GERMAN"], "fr": ["FRENCH"],
    "es": ["SPANISH", "CASTILIAN"], "it": ["ITALIAN"],
    "pt": ["PORTUGUESE"], "ru": ["RUSSIAN"], "ja": ["JAPANESE"],
    "zh": ["CHINESE"], "ar": ["ARABIC"], "nl": ["DUTCH", "FLEMISH"],
    "pl": ["POLISH"], "sv": ["SWEDISH"], "ko": ["KOREAN"],
    "hi": ["HINDI"], "tr": ["TURKISH"], "vi": ["VIETNAMESE"],
}

# WikipediaIngestHelper.fieldNameReplacements
_WIKI_RENAMES = {"PAGE_NS": "PAGE_NAMESPACE"}
# WikipediaIngestHelper.ignoreFields: revision text is CONTENT (the
# d-column/term-frequency path), never an event field
_WIKI_IGNORE = {"REVISION_TEXT"}
# WikipediaContentHandler.Depth: elements that move the naming prefix
_WIKI_DEPTHS = ("page", "revision", "contributor")


def wiki_language(datatype_name: str) -> list[str]:
    """LANGUAGE values guessed from the datatype/dump name — the text
    before 'wiki' (up to an underscore) as an ISO 639-1 code
    (WikipediaIngestHelper.extractWikipediaTypeInformation:87)."""
    idx = datatype_name.find("wiki")
    if idx < 0:
        return []
    dump = datatype_name[:idx]
    code = dump.split("_", 1)[0]
    return ISO_639_1.get(code, [])


def wiki_event_date(file_name: str) -> str | None:
    """Event date from the dump FILENAME's second dash-token
    (WikipediaRecordReader:320-345: enwiki-20130305-pages-articles →
    2013-03-05); None when the name has no date token."""
    import os
    import re as _re
    base = os.path.basename(file_name)
    m = _re.match(r"[^-]+-(\d{8})-", base)
    if not m:
        return None
    d = m.group(1)
    return f"{d[:4]}-{d[4:6]}-{d[6:8]}"


def read_wikipedia_dump(spark: SparkSession, path: str,
                        datatype_name: str = "enwiki") -> DataFrame:
    """MediaWiki dump ingest with the reference's field discipline
    (ingest-wikipedia WikipediaContentHandler + WikipediaIngestHelper +
    WikipediaRecordReader):

    - record = ``<page>``; fields named ``<DEPTH>_<ELEMENT>`` uppercase
      with depth ∈ {PAGE, REVISION, CONTRIBUTOR} (nested ids stay
      distinct: PAGE_ID vs REVISION_ID vs CONTRIBUTOR_ID); element
      attributes become ``<DEPTH>_<ELEM>_<ATTR>``;
    - ``PAGE_NS`` renames to ``PAGE_NAMESPACE``;
    - ``REVISION_TEXT`` is NOT an event field — it lands in the
      ``text`` content column (the d-column / term-frequency path);
    - ``language`` (multi-value) guessed from the datatype name;
    - ``event_date`` parsed from the dump file name.

    Output: one row per page revision with the fixed columns plus a
    ``fields`` map of every extracted field (multimap-shaped:
    map<string, array<string>>) for JEXL queries over dump-specific
    extras.  Scale shape: ``wholetext`` per dump file split into pages
    inside Arrow-batched ``mapInPandas`` — one task per dump file (the
    reference's WikipediaInputFormat is likewise file-per-split); shard
    real multi-GB dumps into per-file chunks upstream as the reference
    does."""
    import xml.etree.ElementTree as ET

    raw = (spark.read.text(path, wholetext=True)
           .withColumn("__file", F.input_file_name()))
    langs = wiki_language(datatype_name)

    out_schema = ("page_id long, page_title string, page_namespace string, "
                  "revision_id long, revision_timestamp string, "
                  "contributor_username string, contributor_id long, "
                  "revision_comment string, text string, "
                  "fields map<string, array<string>>, "
                  "language array<string>, event_date string")

    def _local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def extract_page(page) -> tuple[dict[str, list[str]], str]:
        """One <page> → (field multimap, revision text) — the
        WikipediaContentHandler walk: depth-prefixed names, attributes
        as extra fields, REVISION_TEXT diverted to content."""
        fields: dict[str, list[str]] = {}
        text_out: list[str] = [""]

        def put(name: str, value: str | None) -> None:
            name = _WIKI_RENAMES.get(name, name)
            if name in _WIKI_IGNORE or value is None:
                return
            value = value.strip()
            if value:
                fields.setdefault(name, []).append(value)

        def walk(el, depth: str) -> None:
            local = _local(el.tag)
            if local in _WIKI_DEPTHS:
                depth = local.upper()
            name = f"{depth}_{local.upper()}"
            if depth == "REVISION" and local == "text":
                text_out[0] = (el.text or "")
            elif el.text and not list(el):
                put(name, el.text)
            for attr, aval in el.attrib.items():
                put(f"{name}_{_local(attr).upper()}", aval)
            for child in el:
                walk(child, depth)

        for child in page:
            walk(child, "PAGE")
        return fields, text_out[0]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["page_id", "page_title", "page_namespace", "revision_id",
                "revision_timestamp", "contributor_username",
                "contributor_id", "revision_comment", "text", "fields",
                "language", "event_date"]
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for blob, fname in zip(pdf["value"], pdf["__file"]):
                try:
                    root = ET.fromstring(blob)
                except ET.ParseError:
                    root = ET.fromstring(f"<__root__>{blob}</__root__>")
                ed = wiki_event_date(fname)
                pages = ([root] if _local(root.tag) == "page"
                         else [p for p in root.iter() if _local(p.tag) == "page"])
                for pg in pages:
                    f_map, text = extract_page(pg)

                    def one(name, cast=None):
                        vs = f_map.get(name)
                        if not vs:
                            return None
                        return cast(vs[0]) if cast else vs[0]

                    rows["page_id"].append(one("PAGE_ID", int))
                    rows["page_title"].append(one("PAGE_TITLE"))
                    rows["page_namespace"].append(one("PAGE_NAMESPACE"))
                    rows["revision_id"].append(one("REVISION_ID", int))
                    rows["revision_timestamp"].append(one("REVISION_TIMESTAMP"))
                    rows["contributor_username"].append(
                        one("CONTRIBUTOR_USERNAME"))
                    rows["contributor_id"].append(one("CONTRIBUTOR_ID", int))
                    rows["revision_comment"].append(one("REVISION_COMMENT"))
                    rows["text"].append(text)
                    rows["fields"].append(f_map)
                    rows["language"].append(langs)
                    rows["event_date"].append(ed)
            yield pd.DataFrame(rows)

    out = raw.mapInPandas(parse, out_schema)
    return (out.withColumn("revision_timestamp",
                           F.to_timestamp("revision_timestamp",
                                          "yyyy-MM-dd'T'HH:mm:ss'Z'"))
            .withColumn("event_date", F.col("event_date").cast("date")))


def read_orc_events(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC source — Spark-native reader, same predicate
    pushdown + column pruning guarantees as the parquet path (ORC
    carries row-group min/max stats too).  The reference's ingest
    consumes whatever the record reader yields; on Spark the columnar
    formats are interchangeable scan providers, so ORC-landed data
    needs no conversion step before querying."""
    return spark.read.orc(path)


def read_media_dir(spark: SparkSession, path: str,
                   glob: str | None = None) -> DataFrame:
    """Raw media-file ingest via Spark's built-in ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content
    binary) — the on-ramp from a directory of image/audio payloads into
    the multimodal binary-column layout (operators/multimodal).  The
    source parallelizes across files and carries the length column for
    size-based filtering BEFORE content is read into memory; pair with
    a low ``spark.sql.execution.arrow.maxRecordsPerBatch`` when the
    payloads are large."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


NYCTLC_KNOWN_FIELDS = {
    "VENDORID", "LPEP_PICKUP_DATETIME", "LPEP_DROPOFF_DATETIME",
    "STORE_AND_FWD_FLAG", "RATECODEID", "PICKUP_LONGITUDE",
    "PICKUP_LATITUDE", "DROPOFF_LONGITUDE", "DROPOFF_LATITUDE",
    "PASSENGER_COUNT", "TRIP_DISTANCE", "FARE_AMOUNT", "EXTRA",
    "MTA_TAX", "TIP_AMOUNT", "TOLLS_AMOUNT", "EHAIL_FEE",
    "IMPROVEMENT_SURCHARGE", "TOTAL_AMOUNT", "PAYMENT_TYPE", "TRIP_TYPE",
}


def _circle_wkt(cx, cy, r):
    """32-point circle polygon WKT — the JTS GeometricShapeFactory
    recipe NYCTLCIngestHelper.createCircle uses (setNumPoints(32),
    setSize(RADIUS*2), createCircle → x_i = cx + r·cos(2πi/32),
    y_i = cy + r·sin(2πi/32), ring closed on point 0), built as pure
    column expressions (JVM codegen, no UDF).  Numeric formatting is
    Spark's shortest-repr double→string rather than the JTS WKTWriter
    precision model — consumers (the geowave: family) parse the
    numbers, not the bytes."""
    import math
    coords = [(math.cos(i * math.pi / 16.0), math.sin(i * math.pi / 16.0))
              for i in range(32)]
    coords.append(coords[0])
    parts = [F.concat((cx + r * F.lit(c)).cast("string"), F.lit(" "),
                      (cy + r * F.lit(s)).cast("string"))
             for c, s in coords]
    return F.concat(F.lit("POLYGON (("), F.concat_ws(", ", *parts),
                    F.lit("))"))


def read_nyctlc(spark: SparkSession, path: str,
                generate_extra_geometries: bool = False,
                generate_overloaded_composite: bool = False) -> DataFrame:
    """NYC Taxi & Limousine Commission dataset ingest
    (warehouse/ingest-nyctlc): header-driven dynamic field parsing —
    the header is uppercased and validated against the known field
    list but UNKNOWN fields are kept (NYCTLCHelper.parseHeader logs
    them; PROCESS_EXTRA_FIELDS) — plus the derived geometry fields
    NYCTLCIngestHelper.getEventFields builds for the GeoWave index:

    - ``PICKUP_LOCATION`` / ``DROPOFF_LOCATION``: WKT points
      concatenated from the RAW lat/lon field STRINGS (exactly the
      Java's ``"POINT (" + lon + " " + lat + ")"`` — no float
      round-trip), NULL when either half of the pair is missing
      (the helper logs and skips);
    - ``ALL_LOCATIONS``: the multi-valued union of whichever points
      exist (HashMultimap semantics — unordered, so consumers sort);
    - ``ALL_POINTS`` / ``ALL_POINTS_GEO``: the UNCONDITIONAL
      point-query fields (NYCTLCIngestHelper.java:158-161) — emitted
      even when a coordinate is missing, where Java's string concat
      renders null as the literal ``"null"`` (``"POINT (null null)"``
      / ``"null null"``); we reproduce those exact strings (HashMultimap
      is a SET multimap, so two identical strings collapse to one);
    - ``TOTAL_AMOUNT_INDEXED``: a copy of the single TOTAL_AMOUNT
      value (NYCTLCIngestHelper.java:151-156), NULL when the source
      field is absent/empty.

    The config-gated extras mirror the reference's two helper flags
    (NYCTLCHelper GENERATE_EXTRA_GEOMETRIES /
    GENERATE_OVERLOADED_COMPOSITE, default false):

    - ``generate_extra_geometries`` (:113-126): when all four
      coordinates exist, three 32-point circle WKT polygons join
      ALL_LOCATIONS — radius = half the euclidean pickup→dropoff
      distance, centred at pickup, dropoff, and ``min + (max - min)``
      per axis (which algebraically IS the max corner — the Java
      expression reads like a midpoint but reduces to max; reproduced
      faithfully);
    - ``generate_overloaded_composite`` (:130-145): the two points
      re-join ALL_LOCATIONS (set semantics — no-op when already
      there) and the same three circles land in a separate
      ``ALL_LOCATIONS_OVERLOADED`` column.

    All columns stay strings (the reference's event fields are raw
    strings; normalizers type them downstream).  Returns the frame
    with uppercased source columns + the six derived columns;
    unknown header fields are logged exactly as parseHeader does
    (validate-but-allow), which is also the only signal a misspelled
    coordinate header gives before every derived point goes NULL."""
    import logging
    from datawave_spark.util import spread
    df = spark.read.option("header", True).csv(path)
    df = df.toDF(*[c.strip().upper() for c in df.columns])
    # spread the raw rows before the derived-field projection (r11): a
    # small CSV arrives as one split and the WKT/array string work
    # would run single-task (no-op on wide scans)
    df = spread(df, sized=True)
    unknown = set(df.columns) - NYCTLC_KNOWN_FIELDS
    if unknown:
        logging.getLogger(__name__).debug(
            "NYCTLC header contained unknown fields: %s",
            ",".join(sorted(unknown)))

    def point(lon: str, lat: str):
        return F.when(
            F.col(lon).isNotNull() & F.col(lat).isNotNull(),
            F.concat(F.lit("POINT ("), F.col(lon), F.lit(" "),
                     F.col(lat), F.lit(")")))

    pickup = point("PICKUP_LONGITUDE", "PICKUP_LATITUDE") \
        if {"PICKUP_LONGITUDE", "PICKUP_LATITUDE"} <= set(df.columns) \
        else F.lit(None).cast("string")
    dropoff = point("DROPOFF_LONGITUDE", "DROPOFF_LATITUDE") \
        if {"DROPOFF_LONGITUDE", "DROPOFF_LATITUDE"} <= set(df.columns) \
        else F.lit(None).cast("string")

    # The unconditional point-query fields concatenate WITHOUT a
    # null-pair guard: Java's `"POINT (" + lon + " " + lat + ")"`
    # renders a null coordinate as the literal string "null" — exact
    # parity, reproduced via coalesce to "null".
    def _s(col: str):
        return (F.coalesce(F.col(col), F.lit("null"))
                if col in df.columns else F.lit("null"))

    raw_pt = lambda lon, lat: F.concat(
        F.lit("POINT ("), _s(lon), F.lit(" "), _s(lat), F.lit(")"))
    raw_geo = lambda lon, lat: F.concat(_s(lat), F.lit(" "), _s(lon))
    total = (F.col("TOTAL_AMOUNT") if "TOTAL_AMOUNT" in df.columns
             else F.lit(None).cast("string"))

    circles = None
    if generate_extra_geometries or generate_overloaded_composite:
        cols = {"PICKUP_LONGITUDE", "PICKUP_LATITUDE",
                "DROPOFF_LONGITUDE", "DROPOFF_LATITUDE"}
        if cols <= set(df.columns):
            plon = F.col("PICKUP_LONGITUDE").try_cast("double")
            plat = F.col("PICKUP_LATITUDE").try_cast("double")
            dlon = F.col("DROPOFF_LONGITUDE").try_cast("double")
            dlat = F.col("DROPOFF_LATITUDE").try_cast("double")
            r = F.sqrt(F.pow(dlon - plon, 2) + F.pow(dlat - plat, 2)) / 2
            # min + (max - min) == max per axis (the Java verbatim)
            mlon, mlat = F.greatest(plon, dlon), F.greatest(plat, dlat)
            all_present = (plon.isNotNull() & plat.isNotNull()
                           & dlon.isNotNull() & dlat.isNotNull())
            circles = F.when(all_present, F.array(
                _circle_wkt(plon, plat, r), _circle_wkt(dlon, dlat, r),
                _circle_wkt(mlon, mlat, r))) \
                .otherwise(F.array().cast("array<string>"))

    out = (df.withColumn("PICKUP_LOCATION", pickup)
            .withColumn("DROPOFF_LOCATION", dropoff)
            .withColumn("ALL_LOCATIONS",
                        # array_distinct: HashMultimap is a SET multimap
                        # — a round trip (pickup == dropoff string) is
                        # ONE location in the reference, not two
                        F.array_distinct(
                            F.filter(F.array("PICKUP_LOCATION",
                                             "DROPOFF_LOCATION"),
                                     lambda v: v.isNotNull())))
            .withColumn("ALL_POINTS", F.array_distinct(F.array(
                raw_pt("PICKUP_LONGITUDE", "PICKUP_LATITUDE"),
                raw_pt("DROPOFF_LONGITUDE", "DROPOFF_LATITUDE"))))
            .withColumn("ALL_POINTS_GEO", F.array_distinct(F.array(
                raw_geo("PICKUP_LONGITUDE", "PICKUP_LATITUDE"),
                raw_geo("DROPOFF_LONGITUDE", "DROPOFF_LATITUDE"))))
            .withColumn("TOTAL_AMOUNT_INDEXED", total))
    if generate_extra_geometries and circles is not None:
        out = out.withColumn(
            "ALL_LOCATIONS",
            F.array_distinct(F.concat("ALL_LOCATIONS", circles)))
    if generate_overloaded_composite and circles is not None:
        # the point re-puts are set-multimap no-ops; the circles go to
        # the separate overloaded composite field
        out = out.withColumn("ALL_LOCATIONS_OVERLOADED", circles)
    return out
