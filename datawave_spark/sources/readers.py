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
                     schema: T.StructType | str | None = None) -> DataFrame:
    """JSON with nested-struct flattening to JEXL-addressable fields."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return flatten_structs(reader.json(path))


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
