"""limit.fields — cap the number of values returned per multi-valued
field.

Reference: warehouse/query-core/src/main/java/datawave/query/function/
LimitFields.java:54 — keeps hit values preferentially, then arbitrary
values up to the limit, and records an original-count field.

Spark restatement: ``slice`` on ArrayType columns + a ``{field}_count``
companion column.  Hit preservation (keeping values that matched the
query) is supported by passing the query's matched-value predicate."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def limit_fields(df: DataFrame, limits: dict[str, int],
                 hit_filters: dict[str, Callable[[Column], Column]] | None = None,
                 ) -> DataFrame:
    """Apply per-field value caps.  ``hit_filters[field]`` is an
    element-predicate whose matching values sort first (LimitFields hit
    preservation); without one the first N values are kept."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    out = df
    for fname, limit in limits.items():
        if fname not in schema or not isinstance(schema[fname], T.ArrayType):
            continue
        col = F.col(fname)
        out = out.withColumn(f"{fname}_count", F.size(col))
        if hit_filters and fname in hit_filters:
            pred = hit_filters[fname]
            hits = F.filter(col, pred)
            rest = F.filter(col, lambda v: ~pred(v))
            col = F.concat(hits, rest)
        out = out.withColumn(fname, F.slice(col, 1, limit))
    return out
