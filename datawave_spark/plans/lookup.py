"""Lookup-UUID / content retrieval (SURVEY §3.2).

Reference: ``GET /Query/lookupUUID/{type}/{uuid}``
(web-services/query/.../QueryExecutorBean.java:1605) resolves a unique
field value to its event, and ContentQueryLogic
(query/tables/content/ContentQueryLogic.java:56) fetches the raw stored
document (the ``d`` column family) by document id.

Spark restatement: a point lookup is a filter on a (usually unique)
field — on a table Z-ORDERed/sorted by that field the scan prunes to a
few row groups; the "content" is just the stored payload column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lookup_uuid(df: DataFrame, field: str, value, *,
                first_only: bool = True) -> DataFrame:
    """Point lookup by unique-field value (lookupUUID)."""
    out = df.filter(F.col(field) == F.lit(value))
    return out.limit(1) if first_only else out


def fetch_content(df: DataFrame, id_col: str, ids: list,
                  content_col: str) -> DataFrame:
    """ContentQueryLogic: raw stored content for document ids."""
    return (df.filter(F.col(id_col).isin(ids))
            .select(id_col, content_col))
