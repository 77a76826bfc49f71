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


def limit_groups_to_hits(df: DataFrame, groups_col: str,
                         hit_preds: dict[str, Callable[[Column], Column]],
                         limit: int = -1) -> DataFrame:
    """Group-level hit preservation over an ``array<struct>`` grouping
    column (LimitFields.java:54 hit handling + the commonality-token
    contract pinned by TestLimitReturnedGroupsToHitTermGroups /
    HitsAreAlwaysIncludedCommonalityTokenTest): a sibling group
    containing a HIT value returns WHOLE (the hit's same-context
    companion fields ride along); non-hit groups are dropped at
    ``limit=-1`` or kept up to ``limit`` extras.  ``hit_preds`` maps
    struct member name → element predicate (a member may be scalar or
    array — the predicate receives the member column as stored)."""
    col = F.col(groups_col)

    def group_hit(g):
        p = F.lit(False)
        for fld, pred in hit_preds.items():
            p = p | F.coalesce(pred(g.getField(fld)), F.lit(False))
        return p

    hits = F.filter(col, group_hit)
    if limit >= 0:
        rest = F.filter(col, lambda g: ~F.coalesce(group_hit(g),
                                                   F.lit(False)))
        hits = F.concat(hits, F.slice(rest, 1, limit))
    return df.withColumn(groups_col, hits)
