"""Event data decoration — template columns derived from result fields.

Reference: warehouse/query-core/src/main/java/datawave/query/
transformer/EventQueryDataDecorator.java:10 (+
EventQueryDataDecoratorTransformer.java): a configured destination
field gets its value built by substituting a source field's value into
a pattern string (``@field_value@`` placeholder) — the deployment hook
that turns raw IDs into portal links / content-fetch URLs on the
response page.  Pattern entries are tried in configuration order and
the FIRST source field with a value in that document wins
(decorateData's break); when the destination field already has values
they are overwritten, otherwise the field is added.

Spark restatement: a single when-chain projection (coalesce semantics
over the configured sources) — zero shuffle, whole-stage codegen'd,
applied AFTER the query like the reference's transformer stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PLACEHOLDER = "@field_value@"


def decorate_events(df: DataFrame, field_name: str,
                    pattern_map: dict[str, str]) -> DataFrame:
    """Add/overwrite ``field_name`` with the first configured source
    field's pattern substitution; rows where no source has a value keep
    the existing destination value (or NULL when the field is new)."""
    if not pattern_map:
        raise ValueError("decorate_events needs at least one pattern")
    missing = [s for s in pattern_map if s not in df.columns]
    if missing:
        raise ValueError(f"decorator source fields not in result: {missing}")
    chain = None
    for src, pattern in pattern_map.items():
        val = F.replace(F.lit(pattern), F.lit(PLACEHOLDER),
                        F.col(src).cast("string"))
        cond = F.col(src).isNotNull()
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    fallback = (F.col(field_name).cast("string")
                if field_name in df.columns else F.lit(None).cast("string"))
    return df.withColumn(field_name, chain.otherwise(fallback))
