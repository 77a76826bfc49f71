"""HIT_TERM — annotate each result with which query terms matched.

Reference: warehouse/query-core/src/main/java/datawave/query/jexl/
HitListArithmetic.java:21 — a JEXL arithmetic that records every
(field, value) comparison that evaluated true, surfaced to the user as
the HIT_TERM pseudo-field.

Spark restatement: each leaf comparison is compiled INDIVIDUALLY (the
same compile path the fused predicate uses) into a boolean, and
HIT_TERM is the array of leaf strings whose boolean is true.  Per-term
evaluation cannot short-circuit like the fused predicate, but all leaves
evaluate in one projection over rows that already matched — the
expensive part (the filter) ran fused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datawave_spark.compiler.columns import CompileContext, compile_node
from datawave_spark.jexl.ast import (
    AndNode, CmpNode, FieldCmpNode, FuncNode, JexlNode, NotNode, OrNode,
)


def _leaves(node: JexlNode) -> list[JexlNode]:
    if isinstance(node, (CmpNode, FieldCmpNode, FuncNode)):
        return [node]
    if isinstance(node, (AndNode, OrNode)):
        out = []
        for t in node.terms:
            out.extend(_leaves(t))
        return out
    if isinstance(node, NotNode):
        # negated branches contribute no positive hits (reference hit
        # lists record satisfied positive comparisons)
        return []
    return []


def with_hit_terms(df: DataFrame, query, *,
                   field_types: dict[str, str] | None = None,
                   model: dict[str, list[str]] | None = None,
                   hit_col: str = "HIT_TERM") -> DataFrame:
    """Filter by the query AND attach ``hit_col``: array of the leaf
    term strings (``FIELD op value``) that individually matched."""
    from datawave_spark.jexl.parser import parse
    import datawave_spark.functions  # noqa: F401
    node = parse(query) if isinstance(query, str) else query
    ctx = CompileContext.for_dataframe(df, field_types=field_types,
                                       model=model)
    filtered = df.filter(compile_node(node, ctx))
    hits = [F.when(F.coalesce(compile_node(leaf, ctx), F.lit(False)),
                   F.lit(str(leaf))).otherwise(F.lit(None))
            for leaf in _leaves(node)]
    if not hits:
        return filtered.withColumn(hit_col, F.array().cast("array<string>"))
    return filtered.withColumn(
        hit_col, F.filter(F.array(*hits), lambda v: v.isNotNull()))
