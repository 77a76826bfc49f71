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


# ---- value-level hit terms (HitListArithmetic's actual output shape)

_HIT_FUNCS = {("filter", "includeRegex"), ("filter", "getAllMatches"),
              ("f", "matchRegex")}


def _leaf_value_hits(ctx: CompileContext, leaf: JexlNode):
    """→ list of array<string> Columns of 'FIELD.i:value' hit strings
    for one positive leaf (HitListArithmetic.java:21 records the
    (field-instance, value) pairs that satisfied the comparison; the
    instance index is the grouping-context position —
    IfThisTestFailsThenHitTermsAreBroken pins 'NAME.2:Haiqu').  Only
    value comparisons and the regex include functions contribute;
    occurrence/isNull-style assertions hit no values."""
    from pyspark.sql import types as T
    from datawave_spark.compiler.columns import (
        _element_type, _expand_field_arg, _scalar_cmp, _typed_literal,
        fold_query_pattern, java_full_match, raw_match_string)
    from datawave_spark.jexl.ast import Identifier, Literal
    from datawave_spark.normalizers import get_normalizer

    if isinstance(leaf, CmpNode) and isinstance(leaf.value, Literal) \
            and leaf.op in ("==", "=~", "<", ">", "<=", ">="):
        fname, op, value = leaf.field.name, leaf.op, leaf.value.value
    elif isinstance(leaf, FuncNode) \
            and (leaf.namespace, leaf.name) in _HIT_FUNCS \
            and len(leaf.args) >= 2 \
            and isinstance(leaf.args[0], Identifier):
        a1 = leaf.args[1]
        fname, op = leaf.args[0].name, "=~"
        value = a1.value if isinstance(a1, Literal) else a1.name
    else:
        return []
    if value is None:
        return []

    out = []
    for member in _expand_field_arg(ctx, fname):
        spec = ctx.resolve(member)
        if spec is None:
            continue
        dtype = ctx.spark_type(spec)
        elem_type = _element_type(dtype)
        norm = get_normalizer(spec.normalizer)
        if op == "=~":
            pattern = java_full_match(fold_query_pattern(value, norm))

            def pred(v, _n=norm, _s=spec, _e=elem_type, _p=pattern):
                vv = v if _s.normalized_at_rest else _n.col(v)
                return raw_match_string(vv, _e).rlike(_p)
        else:
            try:
                lit = _typed_literal(value, norm, elem_type)
            except (ValueError, TypeError):
                continue

            def pred(v, _n=norm, _s=spec, _e=elem_type, _l=lit):
                return _scalar_cmp(op, v, _l, _e, _n,
                                   _s.normalized_at_rest)

        def render(v, i, _m=member, _e=elem_type):
            return F.concat(F.lit(f"{_m}."), i.cast("string"),
                            F.lit(":"), raw_match_string(v, _e))

        col = F.col(spec.column)
        if isinstance(dtype, T.ArrayType):
            hits = F.filter(
                F.zip_with(col,
                           F.sequence(F.lit(0), F.size(col) - 1),
                           lambda v, i: F.when(
                               F.coalesce(pred(v), F.lit(False)),
                               render(v, i))),
                lambda s: s.isNotNull())
        else:
            hits = F.when(
                col.isNotNull() & F.coalesce(pred(col), F.lit(False)),
                F.array(render(col, F.lit(0)))).otherwise(F.array())
        out.append(F.coalesce(hits, F.array()))
    return out


def with_value_hit_terms(df: DataFrame, query, *,
                         field_types: dict[str, str] | None = None,
                         model: dict[str, list[str]] | None = None,
                         hit_col: str = "HIT_TERM") -> DataFrame:
    """Filter by the query AND attach the reference-shaped HIT_TERM:
    array of 'FIELD.instance:value' strings for every value that
    satisfied a positive leaf (HitListArithmetic.java:21; per-instance
    shape pinned by IfThisTestFailsThenHitTermsAreBroken.java:104)."""
    from datawave_spark.jexl.parser import parse
    import datawave_spark.functions  # noqa: F401
    node = parse(query) if isinstance(query, str) else query
    ctx = CompileContext.for_dataframe(df, field_types=field_types,
                                       model=model)
    filtered = df.filter(compile_node(node, ctx))
    hit_arrays = []
    for leaf in _leaves(node):
        hit_arrays.extend(_leaf_value_hits(ctx, leaf))
    if not hit_arrays:
        return filtered.withColumn(hit_col,
                                   F.array().cast("array<string>"))
    allhits = hit_arrays[0]
    for h in hit_arrays[1:]:
        allhits = F.concat(allhits, h)
    return filtered.withColumn(hit_col, F.array_distinct(allhits))
