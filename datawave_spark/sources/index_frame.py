"""Derived index frame — the global-index / field-index parity layer.

Reference: DataWave's planner walks a *global inverted index*
(``shardIndex``: normValue → field → shard/uid lists, SURVEY §1.1) to
turn each indexed term into candidate (shard, uid) ranges —
RangeStream (query/index/lookup/RangeStream.java:106) with
Intersection/Union stream merging (:377,425) over Uid.List protobufs
(IndexInfo.java:48).

On Spark, Catalyst's pushdown makes an index unnecessary for scans —
but the index FRAME itself powers parity features that want
(field, value) → documents without touching events: discovery,
ANYFIELD expansion against observed values, and index-intersection
candidate generation.  This module materializes it as an ordinary
DataFrame:

    (field, value, uid, event_date)   one row per field VALUE per event

and implements RangeStream over it: AND = inner join on uid (the
sort-merge index intersection of AndIterator.java:34), OR = union +
distinct (OrIterator.java:28), NOT = anti join against the universe
(NegationFilter).  At 100 TB the index frame is written bucketed by
``value`` so term lookups prune, exactly as the reference's
index-organized table does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datawave_spark.jexl.ast import (
    AndNode, CmpNode, JexlNode, NotNode, OrNode,
)
from datawave_spark.normalizers import get_normalizer


def build_reverse_index(index: DataFrame) -> DataFrame:
    """Reversed-value index (shardReverseIndex parity, SURVEY §1.1):
    leading-wildcard terms (``FIELD =~ '.*suffix'``) become PREFIX
    lookups on the reversed value — pushdown-able StartsWith instead of
    a full regex scan."""
    return index.withColumn("value", F.reverse(F.col("value")))


def suffix_uids(reverse_index: DataFrame, field: str, suffix: str) -> DataFrame:
    """Candidate uids for a trailing-wildcard term via the reverse
    index: value ends with ``suffix`` ⇔ reversed value starts with
    reversed suffix."""
    rev = suffix[::-1]
    return (reverse_index
            .filter((F.col("field") == field.upper())
                    & F.col("value").startswith(rev))
            .select("uid").distinct())


def build_index(events: DataFrame, fields: list[str], id_col: str,
                date_col: str | None = None,
                field_types: dict[str, str] | None = None) -> DataFrame:
    """Materialize the inverted-index frame for the given fields.
    Multi-valued (array) fields fan out one entry per value; values are
    stored normalized (the index stores normValue in the reference)."""
    ft = {k.upper(): v for k, v in (field_types or {}).items()}
    parts = []
    dtypes = dict(events.dtypes)
    for f in fields:
        norm = get_normalizer(ft.get(f.upper(), "noop"))
        date_expr = (F.to_date(F.col(date_col)) if date_col
                     else F.lit(None).cast("date"))
        if dtypes.get(f, "").startswith("array"):
            # explode must sit at the top level of a projection
            base = events.select(F.explode(F.col(f)).alias("__v"),
                                 F.col(id_col).alias("__id"),
                                 date_expr.alias("event_date"))
        else:
            base = events.select(F.col(f).alias("__v"),
                                 F.col(id_col).alias("__id"),
                                 date_expr.alias("event_date"))
        sel = base.select(
            F.lit(f.upper()).alias("field"),
            norm.col(F.col("__v").cast("string")).alias("value"),
            F.col("__id").cast("string").alias("uid"),
            "event_date",
        ).filter(F.col("value").isNotNull())
        parts.append(sel)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _term_uids(index: DataFrame, node: CmpNode,
               field_types: dict[str, str] | None) -> DataFrame:
    ft = {k.upper(): v for k, v in (field_types or {}).items()}
    norm = get_normalizer(ft.get(node.field.name.upper(), "noop"))
    value = node.value.value
    v = F.col("value")
    if node.op == "==":
        lit = norm.normalize_literal(value)
        if isinstance(lit, (int, float)) and not isinstance(lit, bool):
            # index values are stringified; numeric terms compare
            # numerically ("25" must match stored "25.0")
            pred = v.cast("double") == float(lit)
        else:
            pred = v == str(lit)
    elif node.op == "=~":
        pred = v.rlike("^(?:" + str(value) + ")$")
    elif node.op in ("<", ">", "<=", ">="):
        lit = norm.normalize_literal(value)
        cmp_col = v.cast("double") if isinstance(lit, (int, float)) else v
        lit_c = F.lit(lit)
        pred = {"<": cmp_col < lit_c, ">": cmp_col > lit_c,
                "<=": cmp_col <= lit_c, ">=": cmp_col >= lit_c}[node.op]
    else:
        raise ValueError(f"index lookup cannot serve op {node.op!r}")
    return (index.filter((F.col("field") == node.field.name.upper()) & pred)
            .select("uid").distinct())


def candidate_uids(index: DataFrame, node: JexlNode,
                   universe: DataFrame | None = None,
                   field_types: dict[str, str] | None = None) -> DataFrame:
    """RangeStream: AST → candidate uid frame.

    AND → inner join (index intersection), OR → union+distinct (index
    union), NOT → anti join vs the uid universe (context-required
    branch — the reference marks these _Delayed_ and evaluates lazily;
    with a universe frame we can resolve them in-plan).
    """
    if isinstance(node, CmpNode):
        if node.op in ("!=", "!~"):
            pos = CmpNode("==" if node.op == "!=" else "=~",
                          node.field, node.value)
            return candidate_uids(index, NotNode(pos), universe, field_types)
        return _term_uids(index, node, field_types)
    if isinstance(node, AndNode):
        out = None
        for t in node.terms:
            uids = candidate_uids(index, t, universe, field_types)
            out = uids if out is None else out.join(uids, "uid", "inner")
        return out
    if isinstance(node, OrNode):
        out = None
        for t in node.terms:
            uids = candidate_uids(index, t, universe, field_types)
            out = uids if out is None else out.union(uids)
        return out.distinct()
    if isinstance(node, NotNode):
        if universe is None:
            raise ValueError(
                "negation needs a uid universe (context-required branch)")
        pos = candidate_uids(index, node.term, universe, field_types)
        return universe.select("uid").distinct().join(pos, "uid", "left_anti")
    raise TypeError(f"index lookup cannot serve node {node!r}")


def index_query(events: DataFrame, index: DataFrame, jexl: str,
                id_col: str,
                field_types: dict[str, str] | None = None) -> DataFrame:
    """Full index-driven query: candidate uids from the index frame,
    then fetch + (re)evaluate against the events — the two-phase
    index-then-evaluate shape of QueryIterator, as one Catalyst plan."""
    from datawave_spark.jexl.parser import parse
    node = parse(jexl)
    universe = events.select(F.col(id_col).cast("string").alias("uid"))
    cands = candidate_uids(index, node, universe, field_types)
    return events.join(
        cands, events[id_col].cast("string") == cands["uid"], "left_semi")
