"""Ingest-side grouped-field-name parsing.

Reference: warehouse/ingest-core/src/main/java/datawave/ingest/data/
normalizer/SimpleGroupFieldNameParser.java — DataWave encodes
nested-record siblings as FLAT field names ``FIELD.group...subgroup``
(``NAME.PERSON_1.0``); the parser splits the base field name from its
grouping context at ingest, and the ``grouping:`` query functions
re-associate values whose names share a trailing context
(GroupingRequiredFilterFunctions.getSubgroup:141 — the LAST dot
component).

Spark-first restatement: the natural landing for reference-style
multimap events is an ``array<struct<name,value>>`` column;
``group_structs`` turns it into the ``array<struct<MEMBER...>>`` sibling
representation the ``grouping:`` compilers consume (one struct per
distinct subgroup context) — entirely JVM-side higher-order column
functions, no UDF, no shuffle.  The name-level parsers are also exposed
as plain Python for metadata/loader code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "parse_group_field_name", "trim_group",
    "extract_trimmed_components", "group_structs",
]


def parse_group_field_name(full_name: str) -> tuple[str, str | None]:
    """``extractFieldNameComponents``
    (SimpleGroupFieldNameParser.java:31-50): split at the FIRST dot —
    base field name, full group context (None when ungrouped)."""
    i = full_name.find(".")
    if i < 0:
        return full_name, None
    return full_name[:i], full_name[i + 1:]


def trim_group(group: str) -> str:
    """``trimGroup`` (SimpleGroupFieldNameParser.java:168-196): remove
    numeric parent offsets that follow ``_`` within group components —
    ``PARENT_0.CHILD_1`` → ``PARENT.CHILD`` (so configurations need not
    enumerate every offset permutation).  Exact port of the char walk,
    including its edge behavior: a ``_<digits>`` run followed by ``.``
    contributes only the dot, a trailing run vanishes, and ``_`` before
    a non-digit is kept verbatim."""
    out: list[str] = []
    check = False
    start = -1
    for i, c in enumerate(group):
        if check:
            if c == ".":
                out.append(c)
                check = False
            elif c.isdigit():
                continue
            elif c == "_":
                out.append(group[start:i])
                start = i
            else:
                out.append(group[start:i + 1])
                check = False
        elif c == "_":
            check = True
            start = i
        else:
            out.append(c)
    return "".join(out)


def extract_trimmed_components(full_name: str) \
        -> tuple[str, str | None, str | None]:
    """``extractTrimmedGroupAndSubGroup``
    (SimpleGroupFieldNameParser.java:86-117): → (base field name,
    trimmed group, subgroup).  Mirrors the Java exactly: the candidate
    group is the middle components (first and last stripped); when
    trimming changes it, the trimmed group is kept and the subgroup is
    left null; otherwise a 2-part name yields only a subgroup and a
    ≥3-part name yields (splits[1], last)."""
    splits = [s for s in full_name.split(".") if s]
    base = splits[0] if splits else full_name
    group: str | None = None
    subgroup: str | None = None
    if len(splits) > 1:
        orig_group = ".".join(splits[1:-1]) if len(splits) > 2 else splits[1]
        group = trim_group(orig_group)
        if group == orig_group:
            group = None
            if len(splits) == 2:
                subgroup = splits[1]
            else:
                group = splits[1]
                subgroup = splits[-1]
    return base, group, subgroup


def _ctx(e: Column) -> Column:
    # getSubgroup parity (GroupingRequiredFilterFunctions.java:141):
    # the grouping context is the LAST dot component
    return F.substring_index(e["name"], ".", -1)


def _base(e: Column) -> Column:
    return F.upper(F.substring_index(e["name"], ".", 1))


def group_structs(df: DataFrame, fields_col: str, members: list[str],
                  out_col: str = "GROUPS") -> DataFrame:
    """Re-associate flat reference-style grouped field names into the
    ``array<struct>`` sibling representation.

    ``fields_col`` holds ``array<struct<name:string, value:string>>``
    (the flat event multimap); ``members`` names the base fields each
    sibling struct carries.  One struct is emitted per distinct
    subgroup context among the grouped names (context = last dot
    component, the grouping functions' index-0 convention); each member
    holds ALL of that context's values as an array (the reference's
    multimap can repeat a field within one subgroup, and matching is
    any-value — review r9); a member missing from a context is an
    empty array; ungrouped names (no dot) are ignored.  All steps are
    codegen'd higher-order column functions over the row's own array —
    zero shuffle, scales with the event, not the table."""
    want = [m.upper() for m in members]
    col = F.col(fields_col)
    grouped = F.filter(
        col, lambda e: e["name"].contains(".")
        & F.upper(F.substring_index(e["name"], ".", 1)).isin(*want))
    contexts = F.array_sort(F.array_distinct(F.transform(grouped, _ctx)))

    def member_vals(c: Column, m: str) -> Column:
        hits = F.filter(grouped,
                        lambda e: (_base(e) == m) & (_ctx(e) == c))
        return F.transform(hits, lambda e: e["value"].cast("string"))

    structs = F.transform(
        contexts,
        lambda c: F.struct(*[member_vals(c, m).alias(m) for m in want]))
    return df.withColumn(out_col, structs)
