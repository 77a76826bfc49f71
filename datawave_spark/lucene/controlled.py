"""Controlled and UUID LUCENE parser variants.

Reference: warehouse/query-core/src/main/java/datawave/query/language/
parser/jexl/LuceneToJexlControlledQueryParser.java (parse-time field
allow-list + deployment-required include/exclude value clauses appended
to every query) and LuceneToJexlUUIDQueryParser.java (queries restricted
to fielded lookups on registered UUID types — the parser behind the
lookupUUID endpoint).

Both are PARSE-TIME restrictions — a query that violates them never
reaches planning — which is a different control point from the
result-side ``disallowed_fields`` projection the planner already has:
the reference deploys both (parse-time for query surfaces wired to a
restricted parser, result-side for response filtering).
"""

from __future__ import annotations

from dataclasses import dataclass

from datawave_spark.jexl.ast import (
    AndNode, CmpNode, FieldCmpNode, FuncNode, Identifier, JexlNode,
    NotNode, OrNode, RangeNode,
)
from datawave_spark.lucene.parser import LuceneParseError, parse_lucene


class ControlledQueryError(LuceneParseError):
    """Raised when a query references a field outside the allow-list or
    violates the UUID-query shape — the parse-time rejection the
    reference signals with ParseException."""


# ------------------------------------------------- controlled parser

def _strip_gran(name: str) -> str:
    return name.split("[", 1)[0]


import re as _re

_FIELD_NAME = _re.compile(r"[A-Za-z_$][A-Za-z0-9_.$]*")

# f: option functions whose EVERY argument is a field name; for all
# other functions only the leading argument is a field position (the
# layout our own Lucene parser emits — value/regex args follow).
_ALL_FIELD_ARG_FUNCS = {
    "groupby", "unique", "most_recent_unique", "sum", "min", "max",
    "average", "count", "excerpt_fields", "limit_fields", "noexpansion",
    "lenient", "strict",
}


def _referenced_fields(node: JexlNode) -> set[str]:
    """Every field identifier a query references: comparison leaves,
    field-to-field comparisons, and the FIELD positions of function
    calls (leading arg, or all args for the f: option functions) —
    value/regex arguments are never counted as fields."""
    out: set[str] = set()
    if isinstance(node, CmpNode):
        out.add(_strip_gran(node.field.name))
    elif isinstance(node, RangeNode):
        out.add(_strip_gran(node.field.name))
    elif isinstance(node, FieldCmpNode):
        out.add(_strip_gran(node.left.name))
        out.add(_strip_gran(node.right.name))
    elif isinstance(node, FuncNode):
        if node.namespace == "f" and node.name in _ALL_FIELD_ARG_FUNCS:
            cands = node.args
        else:
            cands = node.args[:1]
        for a in cands:
            if isinstance(a, Identifier):
                name = _strip_gran(a.name)
                if _FIELD_NAME.fullmatch(name):
                    out.add(name)
    elif isinstance(node, (AndNode, OrNode)):
        for t in node.terms:
            out |= _referenced_fields(t)
    elif isinstance(node, NotNode):
        out |= _referenced_fields(node.term)
    return out


def controlled_rewrite(query: str,
                       included_values: dict[str, list[str]] | None = None,
                       excluded_values: dict[str, list[str]] | None = None
                       ) -> str:
    """The reference's string rewrite (LuceneToJexlControlledQueryParser
    .parse:20-55): deployment-required value filters are appended as
    ``(query) AND ((#INCLUDE... OR ...) AND #EXCLUDE...)`` before
    parsing, so the clauses go through the ordinary #FUNC pipeline.

    Deviation from the reference's literal string build: the OR-joined
    include alternatives are PARENTHESIZED.  The reference concatenates
    ``inc1 OR inc2 AND exc`` bare, which (AND binds tighter than OR)
    parses as ``inc1 OR (inc2 AND exc)`` — any row matching the first
    include alternative bypasses every mandated exclude.  That defeats
    the restriction the class exists to enforce, so here the intent
    wins over string-level parity: every exclude applies regardless of
    which include alternative matched."""
    parts = []
    inc = [f"#INCLUDE({f}, {v})"
           for f, vs in sorted((included_values or {}).items())
           for v in vs]
    if inc:
        joined = " OR ".join(inc)
        parts.append(f"({joined})" if len(inc) > 1 else joined)
    exc = [f"#EXCLUDE({f}, {v})"
           for f, vs in sorted((excluded_values or {}).items())
           for v in vs]
    parts.extend(exc)
    if not parts:
        return query
    return f"({query}) AND ({' AND '.join(parts)})"


def parse_controlled(query: str,
                     allowed_fields: set[str] | list[str] | None = None,
                     included_values: dict[str, list[str]] | None = None,
                     excluded_values: dict[str, list[str]] | None = None
                     ) -> JexlNode:
    """Controlled LUCENE parse: apply the include/exclude rewrite, parse,
    then reject any query referencing a field outside
    ``allowed_fields`` (case-insensitive; unfielded ``_ANYFIELD_``
    terms pass, matching the reference's setAllowAnyField(true))."""
    rewritten = controlled_rewrite(query, included_values, excluded_values)
    node = parse_lucene(rewritten)
    if allowed_fields is not None:
        allow = {f.upper() for f in allowed_fields} | {"_ANYFIELD_"}
        # the rewrite's own include/exclude fields are deployment
        # config, not user input — they are implicitly allowed
        allow |= {f.upper() for f in (included_values or {})}
        allow |= {f.upper() for f in (excluded_values or {})}
        bad = sorted(f for f in _referenced_fields(node)
                     if f.upper() not in allow)
        if bad:
            raise ControlledQueryError(
                f"query references disallowed field(s) {bad}; allowed: "
                f"{sorted(allow)}")
    return node


# ------------------------------------------------------- UUID parser

@dataclass(frozen=True)
class UUIDType:
    """One registered UUID field (reference: datawave.query.data.UUIDType):
    lookup queries may only target these fields; a trailing wildcard is
    allowed from ``allow_wildcard_after`` characters on (None = no
    wildcards)."""
    field_name: str
    allow_wildcard_after: int | None = None


def _first_wildcard_index(regex: str) -> int:
    """Index (in original-selector characters) of the first wildcard in
    a regex produced by the Lucene wildcard translation: literal chars
    arrive re.escape()d, wildcards as ``.*``/``.`` — count literals
    until the first unescaped ``.``."""
    i = n = 0
    while i < len(regex):
        if regex[i] == "\\":
            i += 2
            n += 1
        elif regex[i] == ".":
            return n
        else:
            i += 1
            n += 1
    return n


def validate_uuid_query(node: JexlNode, uuid_types: list[UUIDType]) -> None:
    """LuceneToJexlUUIDQueryParser.validUUIDQuery: every leaf must be a
    fielded lookup on a registered UUID type — no ranges, no functions,
    wildcards only at/after the type's allowed position; boolean
    structure recurses."""
    types = {u.field_name.upper(): u for u in uuid_types}
    if isinstance(node, (AndNode, OrNode)):
        for t in node.terms:
            validate_uuid_query(t, uuid_types)
        return
    if isinstance(node, NotNode):
        validate_uuid_query(node.term, uuid_types)
        return
    if isinstance(node, CmpNode):
        u = types.get(node.field.name.upper())
        if u is None:
            raise ControlledQueryError(
                f"field {node.field.name!r} is not a registered UUID type")
        if node.op == "==":
            return
        if node.op == "=~":
            first = _first_wildcard_index(str(node.value.value))
            if u.allow_wildcard_after is None \
                    or first < u.allow_wildcard_after:
                raise ControlledQueryError(
                    f"wildcard at position {first} not allowed for UUID "
                    f"field {u.field_name!r} "
                    f"(allowed after {u.allow_wildcard_after})")
            return
        raise ControlledQueryError(
            f"operator {node.op!r} not supported in UUID queries "
            f"(ranges/inequalities are not UUID lookups)")
    raise ControlledQueryError(
        f"node {type(node).__name__} not supported in UUID queries")


def parse_uuid_query(query: str, uuid_types: list[UUIDType]) -> JexlNode:
    """UUID-restricted LUCENE parse (LuceneToJexlUUIDQueryParser.parse):
    smart quotes normalize to ASCII quotes, the query parses normally,
    and the shape validates against the registered UUID types before it
    may plan."""
    query = query.replace("\u0093", '"').replace("\u0094", '"')
    node = parse_lucene(query)
    validate_uuid_query(node, uuid_types)
    return node
