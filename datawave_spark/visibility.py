"""ColumnVisibility label model.

Reference: every Accumulo key carries a ColumnVisibility boolean
expression (``A&B|(C&D)``); query-side, results are filtered by the
user's authorizations and labels are translated to response "markings"
(Document.java:72-78; masked-field variant
ShardedDataTypeHandler.createMaskedShardEventColumn:969).

Spark restatement: a ``visibility`` string column + this evaluator.
The label VOCABULARY is tiny (config-driven at ingest) even when the
data is 100 TB, so the scalable filter is: collect the distinct labels
(bounded), evaluate each against the user's auths driver-side, and
push an ``isin(allowed)`` predicate — which Catalyst turns into a
parquet-pushed filter — rather than evaluating boolean expressions
per row.

This reproduces the security *model* (which rows a user sees); it is
not a security *boundary* — Spark has no tserver-side enforcement.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, functions as F


class VisibilityParseError(ValueError):
    pass


# unquoted label charset per Accumulo's ColumnVisibility (alphanumeric
# plus _ - : . /); anything else must be quoted, where \" and \\
# escape (visibility-referee r8: '/' was missing, so a stored
# 'org/team' label failed to parse and fail-closed DROPPED the row
# where Accumulo evaluates it)
_TOK = re.compile(
    r"\s*(?:(?P<op>[&|()])|(?P<label>[A-Za-z0-9_.:/-]+|\"(?:\\.|[^\"\\])*\"))")


def _tokens(expr: str):
    pos = 0
    while pos < len(expr):
        m = _TOK.match(expr, pos)
        if not m:
            raise VisibilityParseError(f"bad visibility at {pos}: {expr!r}")
        pos = m.end()
        yield m.group("op") or m.group("label")
    yield None


def evaluate(expr: str | None, auths: set[str]) -> bool:
    """Evaluate a ColumnVisibility expression against an auth set.

    Accumulo's parser REJECTS mixed ``&`` and ``|`` at the same
    parenthesis level (there is no precedence to invent): a label like
    ``A&B|C`` is a parse error, because silently choosing ``(A&B)|C``
    would grant visibility to users holding only C — broader than the
    label author intended.  Parentheses group; empty/None visibility is
    visible to everyone."""
    if expr is None or expr.strip() == "":
        return True
    toks = list(_tokens(expr))
    pos = 0

    def peek():
        return toks[pos]

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_expr() -> bool:
        v = parse_atom()
        op = None
        while peek() in ("&", "|"):
            t = take()
            if op is None:
                op = t
            elif t != op:
                raise VisibilityParseError(
                    f"mixed '&' and '|' without parentheses in {expr!r}")
            nxt = parse_atom()
            v = (v and nxt) if op == "&" else (v or nxt)
        return v

    def parse_atom() -> bool:
        t = take()
        if t == "(":
            v = parse_expr()
            if take() != ")":
                raise VisibilityParseError(f"unbalanced parens in {expr!r}")
            return v
        if t in ("&", "|", ")", None):
            raise VisibilityParseError(f"unexpected {t!r} in {expr!r}")
        if t.startswith('"'):
            # unescape \" and \\ inside the quoted term (Accumulo's
            # quoted-term escape rules)
            label = re.sub(r'\\(["\\])', r"\1", t[1:-1])
        else:
            label = t
        return label in auths

    result = parse_expr()
    if peek() is not None:
        raise VisibilityParseError(f"trailing tokens in {expr!r}")
    return result


def _evaluate_fail_closed(expr: str, auths: set[str]) -> bool:
    """A stored label that does not parse (e.g. mixed &/| written
    without parens) grants NOTHING — fail closed, mirroring Accumulo
    where such a label could never have been ingested."""
    try:
        return evaluate(expr, auths)
    except VisibilityParseError:
        return False


#: Largest distinct-visibility vocabulary the driver will pull.  Label
#: vocabularies are config-bounded in a sane deployment (combinations
#: of a few dozen auth labels), so the fast path almost always wins;
#: the cap exists so a hostile/corrupt corpus with a data-sized
#: visibility column cannot OOM the driver.
VIS_DISTINCT_CAP = 10_000


def filter_by_auths(df: DataFrame, auths: Iterable[str],
                    vis_col: str = "visibility",
                    distinct_cap: int = VIS_DISTINCT_CAP) -> DataFrame:
    """Row-filter a frame by user authorizations.

    Fast path: distinct labels are collected (bounded probe: at most
    ``distinct_cap + 1`` rows leave the cluster) and the verdict pushed
    down as an ``isin`` predicate — pure JVM, parquet-pushable.

    If the vocabulary exceeds the cap, the filter degrades to an
    Arrow-batched pandas UDF that evaluates each batch's (few) distinct
    expressions with memoization — still correct on an unbounded
    column, never a driver-sized collect and never fail-closed-drop-
    everything."""
    auth_set = set(auths)
    if vis_col not in df.columns:
        return df
    distinct = [r[0] for r in
                df.select(vis_col).distinct().limit(distinct_cap + 1)
                .collect()]
    if len(distinct) <= distinct_cap:
        allowed = [v for v in distinct
                   if v is not None and _evaluate_fail_closed(v, auth_set)]
        pred = F.col(vis_col).isNull() | (F.col(vis_col) == "")
        if allowed:
            pred = pred | F.col(vis_col).isin(allowed)
        return df.filter(pred)

    import pandas  # noqa: F401 — resolves the UDF's type hints
    from pyspark.sql.functions import pandas_udf

    def _visible(vs: "pandas.Series") -> "pandas.Series":
        memo: dict[str, bool] = {}

        def ev(v):
            if v is None or v == "":
                return True
            got = memo.get(v)
            if got is None:
                got = memo[v] = _evaluate_fail_closed(v, auth_set)
            return got

        return vs.map(ev)

    _visible.__annotations__ = {"vs": pandas.Series,
                                "return": pandas.Series}
    visible = pandas_udf(_visible, "boolean")
    return df.filter(visible(F.col(vis_col)))


def mask_fields(df: DataFrame, field_visibility: dict[str, str],
                auths: Iterable[str], mask_value: str = "***") -> DataFrame:
    """Field-level masking (createMaskedShardEventColumn parity): a
    field whose declared visibility the user lacks is replaced by the
    mask value instead of dropping the row."""
    auth_set = set(auths)
    out = df
    for fname, vis in field_visibility.items():
        if fname in out.columns and not _evaluate_fail_closed(vis, auth_set):
            out = out.withColumn(fname, F.lit(mask_value))
    return out


def combined_visibility(vis_col: str = "visibility") -> Column:
    """Aggregation expression for the marking of an AGGREGATED row —
    GroupingUtils.combineVisibilities (query/common/grouping/
    GroupingUtils.java:45) / MarkingFunctions.combine parity: a group's
    visibility is the CONJUNCTION of its members' distinct labels, so
    a user may see the aggregate only if they could see every
    contributing row.  Members are deduped and sorted (stable across
    partitionings); a member containing a disjunction is parenthesized
    before joining with ``&`` (Accumulo's ColumnVisibility quoting
    rule).  Use inside ``groupBy().agg(...)``."""
    distinct = F.array_sort(F.collect_set(F.col(vis_col)))
    wrapped = F.transform(
        distinct,
        lambda v: F.when(v.contains("|"),
                         F.concat(F.lit("("), v, F.lit(")"))).otherwise(v))
    return F.concat_ws("&", wrapped)
