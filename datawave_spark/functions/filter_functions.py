"""``filter:`` namespace — evaluation-phase predicate functions.

Reference: warehouse/query-core/src/main/java/datawave/query/jexl/
functions/EvaluationPhaseFilterFunctions.java (line numbers cited per
function).  In DataWave these run in the per-document JEXL interpreter
after index intersection; here they are ordinary Column expressions that
Catalyst can push down and codegen.

All functions are total predicates (NULL-safe) with ANY-value semantics
over multi-valued fields, matching the reference's behavior of iterating
a field's value set.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from datawave_spark.compiler.columns import (
    CompileContext, field_pred, field_values, register_function,
)
from datawave_spark.jexl.ast import Identifier, JexlNode, Literal


def _ident(arg: JexlNode) -> str:
    if isinstance(arg, Identifier):
        return arg.name
    raise ValueError(f"expected field identifier, got {arg}")


def _lit(arg: JexlNode):
    if isinstance(arg, Literal):
        return arg.value
    if isinstance(arg, Identifier):  # bare word treated as string literal
        return arg.name
    raise ValueError(f"expected literal, got {arg}")


@register_function("filter", "isNull")
def f_is_null(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.isNull:164 — field absent/empty."""
    return F.size(field_values(ctx, _ident(args[0]))) == 0


@register_function("filter", "isNotNull")
def f_is_not_null(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.isNotNull:142."""
    return F.size(field_values(ctx, _ident(args[0]))) > 0


def _anchored(pattern: str) -> str:
    # Reference regex filters use Matcher.matches() (full match) OR
    # Matcher.find() depending on function; includeRegex uses full-value
    # match semantics against normalized and raw values.
    return "^(?:" + pattern + ")$"


@register_function("filter", "includeRegex")
def f_include_regex(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.includeRegex:263 — any value of
    FIELD fully matches the pattern."""
    pattern = _anchored(str(_lit(args[1])))
    return field_pred(ctx, _ident(args[0]),
                      lambda v: v.cast("string").rlike(pattern))


@register_function("filter", "excludeRegex")
def f_exclude_regex(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.excludeRegex:180 — no value
    matches."""
    return ~f_include_regex(ctx, args)


@register_function("filter", "occurrence")
def f_occurrence(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.occurrence:58 — compare the number
    of values of FIELD: ``filter:occurrence(FIELD, '>', 2)``.
    Two-arg form means ``== count``."""
    fname = _ident(args[0])
    if len(args) == 2:
        op, count = "==", int(_lit(args[1]))
    else:
        op, count = str(_lit(args[1])), int(_lit(args[2]))
    n = F.size(field_values(ctx, fname))
    return {"==": n == count, "=": n == count, "!=": n != count,
            "<": n < count, ">": n > count,
            "<=": n <= count, ">=": n >= count}[op]


@register_function("filter", "matchesAtLeastCountOf")
def f_matches_at_least(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.matchesAtLeastCountOf:223 —
    ``(count, FIELD, v1, v2, ...)``: at least ``count`` of the listed
    values appear among FIELD's values (case-insensitive, as the
    reference compares normalized values)."""
    count = int(_lit(args[0]))
    fname = _ident(args[1])
    wanted = [str(_lit(a)).lower() for a in args[2:]]
    vals = F.transform(field_values(ctx, fname),
                       lambda v: F.lower(v.cast("string")))
    hits = F.size(F.array_intersect(vals, F.array(*[F.lit(w) for w in wanted])))
    return hits >= count


def _ts(col: Column, pattern: str | None) -> Column:
    # try_to_timestamp everywhere: an unparseable stored value fails the
    # comparison instead of failing the query (the reference's evaluator
    # likewise treats bad values as non-matching).
    if pattern:
        return F.try_to_timestamp(col.cast("string"),
                                  F.lit(_java_to_spark_fmt(pattern)))
    return F.coalesce(
        col.cast("timestamp"),
        F.try_to_timestamp(col.cast("string")),
        F.try_to_timestamp(col.cast("string"), F.lit("yyyyMMdd")),
    )


def _java_to_spark_fmt(pattern: str) -> str:
    # SimpleDateFormat and Spark's datetime pattern dialects agree on the
    # subset DataWave queries use (yyyyMMdd etc.).
    return pattern


def _date_lit(value, pattern: str | None) -> Column:
    c = F.lit(str(value))
    if pattern:
        return F.to_timestamp(c, _java_to_spark_fmt(pattern))
    return F.coalesce(F.to_timestamp(c), F.to_timestamp(c, "yyyyMMdd"))


def _date_cmp(ctx: CompileContext, args, cmp):
    """Shared body for afterDate:770 / beforeDate:949 — optional
    SimpleDateFormat pattern args (field pattern, literal pattern)."""
    fname = _ident(args[0])
    rest = [(_lit(a)) for a in args[1:]]
    if len(rest) == 1:
        value, fpat, lpat = rest[0], None, None
    elif len(rest) == 2:
        value, fpat, lpat = rest[0], None, str(rest[1])
    else:
        value, fpat, lpat = rest[1], str(rest[0]), str(rest[2])
    lit = _date_lit(value, lpat)
    return field_pred(ctx, fname, lambda v: cmp(_ts(v, fpat), lit))


@register_function("filter", "afterDate")
def f_after_date(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.afterDate:770."""
    return _date_cmp(ctx, args, lambda c, lit: c > lit)


@register_function("filter", "beforeDate")
def f_before_date(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.beforeDate:949."""
    return _date_cmp(ctx, args, lambda c, lit: c < lit)


@register_function("filter", "betweenDates")
def f_between_dates(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.betweenDates:1127 —
    ``(FIELD, start, end[, pattern])``; bounds inclusive."""
    fname = _ident(args[0])
    rest = [_lit(a) for a in args[1:]]
    if len(rest) == 2:
        start, end, pat = rest[0], rest[1], None
    else:
        start, end, pat = rest[0], rest[1], str(rest[2])
    lo, hi = _date_lit(start, pat), _date_lit(end, pat)
    return field_pred(ctx, fname,
                      lambda v: (_ts(v, pat) >= lo) & (_ts(v, pat) <= hi))


# Load-date variants: the reference tracks LOAD_DATE as a real field on
# every event (afterLoadDate:417, beforeLoadDate:532, betweenLoadDates:646)
# — identical logic against the LOAD_DATE field.
@register_function("filter", "afterLoadDate")
def f_after_load_date(ctx: CompileContext, args):
    return _date_cmp(ctx, (Identifier("LOAD_DATE"), *args), lambda c, lit: c > lit) \
        if not isinstance(args[0], Identifier) else _date_cmp(ctx, args, lambda c, lit: c > lit)


@register_function("filter", "beforeLoadDate")
def f_before_load_date(ctx: CompileContext, args):
    return _date_cmp(ctx, (Identifier("LOAD_DATE"), *args), lambda c, lit: c < lit) \
        if not isinstance(args[0], Identifier) else _date_cmp(ctx, args, lambda c, lit: c < lit)


@register_function("filter", "betweenLoadDates")
def f_between_load_dates(ctx: CompileContext, args):
    if not isinstance(args[0], Identifier):
        args = (Identifier("LOAD_DATE"), *args)
    return f_between_dates(ctx, args)


@register_function("filter", "getAllMatches")
def f_get_all_matches(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getAllMatches:343 — the reference
    returns the set of values matching a regex (used for hit
    collection); as a predicate term it is true when any value matches,
    i.e. includeRegex."""
    return f_include_regex(ctx, args)


@register_function("filter", "timeFunction")
def f_time_function(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.timeFunction:1431 —
    ``(FIELD1, FIELD2, operator, equality, goal)``: compare the time
    difference of two date fields against a goal in millis, e.g.
    ``filter:timeFunction(DEATH, BIRTH, '-', '>', 86400000)``."""
    f1, f2 = _ident(args[0]), _ident(args[1])
    operator = str(_lit(args[2]))
    equality = str(_lit(args[3]))
    goal = int(_lit(args[4]))
    assert operator == "-", f"only '-' supported (reference too): {operator}"
    spec1, spec2 = ctx.resolve(f1), ctx.resolve(f2)
    if spec1 is None or spec2 is None:
        return F.lit(False)
    delta = (_ts(F.col(spec1.column), None).cast("double")
             - _ts(F.col(spec2.column), None).cast("double")) * 1000.0
    cmp = {">": delta > goal, "<": delta < goal, ">=": delta >= goal,
           "<=": delta <= goal, "==": delta == goal, "=": delta == goal,
           "!=": delta != goal}[equality]
    return F.coalesce(cmp, F.lit(False))


@register_function("filter", "getMaxTime")
def f_get_max_time(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMaxTime:1447 — max epoch-millis
    over the field's values."""
    vals = field_values(ctx, _ident(args[0]))
    return F.array_max(F.transform(
        vals, lambda v: (_ts(v, None).cast("double") * 1000).cast("long")))


@register_function("filter", "getMinTime")
def f_get_min_time(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMinTime:1465."""
    vals = field_values(ctx, _ident(args[0]))
    return F.array_min(F.transform(
        vals, lambda v: (_ts(v, None).cast("double") * 1000).cast("long")))


@register_function("filter", "getMaxValue")
def f_get_max_value(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMaxValue:1481 — returns a value
    (used inside comparisons in the reference).  As a standalone term we
    expose the max over the field's values; comparisons against it are
    expressed via f:between etc."""
    return F.array_max(field_values(ctx, _ident(args[0])))


@register_function("filter", "getMinValue")
def f_get_min_value(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMinValue:1502."""
    return F.array_min(field_values(ctx, _ident(args[0])))
