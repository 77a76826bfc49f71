"""``f:`` namespace — QueryFunctions.

Reference: warehouse/query-core/src/main/java/datawave/query/jexl/
functions/QueryFunctions.java — ``length:55``, ``between:81-183``,
``matchRegex:199``, ``includeText:219``.  The *options* half of the
``f:`` namespace (f:groupby, f:unique, f:sum, ... — recognized by
QueryOptionsFromQueryVisitor.java:58-64) does not evaluate per row; it is
extracted from the AST before compilation by
``datawave_spark.compiler.options.extract_options``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datawave_spark.compiler.columns import (
    CompileContext, field_pred, java_full_match, register_function,
)
from datawave_spark.functions.filter_functions import _ident, _lit


def _bool_arg(a) -> bool:
    v = _lit(a)
    if isinstance(v, bool):
        return v
    return str(v).lower() == "true"


@register_function("f", "between")
def f_between(ctx: CompileContext, args):
    """QueryFunctions.between:81-183 (string/float/long overloads) —
    3-arg form is inclusive both sides; the 5-arg form
    ``(FIELD, left, leftInclusive, right, rightInclusive)`` carries
    explicit inclusivity booleans.  ANY-value semantics.  Numeric
    bounds compare as double (the Java narrows to FLOAT — a 32-bit
    precision loss on large longs we deliberately do not reproduce)."""
    fname = _ident(args[0])
    if len(args) == 5:
        lo, hi = _lit(args[1]), _lit(args[3])
        lo_inc, hi_inc = _bool_arg(args[2]), _bool_arg(args[4])
    elif len(args) == 3:
        lo, hi = _lit(args[1]), _lit(args[2])
        lo_inc = hi_inc = True
    else:
        # the Java has exactly the 3- and 5-arg overloads; silently
        # dropping extras would mis-evaluate a mistyped query
        raise ValueError(
            f"f:between takes (FIELD, lo, hi) or (FIELD, lo, loInc, "
            f"hi, hiInc); got {len(args)} args")

    def _is_num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    numeric = _is_num(lo)
    if numeric != _is_num(hi):
        raise ValueError(
            f"f:between bounds must both be numeric or both strings: "
            f"({lo!r}, {hi!r})")

    def bound(v):
        if numeric:
            # try_cast: an unparseable stored value is a non-match,
            # not an ANSI whole-scan abort (r8 sweep)
            c, l, h = v.try_cast("double"), float(lo), float(hi)
        else:
            c, l, h = v.cast("string"), str(lo), str(hi)
        left = (c >= l) if lo_inc else (c > l)
        right = (c <= h) if hi_inc else (c < h)
        return left & right

    return field_pred(ctx, fname, bound)


@register_function("f", "length")
def f_length(ctx: CompileContext, args):
    """QueryFunctions.length:55 — value string-length within
    ``[lo, hi]``."""
    fname = _ident(args[0])
    lo, hi = int(_lit(args[1])), int(_lit(args[2]))
    return field_pred(ctx, fname,
                      lambda v: (F.length(v.cast("string")) >= lo)
                      & (F.length(v.cast("string")) <= hi))


@register_function("f", "matchRegex")
def f_match_regex(ctx: CompileContext, args):
    """QueryFunctions.matchRegex:199 — full-match against the value
    with JexlPatternCache's flags (CASE_INSENSITIVE | DOTALL via
    ``(?is)``, same stance on MULTILINE as filter:includeRegex)."""
    from datawave_spark.compiler.columns import field_regex_pred
    pattern = java_full_match(str(_lit(args[1])))
    return field_regex_pred(ctx, _ident(args[0]), pattern)


@register_function("f", "includeText")
def f_include_text(ctx: CompileContext, args):
    """QueryFunctions.includeText:219 — equality against the RAW
    (un-normalized) value, case-sensitively; numeric values compare
    through their canonical number string ('25' matches a stored
    numeric 25 — QueryFunctionQueryTest.testIncludeText).  Compiled as
    an escaped anchored regex so field_regex_pred's numeric-aware
    string form applies."""
    import re as _re
    text = str(_lit(args[1]))
    from datawave_spark.compiler.columns import field_regex_pred
    return field_regex_pred(ctx, _ident(args[0]),
                            "^" + _re.escape(text) + "$")
