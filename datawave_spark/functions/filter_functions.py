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
from pyspark.sql import types as T

from datawave_spark.compiler.columns import (
    CompileContext, _element_type, field_pred, field_values,
    java_full_match, register_function,
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
    """JexlPatternCache full-match semantics — see
    columns.java_full_match, the single encoding of the flag policy."""
    return java_full_match(pattern)


@register_function("filter", "includeRegex")
def f_include_regex(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.includeRegex:263 — any value of
    FIELD fully matches the pattern (numeric values match through
    their normalized string form, not the double render)."""
    from datawave_spark.compiler.columns import field_regex_pred
    pattern = _anchored(str(_lit(args[1])))
    return field_regex_pred(ctx, _ident(args[0]), pattern)


@register_function("filter", "excludeRegex")
def f_exclude_regex(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.excludeRegex:180 — no value
    matches."""
    return ~f_include_regex(ctx, args)


@register_function("filter", "occurrence")
def f_occurrence(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.occurrence:58 — compare the number
    of values of FIELD: ``filter:occurrence(FIELD, '>', 2)``.
    Two-arg form means ``== count``.

    Size follows the Java's getSizeOf exactly: a SCALAR binding is one
    object — size 1 — even when the field is absent or its value NULL
    (JEXL passes null, getSizeOf(Object) returns 1 for any
    non-Iterable, null included), so on scalar fields occurrence
    degenerates to comparing against the constant 1.  A multi-valued
    field maps non-null elements to event-sourced ValueTuples: when ANY
    exist, getSizeOf returns only their count (``sourcedFromEvent`` —
    null elements excluded); when NONE do, it falls back to the total
    element count.  A NULL array is again the null Object → 1."""
    from datawave_spark.jexl.ast import Identifier as _Id, Literal as _Lit
    fname = _ident(args[0])
    if len(args) == 2:
        op, count_arg = "==", args[1]
    else:
        op, count_arg = str(_lit(args[1])), args[2]
    if isinstance(count_arg, (_Id, _Lit)):
        count = int(_lit(count_arg))
    else:
        # expression count (FunctionalSetTest: "occurrence(AG, '==',
        # getAllMatches(AG,'16').size() + getAllMatches(AG,'18')
        # .size())") — resolve through the arithmetic compiler
        from datawave_spark.compiler.columns import _compile_arith_expr
        count = _compile_arith_expr(count_arg, ctx)
    if "||" in fname or fname.upper() in ctx.model:
        # union / model-alias field: getSizeOf over the member-union
        # FunctionalSet — non-null tuple count, total element count
        # when none (FunctionalSetTest's occurrence-over-AG cases)
        vals = field_values(ctx, fname)
        nn = F.size(F.filter(vals, lambda v: v.isNotNull()))
        n = F.when(nn > 0, nn).otherwise(F.size(vals))
        return {"==": n == count, "=": n == count, "!=": n != count,
                "<": n < count, ">": n > count,
                "<=": n <= count, ">=": n >= count}[op]
    spec = ctx.resolve(fname)
    if spec is None:
        n = F.lit(1)
    else:
        col = F.col(spec.column)
        if isinstance(ctx.spark_type(spec), T.ArrayType):
            # explicit isNull, not coalesce(size(col), 1): legacy
            # (ANSI-off) Spark returns -1 for size(NULL), which a
            # coalesce would pass through
            nn = F.size(F.filter(col, lambda v: v.isNotNull()))
            n = F.when(col.isNull(), F.lit(1)).otherwise(
                F.when(nn > 0, nn).otherwise(F.size(col)))
        else:
            n = F.lit(1)
    return {"==": n == count, "=": n == count, "!=": n != count,
            "<": n < count, ">": n > count,
            "<=": n <= count, ">=": n >= count}[op]


@register_function("filter", "matchesAtLeastCountOf")
def f_matches_at_least(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.matchesAtLeastCountOf:223 —
    ``(count, FIELD, regex1, regex2, ...)``: per REGEX, the FIRST field
    value fully matching it (includeRegex's singleton contract, same
    (?is) pattern flags); the SET of those first-matches must reach
    ``count``.  Distinctness matters: two regexes whose first match is
    the same value contribute ONE element, exactly the Java's
    FunctionalSet accumulation."""
    count = int(_lit(args[0]))
    fname = _ident(args[1])
    regexes = [str(_lit(a)) for a in args[2:]]
    vals = field_values(ctx, fname)
    firsts = [
        F.try_element_at(
            F.filter(vals,
                     lambda v: v.cast("string").rlike(_anchored(r))),
            F.lit(1)).cast("string")
        for r in regexes]
    matched = F.array_distinct(
        F.filter(F.array(*firsts), lambda v: v.isNotNull()))
    return F.size(matched) >= count


# EvaluationPhaseFilterFunctions.DATE_FORMAT_STRINGS:1321 — the
# reference's known-format list for pattern-less getTime, in ITS order
# (first parse wins), minus entries Spark's DateTimeFormatter dialect
# cannot express: the four zone-bearing patterns (Z / z / zzz suffixes
# — RFC-822 and named zones on otherwise-naive stamps; common forms
# like '+0000'/'GMT' still parse — at the Java instant — via the
# default-parser branch, pinned in test_zone_and_dayname_format_
# coverage) and the two locale day-name forms
# ('EEE MMM dd HH:mm:ss zzz yyyy' — true omissions).  Entries the
# default cast already handles (yyyy-MM-dd [HH:mm:ss]) are covered by
# the try_cast branch ahead of this list.  Two lenient-SimpleDateFormat
# behaviors are deliberately NOT reproduced: prefix parsing (SDF's
# DateFormat.parse(String) ignores trailing text, so the reference
# accepts '2024-01-15garbage' via 'yyyy-MM-dd') and field rollover
# (month 13 → next year) — try_to_timestamp requires a full, in-range
# match, so such values are non-matches instead of silently
# reinterpreted.  This is an INSTANT divergence, not just accept-set
# widening: sub-day stamps the reference's list lacks exact entries
# for — minutes-only 'yyyy-MM-dd HH:mm', ISO-T without the quoted 'Z',
# short fractions — prefix-parse in Java via an EARLIER list entry
# ('yyyy-MM-dd' → MIDNIGHT, '.SSS' greedy integer-ms), while the
# leading try_cast/default branches here parse the full stamp to its
# face-value instant.  Policy (deliberate, pinned in
# test_filter_referee.TestKnownFormatListReferee): keep Spark's
# full-parse instants — the face-value reading is the correct one, and
# reproducing prefix-parse would import the silent midnight-truncation
# bug class the lenient-SDF pin already rejects.  Consequence: date
# bounds can disagree with the reference on such stamps (e.g.
# beforeDate(F, '2024-01-05 06:00') on stored '2024-01-05 10:30' —
# Java matches via midnight, this engine does not).  See
# DIVERGENCES.md.
# the separator-free digit-run formats — single source of truth for
# the all-digit fast dispatch in _ts
_COMPACT_FORMATS = ("yyyyMMddHHmmss", "yyyyMMddHHmm", "yyyyMMddHH",
                    "yyyyMMdd")

_KNOWN_DATE_FORMATS = (
    "yyyyMMdd:HH:mm:ss:SSS",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyyMMdd HHmmss",
    "yyyy-MM-dd'T'HH'|'mm",
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "MM/dd/yyyy HH:mm:ss",
    "yyyyMMdd_HHmmss",
    "MM/dd/yyyy",
    "yyyy-MMMM",
    "yyyy-MMM",
    "yyyyMMddHHmmss",
    "yyyyMMddHHmm",
    "yyyyMMddHH",
    "yyyyMMdd",
)


def _ts(col: Column, pattern: str | None) -> Column:
    # try_to_timestamp everywhere: an unparseable stored value fails the
    # comparison instead of failing the query (the reference's evaluator
    # likewise treats bad values as non-matching).
    if pattern == "e":
        # TIME_SINCE_EPOCH_FORMAT:1314 — the value IS epoch millis
        return F.timestamp_millis(col.cast("string").try_cast("long"))
    if pattern:
        return F.try_to_timestamp(col.cast("string"),
                                  F.lit(_java_to_spark_fmt(pattern)))
    # try_cast, not cast: under ANSI mode a plain cast ERRORS on a
    # string the default parser rejects (e.g. 'yyyyMMdd' compact
    # dates), so the coalesce fallback chain would never be reached —
    # caught by the round-7 referee fuzz (test_filter_referee).
    # Cost note: coalesce short-circuits per row in codegen — typed
    # timestamp/date columns resolve at the first branch (no regex
    # work); only string date fields walk further, and only as far as
    # their format.  The all-digit dispatch sits AFTER the
    # try_cast/default branches, which accept inputs the format list
    # doesn't (bare-year '2024', epoch-seconds longs) — review r7
    # caught a dispatch-first version silently nulling those.  An
    # all-digit string that survives both leading branches can only
    # match the compact formats (every format in the rest of the list
    # requires a separator), so one rlike guard replaces ~13 failed
    # parse attempts on compact inputs.
    s = col.cast("string")
    compact = F.coalesce(*[F.try_to_timestamp(s, F.lit(f))
                           for f in _COMPACT_FORMATS])
    # letters-aware dispatch, the mirror of the all-digit guard (r8):
    # a 'yyyy-<letters>' string can only match the two month-name
    # formats (every other separated format requires digits after the
    # first separator), and conversely no month-name string matches any
    # other entry — so one rlike routes it to 2 parse attempts instead
    # of walking ~9 (the 8.3× probe row's residual, README "known-format
    # date parse").  Both formats sit at the END of the reference list,
    # so carving them out preserves first-match order for every other
    # input.
    month_fmts = ("yyyy-MMMM", "yyyy-MMM")
    month_name = F.coalesce(*[F.try_to_timestamp(s, F.lit(f))
                              for f in month_fmts])
    separated = [f for f in _KNOWN_DATE_FORMATS
                 if f not in _COMPACT_FORMATS and f not in month_fmts]
    return F.coalesce(
        col.try_cast("timestamp"),
        F.try_to_timestamp(s),
        F.when(s.rlike("^[0-9]+$"), compact)
         .when(s.rlike("^[0-9]{4}-[A-Za-z]+$"), month_name)
         .otherwise(F.coalesce(*[F.try_to_timestamp(s, F.lit(f))
                                 for f in separated])),
    )


def _java_to_spark_fmt(pattern: str) -> str:
    # SimpleDateFormat and Spark's datetime pattern dialects agree on the
    # subset DataWave queries use (yyyyMMdd etc.).
    return pattern


# the known-format list as (java pattern, strptime pattern) for
# DRIVER-side literal parsing — query date args are compile-time
# strings, so getTime(literal) / getTime(literal, true) resolve in
# Python and emit plain timestamp literals (no codegen cost).  Order =
# the reference's; the two cast-covered defaults sit at their original
# positions ("yyyy-MM-dd HH:mm:ss" before the compact runs,
# "yyyy-MM-dd" after the T-forms).
# third member: expected total length for the WIDTH-STRICT compact
# formats (adjacent digit runs).  SimpleDateFormat honors the pattern
# letter count for all but the last adjacent field, so '2000010100'
# does NOT parse as yyyyMMddHHmm — but Python strptime lets %H/%M eat
# single digits and would sneak a match; the length pin restores the
# Java behavior (zero-width-separated formats don't need it).
_PY_KNOWN_FORMATS = (
    ("yyyyMMdd:HH:mm:ss:SSS", "%Y%m%d:%H:%M:%S:%f", 21),
    # SSS/S at end-of-pattern: SimpleDateFormat's lenient number parse
    # reads the WHOLE adjacent digit run as an integer count of
    # MILLISECONDS ('.5' = 5 ms, '.55' = 55 ms — NOT a decimal
    # fraction), so the reference's '.SSS' entry (:1327) already
    # accepts 1-2 digit fractions and SUBSUMES its '.S' entry (:1329)
    # for naive stamps (the '.S' row is reachable only via the
    # zone-bearing variants) — one JAVA_MS row covers both.  JAVA_MS
    # marks that semantic: head parsed with the base format, digits
    # scaled as integer ms (1-3 digits; ≥4 would roll over into
    # seconds under lenient Calendar, which stays pinned as
    # not-reproduced).  The ':SSS' and T-'Z' fraction entries keep
    # their total-width pins instead: their leading compact runs /
    # trailing literals need width-strictness, so sub-3-digit
    # fractions there remain documented omissions.
    ("yyyy-MM-dd HH:mm:ss.SSS", "JAVA_MS:%Y-%m-%d %H:%M:%S", None),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S", None),
    ("yyyyMMdd HHmmss", "%Y%m%d %H%M%S", 15),
    ("yyyy-MM-dd'T'HH'|'mm", "%Y-%m-%dT%H|%M", None),
    ("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'", "%Y-%m-%dT%H:%M:%S.%fZ", 24),
    ("yyyy-MM-dd'T'HH:mm:ss'Z'", "%Y-%m-%dT%H:%M:%SZ", None),
    ("MM/dd/yyyy HH:mm:ss", "%m/%d/%Y %H:%M:%S", None),
    ("yyyyMMdd_HHmmss", "%Y%m%d_%H%M%S", 15),
    ("yyyy-MM-dd", "%Y-%m-%d", None),
    ("MM/dd/yyyy", "%m/%d/%Y", None),
    ("yyyy-MMMM", "%Y-%B", None),
    ("yyyy-MMM", "%Y-%b", None),
    ("yyyyMMddHHmmss", "%Y%m%d%H%M%S", 14),
    ("yyyyMMddHHmm", "%Y%m%d%H%M", 12),
    ("yyyyMMddHH", "%Y%m%d%H", 10),
    ("yyyyMMdd", "%Y%m%d", 8),
)

_GRAN_RANK = {"YEAR": 0, "MONTH": 1, "WEEK": 2, "DAY": 3, "HOUR": 4,
              "MINUTE": 5, "SECOND": 6, "MILLISECOND": 7}


def _granularity_of(pattern: str) -> str:
    """getGranularity:1396 port — the finest Calendar field a
    SimpleDateFormat pattern carries (quote-aware char scan)."""
    if pattern == "e":
        return "MILLISECOND"
    gran, escaped = "YEAR", False
    for ch in pattern:
        if ch == "'":
            escaped = not escaped
        if escaped:
            continue
        if ch == "S":
            return "MILLISECOND"
        g = {"s": "SECOND", "m": "MINUTE", "h": "HOUR", "K": "HOUR",
             "k": "HOUR", "H": "HOUR", "E": "DAY", "F": "DAY",
             "d": "DAY", "D": "DAY", "W": "WEEK", "w": "WEEK",
             "M": "MONTH"}.get(ch)
        if g and _GRAN_RANK[g] > _GRAN_RANK[gran]:
            gran = g
    return gran


def _java_fmt_to_strptime(pattern: str) -> str:
    """Translate the SimpleDateFormat subset query literals use to a
    strptime pattern (token-greedy; quoted runs become literals).
    Raises on zone/day-name tokens — not representable driver-side."""
    out, i, n = [], 0, len(pattern)
    tokens = (("yyyy", "%Y"), ("yy", "%y"), ("MMMM", "%B"),
              ("MMM", "%b"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"),
              ("mm", "%M"), ("ss", "%S"), ("SSS", "%f"))
    while i < n:
        ch = pattern[i]
        if ch == "'":
            j = pattern.find("'", i + 1)
            if j < 0:                 # SimpleDateFormat: IllegalArgument
                raise ValueError(f"Unterminated quote in date pattern "
                                 f"{pattern!r}")
            if j == i + 1:            # '' = literal quote
                out.append("'")
                i += 2
                continue
            out.append(pattern[i + 1:j].replace("%", "%%"))
            i = j + 1
            continue
        for tok, py in tokens:
            if pattern.startswith(tok, i):
                out.append(py)
                i += len(tok)
                break
        else:
            if ch.isalpha():
                raise ValueError(
                    f"unsupported date pattern token {ch!r} in {pattern}")
            out.append(ch)
            i += 1
    return "".join(out)


def _parse_date_literal(value, pattern: str | None):
    """getTime(literal[, format]) driver-side → (datetime, granularity
    name).  Pattern-less walks the reference's known-format list in
    order; the granularity is the MATCHED format's (getTime(value,
    true) bumps by it)."""
    import datetime as _d
    s = str(value)
    if pattern == "e":
        return (_d.datetime(1970, 1, 1)
                + _d.timedelta(milliseconds=int(s)), "MILLISECOND")
    if pattern:
        return (_d.datetime.strptime(s, _java_fmt_to_strptime(pattern)),
                _granularity_of(pattern))
    for jf, pf, width in _PY_KNOWN_FORMATS:
        if width is not None and len(s) != width:
            continue
        if pf.startswith("JAVA_MS:"):
            # trailing SSS/S: digits are an integer MILLISECOND count
            # (Java lenient number parse), not a decimal fraction
            head, dot, frac = s.rpartition(".")
            if not dot or not frac.isdigit() or len(frac) > 3:
                continue
            try:
                base = _d.datetime.strptime(head, pf[len("JAVA_MS:"):])
            except ValueError:
                continue
            return (base + _d.timedelta(milliseconds=int(frac)),
                    _granularity_of(jf))
        try:
            return _d.datetime.strptime(s, pf), _granularity_of(jf)
        except ValueError:
            continue
    raise ValueError(
        f"Unable to parse value using known date formats: {s}")


def _calendar_add(dt, granularity: str):
    """Calendar.add(field, 1) in GMT: MONTH/YEAR pin the day-of-month
    and clamp to the target month's last day."""
    import calendar as _c
    import datetime as _d
    step = {"MILLISECOND": _d.timedelta(milliseconds=1),
            "SECOND": _d.timedelta(seconds=1),
            "MINUTE": _d.timedelta(minutes=1),
            "HOUR": _d.timedelta(hours=1),
            "DAY": _d.timedelta(days=1),
            "WEEK": _d.timedelta(days=7)}.get(granularity)
    if step is not None:
        return dt + step
    if granularity == "MONTH":
        y = dt.year + dt.month // 12
        m = dt.month % 12 + 1
        return dt.replace(year=y, month=m,
                          day=min(dt.day, _c.monthrange(y, m)[1]))
    y = dt.year + 1                                 # YEAR
    return dt.replace(year=y,
                      day=min(dt.day, _c.monthrange(y, dt.month)[1]))


def _date_lit(value, pattern: str | None, bump: bool = False) -> Column:
    """A query date literal as a timestamp Column — getTime(literal)
    driver-side; ``bump=True`` is getTime(literal, true) /
    getNextTime(literal, rangeFormat, granularity): one unit of the
    matched format's granularity added (afterDate's exclusive start,
    betweenDates' inclusive end)."""
    dt, gran = _parse_date_literal(value, pattern)
    if bump:
        dt = _calendar_add(dt, gran)
    return F.lit(dt).cast("timestamp")


def _date_cmp(ctx: CompileContext, args, cmp, bump: bool):
    """Shared body for afterDate:770 / beforeDate:949 — optional
    SimpleDateFormat pattern args (field pattern, literal/range
    pattern).  ``bump``: afterDate's start is getTime(start, true) /
    getNextTime(start, rangeFormat, granularity) — one unit of the
    literal's OWN granularity added, so 'after 2024-05-01' means
    >= May 2 midnight (t_ms >= bumped ⇔ t >= bumped at any
    sub-ms precision); beforeDate's end is getTime(end) - 1 ms,
    i.e. strictly < end."""
    fname = _ident(args[0])
    rest = [(_lit(a)) for a in args[1:]]
    if len(rest) == 1:
        value, fpat, lpat = rest[0], None, None
    elif len(rest) == 2:
        value, fpat, lpat = rest[0], None, str(rest[1])
    else:
        value, fpat, lpat = rest[1], str(rest[0]), str(rest[2])
    lit = _date_lit(value, lpat, bump=bump)
    return field_pred(ctx, fname, lambda v: cmp(_ts(v, fpat), lit))


@register_function("filter", "afterDate")
def f_after_date(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.afterDate:770 —
    t >= getTime(start, true): the start bumped by its granularity."""
    return _date_cmp(ctx, args, lambda c, lit: c >= lit, bump=True)


@register_function("filter", "beforeDate")
def f_before_date(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.beforeDate:949 —
    t <= getTime(end) - 1 ms ⇔ t < end (un-bumped)."""
    return _date_cmp(ctx, args, lambda c, lit: c < lit, bump=False)


@register_function("filter", "betweenDates")
def f_between_dates(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.betweenDates:1127 —
    ``(FIELD[, pattern], start, end[, rangePattern])``:
    getTime(start) <= t <= getTime(end, true) - 1, i.e. start
    inclusive un-bumped, end bumped by its own granularity and
    exclusive — 'between 2024-01-05 and 2024-01-10' spans through
    Jan 10 23:59:59.999 (the whole end day), exactly the Java."""
    fname = _ident(args[0])
    rest = [_lit(a) for a in args[1:]]
    if len(rest) == 2:
        (start, end), fpat, lpat = rest, None, None
    elif len(rest) == 3:
        (start, end), fpat, lpat = rest[:2], None, str(rest[2])
    else:                       # (pattern, start, end, rangePattern)
        (start, end), fpat, lpat = rest[1:3], str(rest[0]), str(rest[3])
    lo = _date_lit(start, lpat)
    hi = _date_lit(end, lpat, bump=True)
    return field_pred(ctx, fname,
                      lambda v: (_ts(v, fpat) >= lo) & (_ts(v, fpat) < hi))


# Load-date variants: the reference tracks LOAD_DATE as a real field on
# every event (afterLoadDate:417, beforeLoadDate:532, betweenLoadDates:646)
# — identical logic against the LOAD_DATE field.
@register_function("filter", "afterLoadDate")
def f_after_load_date(ctx: CompileContext, args):
    if not isinstance(args[0], Identifier):
        args = (Identifier("LOAD_DATE"), *args)
    return _date_cmp(ctx, args, lambda c, lit: c >= lit, bump=True)


@register_function("filter", "beforeLoadDate")
def f_before_load_date(ctx: CompileContext, args):
    if not isinstance(args[0], Identifier):
        args = (Identifier("LOAD_DATE"), *args)
    return _date_cmp(ctx, args, lambda c, lit: c < lit, bump=False)


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


def _java_long_op(a: Column, b: Column, operator: str) -> Column:
    """OperationEvaluator.calculate(long, long, op) — Java long
    arithmetic on Columns.  ``%`` matches Java directly (Spark's ``%``
    takes the dividend's sign, like Java); ``/`` is Java's
    truncate-toward-zero long division, built exactly as
    (a - a % b) / b (the numerator is exactly divisible, so the
    double-typed divide is exact for any |ms epoch| < 2^53)."""
    if operator == "+":
        return a + b
    if operator == "-":
        return a - b
    if operator == "*":
        return a * b
    if operator == "%":
        return a % b
    if operator == "/":
        return ((a - a % b) / b).cast("long")
    raise ValueError(f"unsupported timeFunction operator: {operator}")


@register_function("filter", "timeFunction")
def f_time_function(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.timeFunction:1431 —
    ``(FIELD1, FIELD2, operator, equality, goal)``: calculate
    ``getMaxTime(FIELD1) <op> getMinTime(FIELD2)`` (SET semantics over
    multi-valued fields — max of the first field's parsed times, min of
    the second's, exactly the Java) in exact long epoch-millis, then
    compare against the goal with the equality operator
    (OperationEvaluator.compare), e.g.
    ``filter:timeFunction(DEATH, BIRTH, '-', '>', 86400000)``.

    A side with ANY unparseable value yields false, matching the
    reference, whose getMaxTime/getMinTime throw ParseException on the
    FIRST bad value (the evaluator turns the error into a non-match) —
    the parseable subset is never evaluated on its own.  Divergences
    (documented, total-function): a NULL/empty side also yields false
    (the reference's nulls likewise; its EMPTY iterable computes
    Long.MIN/MAX_VALUE sentinel arithmetic — garbage wrap-around the
    evaluator only reaches through an empty FunctionalSet, which absent
    fields never produce)."""
    def _unq(s: str) -> str:
        # the LUCENE #TIME_FUNCTION form passes its args still QUOTED
        # ("'-'", "'2522880000000L'" — CompositeFunctionsTest
        # .testDateDelta); JEXL-form args arrive bare
        s = s.strip()
        if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
            s = s[1:-1]
        return s

    f1, f2 = _ident(args[0]), _ident(args[1])
    operator = _unq(str(_lit(args[2])))
    equality = _unq(str(_lit(args[3])))
    # Java long suffix stripped before the integer parse
    goal = int(_unq(str(_lit(args[4]))).rstrip("lL"))

    def _side(field, pick):
        # SCALAR fast path: one value IS the set — the extreme is the
        # parsed value and the all-parse check is its non-nullness
        # (NULL propagates to a false comparison via the coalesce), so
        # the whole side is one codegen'd expression with no array
        # machinery (r9 perf pass)
        spec = ctx.resolve(field)
        if spec is not None and "||" not in field \
                and field.upper() not in ctx.model \
                and not isinstance(ctx.spark_type(spec), T.ArrayType):
            dtype = ctx.spark_type(spec)
            if isinstance(dtype, (T.TimestampType, T.TimestampNTZType,
                                  T.DateType)):
                # already temporal: no parse chain in the plan at all
                return F.unix_millis(F.col(spec.column).cast("timestamp"))
            return F.unix_millis(_ts(F.col(spec.column), None))
        # NULL elements are ABSENCE (the reference's FunctionalSet holds
        # only actual values), so only non-null raw values are parsed —
        # a null element must not read as a parse failure (review r8).
        # ONE aggregate pass folds parse + all-parse check + extreme:
        # the known-format parse chain is the expensive expression here
        # and lambda subexpressions get no CSE, so referencing the
        # parsed array from both the check and the aggregate re-derived
        # it per side (r9 perf pass; semantics pinned by
        # test_filter_referee).
        vals = F.filter(field_values(ctx, field),
                        lambda v: v.isNotNull())
        acc0 = F.struct(F.lit(True).alias("ok"),
                        F.lit(None).cast("long").alias("t"))
        res = F.aggregate(
            F.transform(vals, lambda v: F.unix_millis(_ts(v, None))),
            acc0,
            lambda a, t: F.struct(
                (a["ok"] & t.isNotNull()).alias("ok"),
                # greatest/least skip NULLs, so the running extreme
                # seeds cleanly from the NULL initial accumulator
                pick(a["t"], t).alias("t")))
        # any unparseable value ⇒ NULL side ⇒ false, the reference's
        # ParseException → non-match; empty side stays NULL too
        return F.when(res["ok"], res["t"])

    t1 = _side(f1, F.greatest)
    t2 = _side(f2, F.least)
    calc = _java_long_op(t1, t2, operator)
    cmp = {">": calc > goal, "<": calc < goal, ">=": calc >= goal,
           "<=": calc <= goal, "==": calc == goal, "=": calc == goal,
           "!=": calc != goal}[equality]
    return F.coalesce(cmp, F.lit(False))


@register_function("filter", "getMaxTime")
def f_get_max_time(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMaxTime:1447 — max epoch-millis
    over the field's values."""
    vals = field_values(ctx, _ident(args[0]))
    return F.array_max(F.transform(
        vals, lambda v: F.unix_millis(_ts(v, None))))


@register_function("filter", "getMinTime")
def f_get_min_time(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMinTime:1465."""
    vals = field_values(ctx, _ident(args[0]))
    return F.array_min(F.transform(
        vals, lambda v: F.unix_millis(_ts(v, None))))


def _time_value_pairs(ctx: CompileContext, field: str) -> Column:
    """(parsed epoch-ms, original value) structs for the field's
    values, unparseable values dropped — the reference's getTime throws
    ParseException there, which getMaxValue/getMinValue propagate as a
    query error; skipping is the documented total-function stance (the
    same one filter:after/before take for bad stored dates)."""
    pairs = F.transform(
        field_values(ctx, field),
        lambda v: F.struct(F.unix_millis(_ts(v, None)).alias("t"),
                           v.alias("v")))
    return F.filter(pairs, lambda s: s["t"].isNotNull())


@register_function("filter", "getMaxValue")
def f_get_max_value(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMaxValue:1481 — returns the
    VALUE whose parsed TIME is the maximum (the Java tracks
    ``getTime(date) > max`` and keeps the winning ``date`` object), NOT
    the lexicographic max: over mixed-format date strings the two
    orders differ.  Struct ordering compares the parsed-time field
    first; exact ties tiebreak on the value string (the Java keeps the
    first-encountered value of a tied time — set iteration order is
    nondeterministic there, so any deterministic tiebreak is parity)."""
    return F.array_max(_time_value_pairs(ctx, _ident(args[0])))["v"]


@register_function("filter", "getMinValue")
def f_get_min_value(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getMinValue:1502 — min-time
    counterpart of getMaxValue (same time-ordered selection)."""
    return F.array_min(_time_value_pairs(ctx, _ident(args[0])))["v"]


# ---- filter:compare + period-extraction + time accessors (round 6:
# ---- the last four EvaluationPhaseFilterFunctions members)

def _compare_value_set(ctx: CompileContext, field: str,
                       numeric: bool) -> Column:
    """Non-null normalized value array of a field for filter:compare —
    numeric fields compare as doubles, everything else as lowercased
    strings (the reference compares NORMALIZED values: NumberNormalizer
    makes lexicographic == numeric, LcNoDiacritics lowercases).  NULL
    elements of array fields are dropped first: the reference iterates
    actual values (null is absence, not a value), while Spark's array
    set ops would match NULL to NULL and fake an intersection.  NOT
    deduplicated — min/max/overlap are distinct-invariant, and the one
    consumer that needs a true SET (set-equality) dedups itself (r10:
    dropping the per-side array_distinct pass halved the expression)."""
    vals = F.filter(field_values(ctx, field), lambda v: v.isNotNull())
    if numeric:
        # try_cast + re-filter: a value that fails numeric
        # normalization is ABSENT from the comparison set (the
        # reference iterates normalized values), never an ANSI abort
        # and never a NULL element that could fake a set match (r8)
        return F.filter(F.transform(vals, lambda v: v.try_cast("double")),
                        lambda v: v.isNotNull())
    return F.transform(vals, lambda v: F.lower(v.cast("string")))


@register_function("filter", "compare")
def f_compare(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.compare — field-vs-field value-SET
    comparison with an ANY/ALL mode: ``filter:compare(F1, '<', 'ANY',
    F2)``.  Exact reference semantics (compareFields):

    - ``==``/``=``  : both sets empty → true; ANY → sets intersect;
                      ALL → set equality;
    - ``!=``        : both empty → false; ANY → NOT set-equal;
                      ALL → sets disjoint;
    - ``<,<=,>,>=`` : false if either set is empty (the Java switch
                      falls through to default); else min/max bounds:
                      ANY ``<`` is min(s1) < max(s2), ALL ``<`` is
                      max(s1) < min(s2), mirrored for ``>``.
    """
    f1, f2 = _ident(args[0]), _ident(args[3])
    op = str(_lit(args[1])).replace(" ", "")
    mode = str(_lit(args[2])).upper()
    if mode not in ("ANY", "ALL"):
        raise ValueError(f"compare mode must be ANY or ALL: {mode}")
    if op not in ("==", "=", "!=", "<", "<=", ">", ">="):
        raise ValueError(f"unsupported compare operator: {op}")
    any_ = mode == "ANY"

    def _is_numeric(field: str) -> bool:
        spec = ctx.resolve(field)
        if spec is None:
            return False
        return isinstance(_element_type(ctx.spark_type(spec)),
                          T.NumericType)

    n1, n2 = _is_numeric(f1), _is_numeric(f2)
    if n1 != n2:
        # Deliberate divergence, documented: the reference compares
        # each side's per-field NORMALIZED string (a numeric field's is
        # the external NumericalEncoder byte form, which is not in the
        # reference tree), so a mixed numeric-vs-string compare there
        # is a lexicographic compare of heterogeneous encodings we
        # cannot reproduce byte-for-byte.  Silently lowercase-string
        # comparing instead ('10' < '9') would be wrong in a different
        # way — an explicit error beats a silently-divergent answer.
        raise ValueError(
            f"filter:compare on mixed numeric/string fields "
            f"({f1}, {f2}) is not supported: the reference's behavior "
            f"depends on an external numeric encoding; cast one side "
            f"or compare same-typed fields")
    numeric = n1 and n2

    def _scalar_col(field: str) -> Column | None:
        """The field's single normalized scalar column, or None when
        the argument is a union/alias or an array field."""
        from datawave_spark.compiler.columns import _expand_field_arg
        names = _expand_field_arg(ctx, field)
        if len(names) != 1:
            return None
        spec = ctx.resolve(names[0])
        if spec is None or isinstance(ctx.spark_type(spec), T.ArrayType):
            return None
        col = F.col(spec.column)
        return col.try_cast("double") if numeric \
            else F.lower(col.cast("string"))

    sa, sb = _scalar_col(f1), _scalar_col(f2)
    if sa is not None and sb is not None:
        # scalar-vs-scalar: the sets are 0/1-element, so every
        # mode/op pair reduces to ONE direct comparison (a codegen-able
        # plan with no array construction — the r6-era shape):
        # ==/= : singleton intersection == singleton set-equality;
        # != : ANY not-set-equal == ALL disjoint == not null-safe-eq;
        # inequalities: NULL-side → NULL → coalesce(False) is the
        # reference's empty-set-is-false rule.
        if op in ("==", "="):
            pred = F.when(sa.isNull() & sb.isNull(), F.lit(True)) \
                .otherwise(sa == sb)
        elif op == "!=":
            pred = ~sa.eqNullSafe(sb)
        else:
            pred = {"<": sa < sb, "<=": sa <= sb,
                    ">": sa > sb, ">=": sa >= sb}[op]
        return F.coalesce(pred, F.lit(False))

    a = _compare_value_set(ctx, f1, numeric)
    b = _compare_value_set(ctx, f2, numeric)
    if op in ("==", "=") and any_:
        # arrays_overlap IS set-intersection-nonempty on null-free
        # arrays — no distinct pass needed
        pred = F.when((F.size(a) == 0) & (F.size(b) == 0), F.lit(True)) \
            .otherwise(F.arrays_overlap(a, b))
    elif op == "!=" and not any_:
        # ALL != : sets disjoint (both-empty → false; one-empty IS
        # disjoint → true, as the reference's intersect-empty test)
        pred = ~((F.size(a) == 0) & (F.size(b) == 0)) \
            & ~F.arrays_overlap(a, b)
    elif op in ("==", "=", "!="):
        # the two set-EQUALITY modes are the only consumers of a true
        # distinct set
        da, db = F.array_distinct(a), F.array_distinct(b)
        set_eq = ((F.size(da) == F.size(db))
                  & (F.size(F.array_except(da, db)) == 0))
        if op == "!=":
            pred = F.when((F.size(a) == 0) & (F.size(b) == 0),
                          F.lit(False)).otherwise(~set_eq)
        else:
            pred = F.when((F.size(a) == 0) & (F.size(b) == 0),
                          F.lit(True)).otherwise(set_eq)
    else:
        # inequalities: array_min/max return NULL on an empty array, so
        # a NULL comparison ⇔ an empty side — the coalesce(False) below
        # IS the reference's empty-set-is-false inequality rule, with
        # no size/emptiness subexpressions at all
        min1, max1 = F.array_min(a), F.array_max(a)
        min2, max2 = F.array_min(b), F.array_max(b)
        cmps = {
            ("<", True): min1 < max2,  ("<", False): max1 < min2,
            ("<=", True): min1 <= max2, ("<=", False): max1 <= min2,
            (">", True): max1 > min2,  (">", False): min1 > max2,
            (">=", True): max1 >= min2, (">=", False): min1 >= max2,
        }
        pred = cmps[(op, any_)]
    return F.coalesce(pred, F.lit(False))


def match_left_of_period(value: Column, pos: int) -> Column:
    """EvaluationPhaseFilterFunctions.getMatchToLeftOfPeriod — the
    grouping-notation extractor: peel everything up to and including the
    FIRST period (the field-name prefix), then return the remainder LEFT
    of the (pos+1)-th period counting from the RIGHT; NULL when the
    remainder has fewer than pos+1 periods.  'FIELD.a.b.c', pos=0 →
    'a.b'; pos=1 → 'a'."""
    peeled = F.when(value.contains("."),
                    F.substring(value, F.instr(value, ".") + F.lit(1),
                                F.length(value))) \
        .otherwise(value)
    parts = F.split(peeled, "\\.")
    keep = F.size(parts) - F.lit(pos + 1)
    return F.when(keep >= 1,
                  F.array_join(F.slice(parts, F.lit(1), keep), ".")) \
        .otherwise(F.lit(None).cast("string"))


def match_right_of_period(value: Column, pos: int) -> Column:
    """EvaluationPhaseFilterFunctions.getMatchToRightOfPeriod — no
    field-name peel: the suffix RIGHT of the (pos+1)-th period from the
    right of the whole input; NULL when there are fewer than pos+1
    periods.  'FIELD.a.b.c', pos=0 → 'c'; pos=1 → 'b.c'."""
    parts = F.split(value, "\\.")
    n = F.lit(pos + 1)
    return F.when(F.size(parts) >= F.lit(pos + 2),
                  F.array_join(F.slice(parts, -n, n), ".")) \
        .otherwise(F.lit(None).cast("string"))


@register_function("filter", "getMatchToLeftOfPeriod")
def f_match_left_of_period(ctx: CompileContext, args):
    """Value-returning (getMaxValue convention): extraction over the
    field's first value; scalar grouping-context fields in practice."""
    vals = field_values(ctx, _ident(args[0]))
    return match_left_of_period(F.try_element_at(vals, F.lit(1)),
                                int(_lit(args[1])))


@register_function("filter", "getMatchToRightOfPeriod")
def f_match_right_of_period(ctx: CompileContext, args):
    vals = field_values(ctx, _ident(args[0]))
    return match_right_of_period(F.try_element_at(vals, F.lit(1)),
                                 int(_lit(args[1])))


def value_time_millis(value: Column, pattern: str | None = None) -> Column:
    """EvaluationPhaseFilterFunctions.getTime — epoch millis of a parsed
    date value (the reference tries its known-format list; _ts carries
    the same fallback chain).  unix_millis is exact integer floor-div —
    a double*1000 cast truncates toward zero and diverges from DuckDB's
    epoch_ms on pre-1970 sub-millisecond values."""
    return F.unix_millis(_ts(value, pattern))


# granularity -> make_interval kwargs; values are literal magnitudes
# (Columns are built per call — F.lit needs an active session)
_GRANULARITY_STEPS = {"YEAR": ("years", 1), "MONTH": ("months", 1),
                      "WEEK": ("days", 7), "DAY": ("days", 1),
                      "HOUR": ("hours", 1), "MINUTE": ("mins", 1),
                      "SECOND": ("secs", 1.0),
                      "MILLISECOND": ("secs", 0.001)}


def value_next_time_millis(value: Column, granularity: str,
                           pattern: str | None = None) -> Column:
    """EvaluationPhaseFilterFunctions.getNextTime — getTime plus ONE
    unit of the given granularity (the reference's Calendar.add(field,
    1)); granularity names mirror the Calendar fields its format list
    pairs with."""
    g = granularity.upper()
    if g not in _GRANULARITY_STEPS:
        raise ValueError(f"unknown granularity {granularity}")
    arg, step = _GRANULARITY_STEPS[g]
    stepped = _ts(value, pattern) + F.make_interval(**{arg: F.lit(step)})
    return F.unix_millis(stepped)


@register_function("filter", "getTime")
def f_get_time(ctx: CompileContext, args):
    vals = field_values(ctx, _ident(args[0]))
    pat = str(_lit(args[1])) if len(args) > 1 else None
    return value_time_millis(F.try_element_at(vals, F.lit(1)), pat)


@register_function("filter", "getNextTime")
def f_get_next_time(ctx: CompileContext, args):
    """``filter:getNextTime(FIELD, 'GRANULARITY'[, 'pattern'])``."""
    vals = field_values(ctx, _ident(args[0]))
    gran = str(_lit(args[1]))
    pat = str(_lit(args[2])) if len(args) > 2 else None
    return value_next_time_millis(F.try_element_at(vals, F.lit(1)),
                                  gran, pat)


@register_function("filter", "getHitTerm")
def f_get_hit_term(ctx: CompileContext, args):
    """EvaluationPhaseFilterFunctions.getHitTerm — the reference wraps a
    value into its HIT_TERM attribution tuple; the engine-level analog
    is operators.hit_terms.with_hit_terms (per-row matched-leaf
    attribution, driver-green r03).  As a column we surface the field's
    first value, which IS the hit term for a matched leaf."""
    return F.try_element_at(field_values(ctx, _ident(args[0])), F.lit(1))
