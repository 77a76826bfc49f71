"""Referee-fuzz for the value-returning filter: surface — ported-Java
referees property-tested against the Spark column implementations
(round-7 directive: the filter:compare referee caught a real
bound-semantics bug in round 6; same treatment for the time/value
families).

Referees are line-ported from
EvaluationPhaseFilterFunctions.java (getTime:1584, getNextTime:1533,
timeFunction:1431, getMaxValue:1489/getMinValue:1510,
getMatchToLeftOfPeriod:1661/getMatchToRightOfPeriod:1692 +
getIndicesOfPeriods:1711) and OperationEvaluator.java (calculate/
compare).  Deliberate divergences each get a pinned test instead of a
fuzz exemption without evidence.
"""

import calendar as _cal
from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawave_spark.functions.filter_functions import (
    match_left_of_period, match_right_of_period, value_next_time_millis,
    value_time_millis,
)

UTC = timezone.utc


# ---------------------------------------------------------------- referees

def epoch_ms(dt: datetime) -> int:
    """Java Date.getTime — exact ms; for sub-ms instants Spark's
    unix_millis floor-divides (matches DuckDB epoch_ms), pinned below."""
    us = dt.replace(tzinfo=UTC).timestamp()
    # avoid float rounding: compute from days/seconds/micros exactly
    delta = dt.replace(tzinfo=None) - datetime(1970, 1, 1)
    total_us = (delta.days * 86400 + delta.seconds) * 10**6 \
        + delta.microseconds
    assert abs(us * 1e6 - total_us) < 2e6
    return total_us // 1000   # floor division, negative-safe


def java_calendar_add(dt: datetime, granularity: str) -> datetime:
    """Calendar.add(field, 1) in a DST-free zone (session tz = UTC):
    MONTH/YEAR pin the day-of-month and clamp to the target month's
    last day (Jan 31 + MONTH -> Feb 28/29; Feb 29 + YEAR -> Feb 28)."""
    if granularity == "MILLISECOND":
        return dt + timedelta(milliseconds=1)
    if granularity == "SECOND":
        return dt + timedelta(seconds=1)
    if granularity == "MINUTE":
        return dt + timedelta(minutes=1)
    if granularity == "HOUR":
        return dt + timedelta(hours=1)
    if granularity == "DAY":
        return dt + timedelta(days=1)
    if granularity == "WEEK":
        return dt + timedelta(days=7)
    if granularity == "MONTH":
        y = dt.year + dt.month // 12
        m = dt.month % 12 + 1
        return dt.replace(year=y, month=m,
                          day=min(dt.day, _cal.monthrange(y, m)[1]))
    if granularity == "YEAR":
        y = dt.year + 1
        return dt.replace(year=y,
                          day=min(dt.day, _cal.monthrange(y, dt.month)[1]))
    raise ValueError(granularity)


def java_long_calc(a: int, b: int, op: str) -> int:
    """OperationEvaluator.calculate(long, long, op): / truncates toward
    zero, % takes the dividend's sign (Java semantics, NOT Python's)."""
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q
    if op == "%":
        r = abs(a) % abs(b)
        return r if a >= 0 else -r
    raise ValueError(op)


def java_compare(calc: int, goal: int, eq: str) -> bool:
    return {"<": calc < goal, "<=": calc <= goal, ">": calc > goal,
            ">=": calc >= goal, "==": calc == goal, "=": calc == goal,
            "!=": calc != goal}[eq]


def java_time_function(times1, times2, op, eq, goal) -> bool:
    if not times1 or not times2:
        return False
    return java_compare(java_long_calc(max(times1), min(times2), op),
                        goal, eq)


def _indices_of_periods(s: str) -> list[int]:
    """getIndicesOfPeriods:1711 verbatim — including the indexOf(.,
    lastIndex + 1) start offset that SKIPS a period at index 0 and
    yields a trailing -1 entry for inputs beginning with '.'."""
    out, last = [], 0
    for _ in range(s.count(".")):
        i = s.find(".", last + 1)
        out.append(i)
        last = i
    return out


def java_left_of_period(inp: str, pos: int):
    s = inp[inp.find(".") + 1:]          # find==-1 -> whole string, like Java
    idx = _indices_of_periods(s)
    if len(idx) < pos + 1:
        return None
    end = idx[len(idx) - pos - 1]
    if end < 0:
        # Java: input.substring(0, -1) -> StringIndexOutOfBoundsException
        raise IndexError("java StringIndexOutOfBounds")
    return s[:end]


def java_right_of_period(inp: str, pos: int):
    idx = _indices_of_periods(inp)
    if len(idx) < pos + 1:
        return None
    start = idx[len(idx) - pos - 1]
    return inp[start + 1:]               # start==-1 -> whole input (quirk)


# ------------------------------------------------------------- strategies

DT = st.datetimes(min_value=datetime(1900, 1, 3),
                  max_value=datetime(2100, 12, 28))
GRANULARITIES = ["YEAR", "MONTH", "WEEK", "DAY", "HOUR", "MINUTE",
                 "SECOND", "MILLISECOND"]


def _batch(spark, dts):
    return spark.createDataFrame([(d,) for d in dts], "ts timestamp")


# ------------------------------------------------------------- the fuzz

class TestGetTimeReferee:
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(dts=st.lists(DT, min_size=1, max_size=25))
    def test_epoch_millis_matches_java(self, spark, dts):
        """getTime == Date.getTime epoch ms — incl. pre-1970 and sub-ms
        (floor-division ties to DuckDB epoch_ms, the r6 unix_millis
        contract)."""
        got = _batch(spark, dts).select(
            value_time_millis(F.col("ts")).alias("ms")).collect()
        assert [r.ms for r in got] == [epoch_ms(d) for d in dts]

    def test_pre1970_submillis_floors_not_truncates(self, spark):
        # 1969-12-31 23:59:59.9995 = -0.5 ms -> floor -1, trunc would give 0
        dt = datetime(1969, 12, 31, 23, 59, 59, 999500)
        got = _batch(spark, [dt]).select(
            value_time_millis(F.col("ts")).alias("ms")).head().ms
        assert got == -1 == epoch_ms(dt)


def _fmt_ms(dt):
    return f"{dt.microsecond // 1000:03d}"


# (strftime-style renderer, granularity truncator) per reference
# DATE_FORMAT_STRINGS entry that _ts carries — the truncator yields the
# instant SimpleDateFormat reconstructs from only the fields the format
# carries (missing fields default to Jan 1 / midnight, GMT)
KNOWN_FORMAT_CASES = [
    (lambda d: d.strftime("%Y%m%d:%H:%M:%S:") + _fmt_ms(d),
     lambda d: d.replace(microsecond=d.microsecond // 1000 * 1000)),
    (lambda d: d.strftime("%Y-%m-%d %H:%M:%S.") + _fmt_ms(d),
     lambda d: d.replace(microsecond=d.microsecond // 1000 * 1000)),
    (lambda d: d.strftime("%Y-%m-%d %H:%M:%S"),
     lambda d: d.replace(microsecond=0)),
    (lambda d: d.strftime("%Y%m%d %H%M%S"),
     lambda d: d.replace(microsecond=0)),
    (lambda d: d.strftime("%Y-%m-%dT%H|%M"),
     lambda d: d.replace(second=0, microsecond=0)),
    (lambda d: d.strftime("%Y-%m-%dT%H:%M:%S.") + _fmt_ms(d) + "Z",
     lambda d: d.replace(microsecond=d.microsecond // 1000 * 1000)),
    (lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ"),
     lambda d: d.replace(microsecond=0)),
    (lambda d: d.strftime("%m/%d/%Y %H:%M:%S"),
     lambda d: d.replace(microsecond=0)),
    (lambda d: d.strftime("%Y%m%d_%H%M%S"),
     lambda d: d.replace(microsecond=0)),
    (lambda d: d.strftime("%Y-%m-%d"),
     lambda d: datetime(d.year, d.month, d.day)),
    (lambda d: d.strftime("%m/%d/%Y"),
     lambda d: datetime(d.year, d.month, d.day)),
    (lambda d: d.strftime("%Y-%B"),            # yyyy-MMMM
     lambda d: datetime(d.year, d.month, 1)),
    (lambda d: d.strftime("%Y-%b"),            # yyyy-MMM
     lambda d: datetime(d.year, d.month, 1)),
    (lambda d: d.strftime("%Y%m%d%H%M%S"),
     lambda d: d.replace(microsecond=0)),
    (lambda d: d.strftime("%Y%m%d%H%M"),
     lambda d: d.replace(second=0, microsecond=0)),
    (lambda d: d.strftime("%Y%m%d%H"),
     lambda d: d.replace(minute=0, second=0, microsecond=0)),
    (lambda d: d.strftime("%Y%m%d"),
     lambda d: datetime(d.year, d.month, d.day)),
]


class TestKnownFormatListReferee:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(dts=st.lists(DT, min_size=1, max_size=6),
           case=st.sampled_from(range(len(KNOWN_FORMAT_CASES))))
    def test_patternless_gettime_parses_known_formats(self, spark, dts,
                                                      case):
        """getTime with NO pattern walks the reference's
        DATE_FORMAT_STRINGS list: every translatable entry must parse
        back to the instant SimpleDateFormat would reconstruct (missing
        fields default per granularity)."""
        render, trunc = KNOWN_FORMAT_CASES[case]
        strs = [render(d) for d in dts]
        df = spark.createDataFrame([(s,) for s in strs], "v string")
        got = [r.ms for r in df.select(
            value_time_millis(F.col("v")).alias("ms")).collect()]
        assert got == [epoch_ms(trunc(d)) for d in dts], strs

    def test_epoch_pattern_e(self, spark):
        """The 'e' explicit pattern (TIME_SINCE_EPOCH_FORMAT:1314) —
        the value string IS epoch millis, negatives included."""
        df = spark.createDataFrame(
            [("1705276800000",), ("-86400000",), ("notanumber",)],
            "v string")
        got = [r.ms for r in df.select(
            value_time_millis(F.col("v"), "e").alias("ms")).collect()]
        assert got == [1705276800000, -86400000, None]

    def test_fullparse_instant_divergence_pinned(self, spark):
        """Pinned INSTANT divergence (policy: keep full-parse instants).
        Stamps with no exact DATE_FORMAT_STRINGS entry — ISO 'T'
        without the quoted 'Z', minutes-only — are NOT rejected by the
        reference: DateFormat.parse(String) ignores trailing text, so
        they prefix-match an EARLIER list entry ('yyyy-MM-dd' →
        MIDNIGHT).  This engine's default-parser branch reads the full
        stamp at face value instead (10:00 here, not midnight), so
        date bounds can disagree with the reference on such values.
        Deliberate and documented (DIVERGENCES.md): the face-value
        instant is the correct reading; reproducing prefix-parse would
        import the silent midnight-truncation bug class the lenient-SDF
        pin below already rejects."""
        df = spark.createDataFrame(
            [("2024-01-05T10:00:00",), ("2024-01-05 10:00",)], "v string")
        got = [r.ms for r in df.select(
            value_time_millis(F.col("v")).alias("ms")).collect()]
        assert got == [epoch_ms(datetime(2024, 1, 5, 10)),
                       epoch_ms(datetime(2024, 1, 5, 10))]

    def test_unterminated_quote_pattern_raises(self, spark):
        # SimpleDateFormat throws IllegalArgumentException; a malformed
        # explicit pattern must raise, not hang (review r7)
        from datawave_spark.functions.filter_functions import (
            _java_fmt_to_strptime)
        with pytest.raises(ValueError, match="Unterminated quote"):
            _java_fmt_to_strptime("yyyy'Z")

    def test_all_digit_dispatch_edges(self, spark):
        """The all-digit fast dispatch sits AFTER the try_cast/default
        branches (review r7: a dispatch-first version silently nulled
        what those accept): 8/10/12/14-digit strings parse as the
        compact formats, bare-year '2024' still parses via try_cast
        (part of the documented accept-set widening — the reference's
        list would reject it), and all-digit widths NO branch accepts
        parse as nothing."""
        df = spark.createDataFrame(
            [("20240105",), ("2024010510",), ("202401051030",),
             ("20240105103045",), ("202401051",), ("2024",),
             ("123456789012345",)], "v string")
        got = [r.ms for r in df.select(
            value_time_millis(F.col("v")).alias("ms")).collect()]
        assert got == [epoch_ms(datetime(2024, 1, 5)),
                       epoch_ms(datetime(2024, 1, 5, 10)),
                       epoch_ms(datetime(2024, 1, 5, 10, 30)),
                       epoch_ms(datetime(2024, 1, 5, 10, 30, 45)),
                       None,
                       epoch_ms(datetime(2024, 1, 1)),   # bare year
                       None]

    def test_typed_columns_parse_via_cast(self, spark):
        """Typed long columns are epoch SECONDS under Spark's numeric
        cast (the try_cast branch) — the dispatch reordering must not
        shadow it."""
        df = spark.createDataFrame([(1704067200,)], "v long")
        got = df.select(value_time_millis(F.col("v")).alias("ms")) \
            .head().ms
        assert got == epoch_ms(datetime(2024, 1, 1))

    def test_fraction_literals_java_integer_ms(self, spark):
        """Driver-side literals with trailing SSS/S fractions follow
        SimpleDateFormat's lenient number parse: the digit run is an
        integer MILLISECOND count, not a decimal fraction — '.5' is
        5 ms (Java parses it via the '.SSS' entry :1327; the '.S'
        entry :1329 exists too), '.55' is 55 ms.  ≥4 digits would
        roll over into seconds under lenient Calendar, which stays
        pinned as not-reproduced → parse error."""
        from datawave_spark.functions.filter_functions import (
            _parse_date_literal)
        base = datetime(2024, 1, 5, 10, 0, 0)
        for frac, ms in (("5", 5), ("55", 55), ("555", 555)):
            dt, gran = _parse_date_literal(f"2024-01-05 10:00:00.{frac}",
                                           None)
            assert dt == base + timedelta(milliseconds=ms), frac
            assert gran == "MILLISECOND"
        with pytest.raises(ValueError, match="known date formats"):
            _parse_date_literal("2024-01-05 10:00:00.5555", None)

    def test_lenient_sdf_behaviors_not_reproduced(self, spark):
        """Pinned divergence: SimpleDateFormat prefix-parses
        ('2024-01-15garbage' succeeds) and rolls over out-of-range
        fields (month 13 → next January); try_to_timestamp requires a
        full in-range match, so both are non-matches here."""
        df = spark.createDataFrame(
            [("2024-01-15garbage",), ("2024-13-01",)], "v string")
        got = [r.ms for r in df.select(
            value_time_millis(F.col("v")).alias("ms")).collect()]
        assert got == [None, None]

    def test_zone_and_dayname_format_coverage(self, spark):
        """The zone-bearing DATE_FORMAT_STRINGS entries (:1326-1331 —
        'Z'/'z' suffixes) have no explicit list entry here, but Spark's
        default-parser branch understands RFC-822 offsets and named-UTC
        suffixes and computes the SAME instant the reference's
        SimpleDateFormat would — so common zoned stamps agree, not
        diverge.  The two locale day-name forms (:1324,:1338) are the
        true pinned omissions: not expressible in the column-side
        dialect, stored values in them are non-matches here where the
        reference parses them."""
        df = spark.createDataFrame(
            [("2024-01-05 10:00:00 +0000",),      # yyyy-MM-dd HH:mm:ss Z
             ("2024-01-05 10:00:00GMT",),         # yyyy-MM-dd HH:mm:ssz
             ("Fri Jan 05 10:00:00 GMT 2024",)],  # EEE MMM dd HH:mm:ss zzz yyyy
            "v string")
        got = [r.ms for r in df.select(
            value_time_millis(F.col("v")).alias("ms")).collect()]
        utc_10 = epoch_ms(datetime(2024, 1, 5, 10))
        assert got == [utc_10, utc_10, None]

    def test_maxvalue_unparseable_skip_pinned(self, spark):
        """Pinned divergence: getMaxValue/getMinValue (and
        getMaxTime/getMinTime as scalar accessors) SKIP unparseable
        values — the reference's getTime throws ParseException there,
        propagating as a whole-query error.  Skipping is the
        total-function stance (same as filter:after/before on bad
        stored dates); timeFunction is the exception and goes false
        (test above), because there the Java error becomes a non-match
        rather than a query failure."""
        from datawave_spark.compiler import CompileContext
        from datawave_spark.functions.filter_functions import (
            f_get_max_value)
        from datawave_spark.jexl.ast import Identifier
        df = spark.createDataFrame(
            [(0, ["2024-01-02", "garbage", "2023-01-01"])],
            "id long, D array<string>")
        ctx = CompileContext.for_dataframe(df)
        got = df.select(f_get_max_value(
            ctx, [Identifier("D")]).alias("mx")).head().mx
        assert got == "2024-01-02"


class TestGetNextTimeReferee:
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(dts=st.lists(DT, min_size=1, max_size=12),
           gran=st.sampled_from(GRANULARITIES))
    def test_calendar_add_matches_java(self, spark, dts, gran):
        got = _batch(spark, dts).select(
            value_next_time_millis(F.col("ts"), gran).alias("ms")).collect()
        want = [epoch_ms(java_calendar_add(d, gran)) for d in dts]
        assert [r.ms for r in got] == want

    def test_month_and_year_rollover_clamp(self, spark):
        """The Calendar.add day-of-month clamp, pinned explicitly:
        Jan 31 + MONTH -> Feb 29 (leap) / Feb 28; Feb 29 + YEAR ->
        Feb 28; Dec 31 + MONTH -> Jan 31 (year rollover, no clamp)."""
        cases = [
            (datetime(2024, 1, 31), "MONTH", datetime(2024, 2, 29)),
            (datetime(2023, 1, 31), "MONTH", datetime(2023, 2, 28)),
            (datetime(2024, 2, 29), "YEAR", datetime(2025, 2, 28)),
            (datetime(2023, 12, 31), "MONTH", datetime(2024, 1, 31)),
            (datetime(1969, 1, 31), "MONTH", datetime(1969, 2, 28)),
        ]
        for src, gran, want in cases:
            got = _batch(spark, [src]).select(
                value_next_time_millis(F.col("ts"), gran).alias("ms")) \
                .head().ms
            assert got == epoch_ms(want), (src, gran)


class TestTimeFunctionReferee:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(
        st.tuples(st.lists(DT, max_size=3), st.lists(DT, max_size=3)),
        min_size=1, max_size=12),
        op=st.sampled_from(["+", "-", "*", "/", "%"]),
        eq=st.sampled_from(["<", "<=", ">", ">=", "==", "!="]),
        goal=st.integers(min_value=-10**13, max_value=10**13))
    def test_set_semantics_all_operators(self, spark, rows, op, eq, goal):
        """timeFunction = compare(calculate(getMaxTime(F1),
        getMinTime(F2), op), goal, eq) — SET max/min over multi-valued
        fields, Java long arithmetic.  (* is skipped when the product
        exceeds 2^63: Java wraps silently, Spark ANSI errors — wrapped
        epoch products are garbage either side.)"""
        from datawave_spark.compiler import compile_query
        want = []
        for t1s, t2s in rows:
            ms1 = [epoch_ms(d) for d in t1s]
            ms2 = [epoch_ms(d) for d in t2s]
            if op == "*" and ms1 and ms2 and \
                    abs(max(ms1, key=abs)) * abs(max(ms2, key=abs)) >= 2**63:
                return  # skip whole example: overflow is a non-goal
            if op in ("/", "%") and 0 in ms2:
                return  # Java ArithmeticException / Spark ANSI error
            want.append(java_time_function(ms1, ms2, op, eq, goal))
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(rows)],
            "id long, T1 array<timestamp>, T2 array<timestamp>")
        q = f"filter:timeFunction(T1, T2, '{op}', '{eq}', {goal})"
        got_ids = {r.id for r in compile_query(df, q).collect()}
        assert got_ids == {i for i, w in enumerate(want) if w}

    def test_any_unparseable_value_is_false(self, spark):
        """getMaxTime/getMinTime throw ParseException on the FIRST bad
        value — the whole function is false even when the parseable
        subset alone would satisfy the comparison (the reference never
        evaluates the subset)."""
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            [(0, ["2024-01-02"], ["2024-01-01"]),                 # clean
             (1, ["2024-01-02", "garbage"], ["2024-01-01"]),      # bad F1
             (2, ["2024-01-02"], ["2024-01-01", "garbage"])],     # bad F2
            "id long, T1 array<string>, T2 array<string>")
        q = "filter:timeFunction(T1, T2, '-', '>', 0)"
        got = {r.id for r in compile_query(df, q).collect()}
        assert got == {0}

    def test_null_elements_are_absence_not_parse_failure(self, spark):
        """A NULL array element is ABSENCE (the reference's
        FunctionalSet holds only actual values) — it must not trip the
        every-value-parses check the way 'garbage' does (review r8:
        the first cut counted nulls in the denominator and went
        false)."""
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            [(0, ["2024-01-02", None], ["2024-01-01"]),   # null elem ok
             (1, [None], ["2024-01-01"]),                 # all-null side
             (2, [], ["2024-01-01"])],                    # empty side
            "id long, T1 array<string>, T2 array<string>")
        q = "filter:timeFunction(T1, T2, '-', '>', 0)"
        got = {r.id for r in compile_query(df, q).collect()}
        assert got == {0}


class TestMaxMinValueReferee:
    # mixed-format date strings where lexicographic != temporal order
    DATES = ["2024-01-15", "20231231", "2023-06-01 12:00:00",
             "20240102", "1969-07-20", "2024-01-02", "19691231",
             "2100-01-01", "1900-02-28 23:59:59"]

    @staticmethod
    def _parse(s):
        for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y%m%d"):
            try:
                return datetime.strptime(s, fmt)
            except ValueError:
                continue
        raise ValueError(s)

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(st.lists(st.sampled_from(DATES), min_size=1,
                                  max_size=5), min_size=1, max_size=10))
    def test_value_selected_by_parsed_time(self, spark, rows):
        """getMaxValue/getMinValue return the VALUE whose parsed TIME
        is extreme (Java tracks getTime(date) > max), not the
        lexicographic extreme — '20240102' beats '2023-12-31' despite
        sorting before it as a string.  Ties (same instant, different
        strings) accept any tied value: Java keeps first-encountered in
        nondeterministic set order."""
        from datawave_spark.compiler import CompileContext
        from datawave_spark.functions.filter_functions import (
            f_get_max_value, f_get_min_value)
        from datawave_spark.jexl.ast import Identifier
        df = spark.createDataFrame(
            [(i, vs) for i, vs in enumerate(rows)],
            "id long, D array<string>")
        ctx = CompileContext.for_dataframe(df)
        out = {r.id: (r.mx, r.mn) for r in df.select(
            "id",
            f_get_max_value(ctx, [Identifier("D")]).alias("mx"),
            f_get_min_value(ctx, [Identifier("D")]).alias("mn")).collect()}
        for i, vs in enumerate(rows):
            times = [self._parse(v) for v in vs]
            tmax, tmin = max(times), min(times)
            assert out[i][0] in {v for v, t in zip(vs, times) if t == tmax}
            assert out[i][1] in {v for v, t in zip(vs, times) if t == tmin}


def java_after_date(t_ms, start_dt, gran):
    return t_ms >= epoch_ms(java_calendar_add(start_dt, gran))


def java_before_date(t_ms, end_dt):
    return t_ms <= epoch_ms(end_dt) - 1


def java_between_dates(t_ms, start_dt, end_dt, gran):
    return (epoch_ms(start_dt) <= t_ms
            <= epoch_ms(java_calendar_add(end_dt, gran)) - 1)


class TestDateBoundReferee:
    """afterDate:770 / beforeDate:949 / betweenDates:1127 bound
    arithmetic vs the ported referee: start bumped by its own
    granularity for after, end-1 for before, [start, next(end)-1]
    for between — over DAY, MONTH, SECOND, and compact-digit
    granularities."""

    BOUND_FORMATS = [            # (render, granularity)
        (lambda d: d.strftime("%Y-%m-%d"), "DAY"),
        (lambda d: d.strftime("%Y%m%d"), "DAY"),
        (lambda d: d.strftime("%Y-%b"), "MONTH"),
        (lambda d: d.strftime("%Y%m%d%H"), "HOUR"),
        (lambda d: d.strftime("%Y-%m-%d %H:%M:%S"), "SECOND"),
    ]

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(dts=st.lists(DT, min_size=1, max_size=15),
           bounds=st.tuples(DT, DT),
           case=st.sampled_from(range(5)))
    def test_bounds_match_java(self, spark, dts, bounds, case):
        from datawave_spark.compiler import compile_query
        render, gran = self.BOUND_FORMATS[case]
        lo_dt, hi_dt = sorted(bounds)
        lo_s, hi_s = render(lo_dt), render(hi_dt)
        # the rendered string is what both sides parse: re-parse it for
        # the referee truth (render truncates to the granularity)
        from datawave_spark.functions.filter_functions import (
            _parse_date_literal)
        lo_p, g1 = _parse_date_literal(lo_s, None)
        hi_p, g2 = _parse_date_literal(hi_s, None)
        assert (g1, g2) == (gran, gran)   # format list picks our case
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(dts)], "id long, T timestamp")
        for q, want_fn in [
            (f"filter:afterDate(T, '{lo_s}')",
             lambda t: java_after_date(t, lo_p, gran)),
            (f"filter:beforeDate(T, '{hi_s}')",
             lambda t: java_before_date(t, hi_p)),
            (f"filter:betweenDates(T, '{lo_s}', '{hi_s}')",
             lambda t: java_between_dates(t, lo_p, hi_p, gran)),
        ]:
            got = {r.id for r in compile_query(df, q).collect()}
            want = {i for i, d in enumerate(dts) if want_fn(epoch_ms(d))}
            assert got == want, (q, [str(d) for d in dts])


class TestRangePatternOverloads:
    """The 3/4-arg rangePattern forms: bounds parse with the EXPLICIT
    pattern and bump by ITS granularity (getNextTime(start, rangeFormat,
    granularity)); the field side uses the default list (4-arg
    betweenDates) or its own explicit pattern (5-arg)."""

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(dts=st.lists(DT, min_size=1, max_size=10),
           bounds=st.tuples(DT, DT),
           jf=st.sampled_from(["yyyyMMdd", "MM/dd/yyyy", "yyyy-MMM"]))
    def test_range_pattern_bounds(self, spark, dts, bounds, jf):
        from datawave_spark.compiler import compile_query
        from datawave_spark.functions.filter_functions import (
            _java_fmt_to_strptime, _parse_date_literal)
        render = _java_fmt_to_strptime(jf)
        lo_dt, hi_dt = sorted(bounds)
        lo_s, hi_s = lo_dt.strftime(render), hi_dt.strftime(render)
        lo_p, gran = _parse_date_literal(lo_s, jf)
        hi_p, _ = _parse_date_literal(hi_s, jf)
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(dts)], "id long, T timestamp")
        cases = [
            (f"filter:afterDate(T, '{lo_s}', '{jf}')",
             lambda t: java_after_date(t, lo_p, gran)),
            (f"filter:beforeDate(T, '{hi_s}', '{jf}')",
             lambda t: java_before_date(t, hi_p)),
            (f"filter:betweenDates(T, '{lo_s}', '{hi_s}', '{jf}')",
             lambda t: java_between_dates(t, lo_p, hi_p, gran)),
        ]
        for q, want_fn in cases:
            got = {r.id for r in compile_query(df, q).collect()}
            want = {i for i, d in enumerate(dts) if want_fn(epoch_ms(d))}
            assert got == want, (q, [str(d) for d in dts])


PERIOD_ALPHABET = "ab."


class TestPeriodExtractorReferee:
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(inputs=st.lists(st.text(alphabet=PERIOD_ALPHABET, min_size=1,
                                   max_size=10), min_size=1, max_size=20),
           pos=st.integers(min_value=0, max_value=4))
    def test_matches_java_on_nonquirk_inputs(self, spark, inputs, pos):
        """Exact agreement with the line-ported Java on every input
        whose SCANNED string does not start with '.' — trailing
        periods, consecutive periods, no-period inputs, empty-segment
        results all included.  (A leading period triggers the Java
        indexOf-skip quirk — pinned separately.)"""
        df = spark.createDataFrame([(i, s) for i, s in enumerate(inputs)],
                                   "id long, v string")
        got = {r.id: (r.l, r.r) for r in df.select(
            "id",
            match_left_of_period(F.col("v"), pos).alias("l"),
            match_right_of_period(F.col("v"), pos).alias("r")).collect()}
        for i, s in enumerate(inputs):
            peeled = s[s.find(".") + 1:]
            if not peeled.startswith("."):
                assert got[i][0] == java_left_of_period(s, pos), (s, pos)
            if not s.startswith("."):
                assert got[i][1] == java_right_of_period(s, pos), (s, pos)

    def test_leading_period_quirk_divergence_pinned(self, spark):
        """Inputs whose scanned string starts with '.' hit the Java
        getIndicesOfPeriods skip (indexOf from lastIndex+1 misses a
        period at index 0, leaving a trailing -1 index):
        getMatchToRightOfPeriod('.a.b', 0) returns the WHOLE input via
        substring(-1+1), and getMatchToLeftOfPeriod('F..a', 0) throws
        StringIndexOutOfBounds on substring(0, -1).  We diverge to the
        index-free reading (split on every period), which is total and
        position-consistent; pinned here so the divergence is a
        decision, not an accident."""
        # referee reproduces the Java quirk faithfully
        assert java_right_of_period(".a.b", 0) == ".a.b"
        assert java_right_of_period(".a.b", 1) == "b"   # off-by-one cascade
        with pytest.raises(IndexError):
            java_left_of_period("F..a", 0)
        df = spark.createDataFrame([(".a.b",), ("F..a",)], "v string")
        rows = df.select(
            "v",
            match_right_of_period(F.col("v"), 0).alias("r0"),
            match_right_of_period(F.col("v"), 1).alias("r1"),
            match_left_of_period(F.col("v"), 0).alias("l0")).collect()
        by_v = {r.v: r for r in rows}
        assert by_v[".a.b"].r0 == "b"     # split-reading, not whole input
        assert by_v[".a.b"].r1 == "a.b"   # position-consistent
        assert by_v["F..a"].l0 == ""      # total: empty segment, no error
