"""Parity: _spark_datetime_parseable vs Spark's own try_cast.

The planner's #LENIENT_FIELDS handling (apply_lenient_fields →
_normalization_fails) decides driver-side whether a datetime literal
would survive ``try_cast(lit as timestamp/date)`` — wrongly dropping a
parseable term removes a constraint, wrongly keeping an unparseable one
compiles a never-matching branch (advice r10).  This test pins the
validator against the engine itself over a hand-built corpus of every
divergent shape found empirically plus a combinatorial sweep.
"""

import pytest

from datawave_spark.plans.planner import _spark_datetime_parseable

CORPUS = [
    # dates and partial dates
    "2015-03-18", "2015-3-8", "2015-03", "2015-3", "2015", "201", "12",
    "20150318", "+2015-03-18", "-2015-03-18", "0001-01-01", "9999-12-31",
    "99999-03-18", "999999-03-18", "9999999-03-18", "99999999-03-18",
    "2015-13-18", "2015-00-18", "2015-02-30", "2015-02-29", "2016-02-29",
    " 2015-03-18 ", "2015-03-18 ", "2015-03-18T", "2015-03-18X",
    "2015-03-18 utter garbage", "2015-03-18Tanything", "2015-02-29 12:00",
    # date + time
    "2015-03-18 12", "2015-03-18T12", "2015-03-18 12:03",
    "2015-03-18T12:03", "2015-03-18 12:03:17", "2015-03-18T12:03:17",
    "2015-3-8 1:2", "2015-3-8 1:2:3", "2015-03-18 1 2",
    "2015-03-18  12:03", "2015-03-18 12:", "2015-03-18 12:03:",
    "2015-03-18 24:00", "2015-03-18 23:60", "2015-03-18 23:59:60",
    "2015-03-18 12.5",
    # fractions
    "2015-03-18 12:03:17.", "2015-03-18 12:03:17.1",
    "2015-03-18 12:03:17.123", "2015-03-18 12:03:17.123456789",
    "2015-03-18 12:03:17.1234567890123456789",
    # zones after full time
    "2015-03-18T12:03:17Z", "2015-03-18 12:03:17 UTC",
    "2015-03-18 12:03:17 GMT", "2015-03-18 12:03:17 UT",
    "2015-03-18 12:03:17 Zulu", "2015-03-18 12:03:17 utc",
    "2015-03-18 12:03:17+01", "2015-03-18 12:03:17+01:30",
    "2015-03-18 12:03:17+01:30:15", "2015-03-18 12:03:17 +01",
    "2015-03-18 12:03:17  +01", "2015-03-18 12:03:17+19",
    "2015-03-18 12:03:17+18", "2015-03-18 12:03:17-18",
    "2015-03-18 12:03:17 America/New_York",
    "2015-03-18 12:03:17 america/new_york",
    "2015-03-18 12:03:17 XYZ", "2015-03-18 12:03:17 Foo/Bar",
    "2015-03-18 12:03:17 UTC+01", "2015-03-18 12:03:17 GMT+8",
    "2015-03-18 12:03:17 UTC+19", "2015-03-18 12:03:17.5Z",
    "2015-03-18 12:03:17.Z",
    # zones after partial time (rejected for timestamp, tail for date)
    "2015-03-18 12:03Z", "2015-03-18 12:03 UTC", "2015-03-18 12:03+01",
    "2015-03-18 12:03 America/New_York", "2015-03-18 12 UTC",
    "2015-03-18T12Z", "2015-03-18T12+01", "2015-03-18 12 +01",
    "2015-03-18 12:03 Z",
    # time-only
    "12:30", "1:2", "12:30:15", "12:30:15.5", "T12", "T2", "T2:3",
    "T12:30", "T12:30:15", "  12:30  ", "12:30 UTC", "T12 UTC",
    "12:30+01", "T12:30Z", "24:00", "12:60", "1:2:3", "T", "T:30",
    # junk
    "abc", "", "   ", "-", "+", "2015-", "--2015", "2015--03",
]

# combinatorial sweep: date bases x time forms x zone suffixes
_BASES = ["2016-02-29", "2015-06-31", "1999-12-31", "10000-01-01"]
_TIMES = ["", " 5", " 5:6", " 5:6:7", " 5:6:7.89", "T23:59:59",
          " 25:00:00", " 23:59:59"]
_ZONES = ["", "Z", " UTC", "+05:30", " Europe/Paris", " Mars/Phobos"]
SWEEP = [b + t + z for b in _BASES for t in _TIMES for z in _ZONES
         if not (t == "" and z not in ("",))] + [
    t.strip() + z for t in _TIMES[1:] for z in _ZONES]

ALL = CORPUS + SWEEP


@pytest.mark.parametrize("kind", ["timestamp", "date"])
def test_parity_vs_try_cast(spark, kind):  # noqa: F811
    df = spark.createDataFrame([(s,) for s in ALL], "s string") \
        .selectExpr("s", f"try_cast(s as {kind}) is not null as ok")
    truth = {r.s: r.ok for r in df.collect()}
    bad = []
    for s in ALL:
        mine = _spark_datetime_parseable(s, date_only=(kind == "date"))
        if mine != truth[s]:
            bad.append((s, truth[s], mine))
    assert not bad, f"{len(bad)} divergent shapes vs {kind}: {bad[:20]}"
