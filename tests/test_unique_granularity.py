"""#UNIQUE granularity parity (round 8): the reference keys by
UniqueGranularity's FORMATTED STRINGS (DateTimeValueFormatter,
UniqueGranularity.java:29-71) and passes a non-datetime value through
as itself (:162) — the prior date_trunc implementation keyed by
timestamps, ANSI-aborted on the first non-datetime value, and
bucketed TENTH_OF_HOUR by 6 minutes where the Java string-chop
semantics is floor(minute/10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawave_spark.operators.unique import _unique_key, unique_tuples


@pytest.fixture(scope="module")
def vals(spark):
    rows = [("r0", "2024-03-07 14:37:22.456"),
            ("r1", "2024-03-07 14:05:09"),
            ("r2", "2024-03-07T14:59:59"),
            ("r3", "not-a-date"),
            ("r4", None)]
    return spark.createDataFrame(rows, "uid string, V string").cache()


def _keys(df, gran):
    rows = df.select("uid", _unique_key("V", gran).alias("k")) \
             .orderBy("uid").collect()
    return [r.k for r in rows]


class TestGranularityStrings:
    def test_formats_match_reference(self, spark, vals):
        # UniqueGranularity.java:29-71 pattern table
        assert _keys(vals, "YEAR")[0] == "2024"
        assert _keys(vals, "MONTH")[0] == "2024-03"
        assert _keys(vals, "DAY")[0] == "2024-03-07"
        assert _keys(vals, "HOUR")[0] == "2024-03-07T14"
        assert _keys(vals, "MINUTE")[0] == "2024-03-07T14:37"
        assert _keys(vals, "SECOND")[0] == "2024-03-07T14:37:22"
        assert _keys(vals, "MILLISECOND")[0] == "2024-03-07T14:37:22.456"

    def test_tenth_of_hour_is_string_chop(self, spark, vals):
        """Pattern "yyyy-MM-dd'T'HH:m" minus its last char: minute 37
        → tenth '3'; minutes 0-9 → EMPTY tenth (the Java quirk);
        10-minute buckets, not 6."""
        ks = _keys(vals, "TENTH_OF_HOUR")
        assert ks[0] == "2024-03-07T14:3"    # :37
        assert ks[1] == "2024-03-07T14:"     # :05 → unpadded "5" → ""
        assert ks[2] == "2024-03-07T14:5"    # :59

    def test_non_datetime_passes_through(self, spark, vals):
        """UniqueGranularity.java:162 — parse failure keys by the
        ORIGINAL value; must also never ANSI-abort the scan."""
        for g in ("DAY", "MINUTE", "TENTH_OF_HOUR", "MILLISECOND"):
            ks = _keys(vals, g)
            assert ks[3] == "not-a-date", g
            assert ks[4] is None, g

    def test_unique_tuples_mixed_values(self, spark, vals):
        out = unique_tuples(vals, {"V": "DAY"})
        got = sorted(r.V for r in out.collect() if r.V is not None)
        assert got == ["2024-03-07", "not-a-date"]
