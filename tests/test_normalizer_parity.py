"""Normalizer two-sided parity referee (round 8).

Query literals normalize PYTHON-side (`normalize_literal`) while
stored values normalize SPARK-side (`norm.col`) — two implementations
of one canonicalization.  If both accept a raw value they must agree
on the canonical form, or `field == literal` silently misses stored
copies of that exact value (and the index stores a form the query
side never produces).

The r8 sweep found the date normalizer violating this outright:
identity on the Python side vs `to_timestamp` on the column side, so
an indexed date field missed EVERY equality lookup — and
`to_timestamp` ANSI-throws on the first malformed stored value.  Both
fixed (canonical 'yyyy-MM-dd HH:mm:ss.SSS', try_to_timestamp).

Allowed asymmetries (different ROLES, not drift):
- Python side RAISES on a malformed literal (query compile error)
  where the column side yields NULL (stored value dropped from the
  index / non-match) — e.g. number 'abc', ip '256.1.1.1'.
- _ip_col is IPv4-only (documented): IPv6 stored values normalize to
  NULL; the Python side still canonicalizes IPv6 literals.
- number float('NaN') stringifies 'nan' (py) vs 'NaN' (col): numeric
  comparisons never use the string form, and Spark's `=` treats
  NaN = NaN as true, so the forms never meet.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawave_spark.normalizers import NORMALIZERS

POOLS = {
    "noop": ["a", "A", "10", " x "],
    "lc": ["AbC", "ÀÉ", "10", "a\nB"],
    "lcNoDiacritics": ["Café", "ÀÉ", "naïve", "ABC", "ümlaut"],
    "number": ["10", "10.0", "010", "1e3", " 5 ", "+7", "-0", ".5",
               "Infinity"],
    "date": ["2024-01-05", "2024-01-05 10:00:00", "2024-01-05T10:00:00",
             "2024-01-05 10:00:00.123", "2024-01-05 10:00"],
    "ipAddress": ["1.2.3.4", "010.002.003.004", "255.255.255.255",
                  " 1.2.3.4 "],
    "trimLeadingZeros": ["007", "0", "000", "10", "00.5"],
    "hexString": ["DEADbeef", "0xAB"],
    "macAddress": ["AA-BB-CC-DD-EE-FF", "aa:bb:cc:dd:ee:ff"],
    "geo": ["40.7,-74.0", "-90,-180", "90,180"],
}

# raw values BOTH sides must reject their own way: python raises /
# column yields NULL (value dropped, scan never aborts)
REJECTS = {
    "number": ["abc", "0x10", ""],
    "date": ["nope", "2024-13-45"],
    "ipAddress": ["256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d"],
    "geo": ["x,y", "40.7"],
}


@pytest.mark.parametrize("name", sorted(POOLS))
def test_py_and_col_agree(spark, name):
    norm = NORMALIZERS[name]
    pool = POOLS[name]
    df = spark.createDataFrame([(v,) for v in pool], "v string")
    col_out = {r.v: r.o for r in
               df.select("v", norm.col(F.col("v")).cast("string")
                         .alias("o")).collect()}
    bad = []
    for v in pool:
        py = norm.normalize_literal(v)
        py_s, c = str(py), col_out[v]
        if py_s != c and not (
                isinstance(py, float) and c is not None
                and float(py) == float(c)):
            bad.append((v, py_s, c))
    assert not bad, bad


@pytest.mark.parametrize("name", sorted(REJECTS))
def test_malformed_rejected_both_ways(spark, name):
    norm = NORMALIZERS[name]
    pool = REJECTS[name]
    df = spark.createDataFrame([(v,) for v in pool], "v string")
    # column side: NULL, never an ANSI abort
    rows = df.select(norm.col(F.col("v")).cast("string").alias("o")) \
             .collect()
    assert all(r.o is None for r in rows), rows
    for v in pool:
        with pytest.raises((ValueError, TypeError)):
            norm.normalize_literal(v)


LIST_POOLS = {
    "list": ["a;b", " a , b ", "x", "", ";;", "a;;b", "A,B"],
    "lcNoDiacriticsList": ["Café;NAÏVE", "A,b", " X ; y "],
    # '1;x;3': the failing element drops, the REST survive (the
    # reference's per-value ingest normalize error-counts and
    # continues) — the r8 sweep found the column side keeping a NULL
    # hole and the python side raising away the whole value
    "numberList": ["1;2.5", " 10 , 020 ", "1;x;3", "abc", "1e2"],
}


@pytest.mark.parametrize("name", sorted(LIST_POOLS))
def test_list_normalizers_two_sided(spark, name):
    norm = NORMALIZERS[name]
    pool = LIST_POOLS[name]
    df = spark.createDataFrame([(v,) for v in pool], "v string")
    col_out = {r.v: r.o for r in
               df.select("v", norm.col(F.col("v"))
                         .cast("array<string>").alias("o")).collect()}
    bad = []
    for v in pool:
        py = [str(x) for x in norm.normalize_to_many(v)]
        c = list(col_out[v] or [])
        if py != c:
            if name == "numberList" and len(py) == len(c):
                try:
                    if all(float(a) == float(b) for a, b in zip(py, c)):
                        continue
                except (TypeError, ValueError):
                    pass
            bad.append((v, py, c))
    assert not bad, bad


def test_indexed_date_field_round_trip(spark):
    """The bug that motivated this referee: equality + range on a
    date-normalized field must work via the index path (no re-eval)
    exactly as via the evaluator."""
    from datawave_spark.compiler import compile_query
    from datawave_spark.sources.index_frame import build_index, index_query
    rows = [("r0", "2024-01-05"), ("r1", "2024-01-05 10:00:00"),
            ("r2", "2024-01-06T00:00:00"), ("r3", "bogus"), ("r4", None)]
    ev = spark.createDataFrame(rows, "uid string, DT string")
    ft = {"DT": "date"}
    idx = build_index(ev, ["DT"], "uid", field_types=ft)

    def uids(df):
        return sorted(r.uid for r in df.select("uid").distinct().collect())

    for q, want in [('DT == "2024-01-05"', ["r0"]),
                    ('DT == "2024-01-05 10:00"', ["r1"]),
                    ('DT >= "2024-01-05 10:00:00"', ["r1", "r2"]),
                    ('DT < "2024-01-06"', ["r0", "r1"])]:
        assert uids(index_query(ev, idx, q, "uid", field_types=ft,
                                fields={"DT"})) == want, q
        assert uids(compile_query(ev, q, field_types=ft)) == want, q
