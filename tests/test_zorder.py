"""Z-order clustering: row-group stats must stay selective on EVERY
listed column (the multi-dimensional pruning a linear sort cannot give
its trailing columns)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datawave_spark.util import z_order_write


def _avg_file_span(path: str, col: str, lo: float, hi: float) -> float:
    """Mean fraction of the global [lo, hi] range each FILE's
    min/max stats cover for ``col`` — 1.0 = stats useless, small =
    prunable."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None:
            spans.append((fmax - fmin) / max(hi - lo, 1e-9))
    assert spans
    return sum(spans) / len(spans)


def test_zorder_keeps_both_columns_selective(spark, tmp_path):
    n = 40_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 10_000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 10_000).alias("b"))
    zpath = str(tmp_path / "zord")
    z_order_write(df, zpath, ["a", "b"], bits=12, num_parts=8)
    lpath = str(tmp_path / "linear")
    (df.repartitionByRange(8, "a").sortWithinPartitions("a")
     .write.parquet(lpath))
    za = _avg_file_span(zpath, "a", -10_000, 10_000)
    zb = _avg_file_span(zpath, "b", -10_000, 10_000)
    la = _avg_file_span(lpath, "a", -10_000, 10_000)
    lb = _avg_file_span(lpath, "b", -10_000, 10_000)
    # linear sort: leading column tightly clustered, trailing useless
    assert la < 0.3 and lb > 0.9
    # z-order: BOTH columns substantially tighter than the useless case
    assert za < 0.7 and zb < 0.7

def test_zorder_roundtrip_content(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (999 - F.col("id")).alias("b"))
    p = str(tmp_path / "z2")
    z_order_write(df, p, ["a", "b"], bits=10, num_parts=4)
    back = spark.read.parquet(p)
    assert back.count() == 1000
    assert back.agg(F.sum("a")).collect()[0][0] == sum(range(1000))


def test_z_value_interleave_inverse(spark):
    """De-interleaving the Morton value must recover both inputs
    exactly for every pair — the bit layout (bit b of col i at
    position b·N+i) checked against a Python reference."""
    import random
    rnd = random.Random(7)
    pairs = [(rnd.randrange(1 << 10), rnd.randrange(1 << 10))
             for _ in range(200)]
    from datawave_spark.util import z_value
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select("a", "b",
                     z_value([F.col("a"), F.col("b")], bits=10)
                     .alias("z")).collect()
    for r in rows:
        a = b = 0
        for bit in range(10):
            a |= ((r.z >> (bit * 2)) & 1) << bit
            b |= ((r.z >> (bit * 2 + 1)) & 1) << bit
        assert (a, b) == (r.a, r.b)
