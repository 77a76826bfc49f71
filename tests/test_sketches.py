"""Deterministic HLL: accuracy vs exact distinct, merge property,
determinism across partitionings."""

import os

import pytest
from pyspark.sql import functions as F

from datawave_spark.operators.sketches import hll_estimate
from datawave_spark.sources.parquet import read_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ev(spark):
    return read_parquet(spark, f"{SF_DIR}/events.parquet").cache()


def test_hll_estimate_within_standard_error(spark, ev):
    got = {r.field: r.estimate for r in
           hll_estimate(ev, ["user_id", "event_id"], b=8).collect()}
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_id").alias("e")).collect()[0]
    # raw HLL (no corrections): ~1.04/sqrt(256) = 6.5% standard error;
    # allow 3 sigma
    for field, true in (("user_id", exact.u), ("event_id", exact.e)):
        rel = abs(got[field] - true) / true
        assert rel < 0.20, f"{field}: est {got[field]} vs {true} ({rel:.1%})"


def test_hll_partitioning_invariance(spark, ev):
    """max-register merge is associative/commutative: any partitioning
    gives the identical sketch and estimate."""
    a = sorted(hll_estimate(ev, ["user_id"], b=8).collect())
    b = sorted(hll_estimate(ev.repartition(17), ["user_id"], b=8).collect())
    c = sorted(hll_estimate(ev.coalesce(1), ["user_id"], b=8).collect())
    assert a == b == c


def test_hll_merge_equals_whole(spark, ev):
    """Sketching two halves and merging (union -> same register max)
    equals sketching the whole — the incremental-ingest property."""
    lo = ev.filter(F.col("event_id") % 2 == 0)
    hi = ev.filter(F.col("event_id") % 2 == 1)
    merged = sorted(hll_estimate(lo.unionByName(hi), ["user_id"],
                                 b=8).collect())
    whole = sorted(hll_estimate(ev, ["user_id"], b=8).collect())
    assert merged == whole


def test_hll_other_register_counts(spark, ev):
    """b != 8 exercises the rescaled-window constant path."""
    for b in (6, 10):
        est = {r.field: r.estimate
               for r in hll_estimate(ev, ["user_id"], b=b).collect()}
        true = ev.select("user_id").distinct().count()
        assert abs(est["user_id"] - true) / true < 0.35
