"""Skew handling at the join layer (VERDICT r9 #3).

Reference analog: BalancedShardPartitioner exists precisely because a
hot shard/key breaks a naive partitioning first at scale.  Spark-side
the two tools are util.salted_join (explicit key-salting for a known
hot key) and AQE's skew-join split (runtime re-plan); this suite pins
that BOTH engage — the salted plan joins on (key, salt) so the hot key
spreads across ``salt`` tasks, and AQE marks the skewed partition
split in the final adaptive plan (``skew=true``) — and that both give
exactly the naive join's answers.  The measured 10×/100× skew tier
lives in tools/scale_probe.py (skew_join_* / skew_lsh_* ops, README
rows)."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.util import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one key (777) owns 80% of the fact side
    fact = spark.range(200000).select(
        F.when(F.col("id") % 5 != 0, F.lit(777))
        .otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"))
    dim = spark.range(50000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return fact, dim


class TestSaltedJoin:
    def test_same_answer_as_naive(self, spark, skewed):
        fact, dim = skewed
        naive = fact.join(dim, "k").select("k", "v", "w")
        salted = salted_join(fact, dim, "k", salt=8).select("k", "v", "w")
        a = sorted(map(tuple, naive.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b and len(a) > 0

    def test_salt_key_in_join_condition(self, spark, skewed):
        """The whole point of salting: the physical join keys include
        the salt column, so the hot key's rows hash to ``salt``
        different reducers instead of one."""
        fact, dim = skewed
        out = salted_join(fact, dim, "k", salt=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan
        # the salt must appear in a join node's keys, not merely as a
        # projected column
        join_lines = [ln for ln in plan.splitlines()
                      if "Join" in ln and "__salt" in ln]
        assert join_lines, plan[:2000]


class TestAqeSkewSplit:
    def test_skew_split_engages(self, spark, skewed):
        """With broadcast off (the 100 TB fact-to-big-dim shape) and
        AQE skew thresholds at test scale, the final adaptive plan
        must mark the hot partition split (AQEShuffleRead ... skewed /
        skew=true) — the runtime half of the skew story."""
        fact, dim = skewed
        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "65536",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        }
        old = {k: spark.conf.get(k) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            out = fact.join(dim, "k").select("k", "v", "w")
            n = len(out.collect())
            plan = out._jdf.queryExecution().executedPlan().toString()
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
        assert n > 0
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]
