"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); production targets a large
cluster — the configs below are the ones that matter in both: AQE on
(runtime re-planning, skew-join handling, partition coalescing), shuffle
partitions sized to the environment, Arrow enabled for the Pandas-UDF slow
path, and a UTC session timezone so results compare bit-for-bit against
the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB input splits — at 100 TB this yields ~800k tasks, fine for a
    # 1000-executor cluster; local runs read far less and AQE coalesces.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Driver testdata uses parquet TIMESTAMP(NANOS); read as epoch-nanos
    # longs and rebuild timestamps in sources.parquet.read_parquet.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "datawave_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or get) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism and shuffle-partition
    count; on a real cluster ``master`` comes from spark-submit and AQE
    re-sizes shuffles at runtime anyway.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf.setdefault("spark.sql.shuffle.partitions", str(cpus))
    conf.setdefault("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = ("region", "nation", "customer",
                                          "supplier", "part", "orders",
                                          "lineitem", "events", "documents",
                                          "embeddings")) -> dict:
    """Load the driver's parquet tables and register them as temp views."""
    from datawave_spark.sources.parquet import read_parquet
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = read_parquet(spark, path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
