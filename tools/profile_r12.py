#!/usr/bin/env python3
"""Round-12 profiling harness: per-key build/plan/exec split plus
driver-phase timing, for the anti-scaling suspects.  Usage:

    SPARK_GRAFT_CPUS=32 python tools/profile_r12.py key1 key2 ...

For each key prints: build (entry fn → DataFrame), plan
(executedPlan force), exec (noop write), for 3 repeats.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from datawave_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("datawave_spark_profile")
    queries = entrymod.queries()
    keys = sys.argv[1:]
    try:
        from datawave_spark.sources import prepared
        prepared.build_all(spark, SF_DIR)
    except Exception as e:
        print(f"prepare failed: {e}", file=sys.stderr)

    for key in keys:
        fn = queries[key]
        for rep in range(3):
            spark.catalog.clearCache()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            print(f"{key} rep={rep} build={t1-t0:.3f} plan={t2-t1:.3f} "
                  f"exec={t3-t2:.3f} total={t3-t0:.3f}", flush=True)


if __name__ == "__main__":
    main()
