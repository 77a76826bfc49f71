#!/usr/bin/env python3
"""Capture .explain("formatted") for the named query keys into
plans/<tag>/<key>_<suffix>.txt (the optimization-round evidence files).

Usage: python tools/capture_plans.py <tag> <suffix> key [key ...]
e.g.   python tools/capture_plans.py r11 before geowave_polygon_data

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) WITHOUT
executing the query (planning only), so capture is cheap and does not
perturb concurrent measurements.  Streaming keys whose builder executes
eagerly are skipped unless --exec is given.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    tag, suffix, *keys = sys.argv[1:]

    from datawave_spark.session import get_spark
    import __spark_entry__ as m

    spark = get_spark("capture_plans")
    from datawave_spark.sources import prepared
    prepared.build_all(spark, sf_dir)

    qs = m.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    rc = 0
    for k in keys:
        if k not in qs:
            print(f"SKIP {k}: not a registered key", file=sys.stderr)
            rc = 1
            continue
        try:
            df = qs[k](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record the failure
            txt = f"PLAN CAPTURE FAILED: {e}"
            rc = 1
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
