#!/usr/bin/env python3
"""Local replica of the driver's correctness gate at sf0.01: run every
queries() entry on Spark AND its oracle_sql() on DuckDB, compare column
names, row count and order-insensitive values.  Prints one line per key
and a summary; exit 1 on any mismatch."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
ONLY = set(sys.argv[1:])


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Mirror the driver's list-intolerant canonicalizer: it sorts raw
    # object columns, so an array/struct-typed result column crashes the
    # gate with "unhashable type: 'list'".  Fail loudly here too (r10
    # lesson: .astype(str) masked exactly that class of driver failure).
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, dict, set))
                or type(v).__name__ == "ndarray").any():
            raise TypeError(
                f"column {c!r} holds unhashable values (list/ndarray) — "
                "the driver gate will crash; array_join it on both sides")
    out = df.astype(str)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            out[c] = df[c].round(6).astype(str)
    return out.sort_values(by=list(out.columns), kind="mergesort") \
              .reset_index(drop=True)


def main() -> int:
    from datawave_spark.session import get_spark
    import __spark_entry__ as m

    spark = get_spark("verify")
    n = m.entry(spark).count()
    print(f"entry() smoke: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = m.queries(), m.oracle_sql()
    bad = []
    for key in sorted(qs):
        if ONLY and key not in ONLY:
            continue
        t0 = time.perf_counter()
        try:
            spdf = qs[key](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {key}: spark error {e}", flush=True)
            bad.append(key)
            continue
        sql = oracles.get(key)
        if sql is None:
            print(f"ok   {key}: rows-only ({len(spdf)}) "
                  f"[{time.perf_counter()-t0:.1f}s]", flush=True)
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {key}: duckdb error {e}", flush=True)
            bad.append(key)
            continue
        status = None
        if sorted(spdf.columns) != sorted(ddf.columns):
            status = f"cols {sorted(spdf.columns)} != {sorted(ddf.columns)}"
        elif len(spdf) != len(ddf):
            status = f"rows {len(spdf)} != {len(ddf)}"
        else:
            a, b = canon(spdf), canon(ddf)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                status = f"values differ on {int(diff.sum())}/{len(a)} rows"
        if status:
            print(f"FAIL {key}: {status}", flush=True)
            bad.append(key)
        else:
            print(f"ok   {key}: {len(spdf)} rows "
                  f"[{time.perf_counter()-t0:.1f}s]", flush=True)
    print(f"\n{len(bad)} mismatching keys: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
