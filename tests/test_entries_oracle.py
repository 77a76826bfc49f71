"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count, column names, and (order-insensitively)
values."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


QUERY_KEYS = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_oracle_match(spark, duck, key):
    qfn = entrymod.queries()[key]
    spark_pdf = qfn(spark, SF_DIR).toPandas()
    oracle = entrymod.oracle_sql().get(key)
    if oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    duck_pdf = duck.execute(oracle).fetchdf()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), \
        f"{key}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    assert len(spark_pdf) == len(duck_pdf), \
        f"{key}: rows {len(spark_pdf)} != {len(duck_pdf)}"
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            pd.testing.assert_series_equal(
                a[c].astype(float), b[c].astype(float),
                check_exact=False, rtol=1e-9, atol=1e-9, check_names=False)
        else:
            assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), \
                f"{key}: value mismatch in column {c}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None
