"""Chained queries: results of query A parameterize query B.

Reference: warehouse/query-core/src/main/java/datawave/query/tables/
chained/ChainedQueryTable.java (+ strategy/) — runs logic A, feeds its
result values into logic B's query via a chain strategy.

Spark restatement: both stages are DataFrames, so the "chain strategy"
is a join: semi-join B's field against A's extracted values (exact
ChainedQueryTable semantics, but executed as ONE plan — Catalyst can
broadcast the A side when small instead of the reference's
collect-and-rewrite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datawave_spark.compiler import compile_query


def chained_query(df_a: DataFrame, jexl_a: str, extract_col: str,
                  df_b: DataFrame, target_field: str,
                  jexl_b: str | None = None) -> DataFrame:
    """Run A's predicate, extract ``extract_col`` values, return B rows
    whose ``target_field`` matches any of them (optionally further
    filtered by ``jexl_b``)."""
    keys = (compile_query(df_a, jexl_a)
            .select(F.col(extract_col).cast("string").alias("__chain_key"))
            .distinct())
    out = df_b.join(
        keys, df_b[target_field].cast("string") == keys["__chain_key"],
        "left_semi")
    if jexl_b:
        out = compile_query(out, jexl_b)
    return out
