"""TLD (top-level document) parent/child hierarchy.

Reference: warehouse/query-core/src/main/java/datawave/query/tld/
TLDQueryIterator.java:54 + TLD.java:21 — child documents extend the
parent uid with dotted suffixes (``h1.h2.h3.child.index``); TLD queries
match across a whole family; AncestorQueryLogic
(query/tables/AncestorQueryLogic.java:17) matches a document when it or
any ancestor matches.

Spark restatement: the family key is a derived column (uid prefix); the
three query modes are joins:

- ``tld_rollup``   — return every member of families where ANY member
                     matches (TLDQueryIterator semantics): semi-join on
                     the family key;
- ``ancestors_match`` — return documents whose ancestor chain (self
                     included) matches: join the match set against each
                     row's ancestor-prefix list;
- nested alternative: ingest children as ``array<struct>`` (SURVEY
  §1.5) and use grouping: functions — both representations supported.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from datawave_spark.compiler import compile_query

TLD_PARTS = 3  # h1.h2.h3 prefix identifies the top-level document


def tld_key(uid: Column, parts: int = TLD_PARTS) -> Column:
    """Family key: first ``parts`` dot-segments of the uid (TLD.java
    parses the same prefix)."""
    return F.concat_ws(".", F.slice(F.split(uid, r"\."), 1, parts))


def tld_rollup(df: DataFrame, jexl: str, uid_col: str = "uid",
               parts: int = TLD_PARTS) -> DataFrame:
    """All members of families containing ≥1 matching document."""
    keyed = df.withColumn("__tld", tld_key(F.col(uid_col), parts))
    hits = compile_query(keyed, jexl).select("__tld").distinct()
    return keyed.join(hits, "__tld", "left_semi").drop("__tld")


def parents_only(df: DataFrame, uid_col: str = "uid",
                 parts: int = TLD_PARTS) -> DataFrame:
    """Just the top-level documents (uid == family key)."""
    return df.filter(F.size(F.split(F.col(uid_col), r"\.")) <= parts)


def ancestors_match(df: DataFrame, jexl: str, uid_col: str = "uid",
                    parts: int = TLD_PARTS) -> DataFrame:
    """AncestorQueryLogic: keep documents where the document itself OR
    any ancestor (shorter dotted prefix down to the TLD) matches."""
    keyed = df.withColumn("__segs", F.split(F.col(uid_col), r"\."))
    hit_uids = compile_query(df, jexl).select(F.col(uid_col).alias("__hit")) \
        .distinct()
    n = F.size(F.col("__segs"))
    prefixes = F.transform(
        F.sequence(F.lit(parts), n),
        lambda k: F.concat_ws(".", F.slice(F.col("__segs"), 1, k)))
    expanded = keyed.withColumn("__prefix", F.explode(prefixes))
    matched = expanded.join(hit_uids,
                            expanded["__prefix"] == hit_uids["__hit"],
                            "left_semi")
    return matched.select(df.columns).distinct()


def parent_query(df: DataFrame, jexl: str, uid_col: str = "uid",
                 parts: int = TLD_PARTS) -> DataFrame:
    """ParentQueryLogic (query/tables/ParentQueryLogic.java:20 —
    ParentQueryIterator + DedupeColumnFamilies): evaluate the predicate
    against every family member, then return the PARENT document of
    each match (one dotted segment up, floored at the top-level
    document; a matching TLD returns itself), deduplicated.

    Scale shape: one semi-join on the derived parent uid — the match
    set projects to distinct parent uids (small), then a broadcast-able
    semi-join fetches the parent documents."""
    hits = compile_query(df, jexl)
    segs = F.split(F.col(uid_col), r"\.")
    n = F.size(segs)
    parent = F.when(
        n > parts,
        F.concat_ws(".", F.slice(segs, 1, F.greatest(n - 1, F.lit(parts))))
    ).otherwise(F.col(uid_col))
    parent_uids = hits.select(parent.alias("__p")).distinct()
    return df.join(parent_uids, df[uid_col] == F.col("__p"), "left_semi")
