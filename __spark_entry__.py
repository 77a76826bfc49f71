"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship JEXL-compiled query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Query keys are grouped by the SURVEY §2 area they cover:
  jexl_*      — the JEXL→Column compiler spine (§2.2)
  filter_*    — filter:/f: evaluation-phase functions (§2.2)
  geo_*       — geo: functions (§2.2)
  groupby_*   — #GROUPBY aggregators (§2.4)
  unique_*    — #UNIQUE granularities (§2.4)
  discovery_* / facet_* / count_* — index-derived aggregations (§2.4)
  tpch_*      — CachedResults-style SQL surface (§2.1 sink; free on Spark)
  edge_*      — graph/edge queries (§2.3/§3.3)
  ssdeep_*    — similarity join (§2.3)
  dedup_* / ann_* / text_* — training-data pipeline ops
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datawave_spark.entries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: JEXL-compiled predicate + groupBy over events at
    sf0.001 — exercises parser, compiler, multi-value semantics and the
    aggregation transform in one plan."""
    return QUERIES["flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries, ordered so keys WITHOUT current green
    driver evidence come first — the driver gate samples a
    prefix-biased subset per round, so this rotation turns
    judge-verified claims into driver facts for every operator over
    successive rounds.  A key is "settled" (sorted last) only when

    (a) some committed ``CORRECTNESS_r*.json`` records a
        ``hash_match: true`` row for it (merely APPEARING in a round
        file is not evidence — a failure or ``no_oracle`` record must
        re-queue the key, which the previous membership-based sort got
        wrong: ``ann_lsh_topk`` gained an oracle after a ``no_oracle``
        record and then never re-sampled), AND
    (b) its CURRENT ``oracle_sql()`` string still md5-matches the
        snapshot taken at that green check
        (``tools/oracle_green_hashes.json``, maintained by
        ``tools/record_green_hashes.py``) — editing an oracle
        invalidates old green evidence, so the key re-queues
        automatically (the ROUND_NOTES oracle-drift audit, automated).

    Ordering is stable within each group (registration order)."""
    import glob
    import hashlib
    import json
    import os

    qs = {k: v for k, v in QUERIES.items() if k != "flagship"}
    green: set[str] = set()
    root = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as fh:
                records = json.load(fh)
        except (OSError, ValueError):
            continue
        for k, rec in records.items():
            if isinstance(rec, dict) and rec.get("hash_match") is True:
                green.add(k)
    try:
        with open(os.path.join(root, "tools",
                               "oracle_green_hashes.json")) as fh:
            snapshot = json.load(fh)
    except (OSError, ValueError):
        snapshot = {}

    def settled(k: str) -> bool:
        sql = ORACLES.get(k)
        return (k in green and sql is not None
                and snapshot.get(k) == hashlib.md5(sql.encode()).hexdigest())

    order = sorted(qs, key=settled)
    return {k: qs[k] for k in order}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
