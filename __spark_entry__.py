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


def latest_green() -> tuple[set[str], dict[str, int]]:
    """Scan committed ``CORRECTNESS_r*.json`` files (zero-padded names
    sort by round) with LATEST-record-per-key-wins: a failure recorded
    after an old green check un-greens the key.  Returns (green keys,
    key → round-index of its latest green).  The single implementation
    of the settling policy — ``queries()`` and
    ``tools/record_green_hashes.py`` both consume it, so the rotation
    and the snapshot can never disagree."""
    import glob
    import json
    import os

    latest: dict[str, bool] = {}
    green_round: dict[str, int] = {}
    root = os.path.dirname(os.path.abspath(__file__))
    for rnd, p in enumerate(
            sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))):
        try:
            with open(p) as fh:
                records = json.load(fh)
        except (OSError, ValueError):
            continue
        for k, rec in records.items():
            if isinstance(rec, dict):
                ok = rec.get("hash_match") is True
                latest[k] = ok
                if ok:
                    green_round[k] = rnd
    return {k for k, ok in latest.items() if ok}, green_round


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries, ordered so keys WITHOUT current green
    driver evidence come first — the driver gate samples a
    prefix-biased subset per round, so this rotation turns
    judge-verified claims into driver facts for every operator over
    successive rounds.  A key is "settled" (sorted last) only when

    (a) the LATEST committed ``CORRECTNESS_r*.json`` record for it is
        ``hash_match: true`` (later rounds override earlier ones, so a
        regression recorded after an old green check re-queues the key;
        merely APPEARING in a round file is not evidence — a failure or
        ``no_oracle`` record re-queues it), AND
    (b) its CURRENT ``oracle_sql()`` string still md5-matches the
        snapshot taken at that green check
        (``tools/oracle_green_hashes.json``, maintained by
        ``tools/record_green_hashes.py``) — editing an oracle
        invalidates old green evidence, so the key re-queues
        automatically (the ROUND_NOTES oracle-drift audit, automated).

    Ordering is stable within each group (registration order)."""
    import hashlib
    import json
    import os

    qs = {k: v for k, v in QUERIES.items() if k != "flagship"}
    green, green_round = latest_green()
    root = os.path.dirname(os.path.abspath(__file__))
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

    # Unsettled keys first; among settled keys, OLDEST green evidence
    # first — the driver's prefix-biased sample then spends surplus
    # slots re-proving the stalest facts (guards against silent
    # fixture/dependency drift on keys last checked rounds ago).
    order = sorted(qs, key=lambda k: (settled(k), green_round.get(k, -1)))
    return {k: qs[k] for k in order}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
