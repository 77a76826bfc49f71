#!/usr/bin/env python3
"""10× scale probe: generate deterministic synthetic events (6M rows)
and documents (50k, planted near-dups) under .scratch/, then compare
operator wall times at 1× (driver sf0.1) vs 10× — the "would this
survive a scale-up" check.

Each (operator, scale) measurement runs in its OWN subprocess/JVM:
within one long-lived session, accumulated cached frames, GC pressure
and JIT state skew later measurements by 2-5× in either direction
(observed: the same op measured 27 s isolated vs 170 s late in a
shared session).  Results recorded in README.md §Measured scaling.

Usage: python tools/scale_probe.py [--keep] [--ops=a,b,c] [--100x]
       python tools/scale_probe.py --one <op> <events_path> <docs_path>
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch")
SMALL = "/root/testdata/sf0.1"

OPS = ["jexl_filter", "groupby", "tokenize_tf", "minhash_sig", "simhash",
       "lsh_pairs", "ngram_capped", "simhash_pairs", "ssdeep_join",
       "knn_lsh", "knn_blocked", "repetition", "decontaminate", "pack",
       "span_dedup", "rebalance", "semantic_dedup", "kmeans_step",
       "bm25", "edge_dict", "pmi", "validate", "png_decode",
       "gopher", "c4_clean", "dsir", "exsub", "backoff", "budget",
       "neardup", "pagerank", "inc_lsh", "token_ids", "chunk_docs", "pack_seqs",
       "bpe_train", "bpe_encode", "federated", "schema_evo",
       "tokenizer_e2e", "push", "push_epochs", "push_compacted",
       "compare_wide", "nyctlc",
       "date_parse_chain", "index_path", "index_pruned", "content_within",
       "funcset", "skew_join_naive", "skew_join_aqe", "skew_join_salted",
       "skew_lsh_naive", "skew_lsh_capped"]


def generate(spark):
    from pyspark.sql import functions as F
    ev_out = f"{SCRATCH}/events_sf1.parquet"
    if not os.path.exists(ev_out):
        n = 6_000_000
        (spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.lit("2024-01-01").cast("timestamp").cast("long")
             + (F.col("id") * 43) % (30 * 86400)).cast("timestamp").alias("ts"),
            (F.xxhash64(F.col("id")) % 15000).alias("user_id"),
            F.element_at(F.array(*[F.lit(x) for x in
                ["click", "view", "purchase", "error", "signup"]]),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), 5) + 1).cast("int"))
            .alias("event_type"),
            F.round(F.pmod(F.xxhash64(F.col("id"), F.lit(2)), 49000) / 100.0
                    + 0.01, 2).alias("value"),
            F.concat(F.lit('{"k": '),
                     F.pmod(F.xxhash64(F.col("id"), F.lit(3)), 100).cast("string"),
                     F.lit("}")).alias("props"))
         .repartition(16).write.mode("overwrite").parquet(ev_out))
    doc_out = f"{SCRATCH}/documents_sf1.parquet"
    if not os.path.exists(doc_out):
        words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
                 "part", "hash", "merge", "batch", "spark", "line", "sort",
                 "window", "the", "a", "query", "big", "data", "column", "join",
                 "small", "customer", "stream", "group", "filter", "vector",
                 "order"]
        warr = F.array(*[F.lit(w) for w in words])
        base = spark.range(50000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.element_at(warr, (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), 30)
                                    + 1).cast("int"))
                for i in range(60)]).alias("text"))
        dups = spark.range(500).select(
            (F.col("id") + 49500).alias("doc_id2"), F.col("id").alias("src"))
        planted = (base.join(dups, base.doc_id == dups.src)
                   .select(F.col("doc_id2").alias("doc_id"),
                           F.concat(F.col("text"), F.lit(" extra tail words"))
                           .alias("text")))
        (base.filter(F.col("doc_id") < 49500).union(planted)
         .repartition(8).write.mode("overwrite").parquet(doc_out))
    emb_out = f"{SCRATCH}/embeddings_sf1.parquet"
    if not os.path.exists(emb_out):
        comps = [((F.pmod(F.xxhash64(F.col("id"), F.lit(j)), 2001)
                   - 1000) / 1000.0).cast("double") for j in range(64)]
        (spark.range(50000).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 10).cast("int").alias("label"),
            F.array(*comps).alias("embedding"))
         .repartition(8).write.mode("overwrite").parquet(emb_out))


def generate_100x(spark):
    """The 100× tier (sf1.0-equivalent: 60M events, 500k docs) for the
    scale-critical families — same recipes as generate(), 10× the
    rows, so the 1×→10×→100× ratio chain reads off one table."""
    from pyspark.sql import functions as F
    ev_out = f"{SCRATCH}/events_sf10.parquet"
    if not os.path.exists(ev_out):
        n = 60_000_000
        (spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.lit("2024-01-01").cast("timestamp").cast("long")
             + (F.col("id") * 43) % (30 * 86400)).cast("timestamp")
            .alias("ts"),
            (F.xxhash64(F.col("id")) % 150000).alias("user_id"),
            F.element_at(F.array(*[F.lit(x) for x in
                ["click", "view", "purchase", "error", "signup"]]),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), 5) + 1)
                .cast("int")).alias("event_type"),
            F.round(F.pmod(F.xxhash64(F.col("id"), F.lit(2)), 49000)
                    / 100.0 + 0.01, 2).alias("value"),
            F.concat(F.lit('{"k": '),
                     F.pmod(F.xxhash64(F.col("id"), F.lit(3)), 100)
                     .cast("string"),
                     F.lit("}")).alias("props"))
         .repartition(64).write.mode("overwrite").parquet(ev_out))
    doc_out = f"{SCRATCH}/documents_sf10.parquet"
    if not os.path.exists(doc_out):
        words = ["key", "agg", "row", "scan", "slow", "fast", "table",
                 "value", "part", "hash", "merge", "batch", "spark",
                 "line", "sort", "window", "the", "a", "query", "big",
                 "data", "column", "join", "small", "customer",
                 "stream", "group", "filter", "vector", "order"]
        warr = F.array(*[F.lit(w) for w in words])
        base = spark.range(500000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.element_at(warr,
                             (F.pmod(F.xxhash64(F.col("id"), F.lit(i)),
                                     30) + 1).cast("int"))
                for i in range(60)]).alias("text"))
        dups = spark.range(5000).select(
            (F.col("id") + 495000).alias("doc_id2"),
            F.col("id").alias("src"))
        planted = (base.join(dups, base.doc_id == dups.src)
                   .select(F.col("doc_id2").alias("doc_id"),
                           F.concat(F.col("text"),
                                    F.lit(" extra tail words"))
                           .alias("text")))
        (base.filter(F.col("doc_id") < 495000).union(planted)
         .repartition(32).write.mode("overwrite").parquet(doc_out))


def run_one(op: str, events_path: str, docs_path: str,
            emb_path: str | None = None) -> None:
    """Measure one operator once in this (fresh) process; prints the
    wall seconds of the timed run (after one untimed codegen warm-up on
    a 1k-row slice)."""
    from pyspark.sql import functions as F
    from datawave_spark.session import get_spark
    from datawave_spark.compiler import compile_query
    from datawave_spark.operators import curation, dedup
    from datawave_spark.operators.grouping import group_by
    from datawave_spark.sources.ingest import tokenize

    spark = get_spark("scale_probe_one")
    ev = spark.read.parquet(events_path)
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path) if emb_path else None

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def ssdeep_join(d):
        from datawave_spark.operators.ssdeep import (ssdeep_similarity_join,
                                                     text_fixture_hashes)
        hashes = text_fixture_hashes(d)
        queries = hashes.filter(F.col("doc_id") < 100)
        noop(ssdeep_similarity_join(queries, hashes, "ssdeep", "doc_id",
                                    max_repeated=0))

    def _index_path(d):
        # serve a SELECTIVE eq + BOUNDED-range query from the STORED
        # inverted index (r8 referee-fixed path; all fields indexed,
        # so the fetch trusts the index — no re-evaluation).  The
        # index build is ingest-time cost, written untimed in the
        # prepare hook.  Selective on purpose: low-selectivity terms
        # are the capped path's territory (Uid.List overflow → shard
        # ranges), not explicit-uid lookups.
        from datawave_spark.sources.index_frame import index_query
        idx = d.sparkSession.read.parquet(f"{SCRATCH}/probe_index.parquet")
        noop(index_query(
            d, idx,
            "EVENT_TYPE == 'purchase' && "
            "((_Bounded_ = true) && (VALUE >= 100 && VALUE <= 102))",
            "event_id", field_types={"VALUE": "number"},
            fields={"EVENT_TYPE", "VALUE"}))

    def _content_within(d):
        # the r8 exact window-anchor within + 0-step phrase DP over the
        # STORED per-doc offset maps (doc_tf is a prepared asset; the
        # tokenize cost is the tokenize_tf op's measurement)
        tf = d.sparkSession.read.parquet(f"{SCRATCH}/probe_doctf.parquet")
        noop(compile_query(tf, "content:within(3, 'spark', 'query') && "
                               "content:phrase('big', 'data')"))

    def _skew_events(d):
        """Zipf-hot fact table: ONE user_id owns ~20% of events (the
        hot-user shape that breaks naive shuffles first at 100 TB —
        BalancedShardPartitioner exists in the reference for exactly
        this).  Derived from the probe events, written untimed by the
        prepare hook; read here."""
        return d.sparkSession.read.parquet(
            f"{SCRATCH}/probe_skew_events.parquet")

    def _skew_join(d, salted: bool, aqe_skew: bool):
        """Skewed fact ⋈ user dim.  Broadcast is disabled because at
        100 TB the user dim does NOT broadcast (100M+ users) — the
        probe reproduces the sort-merge shape a cluster actually
        runs.  ``aqe_skew`` toggles AQE's skew-join split; ``salted``
        routes through util.salted_join."""
        from datawave_spark.util import salted_join
        s = d.sparkSession
        fact = _skew_events(d)
        dim = s.read.parquet(f"{SCRATCH}/probe_skew_userdim.parquet")
        confs = {
            # at 100 TB the user dim does not broadcast: disable BOTH
            # the planner threshold and AQE's runtime conversion so the
            # probe measures the sort-merge shape a cluster runs
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled":
                "true" if aqe_skew else "false",
        }
        old = {k: s.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            s.conf.set(k, v)
        try:
            if salted:
                out = salted_join(fact, dim, "user_id", salt=16)
            else:
                out = fact.join(dim, "user_id")
            noop(out.select("event_id", "user_id", "n_user_events"))
        finally:
            for k, v in old.items():
                if v is not None:
                    s.conf.set(k, v)

    def _skew_lsh(d, capped: bool):
        """LSH pair generation with ONE planted hot bucket (20% of
        docs share identical text → every band collides).  The
        max_bucket cap bounds the worst reducer at O(cap²); uncapped,
        the hot bucket alone is O((0.2·n)²) pairs."""
        docs = d.sparkSession.read.parquet(
            f"{SCRATCH}/probe_skew_docs.parquet")
        noop(dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", k=2, num_hashes=16, bands=8,
            threshold=0.3, max_bucket=100 if capped else None))

    def _index_pruned(d):
        # the SAME query served from the (field, event_date)-partitioned
        # stored index AND a date-partitioned events table, with the
        # query's date range bounding BOTH scans (RangeStream.java:
        # 377-513 shard-range pruning + the document-range fetch after
        # it): serve cost tracks the DATE WINDOW, not the corpus — the
        # cluster-side shape of the index_path row's linear scans.
        from datawave_spark.sources.index_frame import index_query
        idx = d.sparkSession.read.parquet(
            f"{SCRATCH}/probe_index_part.parquet")
        ev_bydate = d.sparkSession.read.parquet(
            f"{SCRATCH}/probe_events_bydate.parquet")
        noop(index_query(
            ev_bydate, idx,
            "EVENT_TYPE == 'purchase' && "
            "((_Bounded_ = true) && (VALUE >= 100 && VALUE <= 102))",
            "event_id", field_types={"VALUE": "number"},
            fields={"EVENT_TYPE", "VALUE"},
            shard_range=("2024-01-05", "2024-01-07"), date_col="ts",
            event_date_col="event_date"))

    ops = {
        "index_path": _index_path,
        "index_pruned": _index_pruned,
        "skew_join_naive": lambda d: _skew_join(d, salted=False,
                                                aqe_skew=False),
        "skew_join_aqe": lambda d: _skew_join(d, salted=False,
                                              aqe_skew=True),
        "skew_join_salted": lambda d: _skew_join(d, salted=True,
                                                 aqe_skew=False),
        "skew_lsh_naive": lambda d: _skew_lsh(d, capped=False),
        "skew_lsh_capped": lambda d: _skew_lsh(d, capped=True),
        "content_within": _content_within,
        "jexl_filter": lambda d: noop(compile_query(
            d, "EVENT_TYPE == 'click' && VALUE > 50")),
        # FunctionalSet methods (r9): HOF column functions over the
        # value array — the scan-bound claim, measured
        "funcset": lambda d: noop(compile_query(
            d.withColumn("V", F.array(F.col("value"), F.col("value") * 2)),
            "V.max() >= 100 && V.greaterThan(50).size() >= 1")),
        "groupby": lambda d: noop(group_by(
            d, ["event_type"], [("SUM", "value", "s")])),
        "tokenize_tf": lambda d: noop(tokenize(d, "text", "doc_id")),
        "minhash_sig": lambda d: noop(dedup.minhash_signatures(
            d, "text", "doc_id", 2, 8)),
        "simhash": lambda d: noop(dedup.simhash_buckets(
            d, "text", "doc_id", 8)),
        "lsh_pairs": lambda d: noop(dedup.minhash_lsh_pairs(
            d, "text", "doc_id", k=2, num_hashes=16, bands=8,
            threshold=0.3, max_bucket=100)),
        "knn_lsh": lambda d: _knn_lsh(d),
        "knn_blocked": lambda d: noop(__import__(
            "datawave_spark.operators.similarity", fromlist=["x"])
            .knn_join_blocked(d.limit(1000), d, "embedding", "vec_id",
                              block_col="label", k=5, max_block=20000)),
        "ngram_capped": lambda d: noop(dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", k=2, threshold=0.3, max_df=100)),
        "simhash_pairs": lambda d: noop(dedup.simhash_hamming_pairs(
            d, "text", "doc_id", bits=16, max_dist=2, max_bucket=200)),
        "ssdeep_join": ssdeep_join,
        "repetition": lambda d: noop(curation.repetition_ratios(
            d, "text", "doc_id")),
        "decontaminate": lambda d: noop(curation.decontaminate(
            d, d.filter(F.col("doc_id") < 20), "text", "doc_id", 5)),
        "pack": lambda d: noop(curation.pack_sequences(
            d.select("doc_id", F.lit("s").alias("src"),
                     F.length("text").alias("n")),
            "doc_id", "src", "n", 2048)),
        "span_dedup": lambda d: noop(curation.remove_duplicate_spans(
            d, "text", "doc_id", span_tokens=10)),
        # Blocked on IVF clusters sized so the mean block stays ~250
        # rows at EITHER scale — the bounded-block discipline that keeps
        # semantic dedup near-linear (cluster count grows with the
        # corpus; per-cluster pair work stays constant).
        "semantic_dedup": lambda d: _semantic_dedup(d),
        "kmeans_step": lambda d: noop(__import__(
            "datawave_spark.operators.similarity", fromlist=["x"])
            .kmeans_step(d, "embedding",
                         [r.embedding for r in
                          d.orderBy("vec_id").limit(8).collect()])),
        # Full tokenize -> postings -> score path (the ingest-side
        # postings build dominates; the scoring itself touches only the
        # query terms' rows).
        "bm25": lambda d: _bm25(d),
        "edge_dict": lambda d: _edge_dict(d),
        "pmi": lambda d: noop(__import__(
            "datawave_spark.operators.text", fromlist=["x"])
            .collocations_pmi(d, "text", "doc_id", min_count=5, k=20)),
        "gopher": lambda d: noop(curation.gopher_quality_flags(
            d, "text", "doc_id")),
        "c4_clean": lambda d: noop(curation.c4_clean_lines(
            d, "text", "doc_id")),
        "dsir": lambda d: noop(curation.dsir_topk(
            d, d.filter(F.col("doc_id") % 10 == 0), "text", "doc_id",
            k=100)),
        "exsub": lambda d: noop(dedup.exact_substring_dedup(
            d, "text", "doc_id", k=10, min_count=2)),
        "backoff": lambda d: _backoff(d),
        "pagerank": lambda d: _pagerank(d),
        "inc_lsh": lambda d: _inc_lsh(d),
        "token_ids": lambda d: _token_ids(d),
        "chunk_docs": lambda d: _chunk_docs(d),
        "bpe_train": lambda d: _bpe_train(d),
        "bpe_encode": lambda d: _bpe_encode(d),
        "pack_seqs": lambda d: _pack_seqs(d),
        # fixed 1% benchmark probes the full corpus signatures: cost
        # should track benchmark-bucket size, not corpus size
        "neardup": lambda d: _neardup(d),
        # per-stratum budget selection over the quality scorer: the
        # stratum key is doc_id%64 so strata (and their windows) stay
        # bounded as the corpus grows
        "budget": lambda d: noop(curation.select_within_budget(
            __import__("datawave_spark.operators.text", fromlist=["x"])
            .quality_score(d, "text")
            .withColumn("src", (F.col("doc_id") % 64).cast("string"))
            .withColumn("nt", F.length("text").cast("long")),
            "doc_id", "quality", "nt", budget=20000, strata_col="src")),
        "validate": lambda d: _validate(d),
        "png_decode": lambda d: _png_decode(d),
        "rebalance": lambda d: noop(curation.rebalance_mix(
            d.withColumn("src", F.concat(F.lit("s"),
                         (F.col("doc_id") % 4).cast("string")))
             .withColumn("w", F.length("text").cast("long")),
            "doc_id", "src", "w",
            {"s0": 0.4, "s1": 0.3, "s2": 0.2, "s3": 0.1})),
        "federated": lambda d: _federated(d),
        "schema_evo": lambda d: _schema_evo(d),
        "tokenizer_e2e": lambda d: _tokenizer_e2e(d),
        "push": lambda d: _push(d),
        "push_epochs": lambda d: _push_epochs(d),
        "push_compacted": lambda d: _push_compacted(d),
        "compare_wide": lambda d: _compare_wide(d),
        "nyctlc": lambda d: _nyctlc(d),
        "date_parse_chain": lambda d: _date_parse_chain(d),
    }

    def _date_parse_chain(d):
        # the post-dispatch worst case for the known-format chain: a
        # SEPARATED format near the END of the list ('yyyy-MMM' month
        # names) walks try_cast + default + the rlike guard + ~10
        # separated parse attempts per row; compact yyyyMMdd strings
        # take the all-digit fast path (4 attempts) — both measured so
        # the dispatch's win and the residual chain cost are visible.
        compacts = d.select(
            "event_id", F.date_format("ts", "yyyyMMdd").alias("WHEN"))
        noop(compile_query(
            compacts,
            "filter:betweenDates(WHEN, '2024-01-05', '2024-01-20')")
            .select("event_id"))
        months = d.select(
            "event_id", F.date_format("ts", "yyyy-MMM").alias("WHEN"))
        noop(compile_query(
            months, "filter:afterDate(WHEN, '2024-01-05')")
            .select("event_id"))

    def _push_epochs(d):
        # ≥3 epochs with a GROWING ledger: the r6 verdict's open
        # question is whether the per-batch ledger anti-join stays
        # result-bounded as delivered history accumulates.  4 files →
        # 4 micro-batches; the sink hook timestamps each epoch, and the
        # inter-epoch deltas (epoch N runs against a ledger of N-1
        # epochs' keys) are printed for the README shape note.
        import shutil as _sh
        import uuid as _uuid
        from datawave_spark.streaming.push import standing_query_push
        tag = _uuid.uuid4().hex[:8]
        base = f"{SCRATCH}/pushe_{tag}"
        src = f"{base}/src"
        d.repartition(4).write.parquet(src)
        marks = [time.perf_counter()]

        def sink(df, epoch):
            marks.append(time.perf_counter())

        q = standing_query_push(
            spark, src, spark.read.parquet(src).schema,
            lambda b: b.filter(F.col("event_type") == "click")
                       .select("event_id", "value"),
            ["event_id"], f"{base}/feed", f"{base}/ledger",
            f"{base}/ckpt", options={"maxFilesPerTrigger": "1"},
            sink=sink)
        q.awaitTermination()
        deltas = [round(b - a, 2) for a, b in zip(marks, marks[1:])]
        print(f"PUSH_EPOCH_DELTAS {deltas}")
        _sh.rmtree(base, ignore_errors=True)

    def _push_compacted(d):
        # r8: epoch-delta flatness must SURVIVE ledger compaction +
        # bloom sidecar roll.  2 epochs → compact_ledger(bloom) → 2
        # more epochs whose batches mix REPLAYED keys (bloom-positive,
        # full anti-join) with NEW keys (bloom-negative, tail-only) —
        # the post-compaction deltas are printed next to the
        # pre-compaction ones for the README row.
        import shutil as _sh
        import uuid as _uuid
        from datawave_spark.streaming.ledger import compact_ledger
        from datawave_spark.streaming.push import standing_query_push
        tag = _uuid.uuid4().hex[:8]
        base = f"{SCRATCH}/pushc_{tag}"
        src = f"{base}/src"
        d.repartition(2).write.parquet(src)
        sch = spark.read.parquet(src).schema
        marks = [time.perf_counter()]

        def sink(df, epoch):
            marks.append(time.perf_counter())

        def run():
            q = standing_query_push(
                spark, src, sch,
                lambda b: b.filter(F.col("event_type") == "click")
                           .select("event_id", "value"),
                ["event_id"], f"{base}/feed", f"{base}/ledger",
                f"{base}/ckpt", options={"maxFilesPerTrigger": "1"},
                sink=sink)
            q.awaitTermination()

        run()
        pre = [round(b - a, 2) for a, b in zip(marks, marks[1:])]
        stats = compact_ledger(spark, f"{base}/ledger", ["event_id"],
                               bloom_fpp=0.01)
        # epoch 3: PURE new keys — every row bloom-negative, the
        # compacted base is never read (the fast path's whole point);
        # epoch 4: new keys + 5% replays — `maybe` non-empty, full
        # anti-join taken for those rows only.  Each post epoch carries
        # HALF of d (same rows-per-epoch as the pre epochs, so the
        # pre/post deltas compare like for like).
        half = d.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0)
        (half.withColumn("event_id",
                         F.col("event_id") + F.lit(100_000_000))
         .coalesce(1).write.mode("append").parquet(src))
        (half.withColumn("event_id",
                         F.col("event_id") + F.lit(200_000_000))
         .union(d.filter(F.pmod(F.col("event_id"), F.lit(100)) < 5))
         .coalesce(1).write.mode("append").parquet(src))
        marks.clear()
        marks.append(time.perf_counter())
        run()
        post = [round(b - a, 2) for a, b in zip(marks, marks[1:])]
        print(f"PUSH_EPOCH_DELTAS pre={pre} post_compaction={post} "
              f"ledger_files={stats['files']}")
        _sh.rmtree(base, ignore_errors=True)

    def _compare_wide(d):
        # filter:compare over WIDE multi-value fields (64 values/side):
        # the set build is per-row transform/array_distinct (no
        # shuffle), the bound compare is array_min/max — should scale
        # with rows, indifferent to the ledgered set width.
        wide = d.select(
            "event_id",
            F.transform(F.sequence(F.lit(1), F.lit(64)),
                        lambda i: F.pmod(F.xxhash64(F.col("event_id"), i),
                                         F.lit(1000)).cast("double"))
            .alias("A"),
            F.transform(F.sequence(F.lit(1), F.lit(64)),
                        lambda i: F.pmod(F.xxhash64(F.col("event_id"),
                                                    i + 100),
                                         F.lit(1000)).cast("double"))
            .alias("B"))
        noop(compile_query(wide, "filter:compare(A, '<', 'ALL', B)")
             .select("event_id"))

    def _nyctlc(d):
        # NYC-TLC ingest end-to-end: events → header CSV (the
        # reference's raw input shape) → read_nyctlc with all six
        # derived fields.  The CSV round-trip is part of the measured
        # path on both scales — ingest IS the operator here.
        import shutil as _sh
        import uuid as _uuid
        from datawave_spark.sources.readers import read_nyctlc
        tag = _uuid.uuid4().hex[:8]
        base = f"{SCRATCH}/nyctlc_{tag}"
        pad3 = lambda c: F.lpad(F.pmod(F.abs(c), F.lit(1000))
                                .cast("string"), 3, "0")
        (d.select(
            F.col("event_id").cast("string").alias("trip_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
            .alias("lpep_pickup_datetime"),
            F.concat(F.lit("-73."), pad3(F.col("user_id")))
            .alias("pickup_longitude"),
            F.concat(F.lit("40."), pad3(F.col("user_id") + 7))
            .alias("pickup_latitude"),
            F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
                F.concat(F.lit("-74."), pad3(F.col("event_id"))))
            .alias("dropoff_longitude"),
            F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
                F.concat(F.lit("41."), pad3(F.col("event_id") + 13)))
            .alias("dropoff_latitude"),
            F.col("value").cast("string").alias("total_amount"))
         .write.option("header", True).csv(base))
        noop(read_nyctlc(spark, base))
        _sh.rmtree(base, ignore_errors=True)

    def _push(d):
        # standing-query push over the file stream: micro-batch fixed
        # costs dominate at both scales; the only data-dependent stages
        # are the per-batch standing query and the ledger anti-join
        # (result-keyed, result-sized).
        import shutil as _sh
        import uuid as _uuid
        from datawave_spark.streaming.push import standing_query_push
        tag = _uuid.uuid4().hex[:8]
        base = f"{SCRATCH}/push_{tag}"
        # stream straight from the parquet the frame was read from
        # (a limit() warm-up frame still lists the full input — the
        # warm-up therefore streams everything once, untimed, which
        # also pre-warms the timed run's file listing on both scales).
        # The 1x source (sf0.1/events.parquet) is a single FILE inside
        # a directory of OTHER tables — streaming its dirname without a
        # glob would ingest lineitem/documents/... as null-filled rows
        # and inflate the 1x timing; the 10x source is a directory of
        # part files, where the dir itself is the right target.
        parent = {os.path.dirname(f) for f in d.inputFiles()}.pop()
        if parent.endswith(".parquet"):
            src_dir, opts = parent, None
        else:
            src_dir = parent
            fname = os.path.basename(d.inputFiles()[0])
            opts = {"pathGlobFilter": fname}
        q = standing_query_push(
            spark, src_dir, d.schema,
            lambda b: b.filter(F.col("event_type") == "click")
                       .select("event_id", "value"),
            ["event_id"], f"{base}/feed", f"{base}/ledger",
            f"{base}/ckpt", options=opts)
        q.awaitTermination()
        _sh.rmtree(base, ignore_errors=True)

    def _federated(d):
        # two deployments answer the same edge JEXL independently (each
        # branch keeps its own pushdown scan), merged with a deployment
        # tag — a tagged union of scans should scale like the scans.
        from datawave_spark.edges import EdgeDefinition, build_edges
        from datawave_spark.plans.catalog import federated_edge_query
        defs = [EdgeDefinition("user_id", "event_type", "ue", "did",
                               precondition="VALUE > 50")]
        deps = {
            "a": build_edges(d.filter(F.col("user_id") % 2 == 0), defs),
            "b": build_edges(d.filter(F.col("user_id") % 2 == 1), defs),
        }
        noop(federated_edge_query(
            deps, "SINK == 'purchase' && !(SOURCE == '7')"))

    def _event_date(d):
        if dict(d.dtypes).get("ts") == "bigint":   # nanos-as-long store
            return F.expr("timestamp_micros(ts div 1000)").cast("date")
        return F.col("ts").cast("date")

    def _evo_prepare(d):
        # ingest-side layout build (untimed — run_one pre-builds before
        # the timer): two-epoch date-partitioned store, later days add
        # session_id and keep props (prepared.evolving_events shape).
        # The scratch key derives from the SOURCE PATH, not d.count():
        # a count here would re-scan the whole source inside the timed
        # window just to locate the marker file
        import hashlib as _hl
        src_key = _hl.md5(
            ";".join(sorted(d.inputFiles()))[:4096].encode()).hexdigest()[:10]
        root = f"{SCRATCH}/evo_{src_key}"
        marker = os.path.join(root, "_done.evolved")
        if os.path.exists(marker):
            return root
        shutil.rmtree(root, ignore_errors=True)
        ev = d.withColumn("event_date", _event_date(d))
        old = ev.filter((F.col("event_date") < "2024-01-16")
                        | F.col("event_date").isNull()).drop("props")
        new = ev.filter(F.col("event_date") >= "2024-01-16") \
            .withColumn("session_id",
                        F.concat_ws(":", F.col("user_id").cast("string"),
                                    F.col("event_id").cast("string")))
        old.write.mode("append").partitionBy("event_date").parquet(root)
        new.write.mode("append").partitionBy("event_date").parquet(root)
        with open(marker, "w") as fh:
            fh.write("ok\n")
        return root

    def _schema_evo(d):
        # timed half: mergeSchema read over the evolved layout + a
        # pushed filter + date-grouped aggregate — the question is
        # whether footer-merging or the NULL-surfaced column adds a
        # superlinear cost (it must not: merge changes only the read
        # schema, not the scan mechanics)
        from datawave_spark.sources.parquet import read_evolving
        root = _evo_prepare(d)
        ev = read_evolving(spark, root).filter(F.col("value") > 100)
        # the warm-up slice may fall entirely inside the v1 epoch, in
        # which case the merged schema has no session_id at all
        sess = (F.count("session_id") if "session_id" in ev.columns
                else F.count(F.lit(None)))
        noop(ev.groupBy("event_date")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("value").alias("s"),
                  sess.alias("n_sessions")))

    def _tokenizer_e2e(d):
        # the WHOLE tokenizer pipeline in one timing: vocab build
        # (stored at ingest) -> id mapping -> overlapped chunking ->
        # sequence packing; each stage is posexplode + at most ONE
        # broadcast join, so end-to-end must stay scan-bound linear.
        from datawave_spark.operators import text as txt
        vocab = txt.vocab_ids(txt.unigram_counts(d, "text")).persist()
        vocab.count()
        noop(txt.token_ids(d, "text", "doc_id", vocab))
        noop(txt.chunk_documents(d, "text", "doc_id",
                                 chunk_tokens=32, overlap=8))
        noop(txt.pack_token_sequences(
            d.withColumn("src", (F.col("doc_id") % 8).cast("string")),
            "text", "doc_id", vocab, seq_len=64, strata_col="src",
            bin_seqs=4))
        vocab.unpersist()
    def _neardup(d):
        from datawave_spark.operators.curation import decontaminate_neardup
        signed = dedup.attach_minhash_signatures(
            dedup.shingle_sets(d, "text", "doc_id", k=2),
            num_hashes=16).persist()
        signed.count()
        bench = signed.filter(F.col("id") % 100 == 0)
        corp = signed.filter(F.col("id") % 100 != 0)
        noop(decontaminate_neardup(corp, bench, threshold=0.3,
                                   max_bucket=100).select("id", "n"))
        signed.unpersist()

    def _pagerank(d):
        # events-derived user->event_type edge frame, 5 rounds — the
        # per-round cost is one edge-join + one groupBy(dst), so the
        # ratio measures how the vertex-keyed shuffles scale.
        from datawave_spark.operators.components import pagerank
        e = d.select(F.col("user_id").cast("string").alias("src"),
                     F.col("event_type").alias("dst"))
        noop(pagerank(e, iters=5))

    def _inc_lsh(d):
        # the daily-crawl shape at scale: a 2% batch probes the stored
        # corpus signatures with ONE (band, bucket) equi-join +
        # corpus-side bucket cap — cost should follow the BATCH, so the
        # 10×/100× corpus ratios stay far below the data ratio.
        from datawave_spark.operators.dedup import (
            attach_minhash_signatures, incremental_lsh_pairs,
            shingle_sets)
        signed = attach_minhash_signatures(
            shingle_sets(d, "text", "doc_id", k=2), 16).persist()
        signed.count()
        new = signed.filter(F.col("id") % 50 == 0)
        corp = signed.filter(F.col("id") % 50 != 0)
        noop(incremental_lsh_pairs(new, corp, num_hashes=16, bands=8,
                                   threshold=0.3, max_bucket=100))
        signed.unpersist()

    def _token_ids(d):
        # vocab build (one count agg + vocab-sized window) + the full
        # corpus id-mapping pass; the entry reads the STORED unigram
        # table, so query-only cost is posexplode + one broadcast join.
        from datawave_spark.operators import text as txt
        vocab = txt.vocab_ids(txt.unigram_counts(d, "text")).persist()
        vocab.count()
        noop(txt.token_ids(d, "text", "doc_id", vocab))
        vocab.unpersist()

    def _bpe_train(d):
        # the iteration is vocabulary-bounded: corpus size only
        # affects the initial word-count groupBy.
        from datawave_spark.operators.text import bpe_train
        bpe_train(d, "text", n_merges=6, min_pair_count=1).collect()

    def _bpe_encode(d):
        # train (vocab-bounded) + encode the full corpus: the encode
        # half is posexplode + broadcast join + posexplode.
        from datawave_spark.operators.text import bpe_encode, bpe_train
        _, seg = bpe_train(d, "text", n_merges=6, min_pair_count=1,
                           with_state=True)
        noop(bpe_encode(d, "text", "doc_id", seg))

    def _chunk_docs(d):
        from datawave_spark.operators.text import chunk_documents
        noop(chunk_documents(d, "text", "doc_id",
                             chunk_tokens=32, overlap=8))

    def _pack_seqs(d):
        # vocab build + full assembly: doc re-assembly shuffle +
        # stratum window + bin groupBy; bins are budget-bounded so
        # the last stage has no skew at any corpus size.
        from datawave_spark.operators import text as txt
        vocab = txt.vocab_ids(txt.unigram_counts(d, "text")).persist()
        vocab.count()
        noop(txt.pack_token_sequences(
            d.withColumn("src", (F.col("doc_id") % 8).cast("string")),
            "text", "doc_id", vocab, seq_len=64, strata_col="src",
            bin_seqs=4))
        vocab.unpersist()

    def _backoff(d):
        # LM build (two count aggs) + full-corpus scoring in one
        # timing — the entry reads STORED count tables, so query-only
        # cost is the three broadcast joins + per-doc mean.
        from datawave_spark.operators import text as txt
        lm = txt.unigram_counts(d, "text").persist()
        bg = txt.bigram_counts(d, "text").persist()
        lm.count(); bg.count()
        noop(txt.stupid_backoff_score(d, "text", "doc_id", lm, bg))
        lm.unpersist(); bg.unpersist()

    def _semantic_dedup(d):
        from datawave_spark.operators import similarity as sim
        n = d.count()
        k = max(4, n // 250)
        cents = sim.ivf_centroids(d, "embedding", "vec_id", n_centroids=k)
        assigned = sim.ivf_assign(d, "embedding", cents)
        noop(dedup.semantic_dedup(assigned, "embedding", "vec_id",
                                  threshold=0.5, block_col="ivf_cluster"))

    def _bm25(d):
        # postings built directly (split -> explode -> count), not via
        # the tf-map detour, and persisted so the stats aggregate and
        # the scoring pass don't re-tokenize (the entry reads STORED
        # postings; this times one build + one scored query)
        from datawave_spark.operators.text import bm25_topk, tokens
        toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
        post = (toks.select("doc_id",
                            F.size("t").cast("long").alias("doc_len"),
                            F.explode("t").alias("term"))
                .groupBy("term", "doc_id", "doc_len")
                .agg(F.count(F.lit(1)).alias("tf"))
                .select("term", "doc_id", "tf", "doc_len").persist())
        try:
            n, sl = post.groupBy("doc_id").agg(
                F.max("doc_len").alias("dl")).agg(
                F.count(F.lit(1)), F.sum("dl")).first()
            noop(bm25_topk(post, ["spark", "merge", "batch"],
                           n_docs=n, total_len=sl, k=10))
        finally:
            post.unpersist(blocking=False)

    def _edge_dict(d):
        from datawave_spark.edges import EdgeDefinition, edge_dictionary
        noop(edge_dictionary(
            d, [EdgeDefinition("user_id", "event_type", "t1", "r",
                               precondition="VALUE > 50"),
                EdgeDefinition("event_type", "user_id", "t2", "r2")],
            date_col="ts"))

    def _validate(d):
        from datawave_spark.sources.ingest import validate_events
        good, bad = validate_events(
            d, [("value_range", (F.col("value") >= 0)
                 & (F.col("value") <= 450)),
                ("uid_block", F.col("user_id") % 997 != 0)], "event_id")
        noop(good)
        noop(bad)

    def _png_decode(d):
        # synthesize + decode a small PNG per document (the multimodal
        # Arrow-batch path; payload work is per-row python, the scale
        # question is whether mapInPandas batches stay flat)
        import pandas as _pd
        from datawave_spark.operators.multimodal import (attach_media,
                                                         decode_png,
                                                         png_encode)

        def synth(batches):
            for pdf in batches:
                pays = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    w, h = 4 + did % 5, 3 + did % 4
                    px = bytes((did * 7 + k) % 256 for k in range(w * h))
                    pays.append(png_encode(w, h, px))
                yield _pd.DataFrame({"id": pdf["doc_id"], "payload": pays})

        pngs = d.select("doc_id").mapInPandas(
            synth, "id long, payload binary")
        noop(decode_png(attach_media(pngs, "payload", "image/png")))

    def _knn_lsh(d):
        from datawave_spark.operators import similarity as sim
        dim = len(d.select("embedding").head()[0])
        planes = sim.hyperplanes(dim, 8)
        signed = d.select(
            "vec_id", "embedding",
            sim.lsh_signature(F.col("embedding").cast("array<double>"),
                              planes).alias("sig"))
        noop(sim.knn_join_lsh(signed.limit(1000), signed, "embedding",
                              "vec_id", bits=8, k=5, probe_radius=1,
                              max_bucket=2000))

    if op in ("jexl_filter", "groupby", "edge_dict", "validate",
              "pagerank", "federated", "schema_evo", "push",
              "push_epochs", "push_compacted", "compare_wide", "nyctlc",
              "date_parse_chain", "index_path", "index_pruned",
              "funcset", "skew_join_naive", "skew_join_aqe",
              "skew_join_salted"):
        src = ev
    elif op in ("knn_lsh", "knn_blocked", "semantic_dedup", "kmeans_step"):
        src = emb
    else:
        src = docs
    if op == "schema_evo":
        _evo_prepare(src)             # ingest-side layout, untimed
    if op.startswith("skew_join"):
        # Zipf-hot layout: user 777 owns ~20% of events (untimed,
        # ingest-side); the dim is the per-user aggregate
        hot = F.when(F.pmod(F.xxhash64("event_id", F.lit(9)), 5) == 0,
                     F.lit(777)).otherwise(F.col("user_id"))
        sk = src.withColumn("user_id", hot)
        sk.write.mode("overwrite") \
            .parquet(f"{SCRATCH}/probe_skew_events.parquet")
        sk.groupBy("user_id") \
            .agg(F.count(F.lit(1)).alias("n_user_events")) \
            .write.mode("overwrite") \
            .parquet(f"{SCRATCH}/probe_skew_userdim.parquet")
    if op.startswith("skew_lsh"):
        # ONE hot LSH bucket: 20% of docs share identical text, so
        # every band of theirs collides into the same bucket
        hot_txt = F.lit(("the spark query big data table join merge "
                         "sort window filter ") * 3)
        docs2 = src.withColumn(
            "text",
            F.when(F.pmod(F.xxhash64("doc_id", F.lit(9)), 5) == 0,
                   hot_txt).otherwise(F.col("text")))
        docs2.write.mode("overwrite") \
            .parquet(f"{SCRATCH}/probe_skew_docs.parquet")
    if op == "index_path":
        # ingest-side index build, untimed (stored-asset discipline)
        from datawave_spark.sources.index_frame import build_index
        build_index(src, ["event_type", "value"], "event_id",
                    field_types={"VALUE": "number"}) \
            .write.mode("overwrite").parquet(f"{SCRATCH}/probe_index.parquet")
    if op == "index_pruned":
        # same ingest-side build, stored hive-partitioned by
        # (field, event_date) — the shard layout; repartition on the
        # partition columns first so each (field, date) writes ONE file
        from datawave_spark.sources.index_frame import build_index
        build_index(src, ["event_type", "value"], "event_id",
                    date_col="ts", field_types={"VALUE": "number"}) \
            .repartition("field", "event_date") \
            .write.partitionBy("field", "event_date") \
            .mode("overwrite").parquet(f"{SCRATCH}/probe_index_part.parquet")
        # events stored date-partitioned (the README ingest layout) so
        # the post-index fetch partition-prunes too, untimed
        src.withColumn("event_date", F.col("ts").cast("date")) \
            .repartition("event_date") \
            .write.partitionBy("event_date") \
            .mode("overwrite") \
            .parquet(f"{SCRATCH}/probe_events_bydate.parquet")
    if op == "content_within":
        from datawave_spark.sources.ingest import tokenize
        tokenize(src, "text", "doc_id") \
            .write.mode("overwrite").parquet(f"{SCRATCH}/probe_doctf.parquet")
    if not op.startswith("skew_"):
        # skew ops read their stored layouts (the arg is ignored): a
        # warm-up would be a full second run, and they are
        # shuffle-bound, not codegen-bound
        ops[op](src.limit(1000))      # codegen warm-up, untimed
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    ops[op](src)
    print(f"PROBE_SECONDS {time.perf_counter() - t0:.2f}")


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(sys.argv[i + 1], sys.argv[i + 2], sys.argv[i + 3],
                sys.argv[i + 4] if len(sys.argv) > i + 4 else None)
        return

    do_100x = "--100x" in sys.argv
    from datawave_spark.session import get_spark
    spark = get_spark("scale_probe_gen")
    generate(spark)
    if do_100x:
        generate_100x(spark)
    spark.stop()

    wanted = OPS
    for a in sys.argv:
        if a.startswith("--ops"):
            wanted = a.split("=", 1)[1].split(",")

    def measure(op: str, ev_path: str, doc_path: str,
                emb_path: str) -> float:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", op,
             ev_path, doc_path, emb_path],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO})
        secs = float("nan")
        for line in out.stdout.splitlines():
            if line.startswith("PROBE_SECONDS"):
                secs = float(line.split()[1])
            elif line.startswith("PUSH_EPOCH_DELTAS"):
                print(f"  {op}: {line}", flush=True)
        if secs != secs:
            print(out.stderr[-500:], file=sys.stderr)
        return secs

    # the scale-critical families that get the extra 100× datapoint
    # (VERDICT r7 #5): LSH pair generation, incremental LSH,
    # ExactSubstr, PageRank, standing-query push
    hundred_ops = {"lsh_pairs", "inc_lsh", "exsub", "pagerank", "push",
                   "index_path", "index_pruned", "content_within",
                   "simhash_pairs", "ssdeep_join", "bm25", "tokenize_tf"}
    hdr = f"{'op':14} {'1x':>7} {'10x':>8} {'ratio':>6}"
    if do_100x:
        hdr += f" {'100x':>9} {'r100':>6}"
    print(hdr, flush=True)
    for op in wanted:
        s = measure(op, f"{SMALL}/events.parquet",
                    f"{SMALL}/documents.parquet",
                    f"{SMALL}/embeddings.parquet")
        b = measure(op, f"{SCRATCH}/events_sf1.parquet",
                    f"{SCRATCH}/documents_sf1.parquet",
                    f"{SCRATCH}/embeddings_sf1.parquet")
        line = f"{op:14} {s:7.1f} {b:8.1f} {b / max(s, 0.01):6.1f}"
        if do_100x and op in hundred_ops:
            c = measure(op, f"{SCRATCH}/events_sf10.parquet",
                        f"{SCRATCH}/documents_sf10.parquet",
                        f"{SCRATCH}/embeddings_sf1.parquet")
            line += f" {c:9.1f} {c / max(s, 0.01):6.1f}"
        print(line, flush=True)

    if "--keep" not in sys.argv:
        shutil.rmtree(SCRATCH, ignore_errors=True)
        print("(.scratch removed; pass --keep to retain)")


if __name__ == "__main__":
    main()
