"""Recall/consistency tests for the approximate operators (MinHash-LSH,
LSH cosine) against their exact counterparts — the checks the driver's
rows-only gate can't do."""

import os

import pytest

from datawave_spark.operators import dedup, similarity
from datawave_spark.sources.parquet import read_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet(spark, f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup_counts(spark, docs):
    out = dedup.exact_dedup(docs, "text", "doc_id")
    total = docs.count()
    assert out.agg({"n_docs": "sum"}).collect()[0][0] == total


def test_minhash_lsh_recall(spark, docs):
    exact = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=2, threshold=0.3).collect()}
    lsh = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", k=2, num_hashes=16, bands=8,
        threshold=0.3).collect()}
    assert lsh <= exact  # verify step guarantees no false positives
    assert exact, "synthetic corpus should contain planted near-dups"
    recall = len(lsh) / len(exact)
    # 8 bands × 2 rows: P(candidate | j=0.3) = 1-(1-0.09)^8 ≈ 0.53, and
    # planted dups are far above threshold, so recall is high in practice.
    assert recall >= 0.8, f"LSH recall {recall:.2f} too low ({len(lsh)}/{len(exact)})"


def test_from_sets_signatures_match_groupby_formulation(spark, docs):
    """The row-wise (array_min over transform) signature path must be
    bit-identical to the groupBy-min path — guards the pyspark
    higher-order-function arity trap (a binary lambda receives the
    array INDEX as its second argument, clobbering closure salts)."""
    sets = dedup.shingle_sets(docs, "text", "doc_id", k=2)
    via_sets = {r.id: list(r.sig) for r in
                dedup.minhash_signatures_from_sets(sets, 8).collect()}
    via_group = {r.id: list(r.sig) for r in
                 dedup.minhash_signatures(docs, "text", "doc_id", k=2,
                                          num_hashes=8).collect()}
    assert via_sets == via_group


def test_from_sets_ngram_pairs_match_raw_path(spark, docs):
    sets = dedup.shingle_sets(docs, "text", "doc_id", k=2)
    via_sets = {(r.id_a, r.id_b, r.jaccard) for r in
                dedup.ngram_jaccard_pairs_from_sets(sets, 0.3).collect()}
    raw = {(r.id_a, r.id_b, r.jaccard) for r in dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=2, threshold=0.3).collect()}
    assert via_sets == raw and raw


def test_simhash_groups_exact_dups_together(spark, docs):
    # identical texts must share a simhash bucket
    from pyspark.sql import functions as F
    two = docs.limit(1).select(F.lit(900001).alias("doc_id"), "text") \
        .union(docs.limit(1).select(F.lit(900002).alias("doc_id"), "text"))
    out = dedup.simhash_buckets(two, "text", "doc_id", bits=16)
    assert out.count() == 1
    assert out.collect()[0].n_docs == 2


def test_lsh_cosine_recall(spark, emb):
    import pyarrow.parquet as pq
    q = [float(x) for x in pq.read_table(
        f"{SF_DIR}/embeddings.parquet",
        filters=[("vec_id", "=", 0)]).column("embedding")[0].as_py()]
    exact = [r.id for r in similarity.cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()]
    approx = [r.id for r in similarity.lsh_cosine_topk(
        emb, "embedding", "vec_id", q, k=10, bits=8).collect()]
    # multiprobe LSH on 8 bits: the query vector itself (cos=1) must be
    # found, and a majority of the true top-10 should survive
    assert exact[0] == 0 and approx[0] == 0
    overlap = len(set(exact) & set(approx))
    assert overlap >= 5, f"LSH top-10 overlap {overlap}/10 too low"


def test_knn_join_k_rows_per_query(spark, emb):
    from pyspark.sql import functions as F
    out = similarity.knn_join(emb.filter(F.col("vec_id") < 5), emb,
                              "embedding", "vec_id", k=3)
    counts = {r.query_id: r["count"] for r in
              out.groupBy("query_id").count().collect()}
    assert counts == {i: 3 for i in range(5)}


def test_prefix_filter_is_exact(spark, docs):
    """Prefix filtering must lose NO pairs (the prefix-filter theorem):
    identical output to the unfiltered all-pairs join."""
    plain = {(r.id_a, r.id_b, r.jaccard) for r in dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=2, threshold=0.3).collect()}
    filtered = {(r.id_a, r.id_b, r.jaccard) for r in dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=2, threshold=0.3,
        prefix_filter=True).collect()}
    assert filtered == plain and plain


class TestComponents:
    def test_connected_components_basic(self, spark):
        from datawave_spark.operators.components import connected_components
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
            "id_a long, id_b long")
        got = {r.id: r.component for r in connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                       20: 20, 21: 20, 22: 20, 23: 20}

    def test_dedup_clusters_end_to_end(self, spark, docs):
        from datawave_spark.operators.components import dedup_clusters
        pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", k=2,
                                          threshold=0.3)
        out = dedup_clusters(docs, "doc_id", pairs).collect()
        assert len(out) == docs.count()
        dups = [r for r in out if r.is_duplicate]
        assert dups, "planted near-dups should form clusters"
        by_canon = {}
        for r in out:
            by_canon.setdefault(r.canonical_id, []).append(r.id)
        # every cluster's canonical id is its minimum member
        for canon, members in by_canon.items():
            assert canon == min(members)


class TestIVF:
    def test_ivf_recall_vs_bruteforce(self, spark, emb):
        import numpy as np
        import pyarrow.parquet as pq
        cents = similarity.ivf_centroids(emb, "embedding", "vec_id",
                                         n_centroids=8)
        assert cents.shape[1] == 64
        assigned = similarity.ivf_assign(emb, "embedding", cents).cache()
        # every row assigned to a valid cluster
        clusters = {r.ivf_cluster for r in
                    assigned.select("ivf_cluster").distinct().collect()}
        assert clusters <= set(range(8))
        q = [float(x) for x in pq.read_table(
            f"{SF_DIR}/embeddings.parquet",
            filters=[("vec_id", "=", 0)]).column("embedding")[0].as_py()]
        exact = [r.id for r in similarity.cosine_topk(
            emb, "embedding", "vec_id", q, k=10).collect()]
        approx = [r.id for r in similarity.ivf_cosine_topk(
            assigned, "embedding", "vec_id", cents, q, k=10,
            n_probe=4).collect()]
        assert approx[0] == 0  # the query vector itself
        overlap = len(set(exact) & set(approx))
        assert overlap >= 5, f"IVF top-10 overlap {overlap}/10"


def test_distributed_path_matches_driver_union_find(spark):
    """Force the iterative path (threshold 0) and check it agrees with
    the driver union-find on a chain + cliques graph."""
    from datawave_spark.operators.components import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "id_a long, id_b long")
    fast = {(r.id, r.component) for r in connected_components(pairs).collect()}
    dist = {(r.id, r.component) for r in
            connected_components(pairs, driver_threshold=0).collect()}
    assert fast == dist
    assert dict(fast)[5] == 1  # 4-hop chain resolves to the minimum


def test_quantized_topk_high_recall(spark, emb):
    """Int8 quantization error is ~0.4% per component; the dequantized
    top-10 must agree with the exact float top-10 almost perfectly."""
    import pyarrow.parquet as pq
    q = [float(x) for x in pq.read_table(
        f"{SF_DIR}/embeddings.parquet",
        filters=[("vec_id", "=", 0)]).column("embedding")[0].as_py()]
    exact = [r.id for r in similarity.cosine_topk(
        emb, "embedding", "vec_id", q, k=10).collect()]
    quant = similarity.quantize_embeddings(emb, "embedding")
    approx = [r.id for r in similarity.quantized_cosine_topk(
        quant.withColumnRenamed("vec_id", "vid"), "vid", q, k=10).collect()]
    assert approx[0] == 0                      # query vector itself
    assert len(set(exact) & set(approx)) >= 8


class TestIncrementalLsh:
    def test_finds_cross_batch_dup_only(self, spark):
        from datawave_spark.operators.dedup import (
            attach_minhash_signatures, incremental_lsh_pairs, shingle_sets)
        docs = spark.createDataFrame(
            [(10, "alpha beta gamma delta epsilon zeta eta theta"),
             (1, "alpha beta gamma delta epsilon zeta eta theta"),
             (2, "one two three four five six seven eight"),
             (3, "one two three four five six seven eight")],
            "doc_id long, text string")
        signed = attach_minhash_signatures(
            shingle_sets(docs, "text", "doc_id", 2), 16)
        new = signed.filter("id = 10")
        corp = signed.filter("id != 10")
        got = incremental_lsh_pairs(new, corp, 16, 8, 0.3).collect()
        # only the (new=10, old=1) pair; the 2-3 corpus-internal dup
        # must NOT appear (it was found when 2/3 were themselves new)
        assert [(r.id_new, r.id_old) for r in got] == [(10, 1)]
        assert got[0].jaccard == 1.0

    def test_capped_corpus_bucket_suppressed(self, spark):
        from datawave_spark.operators.dedup import (
            attach_minhash_signatures, incremental_lsh_pairs, shingle_sets)
        same = "common words repeated in every corpus document here"
        rows = [(100, same)] + [(i, same) for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        signed = attach_minhash_signatures(
            shingle_sets(docs, "text", "doc_id", 2), 16)
        new = signed.filter("id = 100")
        corp = signed.filter("id != 100")
        got = incremental_lsh_pairs(new, corp, 16, 8, 0.3,
                                    max_bucket=3).collect()
        assert got == []  # all corpus buckets exceed the cap


class TestSimhashHamming:
    def test_near_dup_within_distance_found(self, spark):
        from datawave_spark.operators.dedup import simhash_hamming_pairs
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = spark.createDataFrame(
            [(1, base), (2, base + " lambda"),      # tiny perturbation
             (3, "completely different words here about other topics")],
            "doc_id long, text string")
        got = simhash_hamming_pairs(docs, "text", "doc_id",
                                    bits=16, max_dist=4).collect()
        pairs = {(r.id_a, r.id_b) for r in got}
        assert (1, 2) in pairs
        assert all(r.hamming <= 4 for r in got)

    def test_identical_docs_distance_zero(self, spark):
        from datawave_spark.operators.dedup import simhash_hamming_pairs
        docs = spark.createDataFrame(
            [(1, "same words here"), (2, "same words here")],
            "doc_id long, text string")
        got = simhash_hamming_pairs(docs, "text", "doc_id",
                                    bits=16, max_dist=0).collect()
        assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 0)]

    def test_bucket_cap_suppresses_degenerate_block(self, spark):
        from datawave_spark.operators.dedup import simhash_hamming_pairs
        docs = spark.createDataFrame(
            [(i, "identical content every time") for i in range(6)],
            "doc_id long, text string")
        got = simhash_hamming_pairs(docs, "text", "doc_id", bits=16,
                                    max_dist=2, max_bucket=3).collect()
        assert got == []


class TestKnnJoinBlocked:
    def test_blocked_matches_exact_within_block(self, spark, emb):
        """Within one block, the blocked join must equal the exact
        knn_join run on that block alone."""
        from pyspark.sql import functions as F
        blk = emb.filter(F.col("label") == 0)
        exact = {(r.query_id, r.corpus_id, r.cos) for r in similarity.knn_join(
            blk, blk, "embedding", "vec_id", k=3).collect()}
        blocked = {(r.query_id, r.corpus_id, r.cos)
                   for r in similarity.knn_join_blocked(
                       blk, emb, "embedding", "vec_id",
                       block_col="label", k=3).collect()}
        assert blocked == exact and exact

    def test_candidates_never_cross_blocks(self, spark, emb):
        out = similarity.knn_join_blocked(emb, emb, "embedding", "vec_id",
                                          block_col="label", k=3)
        labels = emb.select("vec_id", "label")
        joined = (out.join(labels.withColumnRenamed("vec_id", "query_id")
                           .withColumnRenamed("label", "ql"), "query_id")
                  .join(labels.withColumnRenamed("vec_id", "corpus_id")
                        .withColumnRenamed("label", "cl"), "corpus_id"))
        from pyspark.sql import functions as F
        assert joined.filter(F.col("ql") != F.col("cl")).count() == 0


class TestKnnJoinLsh:
    def test_candidates_within_probe_radius(self, spark, emb):
        """Every returned neighbor's stored signature is within Hamming
        ≤ probe_radius of its query's signature."""
        from pyspark.sql import functions as F
        planes = similarity.hyperplanes(
            len(emb.select("embedding").head()[0]), 8)
        signed = emb.select(
            "vec_id", "embedding",
            similarity.lsh_signature(
                F.col("embedding").cast("array<double>"), planes).alias("sig"))
        out = similarity.knn_join_lsh(
            signed.filter(F.col("vec_id") < 5), signed, "embedding",
            "vec_id", bits=8, k=3, probe_radius=1)
        sigs = {r.vec_id: r.sig for r in signed.select("vec_id", "sig").collect()}
        for r in out.collect():
            ham = sum(a != b for a, b in
                      zip(sigs[r.query_id], sigs[r.corpus_id]))
            assert ham <= 1

    def test_recall_improves_with_radius(self, spark, emb):
        """Recall against the exact top-3 must grow with probe_radius
        (the recall/cost dial) and be non-trivial at radius 2 on the
        random fixture corpus — random embeddings are LSH's worst case,
        so the bar is deliberately modest."""
        from pyspark.sql import functions as F
        planes = similarity.hyperplanes(
            len(emb.select("embedding").head()[0]), 8)
        signed = emb.select(
            "vec_id", "embedding",
            similarity.lsh_signature(
                F.col("embedding").cast("array<double>"), planes).alias("sig"))
        qs = signed.filter(F.col("vec_id") < 10)
        exact = {(r.query_id, r.corpus_id) for r in similarity.knn_join(
            qs, signed, "embedding", "vec_id", k=3).collect()}
        recalls = []
        for rad in (1, 2):
            approx = {(r.query_id, r.corpus_id)
                      for r in similarity.knn_join_lsh(
                          qs, signed, "embedding", "vec_id", bits=8, k=3,
                          probe_radius=rad).collect()}
            recalls.append(len(approx & exact) / len(exact))
        assert recalls[1] >= recalls[0]
        assert recalls[1] >= 0.25


class TestNgramMaxDf:
    def test_cap_drops_hot_gram_pairs_only(self, spark):
        """With the cap above every gram's df the result equals the
        uncapped path; with a tight cap, pairs supported only by hot
        grams disappear."""
        rows = [(i, "alpha beta common") for i in range(5)] + \
               [(10, "zeta eta common"), (11, "zeta eta common")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        uncapped = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=0.5).collect()}
        loose = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=0.5, max_df=100).collect()}
        assert loose == uncapped
        # cap=3 removes the "beta common"-ish grams shared by the 5-dup
        # group? no — those have df=5 > 3, so the alpha-group pairs must
        # vanish while the df=2 zeta pair survives
        tight = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=0.5, max_df=3).collect()}
        assert (10, 11) in tight
        assert all(a >= 10 for a, _ in tight)

    def test_cap_consistent_between_paths(self, spark, docs):
        """sets path and raw path agree under the cap."""
        raw = {(r.id_a, r.id_b, r.jaccard) for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", k=2, threshold=0.3, max_df=50).collect()}
        sets = dedup.shingle_sets(docs, "text", "doc_id", k=2)
        from_sets = {(r.id_a, r.id_b, r.jaccard)
                     for r in dedup.ngram_jaccard_pairs_from_sets(
                         sets, threshold=0.3, max_df=50).collect()}
        assert from_sets == raw


class TestStarComponents:
    def test_long_chain_converges_in_log_rounds(self, spark):
        """A 64-node chain needs 63 propagation rounds but only ~log2
        star rounds — max_iter=8 must suffice and label every node with
        the chain minimum."""
        from datawave_spark.operators.components import connected_components
        pairs = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                      "id_a long, id_b long")
        out = {(r.id, r.component) for r in connected_components(
            pairs, driver_threshold=0, max_iter=8).collect()}
        assert out == {(i, 0) for i in range(65)}

    def test_mixed_components(self, spark):
        from datawave_spark.operators.components import connected_components
        pairs = spark.createDataFrame(
            [(5, 3), (3, 9), (20, 21), (21, 22), (40, 41)],
            "id_a long, id_b long")
        got = dict((r.id, r.component) for r in connected_components(
            pairs, driver_threshold=0).collect())
        assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20,
                       40: 40, 41: 40}


class TestPQ:
    def test_pq_recall_vs_bruteforce(self, spark, emb):
        import numpy as np
        import pyarrow.parquet as pq
        books = similarity.pq_codebooks(emb, "embedding", "vec_id",
                                        n_subspaces=16, n_centroids=16)
        assert books.shape == (16, 16, 4)
        enc = similarity.pq_encode(emb, "embedding", "vec_id", books)
        codes = enc.select("pq_code").head(3)
        assert all(len(r.pq_code) == 16 for r in codes)
        assert all(0 <= c < 16 for r in codes for c in r.pq_code)
        q = [float(x) for x in pq.read_table(
            f"{SF_DIR}/embeddings.parquet",
            filters=[("vec_id", "=", 0)]).column("embedding")[0].as_py()]
        exact = [r.id for r in similarity.cosine_topk(
            emb, "embedding", "vec_id", q, k=10).collect()]
        approx = [r.id for r in similarity.pq_topk(
            enc, "vec_id", books, q, k=10).collect()]
        # the query vector itself must rank first even through 32×
        # compression; a majority of the true top-10 should survive
        assert approx[0] == 0
        overlap = len(set(exact) & set(approx))
        assert overlap >= 5, f"PQ top-10 overlap {overlap}/10"
        # ADC shortlist + exact re-rank: near-exact recall
        rer = [r.id for r in similarity.pq_topk_rerank(
            enc, emb, "embedding", "vec_id", books, q, k=10,
            shortlist=100).collect()]
        assert len(set(exact) & set(rer)) >= 9

    def test_pq_dim_mismatch_raises(self, spark, emb):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="divisible"):
            similarity.pq_codebooks(emb, "embedding", "vec_id",
                                    n_subspaces=7)


class TestKnnSkewGuards:
    def test_lsh_bucket_cap_suppresses_hot_bucket(self, spark, emb):
        from pyspark.sql import functions as F
        planes = similarity.hyperplanes(
            len(emb.select("embedding").head()[0]), 8)
        signed = emb.select(
            "vec_id", "embedding",
            similarity.lsh_signature(
                F.col("embedding").cast("array<double>"), planes).alias("sig"))
        # degenerate corpus: force every row into ONE bucket
        hot = signed.withColumn("sig", F.lit("00000000"))
        qs = hot.filter(F.col("vec_id") < 3)
        uncapped = similarity.knn_join_lsh(qs, hot, "embedding", "vec_id",
                                           bits=8, k=3, probe_radius=0)
        capped = similarity.knn_join_lsh(qs, hot, "embedding", "vec_id",
                                         bits=8, k=3, probe_radius=0,
                                         max_bucket=10)
        assert uncapped.count() == 9     # 3 queries × k
        assert capped.count() == 0       # hot bucket suppressed

    def test_blocked_max_block_drops_dominant_label(self, spark, emb):
        from pyspark.sql import functions as F
        skew = emb.withColumn("label", F.lit(0))
        out = similarity.knn_join_blocked(
            skew.filter(F.col("vec_id") < 3), skew, "embedding",
            "vec_id", block_col="label", k=3, max_block=100)
        assert out.count() == 0


def test_prefix_filter_exact_under_max_df(spark, docs):
    """The prefix-filter theorem must still hold within the REDUCED
    shingle universe: prefix+cap == direct+cap."""
    direct = {(r.id_a, r.id_b, r.jaccard) for r in dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=2, threshold=0.3, max_df=50).collect()}
    pref = {(r.id_a, r.id_b, r.jaccard) for r in dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=2, threshold=0.3, max_df=50,
        prefix_filter=True).collect()}
    assert pref == direct and direct


# ------------------------------------------------- semantic dedup / k-means

def test_semantic_dedup_keep_first_matches_bruteforce(spark, emb):
    """Survivors = rows with no earlier above-threshold neighbor in
    their block, computed independently in numpy."""
    import numpy as np
    rows = sorted(emb.select("vec_id", "label", "embedding").collect(),
                  key=lambda r: r.vec_id)
    V = np.array([r.embedding for r in rows], dtype=float)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    C = V @ V.T
    expected = set()
    for i, ri in enumerate(rows):
        dominated = any(
            rows[j].label == ri.label and round(C[i, j], 4) >= 0.35
            for j in range(i))
        if not dominated:
            expected.add(ri.vec_id)
    got = {r.vec_id for r in dedup.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.35,
        block_col="label").collect()}
    assert got == expected
    assert 0 < len(got) < len(rows)


def test_semantic_dedup_keep_col_flags_match_filtered(spark, emb):
    flagged = dedup.semantic_dedup(emb, "embedding", "vec_id",
                                   threshold=0.35, block_col="label",
                                   keep_col="keep")
    assert flagged.count() == emb.count()
    kept = {r.vec_id for r in flagged.filter("keep").collect()}
    filtered = {r.vec_id for r in dedup.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.35,
        block_col="label").collect()}
    assert kept == filtered


def test_semantic_dedup_over_ivf_blocks(spark, emb):
    """The scale deployment: block on the stored IVF k-means
    assignment.  Block-restricted survivors must be a superset of the
    unblocked-exact survivors (blocking only removes comparisons)."""
    from datawave_spark.operators.similarity import ivf_centroids, ivf_assign
    cents = ivf_centroids(emb, "embedding", "vec_id", n_centroids=4)
    assigned = ivf_assign(emb, "embedding", cents)
    blocked = {r.vec_id for r in dedup.semantic_dedup(
        assigned, "embedding", "vec_id", threshold=0.35,
        block_col="ivf_cluster").collect()}
    exact = {r.vec_id for r in dedup.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.35).collect()}
    assert exact <= blocked
    assert len(blocked) < emb.count()


def test_kmeans_fit_matches_numpy_lloyd(spark, emb):
    """Distributed Lloyd's == numpy Lloyd's from the same seeds (cosine
    assignment, mean update), to float tolerance."""
    import numpy as np
    rows = sorted(emb.select("vec_id", "embedding").collect(),
                  key=lambda r: r.vec_id)
    V = np.array([r.embedding for r in rows], dtype=float)
    k, iters = 4, 2
    cents = V[:k].copy()
    for _ in range(iters):
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = (Vn @ Cn.T).argmax(axis=1)
        for c in range(k):
            m = V[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    got = np.array(similarity.kmeans_fit(emb, "embedding", "vec_id",
                                         k=k, iters=iters))
    assert np.allclose(got, cents, atol=1e-9)


def test_kmeans_step_no_python_udf_in_plan(spark, emb):
    """Assignment must stay JVM-side: no BatchEvalPython / ArrowEval
    in the physical plan (the posexplode+agg path is codegen'd)."""
    seeds = [list(map(float, r.embedding)) for r in
             emb.orderBy("vec_id").limit(4).collect()]
    plan = similarity.kmeans_step(emb, "embedding", seeds) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_kmeans_step_drops_degenerate_vectors(spark, emb):
    """NULL / zero-norm embeddings yield NULL cosines and a NULL
    cluster — they must be dropped, not crash the codebook rebuild."""
    from pyspark.sql import functions as F
    seeds = [list(map(float, r.embedding)) for r in
             emb.orderBy("vec_id").limit(4).collect()]
    dim = len(seeds[0])
    bad = emb.limit(1).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.col("label"),
        F.array(*[F.lit(0.0)] * dim).alias("embedding"))
    with_bad = emb.select("vec_id", "label",
                          F.col("embedding").cast("array<double>")
                          .alias("embedding")).unionByName(bad)
    rows = similarity.kmeans_step(with_bad, "embedding", seeds).collect()
    assert all(r.cluster is not None for r in rows)
    clean = similarity.kmeans_step(emb, "embedding", seeds).collect()
    assert sorted((r.cluster, r.dim, r.n_members) for r in rows) == \
        sorted((r.cluster, r.dim, r.n_members) for r in clean)
    # fit over the degenerate frame must not raise
    similarity.kmeans_fit(with_bad, "embedding", "vec_id", k=4, iters=1)


# ---------------------------------------------------------------- ExactSubstr

def _exsub_frame(spark):
    w = "w x y z p q r s t u"          # a 10-token region
    rows = [
        (1, f"a b c {w} d e f"),       # first occurrence -> kept intact
        (2, f"g h {w} i j"),           # later doc -> region removed
        (3, f"{w} {w}"),               # within-doc repeat -> 2nd removed
        (4, "unique tokens only here none repeat at all ok fine yes"),
        (5, "short doc"),              # < k tokens -> no windows
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_substring_keep_first_semantics(spark):
    out = {r["doc_id"]: r for r in
           dedup.exact_substring_dedup(
               _exsub_frame(spark), k=10, min_count=2).collect()}
    assert out[1]["removed_tokens"] == 0          # corpus-first kept
    assert out[2]["n_spans"] == 1 and out[2]["removed_tokens"] == 10
    assert out[2]["kept_tokens"] == 4             # 'g h i j' survive
    # doc 3: tokens 1..10 are the corpus-2nd occurrence (doc 1 is
    # first), tokens 11..20 the 3rd — two ADJACENT (not overlapping)
    # duplicated spans, so the island merge keeps them distinct and
    # the whole doc is removed.
    assert out[3]["n_spans"] == 2 and out[3]["kept_tokens"] == 0
    assert out[4]["removed_tokens"] == 0
    assert out[5]["n_spans"] == 0 and out[5]["kept_tokens"] == 2


def test_exact_substring_cleaned_md5_is_whitespace_normalized(spark):
    import hashlib
    rows = [(1, "  a   b  c d e f g h i j k  "),
            (2, "a b c d e f g h i j k")]
    out = {r["doc_id"]: r for r in
           dedup.exact_substring_dedup(
               spark.createDataFrame(rows, ["doc_id", "text"]),
               k=10, min_count=2).collect()}
    # identical token streams -> doc 1 is first (kept), doc 2 loses
    # its windows; doc 1's md5 is over the normalized join.
    assert out[1]["removed_tokens"] == 0
    assert out[1]["cleaned_md5"] == hashlib.md5(
        b"a b c d e f g h i j k").hexdigest()
    assert out[2]["kept_tokens"] == 0
    assert out[2]["cleaned_md5"] == hashlib.md5(b"").hexdigest()


def test_exact_substring_properties_vs_python_referee(spark):
    """Dual-execution referee: a pure-Python implementation of the
    keep-first window-dedup semantics over a randomized-ish fixed
    corpus; the Spark result must agree on every doc's removal set."""
    import hashlib
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    shared = " ".join(rng.choice(vocab) for _ in range(9))
    docs = []
    for i in range(40):
        n = rng.randint(0, 25)
        body = " ".join(rng.choice(vocab) for _ in range(n))
        if i % 3 == 0:          # plant the shared region in a third
            body = f"{body} {shared}".strip()
        docs.append((i, body))

    K = 6

    def referee():
        toks = {i: [t for t in txt.split() if t] for i, txt in docs}
        first: dict[str, tuple[int, int]] = {}
        occs: dict[str, list[tuple[int, int]]] = {}
        for i in sorted(toks):
            ts = toks[i]
            for s in range(len(ts) - K + 1):
                key = "\x1f".join(ts[s:s + K])
                occs.setdefault(key, []).append((i, s + 1))
                first.setdefault(key, (i, s + 1))
        removed: dict[int, set[int]] = {i: set() for i in toks}
        for key, lst in occs.items():
            if len(lst) < 2:
                continue
            for (i, s) in lst:
                if (i, s) != first[key]:
                    removed[i].update(range(s, s + K))
        out = {}
        for i, ts in toks.items():
            kept = [t for p, t in enumerate(ts, 1)
                    if p not in removed[i]]
            out[i] = (len(ts) - len(kept), len(kept),
                      hashlib.md5(" ".join(kept).encode()).hexdigest())
        return out

    want = referee()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.removed_tokens, r.kept_tokens, r.cleaned_md5)
           for r in dedup.exact_substring_dedup(
               df, k=K, min_count=2).collect()}
    assert got == want
    # conservation: every doc accounted for, tokens never created
    for i, (rm, kp, _h) in got.items():
        assert rm + kp == len([t for t in dict(docs)[i].split() if t])
