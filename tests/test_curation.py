"""Semantic tests for the corpus-curation operators (sampling,
repetition signals, decontamination, packing) — properties the driver's
value-hash gate doesn't express (rate accuracy, bin-budget invariants,
determinism under repartitioning)."""

import os

import pytest
from pyspark.sql import functions as F

from datawave_spark.operators import curation

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    from datawave_spark.sources.parquet import read_parquet
    return read_parquet(spark, f"{SF_DIR}/documents.parquet").cache()


class TestStratifiedSample:
    def test_rates_approximately_honored(self, spark):
        df = spark.range(0, 20000).select(
            F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("s"))
        out = curation.stratified_sample(df, "id", "s",
                                         {"true": 0.25, "false": 0.75})
        got = dict(out.groupBy("s").count().collect())
        assert abs(got["true"] / 10000 - 0.25) < 0.03
        assert abs(got["false"] / 10000 - 0.75) < 0.03

    def test_deterministic_and_consistent(self, spark):
        df = spark.range(0, 5000).select(
            F.col("id"), F.lit("a").alias("s"))
        keep_half = {r.id for r in
                     curation.stratified_sample(df, "id", "s", {"a": 0.5})
                     .collect()}
        keep_again = {r.id for r in
                      curation.stratified_sample(df.repartition(7), "id", "s",
                                                 {"a": 0.5}).collect()}
        assert keep_half == keep_again          # partition-insensitive
        keep_qtr = {r.id for r in
                    curation.stratified_sample(df, "id", "s", {"a": 0.25})
                    .collect()}
        assert keep_qtr <= keep_half            # consistent (nested) samples


class TestRepetition:
    def test_repeated_text_scores_high(self, spark):
        df = spark.createDataFrame(
            [(1, "spam spam spam spam spam spam"),
             (2, "each word here is fully distinct today"),
             (3, "")],
            "id long, text string")
        rows = {r.id: r for r in
                curation.repetition_ratios(df, "text", "id").collect()}
        assert rows[1].dup_token_ratio > 0.8
        assert rows[1].dup_2gram_ratio > 0.7
        assert rows[2].dup_token_ratio == 0.0
        assert rows[2].dup_2gram_ratio == 0.0
        assert rows[3].dup_token_ratio == 0.0   # empty doc is defined

    def test_matches_oracle_convention(self, docs):
        out = curation.repetition_ratios(docs, "text", "doc_id")
        row = out.filter(F.col("doc_id") == 0).collect()[0]
        assert 0.0 <= row.dup_3gram_ratio <= row.dup_2gram_ratio <= 1.0


class TestDecontaminate:
    def test_flags_only_overlapping_docs(self, spark):
        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "completely unrelated sentence with other words entirely"),
             (3, "a prefix then the quick brown fox jumps too")],
            "id long, text string")
        bench = spark.createDataFrame(
            [(9, "the quick brown fox jumps over something")],
            "id long, text string")
        got = {r.id: r.n_shared for r in
               curation.decontaminate(corpus, bench, "text", "id", k=5)
               .collect()}
        assert 1 in got and 3 in got and 2 not in got

    def test_short_docs_cannot_match(self, spark):
        corpus = spark.createDataFrame([(1, "too short to gram")],
                                       "id long, text string")
        bench = corpus
        assert curation.decontaminate(corpus, bench, "text", "id",
                                      k=5).count() == 0


class TestPackSequences:
    def test_bins_respect_budget_and_order(self, spark):
        df = spark.createDataFrame(
            [(i, "a", 300) for i in range(10)], "id long, s string, n long")
        out = curation.pack_sequences(df, "id", "s", "n", budget=1000)
        bins = {r.id: r.bin for r in out.collect()}
        # 300 each, 1000 budget -> next-fit: ids 0-3 bin0 (starts at 0,
        # 300, 600, 900), 4-6 bin1, ...
        assert bins[0] == 0 and bins[3] == 0 and bins[4] == 1
        sizes = (out.groupBy("s", "bin").agg(F.sum("size").alias("tot"))
                 .collect())
        # every bin holds at least one doc and only the straddling doc
        # can push a bin past budget
        assert all(r.tot <= 1000 + 300 for r in sizes)

    def test_oversize_doc_gets_own_progression(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 5000), (2, "a", 10)], "id long, s string, n long")
        out = {r.id: r.bin for r in
               curation.pack_sequences(df, "id", "s", "n", budget=1000)
               .collect()}
        assert out[1] == 0 and out[2] == 5   # cum before id2 = 5000

    def test_stable_under_repartition(self, spark):
        df = spark.createDataFrame(
            [(i, f"s{i % 3}", 100 + i) for i in range(50)],
            "id long, s string, n long")
        a = sorted(map(tuple, curation.pack_sequences(
            df, "id", "s", "n", 500).collect()))
        b = sorted(map(tuple, curation.pack_sequences(
            df.repartition(11), "id", "s", "n", 500).collect()))
        assert a == b


class TestRedactPII:
    def test_all_categories_masked(self, spark):
        df = spark.createDataFrame(
            [(1, "mail bob@x.org ip 10.1.2.7 ssn 123-45-6789 "
                 "card 4111 1111 1111 1111 call (555) 867-5309")],
            ["id", "t"])
        row = curation.redact_pii(df, "t", "id").collect()[0]
        assert "<EMAIL>" in row.redacted and "<IP>" in row.redacted
        assert "<SSN>" in row.redacted and "<CARD>" in row.redacted
        assert "<PHONE>" in row.redacted
        assert (row.n_email, row.n_ip, row.n_ssn, row.n_card,
                row.n_phone) == (1, 1, 1, 1, 1)

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([(1, "just plain words here")], ["id", "t"])
        row = curation.redact_pii(df, "t", "id").collect()[0]
        assert row.redacted == "just plain words here"
        assert row.n_email == row.n_phone == 0

    def test_order_ip_not_eaten_by_phone(self, spark):
        # the dotted quad must become <IP>, never a partial <PHONE>
        df = spark.createDataFrame([(1, "server at 192.168.100.200 up")],
                                   ["id", "t"])
        row = curation.redact_pii(df, "t", "id").collect()[0]
        assert "<IP>" in row.redacted and "PHONE" not in row.redacted


class TestCanonicalizeUrls:
    def test_full_normalization(self, spark):
        df = spark.createDataFrame(
            [(1, "HTTPS://WWW.Example.COM/Path/?utm_source=x&id=2#frag"),
             (2, "https://example.com/Path?id=2"),
             (3, "http://site.org/a/?gclid=z")],
            ["id", "u"])
        got = {r.id: r.canonical_url
               for r in curation.canonicalize_urls(df, "u", "id").collect()}
        assert got[1] == "https://example.com/Path/?id=2"
        assert got[2] == "https://example.com/Path?id=2"
        assert got[3] == "http://site.org/a"

    def test_same_page_same_key(self, spark):
        df = spark.createDataFrame(
            [(1, "HTTP://WWW.A.COM/x?utm_campaign=spring"),
             (2, "http://a.com/x")], ["id", "u"])
        keys = [r.url_key
                for r in curation.canonicalize_urls(df, "u", "id").collect()]
        assert keys[0] == keys[1]


class TestRemoveDuplicateSpans:
    def test_keep_first_across_docs(self, spark):
        # 4-token spans: doc 2 repeats doc 1's first span and adds one
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d x y")], ["id", "t"])
        got = {r.id: r.text for r in curation.remove_duplicate_spans(
            df, "t", "id", span_tokens=4).collect()}
        assert got[1] == "a b c d e f"
        assert got[2] == "x y"

    def test_fully_duplicated_doc_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], ["id", "t"])
        got = curation.remove_duplicate_spans(df, "t", "id",
                                              span_tokens=4).collect()
        assert {r.id for r in got} == {1}

    def test_within_doc_repeat_removed(self, spark):
        df = spark.createDataFrame([(1, "a b a b")], ["id", "t"])
        got = curation.remove_duplicate_spans(df, "t", "id",
                                              span_tokens=2).collect()
        assert got[0].text == "a b"

    def test_empty_text_yields_no_row(self, spark):
        df = spark.createDataFrame([(1, ""), (2, "q r")], ["id", "t"])
        got = curation.remove_duplicate_spans(df, "t", "id",
                                              span_tokens=2).collect()
        assert {r.id for r in got} == {2}


class TestRebalanceMix:
    def test_binding_stratum_keeps_all(self, spark):
        # equal weights, targets 0.5/0.5 → both binding, all rows kept
        rows = [(i, "a" if i < 50 else "b", 10) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, src string, w long")
        out = curation.rebalance_mix(df, "id", "src", "w",
                                     {"a": 0.5, "b": 0.5})
        assert out.count() == 100

    def test_shares_approach_targets(self, spark):
        # a: 900 weight, b: 100 weight, target 50/50 → b binding,
        # a downsampled to ~100 weight
        rows = [(i, "a", 1) for i in range(900)] + \
               [(1000 + i, "b", 1) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, src string, w long")
        out = curation.rebalance_mix(df, "id", "src", "w",
                                     {"a": 0.5, "b": 0.5}).collect()
        n_a = sum(1 for r in out if r.src == "a")
        n_b = sum(1 for r in out if r.src == "b")
        assert n_b == 100
        assert 70 <= n_a <= 130  # ~100 expected from the md5 coin

    def test_absent_stratum_dropped(self, spark):
        df = spark.createDataFrame([(1, "a", 5), (2, "zzz", 5)],
                                   "id long, src string, w long")
        out = curation.rebalance_mix(df, "id", "src", "w", {"a": 1.0})
        assert [r.src for r in out.collect()] == ["a"]

    def test_deterministic_across_runs(self, spark):
        rows = [(i, "a" if i % 2 else "b", i % 7 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, src string, w long")
        r1 = {r.id for r in curation.rebalance_mix(
            df, "id", "src", "w", {"a": 0.7, "b": 0.3}).collect()}
        r2 = {r.id for r in curation.rebalance_mix(
            df.repartition(7), "id", "src", "w",
            {"a": 0.7, "b": 0.3}).collect()}
        assert r1 == r2


class TestPerplexity:
    def test_oov_tokens_use_smoothed_probability(self, spark):
        from datawave_spark.operators.text import (perplexity_score,
                                                   unigram_counts)
        corpus = spark.createDataFrame(
            [(1, "aa bb aa bb"), (2, "aa aa bb cc")], "id long, t string")
        lm = unigram_counts(corpus, "t")
        scored = spark.createDataFrame([(9, "aa zz")], "id long, t string")
        row = perplexity_score(scored, "t", "id", lm).first()
        import math
        # total=8: aa has n=4 -> -ln(0.5); zz OOV -> -ln(0.5/8)
        want = (-math.log(4 / 8) + -math.log(0.5 / 8)) / 2
        assert row.cross_entropy == round(want, 4)
        assert row.n_tokens == 2

    def test_common_text_scores_lower_than_rare(self, spark):
        from datawave_spark.operators.text import (perplexity_score,
                                                   unigram_counts)
        rows = [(i, "the common words appear often") for i in range(9)]
        rows.append((100, "zyx qwv rare tokens entirely"))
        corpus = spark.createDataFrame(rows, "id long, t string")
        lm = unigram_counts(corpus, "t")
        got = {r.id: r.perplexity
               for r in perplexity_score(corpus, "t", "id", lm).collect()}
        assert got[0] < got[100]

    def test_all_oov_document_still_scores(self, spark):
        from datawave_spark.operators.text import (perplexity_score,
                                                   unigram_counts)
        corpus = spark.createDataFrame([(1, "aa bb")], "id long, t string")
        lm = unigram_counts(corpus, "t")
        row = perplexity_score(
            spark.createDataFrame([(9, "zz yy")], "id long, t string"),
            "t", "id", lm).first()
        import math
        assert row.cross_entropy == round(-math.log(0.5 / 2), 4)


class TestRebalanceGuards:
    def test_missing_target_stratum_raises(self, spark):
        df = spark.createDataFrame([(1, "a", 5)],
                                   "id long, src string, w long")
        with pytest.raises(ValueError, match="no weight"):
            curation.rebalance_mix(df, "id", "src", "w",
                                   {"a": 0.5, "ghost": 0.5})

    def test_zero_weight_stratum_raises_not_empties(self, spark):
        df = spark.createDataFrame([(1, "a", 5), (2, "b", 0)],
                                   "id long, src string, w long")
        with pytest.raises(ValueError, match="no weight"):
            curation.rebalance_mix(df, "id", "src", "w",
                                   {"a": 0.5, "b": 0.5})

    def test_zero_target_share_drops_stratum_cleanly(self, spark):
        # an explicit 0.0 share means "none of this stratum" — it is
        # dropped, not a ZeroDivisionError, and takes no part in the
        # binding-stratum min (so it can't zero out every rate); a 0.0
        # share for an ABSENT stratum is likewise fine
        df = spark.createDataFrame([(i, "a", 5) for i in range(20)]
                                   + [(100 + i, "b", 5) for i in range(20)],
                                   "id long, src string, w long")
        out = curation.rebalance_mix(df, "id", "src", "w",
                                     {"a": 1.0, "b": 0.0, "ghost": 0.0})
        got = {r.src for r in out.collect()}
        assert got == {"a"}
        with pytest.raises(ValueError, match="must be >= 0"):
            curation.rebalance_mix(df, "id", "src", "w",
                                   {"a": 1.0, "b": -0.1})
        with pytest.raises(ValueError, match="no positive"):
            curation.rebalance_mix(df, "id", "src", "w", {"a": 0.0})


# ------------------------------------------------- hash_split / domain_cap

def test_hash_split_partitions_every_row_once(spark, docs):
    from datawave_spark.operators.curation import hash_split
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1,
                                      "test": 0.1})
    assert out.count() == docs.count()
    assert out.filter(F.col("split").isNull()).count() == 0
    shares = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert set(shares) <= {"train", "val", "test"}
    assert abs(shares.get("train", 0) / n - 0.8) < 0.1


def test_hash_split_is_stable_and_consistent(spark, docs):
    """Same ids -> same assignment; widening a split keeps prior
    members (consistent-hashing property)."""
    from datawave_spark.operators.curation import hash_split
    a = {r.doc_id: r.split for r in
         hash_split(docs, "doc_id", {"train": 0.8, "val": 0.2}).collect()}
    b = {r.doc_id: r.split for r in
         hash_split(docs, "doc_id", {"train": 0.8, "val": 0.2}).collect()}
    assert a == b
    wide = {r.doc_id: r.split for r in
            hash_split(docs, "doc_id", {"train": 0.9, "val": 0.1}).collect()}
    # intervals follow dict INSERTION order: train owns the low
    # interval in both dicts, so widening it only moves the upper
    # boundary — nobody leaves train
    for k, v in a.items():
        if v == "train":
            assert wide[k] == "train"


def test_hash_split_appending_a_split_preserves_earlier_ones(spark, docs):
    """The consistent-hashing contract: carving a new split by
    APPENDING it (shrinking the last split) keeps every earlier
    split's membership exactly."""
    from datawave_spark.operators.curation import hash_split
    before = {r.doc_id: r.split for r in
              hash_split(docs, "doc_id",
                         {"train": 0.8, "val": 0.2}).collect()}
    after = {r.doc_id: r.split for r in
             hash_split(docs, "doc_id",
                        {"train": 0.8, "val": 0.1,
                         "eval": 0.1}).collect()}
    for k, v in before.items():
        if v == "train":
            assert after[k] == "train"
        else:
            assert after[k] in ("val", "eval")


def test_domain_cap_descending_requires_order_col(spark, docs):
    from datawave_spark.operators.curation import domain_cap
    import pytest as _pytest
    with _pytest.raises(ValueError):
        domain_cap(docs, "doc_id", "source", 5, descending=True)


def test_hash_split_rejects_bad_fractions(spark, docs):
    from datawave_spark.operators.curation import hash_split
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.7, "b": 0.7})
    # sub-1 sum without a remainder name would silently label 100% of
    # rows with the last split — must be an explicit error
    with _pytest.raises(ValueError, match="remainder"):
        hash_split(docs, "doc_id", {"sample": 0.01})
    with _pytest.raises(ValueError, match="collides"):
        hash_split(docs, "doc_id", {"sample": 0.01}, remainder="sample")


def test_hash_split_remainder_carves_out_a_small_sample(spark, docs):
    """hash_split(..., {"sample": 0.01}, remainder="rest") labels ~1%
    'sample' — not the whole corpus — and the named split's membership
    matches the sum-to-1 formulation of the same carve-out."""
    from datawave_spark.operators.curation import hash_split
    out = {r.doc_id: r.split for r in
           hash_split(docs, "doc_id", {"sample": 0.05},
                      remainder="rest").collect()}
    n = len(out)
    n_sample = sum(1 for v in out.values() if v == "sample")
    assert 0 < n_sample < 0.25 * n
    explicit = {r.doc_id: r.split for r in
                hash_split(docs, "doc_id",
                           {"sample": 0.05, "rest": 0.95}).collect()}
    assert out == explicit


def test_hash_split_remainder_empty_when_fractions_cover_one(spark, docs):
    """A remainder name alongside fractions already summing to 1 is a
    no-op: no phantom zero-width split steals the terminal interval's
    forced 'ffffffff' endpoint from the last real split."""
    from datawave_spark.operators.curation import hash_split
    with_rem = {r.doc_id: r.split for r in
                hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5},
                           remainder="rest").collect()}
    without = {r.doc_id: r.split for r in
               hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5}).collect()}
    assert with_rem == without
    assert "rest" not in set(with_rem.values())


def test_domain_cap_bounds_and_prefers_order(spark, docs):
    from datawave_spark.operators.curation import domain_cap
    out = domain_cap(docs, "doc_id", "source", 5,
                     order_col="n_chars", descending=True)
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 5 for r in per)
    # kept docs per source are the longest ones
    kept = {(r.source, r.doc_id) for r in out.collect()}
    rows = docs.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, members in by_src.items():
        best = sorted(members, key=lambda r: (-r.n_chars, r.doc_id))[:5]
        assert {(src, r.doc_id) for r in best} == {
            k for k in kept if k[0] == src}


class TestBM25:
    def test_hand_computed_score(self, spark):
        import math
        from datawave_spark.operators.text import bm25_topk
        from pyspark.sql import functions as F
        # 3 docs; postings built by hand.  Query: ['a', 'b'].
        post = spark.createDataFrame(
            [("a", 1, 2, 4), ("a", 2, 1, 2), ("b", 1, 1, 4), ("c", 3, 3, 3)],
            "term string, doc_id int, tf long, doc_len long")
        out = {r["doc_id"]: r for r in
               bm25_topk(post, ["a", "b"], n_docs=3, total_len=9,
                         k=10).collect()}
        assert set(out) == {1, 2}
        assert out[1]["n_terms"] == 2 and out[2]["n_terms"] == 1
        avgdl = 9 / 3
        def s(tf, dl, df):
            idf = math.log((3 - df + 0.5) / (df + 0.5) + 1)
            return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        exp1 = math.floor((s(2, 4, 2) + s(1, 4, 1)) * 10000 + 0.5) / 10000
        assert out[1]["score"] == exp1
        # doc 1 matches both terms -> outranks doc 2
        assert out[1]["score"] > out[2]["score"]

    def test_empty_query_rejected(self, spark):
        import pytest as _pt
        from datawave_spark.operators.text import bm25_topk
        post = spark.createDataFrame([], "term string, doc_id int, tf long, doc_len long")
        with _pt.raises(ValueError):
            bm25_topk(post, [], n_docs=1, total_len=1)

    def test_plan_prunes_and_heaps(self, spark):
        # the term IN-filter must reach the postings scan, and top-k
        # must be TakeOrderedAndProject, not a global Sort+Limit
        from datawave_spark.operators.text import bm25_topk
        from datawave_spark.sources import prepared
        post = prepared.term_postings(spark, "/root/testdata/sf0.001")
        df = bm25_topk(post, ["spark", "merge"], n_docs=100,
                       total_len=5000, k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "PushedFilters" in plan and "In(term" in plan


class TestCollocations:
    def test_pmi_hand_computed(self, spark):
        import math
        from datawave_spark.operators.text import collocations_pmi
        # "x y" appears 3 times; unigrams: x=3, y=3, z=2; T=8, B=5
        docs = spark.createDataFrame(
            [(1, "x y z"), (2, "x y"), (3, "x y z")],
            "doc_id int, text string")
        out = {r["bigram"]: r for r in
               collocations_pmi(docs, "text", "doc_id",
                                min_count=2, k=10).collect()}
        assert out["x y"]["n"] == 3
        exp = ((3 / 5.0) / (3 / 8.0)) / (3 / 8.0)
        assert out["x y"]["pmi"] == math.floor(
            math.log(exp) * 10000 + 0.5) / 10000
        assert out["y z"]["n"] == 2
        # single-token doc contributes no bigrams
        docs1 = spark.createDataFrame([(1, "solo")], "doc_id int, text string")
        assert collocations_pmi(docs1, "text", "doc_id",
                                min_count=1).count() == 0


class TestDSIR:
    def test_matches_python_referee(self, spark):
        import math
        from collections import Counter
        from datawave_spark.operators.curation import dsir_topk
        corpus = {1: "alpha beta alpha beta", 2: "alpha beta gamma gamma",
                  3: "delta delta delta zeta"}
        tgt = "alpha beta alpha"
        docs = spark.createDataFrame(list(corpus.items()),
                                     "doc_id int, text string")
        target = spark.createDataFrame([(9, tgt)], "doc_id int, text string")
        # pure-python referee with the same formula
        ctok = [w for t in corpus.values() for w in t.split()]
        cc, tc_ = Counter(ctok), Counter(tgt.split())
        Tc, Tt, V = len(ctok), len(tgt.split()), len(cc)

        def score(text):
            toks = text.split()
            s = sum(math.log((tc_.get(w, 0) + 1) / (Tt + V))
                    - math.log(cc[w] / Tc) for w in toks)
            return math.floor(s / len(toks) * 10000 + 0.5) / 10000

        expected = {d: score(t) for d, t in corpus.items()}
        out = {r["doc_id"]: r["avg_logratio"] for r in
               dsir_topk(docs, target, "text", "doc_id", k=3).collect()}
        assert out == expected
        # the target-like doc outranks the fully-foreign one
        assert expected[1] > expected[3]

    def test_hand_computed_score(self, spark):
        import math
        from datawave_spark.operators.curation import dsir_topk
        docs = spark.createDataFrame([(1, "a a b")], "doc_id int, text string")
        target = spark.createDataFrame([(9, "a")], "doc_id int, text string")
        # corpus: a=2, b=1, Tc=3, V=2; target: a=1, Tt=1
        row = dsir_topk(docs, target, "text", "doc_id").first()
        lr_a = math.log((1 + 1) / (1 + 2)) - math.log(2 / 3)
        lr_b = math.log((0 + 1) / (1 + 2)) - math.log(1 / 3)
        exp = math.floor((2 * lr_a + lr_b) / 3 * 10000 + 0.5) / 10000
        assert row["avg_logratio"] == exp


class TestGopherAndC4:
    def test_gopher_flags(self, spark):
        from datawave_spark.operators.curation import gopher_quality_flags
        good = "the data and the table have rows with " + \
            " ".join(f"col{i}" for i in range(50))
        docs = spark.createDataFrame(
            [(1, good),
             (2, "short text"),                       # too few words
             (3, "#### " * 60)],                      # symbol soup
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in
               gopher_quality_flags(docs, "text", "doc_id").collect()}
        assert out[1]["gopher_pass"] is True
        assert out[2]["words_ok"] is False and out[2]["gopher_pass"] is False
        assert out[3]["symbol_ok"] is False
        assert out[3]["alpha_ok"] is False            # '####' not alpha

    def test_gopher_line_rules(self, spark):
        from datawave_spark.operators.curation import gopher_quality_flags
        body = "the data and " + " ".join(f"w{i}" for i in range(60))
        bullets = "\n".join(f"- item {i}" for i in range(10))
        docs = spark.createDataFrame([(1, body + "\n" + bullets)],
                                     "doc_id int, text string")
        r = gopher_quality_flags(docs, "text", "doc_id").first()
        assert r["bullet_ok"] is False                # 10/11 lines bullets

    def test_c4_line_and_doc_rules(self, spark):
        from datawave_spark.operators.curation import c4_clean_lines
        docs = spark.createDataFrame(
            [(1, "good line stays here.\nno punct line\nok line two!\n"
                 "enable javascript now."),
             (2, "function f() { return 1; }"),       # brace -> doc drop
             (3, "Lorem Ipsum dolor sit amet.")],     # boilerplate drop
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in
               c4_clean_lines(docs, "text", "doc_id").collect()}
        assert set(out) == {1}
        assert out[1]["n_lines_total"] == 4
        assert out[1]["n_lines_kept"] == 2
        assert out[1]["text_clean"] == \
            "good line stays here.\nok line two!"


class TestGopherEmptyDoc:
    def test_empty_and_whitespace_docs_flag_not_crash(self, spark):
        from datawave_spark.operators.curation import gopher_quality_flags
        docs = spark.createDataFrame(
            [(1, ""), (2, "   \n  \n"), (3, "the data and stuff.")],
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in
               gopher_quality_flags(docs, "text", "doc_id").collect()}
        assert out[1]["n_words"] == 0
        assert out[1]["gopher_pass"] is False
        assert out[2]["gopher_pass"] is False
        assert out[2]["mean_word_len"] == 0.0


class TestStupidBackoff:
    def _lm(self, spark):
        from datawave_spark.operators.text import (bigram_counts,
                                                   unigram_counts)
        corpus = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the cat ran"), (3, "sat the cat")],
            "id long, t string")
        return unigram_counts(corpus, "t"), bigram_counts(corpus, "t"), corpus

    def test_observed_bigrams_score_by_conditional_frequency(self, spark):
        import math
        from datawave_spark.operators.text import stupid_backoff_score
        lm, bg, corpus = self._lm(spark)
        row = {r.id: r for r in stupid_backoff_score(
            corpus, "t", "id", lm, bg).collect()}[1]
        # doc 1 "the cat sat": first token unigram 3/9; (the,cat)=3/3;
        # (cat,sat)=1/3
        want = -(math.log(3 / 9) + math.log(3 / 3) + math.log(1 / 3)) / 3
        assert row.backoff_nll == round(want, 4)
        assert row.n_tokens == 3

    def test_unseen_bigram_backs_off_to_alpha_unigram(self, spark):
        import math
        from datawave_spark.operators.text import stupid_backoff_score
        lm, bg, _ = self._lm(spark)
        new = spark.createDataFrame([(9, "zebra cat the")],
                                    "id long, t string")
        row = stupid_backoff_score(new, "t", "id", lm, bg).first()
        # zebra OOV first token: 0.5/9; (zebra,cat) and (cat,the)
        # unseen: 0.4 * 3/9 each
        want = -(math.log(0.5 / 9) + 2 * math.log(0.4 * 3 / 9)) / 3
        assert row.backoff_nll == round(want, 4)

    def test_shuffled_text_scores_worse_than_natural(self, spark):
        from datawave_spark.operators.text import (bigram_counts,
                                                   stupid_backoff_score,
                                                   unigram_counts)
        rows = [(i, "one two three four five") for i in range(10)]
        corpus = spark.createDataFrame(rows, "id long, t string")
        lm, bg = unigram_counts(corpus, "t"), bigram_counts(corpus, "t")
        probe = spark.createDataFrame(
            [(1, "one two three four five"), (2, "five three one four two")],
            "id long, t string")
        got = {r.id: r.backoff_nll for r in stupid_backoff_score(
            probe, "t", "id", lm, bg).collect()}
        assert got[1] < got[2]  # same unigram mix, broken adjacency


class TestNearDupDecontamination:
    def test_contaminated_doc_dropped_flag_matches_filter(self, spark):
        from datawave_spark.operators.curation import decontaminate_neardup
        from datawave_spark.operators.dedup import (
            attach_minhash_signatures, shingle_sets)
        rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "totally different tokens nothing shared here at all"),
                (100, "alpha beta gamma delta epsilon zeta eta theta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        signed = attach_minhash_signatures(
            shingle_sets(df, "text", "doc_id", k=2), num_hashes=16)
        bench = signed.filter(F.col("id") >= 100)
        corp = signed.filter(F.col("id") < 100)
        surv = {r.id for r in decontaminate_neardup(
            corp, bench, threshold=0.5).collect()}
        assert surv == {2}  # doc 1 is a verbatim copy of benchmark 100
        flags = {r.id: r.keep for r in decontaminate_neardup(
            corp, bench, threshold=0.5, keep_col="keep").collect()}
        assert flags == {1: False, 2: True}


class TestBudgetSelect:
    def test_greedy_prefix_per_stratum(self, spark):
        from datawave_spark.operators.curation import select_within_budget
        rows = [  # (id, stratum, score, size)
            (1, "a", 0.9, 40), (2, "a", 0.8, 50), (3, "a", 0.7, 20),
            (4, "b", 0.5, 100), (5, "b", 0.9, 90), (6, "b", 0.9, 15)]
        df = spark.createDataFrame(
            rows, "id long, src string, score double, n long")
        got = {r.id for r in select_within_budget(
            df, "id", "score", "n", budget=100, strata_col="src").collect()}
        # a: 40 then 40+50=90 fits; +20 would be 110 -> excluded.
        # b: score ties 0.9/0.9 -> id 5 first (90), id 6 overflows (105)
        #    and the monotone prefix never re-admits doc 4.
        assert got == {1, 2, 5}

    def test_oversized_first_doc_yields_empty_stratum(self, spark):
        from datawave_spark.operators.curation import select_within_budget
        df = spark.createDataFrame([(1, "a", 0.9, 500), (2, "a", 0.1, 10)],
                                   "id long, src string, score double, n long")
        assert select_within_budget(
            df, "id", "score", "n", budget=100, strata_col="src").count() == 0


def test_stupid_backoff_matches_python_referee(spark):
    """Dual-execution referee over a randomized-ish fixed corpus: the
    Spark score must equal a pure-Python stupid-backoff replay to the
    operator's 4-decimal rounding."""
    import math
    import random
    import re

    from datawave_spark.operators.text import (bigram_counts,
                                               stupid_backoff_score,
                                               unigram_counts)
    rng = random.Random(11)
    vocab = ["the", "cat", "sat", "mat", "dog", "ran", "big", "x9"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 15))))
            for i in range(30)]
    docs.append((99, "zzz unseen tokens zzz"))

    tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _i, txt in docs:
        ts = tok(txt)
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = sum(uni.values())

    def score(ts):
        nll = 0.0
        for i, t in enumerate(ts):
            u = uni.get(t)
            base = (u / total) if u else 0.5 / total
            if i == 0:
                s = base
            elif (ts[i - 1], t) in bi:
                s = bi[(ts[i - 1], t)] / uni[ts[i - 1]]
            else:
                s = 0.4 * base
            nll -= math.log(s)
        return round(nll / len(ts), 4)

    df = spark.createDataFrame(docs, "id long, t string")
    lm, bg = unigram_counts(df, "t"), bigram_counts(df, "t")
    got = {r.id: r.backoff_nll
           for r in stupid_backoff_score(df, "t", "id", lm, bg).collect()}
    want = {i: score(tok(txt)) for i, txt in docs}
    assert got == want


class TestTokenIds:
    def test_ids_are_frequency_ranked_and_oov_is_zero(self, spark):
        from datawave_spark.operators.text import (token_ids, unigram_counts,
                                                   vocab_ids)
        corpus = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the cat ran"), (3, "the mat")],
            "id long, t string")
        vocab = vocab_ids(unigram_counts(corpus, "t"))
        # the=3, cat=2, then mat/ran/sat alphabetical on the tie
        ids = {r.token: r.tid for r in vocab.collect()}
        assert ids == {"the": 1, "cat": 2, "mat": 3, "ran": 4, "sat": 5}
        probe = spark.createDataFrame([(9, "zebra the cat")],
                                      "id long, t string")
        got = sorted((r.pos, r.tid)
                     for r in token_ids(probe, "t", "id", vocab).collect())
        assert got == [(0, 0), (1, 1), (2, 2)]  # OOV zebra -> 0, order kept

    def test_vocab_size_truncates_and_maps_tail_to_unk(self, spark):
        from datawave_spark.operators.text import (token_ids, unigram_counts,
                                                   vocab_ids)
        corpus = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the cat ran")], "id long, t string")
        vocab = vocab_ids(unigram_counts(corpus, "t"), vocab_size=2)
        assert vocab.count() == 2
        got = {r.pos: r.tid
               for r in token_ids(corpus.filter("id=1"), "t", "id",
                                  vocab).collect()}
        # the/cat tie on n=2; alphabetical gives cat=1, the=2; sat OOV
        assert got == {0: 2, 1: 1, 2: 0}


class TestPageRank:
    def _referee(self, edges, iters=10, d=0.85):
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        out = {}
        for a, b in set(edges):
            out.setdefault(a, []).append(b)
        r = [1.0 / n] * n
        for _ in range(iters):
            nxt = [(1.0 - d) / n] * n
            dang = sum(r[idx[v]] for v in nodes if v not in out)
            for v in nodes:
                for w in out.get(v, ()):
                    nxt[idx[w]] += d * r[idx[v]] / len(out[v])
            for i in range(n):
                nxt[i] += d * dang / n
            r = nxt
        return {v: round(r[idx[v]], 6) for v in nodes}

    def test_matches_python_power_iteration(self, spark):
        from datawave_spark.operators.components import pagerank
        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                 ("d", "c"), ("e", "d"), ("e", "c"), ("f", "e")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: round(r.rank, 6)
               for r in pagerank(df, iters=10).collect()}
        assert got == self._referee(edges, iters=10)

    def test_dangling_mass_conserved(self, spark):
        """b and c are pure sinks; ranks must still sum to 1."""
        from datawave_spark.operators.components import pagerank
        df = spark.createDataFrame([("a", "b"), ("a", "c")],
                                   "src string, dst string")
        rows = pagerank(df, iters=5).collect()
        assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9
        by = {r.node: r.rank for r in rows}
        assert by["b"] == by["c"] > by["a"]

    def test_empty_edges(self, spark):
        from datawave_spark.operators.components import pagerank
        df = spark.createDataFrame([], "src string, dst string")
        assert pagerank(df, iters=3).count() == 0


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        from datawave_spark.operators.text import chunk_documents
        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "id long, t string")
        got = {r.chunk_id: (r.chunk_text, r.n_tokens)
               for r in chunk_documents(df, "t", "id", chunk_tokens=4,
                                        overlap=1).collect()}
        # stride 3: [0:4) [3:7) [6:10) -> 3 chunks, ceil((10-4)/3)+1
        assert got == {0: ("w0 w1 w2 w3", 4), 1: ("w3 w4 w5 w6", 4),
                       2: ("w6 w7 w8 w9", 4)}

    def test_short_and_empty_docs_one_chunk(self, spark):
        from datawave_spark.operators.text import chunk_documents
        df = spark.createDataFrame([(1, "a b"), (2, ""), (3, "  ")],
                                   "id long, t string")
        got = {r.id: (r.chunk_id, r.chunk_text, r.n_tokens)
               for r in chunk_documents(df, "t", "id", chunk_tokens=4,
                                        overlap=1).collect()}
        assert got == {1: (0, "a b", 2), 2: (0, "", 0), 3: (0, "", 0)}

    def test_trailing_partial_window_kept(self, spark):
        from datawave_spark.operators.text import chunk_documents
        df = spark.createDataFrame([(1, "a b c d e")], "id long, t string")
        rows = chunk_documents(df, "t", "id", chunk_tokens=4,
                               overlap=0).collect()
        got = {r.chunk_id: r.chunk_text for r in rows}
        assert got == {0: "a b c d", 1: "e"}

    def test_invalid_overlap_raises(self, spark):
        import pytest as _pt
        from datawave_spark.operators.text import chunk_documents
        df = spark.createDataFrame([(1, "a")], "id long, t string")
        with _pt.raises(ValueError):
            chunk_documents(df, "t", "id", chunk_tokens=4, overlap=4)


class TestPackTokenSequences:
    def test_matches_python_referee(self, spark):
        import hashlib
        import re
        from datawave_spark.operators.text import (pack_token_sequences,
                                                   unigram_counts,
                                                   vocab_ids)
        docs = [(i, "s%d" % (i % 2),
                 " ".join("tok%d" % ((i * 7 + j) % 13)
                          for j in range(5 + i % 4)))
                for i in range(12)]
        df = spark.createDataFrame(docs, "id long, src string, t string")
        vocab = vocab_ids(unigram_counts(df, "t"))
        vmap = {r.token: r.tid for r in vocab.collect()}
        tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

        seq_len, budget = 4, 8   # bin_seqs=2
        want = set()
        by_src: dict[str, list[tuple[int, list[int]]]] = {}
        for i, src, txt in docs:
            by_src.setdefault(src, []).append(
                (i, [vmap.get(t, 0) for t in tok(txt)]))
        for src, items in by_src.items():
            cum, bins = 0, {}
            for i, ids in sorted(items):
                b = (cum) // budget
                cum += len(ids)
                bins.setdefault(b, []).extend(ids)
            for b, al in bins.items():
                for s in range(len(al) // seq_len):
                    sl = al[s * seq_len:(s + 1) * seq_len]
                    want.add((src, b, s, hashlib.md5(
                        " ".join(map(str, sl)).encode()).hexdigest(),
                        sl[0], sl[-1]))
        got = {(r.strata, r.bin, r.seq_idx, r.seq_md5, r.first_tid,
                r.last_tid)
               for r in pack_token_sequences(df, "t", "id", vocab,
                                             seq_len=4, strata_col="src",
                                             bin_seqs=2).collect()}
        assert got == want and want


class TestBpeTrain:
    def _referee(self, docs, n_merges, min_pair_count=2):
        import collections
        import re
        tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        wc = collections.Counter(t for _, s in docs for t in tok(s))
        state = {w: list(w) for w in wc}
        out = []
        for step in range(1, n_merges + 1):
            pc = collections.Counter()
            for w, syms in state.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += wc[w]
            if not pc:
                break
            (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if n < min_pair_count:
                break
            out.append((step, a, b, n))
            for w, syms in state.items():
                ns = []
                for x in syms:
                    if ns and ns[-1] == a and x == b:
                        ns[-1] = a + b
                    else:
                        ns.append(x)
                state[w] = ns
        return out

    def test_matches_python_referee(self, spark):
        from datawave_spark.operators.text import bpe_train
        docs = [(1, "low lower lowest low low newer new newest wider wide"),
                (2, "low lower new newer newer banana bandana"),
                (3, "aaaa aaa aa banana")]
        df = spark.createDataFrame(docs, "id long, t string")
        got = [(r.step, r.left, r.right, r.pair_count)
               for r in bpe_train(df, "t", n_merges=6).collect()]
        assert got == self._referee(docs, 6) and len(got) == 6

    def test_overlapping_run_merges_greedily(self, spark):
        """'aaaa' under merge (a,a) must become [aa, aa] — every other
        candidate in the run, exactly reference BPE."""
        from datawave_spark.operators.text import bpe_train
        df = spark.createDataFrame([(1, "aaaa aaaa aaaa")],
                                   "id long, t string")
        got = [(r.step, r.left, r.right) for r in
               bpe_train(df, "t", n_merges=2, min_pair_count=1).collect()]
        # round 1: (a,a) n=9; round 2: (aa,aa) n=3 — proves both the
        # greedy pairing and that merged symbols pair in later rounds
        assert got == [(1, "a", "a"), (2, "aa", "aa")]

    def test_stops_below_min_pair_count(self, spark):
        from datawave_spark.operators.text import bpe_train
        df = spark.createDataFrame([(1, "ab cd")], "id long, t string")
        out = bpe_train(df, "t", n_merges=5, min_pair_count=2).collect()
        assert out == []    # every pair occurs once

    def test_encode_roundtrip_and_oov_fallback(self, spark):
        """Subwords concatenate back to the original words; a word the
        table never saw falls back to characters."""
        from datawave_spark.operators.text import bpe_encode, bpe_train
        train = spark.createDataFrame(
            [(1, "low lower lowest low low newer new newest")],
            "id long, t string")
        _, seg = bpe_train(train, "t", n_merges=4, min_pair_count=1,
                           with_state=True)
        probe = spark.createDataFrame([(7, "lower zebra")],
                                      "id long, t string")
        rows = bpe_encode(probe, "t", "id", seg).collect()
        words = {}
        for r in sorted(rows, key=lambda r: (r.word_pos, r.sym_idx)):
            words.setdefault(r.word_pos, []).append(r.subword)
        assert "".join(words[0]) == "lower"
        assert words[1] == list("zebra")     # OOV -> chars
        assert len(words[0]) < 5             # merges actually applied

    def test_reliable_checkpoint_mode_same_results(self, spark):
        """reliable=True routes rounds through the reliable checkpoint
        dir (executor-loss-safe on a real cluster) with identical
        values.  The dir must OUTLIVE this test: setCheckpointDir is
        session-global, so a pytest tmp_path would leave later
        checkpoint users pointing at a deleted directory."""
        import tempfile

        from datawave_spark.operators.components import pagerank
        spark.sparkContext.setCheckpointDir(
            tempfile.mkdtemp(prefix="dw_ckpt_"))
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")],
            "src string, dst string")
        local = {r.node: round(r.rank, 9)
                 for r in pagerank(df, iters=3).collect()}
        rel = {r.node: round(r.rank, 9)
               for r in pagerank(df, iters=3, reliable=True).collect()}
        assert local == rel

    def test_random_corpus_matches_referee(self, spark):
        """Seeded fuzz (the stupid-backoff referee pattern): 30 random
        short-alphabet docs — small alphabet forces heavy merge overlap
        and repeated-symbol runs, the fold's hard cases."""
        import random
        rng = random.Random(23)
        docs = [(i, " ".join("".join(rng.choice("abc")
                                     for _ in range(rng.randint(1, 6)))
                             for _ in range(rng.randint(1, 10))))
                for i in range(30)]
        from datawave_spark.operators.text import bpe_train
        df = spark.createDataFrame(docs, "id long, t string")
        got = [(r.step, r.left, r.right, r.pair_count)
               for r in bpe_train(df, "t", n_merges=8,
                                  min_pair_count=1).collect()]
        assert got == self._referee(docs, 8, min_pair_count=1) and got


class TestChunkReconstruction:
    def test_chunks_reassemble_to_original_tokens(self, spark):
        """Dropping each chunk's first `overlap` tokens (except chunk
        0) and concatenating must reproduce the exact token stream —
        the no-loss/no-duplication property of overlapped windows."""
        import random
        import re
        from datawave_spark.operators.text import chunk_documents
        rng = random.Random(7)
        docs = [(i, " ".join(f"t{rng.randint(0, 99)}"
                             for _ in range(rng.randint(0, 40))))
                for i in range(25)]
        df = spark.createDataFrame(docs, "id long, t string")
        rows = chunk_documents(df, "t", "id", chunk_tokens=7,
                               overlap=3).collect()
        tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.id, []).append((r.chunk_id, r.chunk_text))
        for i, txt in docs:
            want = tok(txt)
            rebuilt = []
            for cid, ctext in sorted(by_doc[i]):
                toks = ctext.split() if ctext else []
                rebuilt.extend(toks if cid == 0 else toks[3:])
            assert rebuilt == want, f"doc {i}"


class TestBPECutover:
    def test_driver_cutover_equals_distributed_path(self, spark):
        """The default driver-side training (vocab fits under
        driver_threshold, VERDICT r5 item 5) must be indistinguishable
        from the distributed per-merge loop: identical merge table AND
        identical end-state segmentation, on a short-alphabet corpus
        that forces overlap/tie-break edge cases."""
        import random

        from datawave_spark.operators.text import bpe_train
        rng = random.Random(41)
        docs = [(i, " ".join("".join(rng.choice("abc")
                                     for _ in range(rng.randint(1, 6)))
                             for _ in range(rng.randint(1, 10))))
                for i in range(30)]
        df = spark.createDataFrame(docs, "id long, t string")
        m_drv, s_drv = bpe_train(df, "t", n_merges=8, min_pair_count=1,
                                 with_state=True)
        m_dst, s_dst = bpe_train(df, "t", n_merges=8, min_pair_count=1,
                                 with_state=True, driver_threshold=0)
        drv = [(r.step, r.left, r.right, r.pair_count)
               for r in m_drv.collect()]
        dst = [(r.step, r.left, r.right, r.pair_count)
               for r in m_dst.collect()]
        assert drv == dst and len(drv) == 8
        seg_a = {r.w: (r.cnt, list(r.syms)) for r in s_drv.collect()}
        seg_b = {r.w: (r.cnt, list(r.syms)) for r in s_dst.collect()}
        assert seg_a == seg_b

    def test_large_merge_count_is_one_spark_job(self, spark):
        """256 merges must not mean 256 Spark jobs: under the cutover
        the whole training is one word-count job + one collect (the
        batching alternative would still be ~256/M jobs)."""
        import random

        from datawave_spark.operators.text import bpe_train
        rng = random.Random(5)
        docs = [(i, " ".join("".join(rng.choice("abcdefgh")
                                     for _ in range(rng.randint(1, 8)))
                             for _ in range(20)))
                for i in range(200)]
        df = spark.createDataFrame(docs, "id long, t string")
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        got = bpe_train(df, "t", n_merges=256, min_pair_count=1).collect()
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert got, "training learned no merges"
        # count + collect + the final merges_df collect: a handful of
        # jobs, NOT one-per-merge
        assert after - before <= 6, (before, after)


    def test_min_pair_count_zero_no_phantom_merges(self, spark):
        """min_pair_count=0: decremented-to-zero husk entries in the
        driver path's pair table must never be selected — both paths
        stop when no pair EXISTS in any word, emitting identical (and
        non-padded) merge tables (review r6 finding)."""
        from datawave_spark.operators.text import bpe_train
        df = spark.createDataFrame([(1, "ab ab")], "id long, t string")
        drv = [(r.step, r.left, r.right, r.pair_count) for r in
               bpe_train(df, "t", n_merges=8, min_pair_count=0).collect()]
        dst = [(r.step, r.left, r.right, r.pair_count) for r in
               bpe_train(df, "t", n_merges=8, min_pair_count=0,
                         driver_threshold=0).collect()]
        # 'ab' fully merges in one step; no phantom zero-count merges
        assert drv == dst == [(1, "a", "b", 2)]
