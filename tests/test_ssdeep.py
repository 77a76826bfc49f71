"""SSDeep similarity tests — mirrors the reference's ssdeep-common test
classes (SSDeepHashTest, NGramGeneratorTest,
SSDeepHashEditDistanceScorerTest, SSDeepNGramOverlapScorerTest)."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.operators import ssdeep


@pytest.fixture(scope="module")
def hashes(spark):
    rows = [
        # id, ssdeep  (chunk strings are arbitrary base64-ish text)
        (1, "96:abcdefghijklmnop:abcdefgh"),
        (2, "96:abcdefghijklmnoq:abcdefgh"),     # near-dup of 1
        (3, "96:zzzzyyyyxxxxwwww:zzyyxxww"),     # unrelated
        (4, "192:abcdefghijklmnop:qrstuvwxyzabcd"),  # 2x chunk size of 1
        (5, "notavalidhash"),                    # unparseable → dropped
    ]
    return spark.createDataFrame(rows, "id int, ssdeep string")


class TestParsing:
    def test_parse_drops_invalid(self, spark, hashes):
        parsed = ssdeep.parse_hashes(hashes, "ssdeep", "id")
        got = {r.id for r in parsed.collect()}
        assert got == {1, 2, 3, 4}

    def test_normalize_collapses_runs(self, spark):
        df = spark.createDataFrame([("aaaaaabcddddd",)], "s string")
        out = df.select(ssdeep.normalize_chunk(F.col("s")).alias("n")).first()
        assert out.n == "aaabcddd"

    def test_normalize_zero_disables(self, spark):
        df = spark.createDataFrame([("aaaaaa",)], "s string")
        out = df.select(ssdeep.normalize_chunk(F.col("s"), 0).alias("n")).first()
        assert out.n == "aaaaaa"


class TestNgrams:
    def test_ngram_counts_and_keys(self, spark, hashes):
        parsed = ssdeep.parse_hashes(hashes, "ssdeep", "id")
        ng = ssdeep.hash_ngrams(parsed).filter(F.col("id") == 1)
        rows = ng.collect()
        # chunk len 16 → 10 7-grams at cs 96; double len 8 → 2 at cs 192
        by_cs = {}
        for r in rows:
            by_cs.setdefault(r.chunk_size, set()).add(r.ngram)
        assert len(by_cs[96]) == 10
        assert len(by_cs[192]) == 2

    def test_min_hash_size_skips(self, spark):
        df = spark.createDataFrame([(1, "96:ab:xy")], "id int, ssdeep string")
        parsed = ssdeep.parse_hashes(df, "ssdeep", "id")
        # 96 * 2 = 192 >= 64 → kept; with a large min it is skipped
        assert ssdeep.hash_ngrams(parsed, min_hash_size=500).count() == 0


class TestScoring:
    def _score(self, spark, h1, h2):
        df = spark.createDataFrame([(1, h1), (2, h2)], "id int, ssdeep string")
        out = ssdeep.ssdeep_similarity_join(
            df.filter(F.col("id") == 1), df, "ssdeep", "id")
        rows = out.collect()
        return rows[0] if rows else None

    def test_identical_hashes_score_100(self, spark):
        r = self._score(spark, "96:abcdefghijklmnop:abcdefgh",
                        "96:abcdefghijklmnop:abcdefgh")
        assert r is not None
        assert r.weighted_score == 100
        assert r.match_score == 12  # 10 chunk + 2 double-chunk ngrams

    def test_near_dup_scores_high(self, spark):
        r = self._score(spark, "96:abcdefghijklmnop:abcdefgh",
                        "96:abcdefghijklmnoq:abcdefgh")
        assert r is not None
        assert r.weighted_score >= 90  # one edit in 16+16 chars

    def test_unrelated_no_candidate(self, spark):
        r = self._score(spark, "96:abcdefghijklmnop:abcdefgh",
                        "96:zzzzyyyyxxxxwwww:zzyyxxww")
        assert r is None  # no shared ngram → never a candidate

    def test_double_chunk_size_match(self, spark):
        # q chunk at 192 == 2× t's 96: t's doubleChunk ngrams (at 192)
        # can meet q's chunk ngrams
        r = self._score(spark, "192:abcdefghijklmnop:qqqqwwww",
                        "96:zzzzyyyyxxxxwwww:abcdefghijklmnop")
        assert r is not None
        assert r.match_score == 10
        assert r.weighted_score > 0

    def test_incompatible_sizes_score_zero_never_match(self, spark):
        # 96 vs 384: no shared tuple key is possible (96,192 vs 384,768)
        r = self._score(spark, "96:abcdefghijklmnop:abcdefgh",
                        "384:abcdefghijklmnop:abcdefgh")
        assert r is None

    def test_min_score_filters(self, spark):
        df = spark.createDataFrame(
            [(1, "96:abcdefghijklmnop:abcdefgh"),
             (2, "96:abcdefghijklmnoq:abcdefgh")], "id int, ssdeep string")
        out = ssdeep.ssdeep_similarity_join(
            df.filter(F.col("id") == 1), df, "ssdeep", "id", min_score=101)
        assert out.count() == 0

    def test_max_bucket_caps_hot_ngrams(self, spark):
        rows = [(i, "96:abcdefghijklmnop:abcdefgh") for i in range(10)]
        df = spark.createDataFrame(rows, "id int, ssdeep string")
        out = ssdeep.ssdeep_similarity_join(
            df.filter(F.col("id") == 0), df, "ssdeep", "id", max_bucket=5)
        assert out.count() == 0  # every ngram sits in a 10-doc bucket
