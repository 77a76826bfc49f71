"""Excerpt direction trimming — TermFrequencyExcerptIterator /
ExcerptTransform offset-direction parity (the reference's excerpt
config supports before/after/both windows around each hit)."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.operators.excerpt import excerpts


@pytest.fixture(scope="module")
def doc(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "id long, t string")


def _one(df):
    return df.select("excerpts").first().excerpts[0]


class TestDirections:
    def test_both(self, doc):
        got = _one(excerpts(doc, "t", "id", "gamma", window=1))
        assert got == "beta gamma delta"

    def test_before(self, doc):
        got = _one(excerpts(doc, "t", "id", "gamma", window=2,
                            direction="before"))
        assert got == "alpha beta gamma"

    def test_after(self, doc):
        got = _one(excerpts(doc, "t", "id", "gamma", window=2,
                            direction="after"))
        assert got == "gamma delta epsilon"

    def test_clamped_at_document_edges(self, doc):
        got = _one(excerpts(doc, "t", "id", "alpha", window=3,
                            direction="before"))
        assert got == "alpha"

    def test_bad_direction_rejected(self, doc):
        with pytest.raises(ValueError, match="both/before/after"):
            excerpts(doc, "t", "id", "x", direction="sideways")
