"""UseOccurrenceToCountInJexlContextTest corpus port (reference
warehouse/query-core/src/test/java/datawave/query/
UseOccurrenceToCountInJexlContextTest.java — three grouped-field
documents; filter:occurrence counts the FIELD's value instances
including grouping contexts, and the count can be a SUM of
getAllMatches(...).size() funcalls).

Result sets are verbatim from the Java expectedLists; the reference's
per-instance HIT_TERM assertions ("NAME.2:Haiqu") need value-level hit
tracking and are out of scope here (HIT_TERM leaf-term tracking is
pinned in tests/test_compiler.py / hit_terms)."""

import pytest

from datawave_spark.compiler import compile_query

# MoreTestData.writeItAll: NAME.0/.1/.2 sibling instances as a
# top-level parallel array (the engine's grouped representation)
ROWS = [
    ("First", ["NAME0", "NAME1", "Haiqu"], ["FOO"], [], "First"),
    ("Second", ["NAME1", "NAME0", "Haiqu"], [], ["BAR"], "Second"),
    ("Third", ["NAME9", "NAME8", "Haiqu"], [], [], "Third"),
]
SCHEMA = ("uid string, NAME array<string>, FOO array<string>, "
          "BAR array<string>, UUID string")
FT = {f: "lcNoDiacritics" for f in ("NAME", "FOO", "BAR", "UUID")}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in ROWS], SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.uid for r in out.select("uid").collect()}


class TestOccurrenceInContext:
    def test_occurrence_literal_count(self, docs):
        q = "NAME == 'haiqu' && BAR == 'bar' && filter:occurrence(NAME, '==', 3)"
        assert run(docs, q) == {"Second"}

    def test_occurrence_equals_sum_of_get_all_matches_sizes(self, docs):
        # the count argument is ARITHMETIC over funcall results — only
        # Third's three NAME values all appear in the match lists
        q = ("NAME == 'haiqu' && filter:occurrence(NAME, '==', "
             "filter:getAllMatches(NAME, 'NAME9').size() + "
             "filter:getAllMatches(NAME, 'NAME8').size() + "
             "filter:getAllMatches(NAME, 'Haiqu').size())")
        assert run(docs, q) == {"Third"}

    def test_uuid_equality(self, docs):
        assert run(docs, "UUID == 'Second'") == {"Second"}

    def test_occurrence_mismatch_excludes(self, docs):
        # occurrence(NAME) is 3 everywhere; == 2 matches nothing
        q = "NAME == 'haiqu' && filter:occurrence(NAME, '==', 2)"
        assert run(docs, q) == set()

    def test_occurrence_gt_over_all(self, docs):
        q = "filter:occurrence(NAME, '>', 2)"
        assert run(docs, q) == {"First", "Second", "Third"}
