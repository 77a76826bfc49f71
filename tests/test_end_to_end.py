"""Full-lifecycle integration: raw CSV → ingest (tokenization, shards,
visibility) → JEXL/LUCENE queries incl. multi-zone content functions →
post-transforms → paged output.  The whole user journey in one test."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans import QueryPlanner
from datawave_spark.sources.ingest import IngestConfig, ingest_events
from datawave_spark.sources.readers import read_csv_events
from datawave_spark.visibility import filter_by_auths

CSV = """id,when,title,body,tags,vis
1,2024-03-01,quick brown fox,the quick brown fox jumps high,animal;classic,PUB
2,2024-03-01,lazy dog sleeps,a lazy dog sleeps all day long,animal,PUB
3,2024-03-02,stock report,markets rose on quick gains today,finance,SEC&INT
4,2024-03-05,fox market news,fox reports quick market moves,finance;animal,PUB
"""


@pytest.fixture(scope="module")
def event_table(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    p = d / "raw.csv"
    p.write_text(CSV)
    raw = read_csv_events(spark, str(p), multi_value_delim={"tags": ";"})
    cfg = IngestConfig(
        datatype="articles", date_field="when", uid_fields=["id"],
        tokenized_fields=["title", "body"])
    events = ingest_events(raw, cfg).withColumn("visibility", F.col("vis"))
    return events.cache()


class TestEndToEnd:
    def test_ingest_shape(self, event_table):
        assert {"uid", "event_date", "shard", "title_tf", "body_tf"} \
            <= set(event_table.columns)
        assert event_table.count() == 4

    def test_multi_zone_phrase(self, event_table):
        qp = QueryPlanner(event_table)
        # same phrase, different zones → different hits
        title_hits = qp.plan("content:phrase(TITLE, 'quick', 'brown')").df
        body_hits = qp.plan("content:phrase(BODY, 'quick', 'market')").df
        assert [r.id for r in title_hits.collect()] == [1]
        assert [r.id for r in body_hits.collect()] == [4]

    def test_scored_phrase_threshold(self, spark):
        # 'the' appears 3/6 tokens (score ln(0.5) ≈ -0.69); 'fox' and
        # 'ran' once each in 6 (ln(1/6) ≈ -1.79).  A threshold between
        # the two keeps the rare terms and drops the frequent one.
        df = spark.createDataFrame(
            [(1, "the fox the ran the end"), (2, "fox ran away now")],
            "id int, TEXT string")
        qp = QueryPlanner(df)
        # phrase 'fox ran' exists only in doc 2 as adjacent tokens
        plain = qp.plan("content:phrase(TEXT, 'fox', 'ran')").df
        assert [r.id for r in plain.collect()] == [2]
        # scored: both terms rare enough in doc 2 (ln(1/4) ≈ -1.39)
        ok = qp.plan("content:scoredPhrase(TEXT, -1.3, 'fox', 'ran')").df
        assert [r.id for r in ok.collect()] == [2]
        # tight threshold excludes the terms → no match anywhere
        none = qp.plan("content:scoredPhrase(TEXT, -1.5, 'fox', 'ran')").df
        assert none.count() == 0

    def test_scored_phrase_degrades_without_scores(self, spark):
        # pre-tokenized frame WITHOUT a scores column → behaves as phrase
        from datawave_spark.sources.ingest import tokenize
        from datawave_spark.compiler import compile_query
        df = tokenize(spark.createDataFrame([(1, "fox ran away")],
                                            "id int, TEXT string"),
                      "TEXT", "id")
        out = compile_query(df, "content:scoredPhrase(TEXT, -9.0, 'fox', 'ran')")
        assert out.count() == 1

    def test_mixed_zone_and_field_query(self, event_table):
        qp = QueryPlanner(event_table)
        res = qp.plan("TAGS == 'animal' && content:within(BODY, 5, 'quick', 'fox')")
        assert sorted(r.id for r in res.df.collect()) == [1, 4]

    def test_visibility_then_query(self, event_table):
        visible = filter_by_auths(event_table, {"PUB"})
        qp = QueryPlanner(visible)
        res = qp.plan("body:quick", syntax="LUCENE")
        # id=3 matches 'quick' but is SEC&INT — invisible to PUB
        assert sorted(r.id for r in res.df.collect()) == [1, 4]

    def test_lucene_groupby_over_ingested(self, event_table):
        qp = QueryPlanner(event_table)
        res = qp.plan("tags:animal #GROUPBY(event_date)", syntax="LUCENE")
        by_day = {str(r.event_date): r.record_count for r in res.df.collect()}
        assert by_day == {"2024-03-01": 2, "2024-03-05": 1}

    def test_paged_output(self, event_table):
        qp = QueryPlanner(event_table)
        res = qp.plan("filter:isNotNull(TAGS)")
        pages = list(res.pages(page_size=3))
        assert [len(p) for p in pages] == [3, 1]


class TestCheckpointResume:
    def test_resume_across_instances(self, spark, tmp_path_factory):
        # CheckpointableQueryLogic parity: page, "crash", resume from
        # the persisted cursor in a NEW object — no overlap, no loss.
        from datawave_spark.plans.checkpoint import CheckpointedQuery
        d = str(tmp_path_factory.mktemp("ckpt") / "q1")
        df = spark.range(0, 57).withColumnRenamed("id", "n")
        cq = CheckpointedQuery.create(df, d, query="n >= 0")
        first = cq.next_page(10)
        second = cq.next_page(10)
        assert len(first) == len(second) == 10

        resumed = CheckpointedQuery.load(spark, d)
        assert resumed.meta["pages_emitted"] == 2
        rest = [n for page in resumed.pages(10) for (n,) in page]
        all_vals = sorted([n for (n,) in first + second] + rest)
        assert all_vals == list(range(57))  # exactly once, all rows

    def test_remaining_bulk(self, spark, tmp_path_factory):
        from datawave_spark.plans.checkpoint import CheckpointedQuery
        d = str(tmp_path_factory.mktemp("ckpt") / "q2")
        df = spark.range(0, 20).withColumnRenamed("id", "n")
        cq = CheckpointedQuery.create(df, d)
        cq.next_page(5)
        assert cq.remaining().count() == 15

    def test_planned_query_checkpoint(self, spark, event_table,
                                      tmp_path_factory):
        # end-to-end: plan a JEXL query, checkpoint its result, resume
        from datawave_spark.plans.checkpoint import CheckpointedQuery
        d = str(tmp_path_factory.mktemp("ckpt") / "q3")
        res = QueryPlanner(event_table).plan("TAGS == 'animal'")
        cq = CheckpointedQuery.create(res.df.select("id"), d)
        got = [r for page in cq.pages(2) for (r,) in page]
        assert sorted(got) == [1, 2, 4]


def test_planner_from_metadata(spark):
    """Metadata-table-driven planning: normalizers bound from the ingest
    metadata frame, not hand configuration."""
    from datawave_spark.plans import QueryPlanner
    from datawave_spark.sources.ingest import IngestConfig, field_metadata
    raw = spark.createDataFrame(
        [(1, "2024-01-01", "Zürich"), (2, "2024-01-01", "Geneva")],
        "id long, when string, city string")
    cfg = IngestConfig(datatype="t", date_field="when", uid_fields=["id"],
                       field_types={"city": "lcNoDiacritics"})
    meta = field_metadata(raw, cfg)
    qp = QueryPlanner.from_metadata(raw, meta)
    # literal normalizes through the metadata-bound lcNoDiacritics
    assert [r.id for r in qp.plan("CITY == 'ZURICH'").df.collect()] == [1]
