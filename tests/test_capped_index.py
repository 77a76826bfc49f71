"""Uid.List cardinality-cap planning (GlobalIndexUidAggregator.java:25,
IndexInfo.java:48, RangeStream.java:377,425): the capped index stores
explicit uids below the cap and count-only above; intersection/union
follow the reference's stream-merge semantics; answers are
cap-invariant because the fetch re-evaluates the full predicate."""

import datetime

import pytest
from pyspark.sql import functions as F

from datawave_spark.sources.index_frame import (
    build_capped_index, capped_candidates, capped_index_query,
    info_intersect, info_union,
)
from datawave_spark.jexl.parser import parse


D1, D2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    for i in range(30):
        # 'hot' appears 15x per day (over cap 5); 'cold' 2x per day
        ts = f"2024-01-0{1 + i % 2} 10:00:00"
        rows.append((i, ts, "hot" if i % 10 != 0 else "cold", i % 3))
    return spark.createDataFrame(
        rows, "event_id int, ts string, event_type string, grp int")


@pytest.fixture(scope="module")
def cidx(events):
    return build_capped_index(events, ["event_type", "grp"], "event_id",
                              date_col="ts", max_uids=5).cache()


class TestBuild:
    def test_overflow_rows_have_null_uids(self, cidx):
        hot = cidx.filter((F.col("field") == "EVENT_TYPE")
                          & (F.col("value") == "hot")).collect()
        assert hot and all(r.uids is None and r.uid_count > 5 for r in hot)

    def test_under_cap_rows_keep_sorted_uids(self, cidx):
        cold = cidx.filter((F.col("field") == "EVENT_TYPE")
                           & (F.col("value") == "cold")).collect()
        assert cold and all(r.uids == sorted(r.uids) and
                            r.uid_count == len(r.uids) for r in cold)


class TestInfoMerge:
    def mk(self, spark, rows):
        return spark.createDataFrame(rows, "event_date date, uid string")

    def test_explicit_intersect_explicit(self, spark):
        a = self.mk(spark, [(D1, "1"), (D1, "2")])
        b = self.mk(spark, [(D1, "2"), (D2, "2")])
        got = {(r.event_date, r.uid) for r in info_intersect(a, b).collect()}
        assert got == {(D1, "2")}

    def test_shard_intersect_keeps_other_sides_uids(self, spark):
        a = self.mk(spark, [(D1, None), (D2, None)])
        b = self.mk(spark, [(D1, "7"), (D2, "8")])
        got = {(r.event_date, r.uid) for r in info_intersect(a, b).collect()}
        assert got == {(D1, "7"), (D2, "8")}

    def test_shard_intersect_shard_stays_shard(self, spark):
        a = self.mk(spark, [(D1, None)])
        b = self.mk(spark, [(D1, None), (D2, None)])
        got = {(r.event_date, r.uid) for r in info_intersect(a, b).collect()}
        assert got == {(D1, None)}

    def test_union_merges(self, spark):
        a = self.mk(spark, [(D1, "1")])
        b = self.mk(spark, [(D1, None)])
        got = {(r.event_date, r.uid) for r in info_union(a, b).collect()}
        assert got == {(D1, "1"), (D1, None)}


class TestPlanningOutcomes:
    def test_negation_not_index_served(self, cidx):
        assert capped_candidates(cidx, parse("!(GRP == 1)")) is None

    def test_negated_or_branch_taints_union(self, cidx):
        assert capped_candidates(
            cidx, parse("GRP == 1 || !(GRP == 2)")) is None

    def test_and_ignores_unservable_term(self, cidx):
        info = capped_candidates(cidx, parse("GRP == 1 && !(GRP == 2)"))
        assert info is not None

    def test_hot_term_yields_shard_rows(self, cidx):
        info = capped_candidates(cidx, parse("EVENT_TYPE == 'hot'"))
        rows = info.collect()
        assert rows and all(r.uid is None for r in rows)

    def test_cold_term_yields_document_rows(self, cidx):
        info = capped_candidates(cidx, parse("EVENT_TYPE == 'cold'"))
        rows = info.collect()
        assert rows and all(r.uid is not None for r in rows)


class TestCapInvariance:
    QUERIES = ["EVENT_TYPE == 'hot' && GRP == 1",
               "EVENT_TYPE == 'cold' || GRP == 2",
               "EVENT_TYPE == 'hot' && !(GRP == 0)"]

    @pytest.mark.parametrize("q", QUERIES)
    def test_same_answer_any_cap(self, spark, events, q):
        from datawave_spark.compiler import compile_query
        want = {r.event_id for r in compile_query(events, q).collect()}
        for cap in (1, 5, 1000):
            ci = build_capped_index(events, ["event_type", "grp"],
                                    "event_id", date_col="ts",
                                    max_uids=cap)
            got = {r.event_id for r in capped_index_query(
                events, ci, q, "event_id", "ts").collect()}
            assert got == want, f"cap={cap}"


class TestIndexHoles:
    def test_answers_coverage_invariant(self, spark, events):
        from datawave_spark.compiler import compile_query
        from datawave_spark.sources.index_frame import (build_index,
                                                        index_hole_query)
        idx = build_index(events, ["event_type", "grp"], "event_id",
                          date_col="ts")
        q = "EVENT_TYPE == 'hot' && GRP == 2"
        want = {r.event_id for r in compile_query(events, q).collect()}
        for frontier in ("2023-12-31",   # nothing covered: pure scan
                         "2024-01-01",   # half covered
                         "2024-01-02"):  # fully covered: pure index
            got = {r.event_id for r in index_hole_query(
                events, idx, q, "event_id", "ts", frontier).collect()}
            assert got == want, frontier


class TestUnindexedField:
    def test_and_with_unindexed_term_falls_back_to_evaluation(
            self, spark, events, cidx):
        """A field absent from the capped index is evaluation-only
        (_Delayed_), never an empty candidate frame: ANDing it with an
        indexed term must narrow by the indexed term and re-evaluate —
        not return zero rows.  (round-3 ADVICE, index_frame.py)"""
        jexl = "EVENT_TYPE == 'cold' && UNINDEXED_NUM == 0"
        ev = events.withColumn("unindexed_num", F.col("event_id") % 2)
        expected = {r.event_id for r in ev.filter(
            (F.col("event_type") == "cold")
            & (F.col("unindexed_num") == 0)).collect()}
        got = {r.event_id for r in capped_index_query(
            ev, cidx, jexl, "event_id", "ts").collect()}
        assert got == expected and got

    def test_all_unindexed_or_returns_full_scan_result(
            self, spark, events, cidx):
        ev = events.withColumn("unindexed_num", F.col("event_id") % 2)
        jexl = "EVENT_TYPE == 'cold' || UNINDEXED_NUM == 1"
        expected = {r.event_id for r in ev.filter(
            (F.col("event_type") == "cold")
            | (F.col("unindexed_num") == 1)).collect()}
        got = {r.event_id for r in capped_index_query(
            ev, cidx, jexl, "event_id", "ts").collect()}
        assert got == expected and got

    def test_capped_candidates_unindexed_is_none(self, spark, cidx):
        assert capped_candidates(cidx, parse("NOPE == 'x'")) is None


class TestPlainIndexUnindexed:
    def test_index_query_reevaluates_unindexed_term(self, spark, events):
        from datawave_spark.sources.index_frame import build_index, index_query
        ev = events.withColumn("unindexed_num", F.col("event_id") % 2)
        idx = build_index(ev, ["event_type"], "event_id", date_col="ts")
        expected = {r.event_id for r in ev.filter(
            (F.col("event_type") == "cold")
            & (F.col("unindexed_num") == 0)).collect()}
        got = {r.event_id for r in index_query(
            ev, idx, "EVENT_TYPE == 'cold' && UNINDEXED_NUM == 0",
            "event_id").collect()}
        assert got == expected and got

    def test_index_query_full_fallback_when_nothing_servable(
            self, spark, events):
        from datawave_spark.sources.index_frame import build_index, index_query
        ev = events.withColumn("unindexed_num", F.col("event_id") % 2)
        idx = build_index(ev, ["event_type"], "event_id", date_col="ts")
        got = {r.event_id for r in index_query(
            ev, idx, "UNINDEXED_NUM == 0", "event_id").collect()}
        expected = {r.event_id
                    for r in ev.filter(F.col("unindexed_num") == 0).collect()}
        assert got == expected and got


class TestNullShardRouting:
    def test_index_hole_keeps_null_dated_rows(self, spark, events):
        """NULL-dated rows fail both frontier comparisons; they must
        land in the predicate-scan branch, not vanish."""
        from datawave_spark.sources.index_frame import (build_index,
                                                        index_hole_query)
        ev = events.withColumn(
            "ts", F.when(F.col("event_id") == 0, F.lit(None)).otherwise(
                F.col("ts")))
        idx = build_index(ev.filter(F.col("ts").isNotNull()),
                          ["event_type"], "event_id", date_col="ts")
        got = {r.event_id for r in index_hole_query(
            ev, idx, "EVENT_TYPE == 'cold'", "event_id", "ts",
            covered_until=datetime.date(2024, 1, 1)).collect()}
        expected = {r.event_id for r in
                    ev.filter(F.col("event_type") == "cold").collect()}
        assert 0 in expected          # fixture: event 0 is 'cold'
        assert got == expected


class TestNegatedUnindexed:
    def test_negation_over_unindexed_conjunct_not_underinclusive(
            self, spark, events):
        """!(B == 1 && C == 'x') with C unindexed: the inner AND's
        candidate superset must NOT be anti-joined (it would drop rows
        where B matches but C doesn't); the negation becomes
        evaluation-only instead."""
        from datawave_spark.sources.index_frame import (build_index,
                                                        index_query)
        ev = events.withColumn("unindexed_num", F.col("event_id") % 2)
        idx = build_index(ev, ["event_type", "grp"], "event_id",
                          date_col="ts")
        jexl = ("EVENT_TYPE == 'hot' && "
                "!(GRP == 1 && UNINDEXED_NUM == 0)")
        expected = {r.event_id for r in ev.filter(
            (F.col("event_type") == "hot")
            & ~((F.col("grp") == 1) & (F.col("unindexed_num") == 0))
        ).collect()}
        got = {r.event_id for r in index_query(
            ev, idx, jexl, "event_id").collect()}
        assert got == expected and got
        # specifically: a row with grp==1 but unindexed_num==1 matches
        # the query and must be present
        assert any(r.event_id in got for r in ev.filter(
            (F.col("event_type") == "hot") & (F.col("grp") == 1)
            & (F.col("unindexed_num") == 1)).collect())


class TestIndexOps:
    def test_age_display_oldest_bucket_wins(self, spark):
        import datetime as dt
        from pyspark.sql import functions as F
        from datawave_spark.sources.index_frame import index_age_display
        idx = spark.createDataFrame(
            [("F", "v", "1", "2024-01-01"),      # 19 days -> bucket 14
             ("F", "v", "2", "2024-01-12"),      # 8 days  -> bucket 7
             ("F", "v", "3", "2024-01-19"),      # 1 day   -> bucket 0
             ("F", "v", "4", "2024-01-17")],     # 3 days  -> bucket 2
            "field string, value string, uid string, event_date string"
        ).withColumn("event_date", F.col("event_date").cast("date"))
        out = {r["age_bucket_days"]: r["n"] for r in
               index_age_display(idx, dt.date(2024, 1, 20),
                                 buckets=(14, 7, 2)).collect()}
        assert out == {14: 1, 7: 1, 2: 1, 0: 1}
        import pytest as _pt
        with _pt.raises(ValueError):
            index_age_display(idx, dt.date(2024, 1, 20), buckets=(1,))

    def test_consistency_detects_both_drifts(self, spark):
        from pyspark.sql import functions as F
        from datawave_spark.sources.index_frame import (build_index,
                                                        index_consistency)
        ev = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id int, kind string")
        # stored index built over events 1,2; live data is events 2,3:
        # event 1 -> orphaned entry; event 3 -> missing entry
        idx = build_index(ev.filter("id <= 2"), ["kind"], "id")
        live = ev.filter("id >= 2")
        rows = {(r["issue"], r["field"]): r["n"] for r in
                index_consistency(idx, live, ["kind"], "id").collect()}
        assert rows == {("orphaned_index", "KIND"): 1,
                        ("missing_index", "KIND"): 1}

    def test_consistency_clean_is_empty(self, spark):
        from datawave_spark.sources.index_frame import (build_index,
                                                        index_consistency)
        ev = spark.createDataFrame([(1, "a")], "id int, kind string")
        idx = build_index(ev, ["kind"], "id")
        assert index_consistency(idx, ev, ["kind"], "id").count() == 0
