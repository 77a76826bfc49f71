"""Ingest pipeline, tokenization/tf offsets, visibility, age-off, and
streaming ingest tests."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from datawave_spark import visibility
from datawave_spark.compiler import compile_query
from datawave_spark.operators.ageoff import (
    AgeOffRule, age_off_filter, drop_expired_partitions,
)
from datawave_spark.sources.ingest import (
    IngestConfig, field_metadata, ingest_events, tokenize, write_events,
)

CFG = IngestConfig(
    datatype="test", date_field="when", uid_fields=["rid"],
    field_types={"city": "lcNoDiacritics"},
    multi_value_delim={"tags": ";"},
    tokenized_fields=["body"],
    visibility="A&B",
)


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (1, "2024-01-01", "Rome", "x;y;z", "the quick brown fox the end"),
        (2, "2024-01-02", "Milan", "x", "hello world hello again"),
        (3, "2024-03-05", "Paris", None, ""),
    ]
    return spark.createDataFrame(
        rows, "rid long, when string, city string, tags string, body string")


@pytest.fixture(scope="module")
def events(raw):
    return ingest_events(raw, CFG).cache()


class TestIngest:
    def test_standard_columns(self, events):
        row = events.filter(F.col("rid") == 1).first()
        assert row.datatype == "test"
        assert len(row.uid) == 32
        assert str(row.event_date) == "2024-01-01"
        assert row.shard.startswith("20240101_")
        assert row.visibility == "A&B"
        assert row.load_date is not None

    def test_multivalue_split(self, events):
        assert events.filter(F.col("rid") == 1).first().tags == ["x", "y", "z"]

    def test_build_uid_distinguishes_null_positions(self, spark):
        # concat_ws silently skips NULLs — ('a', NULL, 'b') and
        # ('a', 'b', NULL) must NOT collide to one uid.
        from datawave_spark.sources.ingest import build_uid
        df = spark.createDataFrame(
            [("a", None, "b"), ("a", "b", None)],
            "x string, y string, z string")
        got = [r.u for r in
               df.select(build_uid(df, ["x", "y", "z"]).alias("u")).collect()]
        assert got[0] != got[1]

    def test_shard_bucket_stable(self, raw, events):
        # same uid → same shard bucket on recompute (deterministic)
        again = ingest_events(raw, CFG)
        a = {r.rid: r.shard for r in events.select("rid", "shard").collect()}
        b = {r.rid: r.shard for r in again.select("rid", "shard").collect()}
        assert a == b

    def test_tf_offsets(self, events):
        tf = events.filter(F.col("rid") == 1).first().body_tf
        assert tf["the"] == [0, 4]
        assert tf["quick"] == [1]
        empty = events.filter(F.col("rid") == 3).first().body_tf
        assert empty == {}

    def test_content_phrase_over_ingested_tf(self, events):
        # content: functions resolve {zone}_tf columns from ingest
        hits = compile_query(events, "content:phrase(BODY, 'quick', 'brown')")
        assert [r.rid for r in hits.collect()] == [1]
        hits2 = compile_query(events, "content:within(BODY, 3, 'quick', 'fox')")
        assert [r.rid for r in hits2.collect()] == [1]

    def test_field_metadata(self, raw):
        meta = field_metadata(raw, CFG)
        m = {r.field: r for r in meta.collect()}
        assert m["CITY"].normalizer == "lcNoDiacritics"
        assert m["BODY"].tokenized
        assert m["TAGS"].n_values == 2  # one null

    def test_write_partitioned(self, events, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("events_tbl"))
        write_events(events.drop("load_date"), out, mode="overwrite")
        parts = sorted(p for p in os.listdir(out) if p.startswith("event_date="))
        assert parts == ["event_date=2024-01-01", "event_date=2024-01-02",
                         "event_date=2024-03-05"]


class TestVisibility:
    @pytest.mark.parametrize("expr,auths,expected", [
        ("A", {"A"}, True),
        ("A", {"B"}, False),
        ("A&B", {"A", "B"}, True),
        ("A&B", {"A"}, False),
        ("A|B", {"B"}, True),
        ("A&(B|C)", {"A", "C"}, True),
        ("A&(B|C)", {"A"}, False),
        ("(A&B)|(C&D)", {"C", "D"}, True),
        ("", {"X"}, True),
        (None, set(), True),
    ])
    def test_evaluate(self, expr, auths, expected):
        assert visibility.evaluate(expr, auths) is expected

    def test_filter_by_auths(self, spark):
        df = spark.createDataFrame(
            [(1, "A"), (2, "A&B"), (3, "C|A"), (4, None), (5, "D")],
            "id long, visibility string")
        got = sorted(r.id for r in visibility.filter_by_auths(df, {"A"}).collect())
        assert got == [1, 3, 4]

    def test_mask_fields(self, spark):
        df = spark.createDataFrame([(1, "secret", "open")],
                                   "id long, ssn string, name string")
        out = visibility.mask_fields(df, {"ssn": "PII"}, auths={"PUBLIC"})
        row = out.first()
        assert row.ssn == "***" and row.name == "open"

    def test_bad_expression_raises(self):
        with pytest.raises(visibility.VisibilityParseError):
            visibility.evaluate("A&(B", {"A", "B"})

    def test_mixed_ops_require_parens(self):
        # Accumulo rejects mixed &/| at the same paren level; inventing
        # (A&B)|C precedence would over-grant to holders of only C.
        with pytest.raises(visibility.VisibilityParseError):
            visibility.evaluate("A&B|C", {"C"})
        assert visibility.evaluate("A&(B|C)", {"A", "C"}) is True
        assert visibility.evaluate("(A&B)|C", {"C"}) is True

    def test_filter_fails_closed_on_bad_label(self, spark):
        df = spark.createDataFrame(
            [(1, "A"), (2, "A&B|C")], "id long, visibility string")
        got = sorted(r.id for r in
                     visibility.filter_by_auths(df, {"A", "C"}).collect())
        assert got == [1]  # unparseable label grants nothing


class TestAgeOff:
    def test_read_filter(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01", "keep-short"), (2, "2024-06-01", "x"),
             (3, "2024-01-01", "x")],
            "id long, event_date string, kind string")
        now = dt.date(2024, 6, 10)
        rules = [AgeOffRule(ttl_days=365),
                 AgeOffRule(ttl_days=30, predicate=F.col("kind") == "x")]
        got = sorted(r.id for r in age_off_filter(df, rules, now=now).collect())
        assert got == [1, 2]  # id=3 is kind=x and 161 days old

    def test_partition_drop(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("ageoff_tbl"))
        df = spark.createDataFrame(
            [(1, "2024-01-01"), (2, "2024-06-01")], "id long, d string") \
            .withColumn("event_date", F.col("d").cast("date"))
        df.write.partitionBy("event_date").parquet(out, mode="overwrite")
        dropped = drop_expired_partitions(out, ttl_days=90,
                                          now=dt.date(2024, 6, 10))
        assert dropped == ["event_date=2024-01-01"]
        left = spark.read.parquet(out)
        assert [r.id for r in left.collect()] == [2]


class TestStreaming:
    def test_stream_ingest_available_now(self, spark, raw, tmp_path_factory):
        src = str(tmp_path_factory.mktemp("stream_src"))
        out = str(tmp_path_factory.mktemp("stream_out"))
        ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
        raw.write.mode("overwrite").parquet(src)
        from datawave_spark.streaming import stream_ingest
        q = stream_ingest(spark, src, raw.schema, CFG, out, ckpt)
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == 3
        assert "uid" in got.columns and "body_tf" in got.columns
        # late-data semantics: partition is by EVENT date
        parts = {str(r.event_date) for r in got.select("event_date").collect()}
        assert parts == {"2024-01-01", "2024-01-02", "2024-03-05"}

    def test_windowed_counts_memory_sink(self, spark):
        from datawave_spark.streaming import windowed_counts
        import tempfile
        rows = [(i, f"2024-01-01 00:{i:02d}:00", "click", 1.0) for i in range(30)]
        src_dir = tempfile.mkdtemp()
        df = spark.createDataFrame(rows, "id long, ts string, event_type string, value double") \
            .withColumn("ts", F.to_timestamp("ts"))
        df.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema).parquet(src_dir)
        agg = windowed_counts(stream, window="10 minutes")
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName("win_out").trigger(availableNow=True).start())
        q.awaitTermination(120)
        res = spark.sql("SELECT * FROM win_out").collect()
        assert sum(r.n for r in res) == 30
        assert len(res) == 3  # 30 minutes / 10-minute tumbling windows


class TestStatefulStreaming:
    def test_streaming_unique_across_batches(self, spark, tmp_path_factory):
        import pyspark.sql.functions as F
        from datawave_spark.streaming.stateful import streaming_unique
        src = str(tmp_path_factory.mktemp("su_src"))
        # two files with overlapping keys → maxFilesPerTrigger=1 forces
        # two micro-batches, so dedup must span batch boundaries
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string") \
            .coalesce(1).write.parquet(src + "/f1")
        spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string") \
            .coalesce(1).write.parquet(src + "/f2")
        schema = "k long, v string"
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src + "/*"))
        out = streaming_unique(stream, ["k"])
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName("su_out").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT k FROM su_out").collect()
        assert sorted(r.k for r in rows) == [1, 2, 3]  # k=2 emitted once

    def test_streaming_unique_ttl_dedups_within_window(self, spark,
                                                       tmp_path_factory):
        # with a long TTL, behaves as streaming_unique across batches
        # (the timeout path only changes long-horizon state retention)
        from datawave_spark.streaming.stateful import streaming_unique_ttl
        src = str(tmp_path_factory.mktemp("sut_src"))
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string") \
            .coalesce(1).write.parquet(src + "/f1")
        spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string") \
            .coalesce(1).write.parquet(src + "/f2")
        stream = (spark.readStream.schema("k long, v string")
                  .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
        out = streaming_unique_ttl(stream, ["k"], ttl_ms=3_600_000)
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName("sut_out").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT k FROM sut_out").collect()
        assert sorted(r.k for r in rows) == [1, 2, 3]

    def test_streaming_running_counts(self, spark, tmp_path_factory):
        from datawave_spark.streaming.stateful import streaming_running_counts
        src = str(tmp_path_factory.mktemp("src_src"))
        spark.createDataFrame([("a",), ("a",), ("b",)], "k string") \
            .coalesce(1).write.parquet(src + "/f1")
        spark.createDataFrame([("a",), ("b",)], "k string") \
            .coalesce(1).write.parquet(src + "/f2")
        stream = (spark.readStream.schema("k string")
                  .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
        out = streaming_running_counts(stream, ["k"])
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName("src_out").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT k, max(total) AS t FROM src_out GROUP BY k") \
            .collect()
        got = {r.k: r.t for r in rows}
        assert got == {"a": 3, "b": 2}  # cumulative across batches


class TestStreamStreamJoin:
    def test_interval_join_attribution(self, spark, tmp_path_factory):
        from datawave_spark.streaming.joins import interval_join
        clicks_dir = str(tmp_path_factory.mktemp("ssj_clicks"))
        buys_dir = str(tmp_path_factory.mktemp("ssj_buys"))
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:00:00")],
            "user long, cts string") \
            .withColumn("cts", F.to_timestamp("cts")) \
            .write.mode("overwrite").parquet(clicks_dir)
        # user 1 buys 5 min after click (inside window); user 2 buys
        # 30 min after (outside the 10-minute interval)
        spark.createDataFrame(
            [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 01:30:00")],
            "user long, pts string") \
            .withColumn("pts", F.to_timestamp("pts")) \
            .write.mode("overwrite").parquet(buys_dir)
        clicks = spark.readStream.schema(
            spark.read.parquet(clicks_dir).schema).parquet(clicks_dir)
        buys = spark.readStream.schema(
            spark.read.parquet(buys_dir).schema).parquet(buys_dir)
        joined = interval_join(clicks, buys, "user",
                               left_ts="cts", right_ts="pts",
                               within="10 minutes")
        q = (joined.writeStream.outputMode("append").format("memory")
             .queryName("ssj_out").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT user FROM ssj_out").collect()
        assert sorted(r.user for r in rows) == [1]

    def test_same_ts_name_rejected(self, spark):
        import pytest as _pytest
        from datawave_spark.streaming.joins import interval_join
        df = spark.createDataFrame([(1,)], "user long")
        with _pytest.raises(ValueError, match="distinct"):
            interval_join(df, df, "user", left_ts="ts", right_ts="ts")


class TestCombinedVisibility:
    def test_conjunction_of_distinct_labels(self, spark):
        from datawave_spark.visibility import combined_visibility
        df = spark.createDataFrame(
            [(1, "A"), (1, "A&B"), (1, "A")], "g long, visibility string")
        got = df.groupBy("g").agg(
            combined_visibility().alias("v")).first().v
        assert got == "A&A&B"

    def test_disjunctive_member_parenthesized(self, spark):
        from datawave_spark.visibility import combined_visibility
        df = spark.createDataFrame(
            [(1, "A"), (1, "C|D")], "g long, visibility string")
        got = df.groupBy("g").agg(
            combined_visibility().alias("v")).first().v
        assert got == "A&(C|D)"

    def test_stable_under_repartition(self, spark):
        from datawave_spark.visibility import combined_visibility
        rows = [(1, v) for v in ("Z", "A", "M|N", "B&C")]
        df = spark.createDataFrame(rows, "g long, visibility string")
        a = df.groupBy("g").agg(combined_visibility().alias("v")).first().v
        b = df.repartition(7).groupBy("g").agg(
            combined_visibility().alias("v")).first().v
        assert a == b == "A&B&C&(M|N)&Z"


class TestVisibilityCap:
    def test_over_cap_degrades_to_batch_eval(self, spark):
        """Vocabulary above distinct_cap: no driver-sized collect; the
        pandas-UDF path must produce the same rows as the isin path."""
        from datawave_spark.visibility import filter_by_auths
        rows = [(i, f"L{i}") for i in range(50)] + [(999, "A&B")]
        df = spark.createDataFrame(rows, "id long, visibility string")
        fast = {r.id for r in
                filter_by_auths(df, {"A", "B", "L3"}).collect()}
        capped = {r.id for r in
                  filter_by_auths(df, {"A", "B", "L3"},
                                  distinct_cap=5).collect()}
        assert capped == fast == {3, 999}

    def test_over_cap_null_and_empty_visible(self, spark):
        from datawave_spark.visibility import filter_by_auths
        rows = [(i, f"L{i}") for i in range(20)] + [(100, None), (101, "")]
        df = spark.createDataFrame(rows, "id long, visibility string")
        got = {r.id for r in
               filter_by_auths(df, set(), distinct_cap=3).collect()}
        assert got == {100, 101}


class TestValidateEvents:
    def test_split_and_fail_closed_on_null(self, spark):
        from pyspark.sql import functions as F
        from datawave_spark.sources.ingest import validate_events
        df = spark.createDataFrame(
            [(1, 10.0), (2, -5.0), (3, None)],
            "id int, v double")
        good, bad = validate_events(df, [("v_pos", F.col("v") > 0)], "id")
        assert [r["id"] for r in good.orderBy("id").collect()] == [1]
        rows = {r["event_uuid"]: r for r in bad.collect()}
        assert set(rows) == {"2", "3"}          # NULL fails closed
        assert rows["3"]["error"] == "v_pos"
        assert '"id":3' in rows["3"]["event"]   # default raw JSON content

    def test_multiple_failed_rules_listed_in_order(self, spark):
        from pyspark.sql import functions as F
        from datawave_spark.sources.ingest import validate_events
        df = spark.createDataFrame([(1, -1.0)], "id int, v double")
        _, bad = validate_events(
            df, [("a", F.col("v") > 0), ("b", F.col("v") > 100)], "id")
        assert bad.first()["error"] == "a,b"

    def test_empty_rules_rejected(self, spark):
        import pytest as _pt
        from datawave_spark.sources.ingest import validate_events
        df = spark.createDataFrame([(1,)], "id int")
        with _pt.raises(ValueError):
            validate_events(df, [], "id")


class TestStreamingDeadLetter:
    def test_stream_ingest_routes_invalid_rows(self, spark, raw,
                                               tmp_path_factory):
        src = str(tmp_path_factory.mktemp("dl_src"))
        out = str(tmp_path_factory.mktemp("dl_out"))
        err = str(tmp_path_factory.mktemp("dl_err"))
        ckpt = str(tmp_path_factory.mktemp("dl_ckpt"))
        raw.write.mode("overwrite").parquet(src)
        from datawave_spark.streaming import stream_ingest
        rules = [("tags_present", F.col("tags").isNotNull()),
                 ("body_nonempty", F.length("body") > 0)]
        q = stream_ingest(spark, src, raw.schema, CFG, out, ckpt,
                          validation_rules=rules, error_path=err,
                          uid_col="rid")
        q.awaitTermination(120)
        good = spark.read.parquet(out)
        bad = spark.read.parquet(err)
        assert good.count() == 2                 # row 3 dead-lettered
        row = bad.collect()
        assert len(row) == 1 and row[0]["event_uuid"] == "3"
        assert row[0]["error"] == "tags_present,body_nonempty"
        assert row[0]["job_name"] == CFG.datatype

    def test_bad_config_rejected_at_call_time(self, spark, raw,
                                              tmp_path_factory):
        import pytest as _pt
        src = str(tmp_path_factory.mktemp("dl2_src"))
        out = str(tmp_path_factory.mktemp("dl2_out"))
        ckpt = str(tmp_path_factory.mktemp("dl2_ckpt"))
        raw.write.mode("overwrite").parquet(src)
        from datawave_spark.streaming import stream_ingest
        # missing error_path and missing uid both fail EAGERLY, before
        # any stream starts — not wrapped in a StreamingQueryException
        with _pt.raises(ValueError, match="error_path"):
            stream_ingest(spark, src, raw.schema, CFG, out, ckpt,
                          validation_rules=[("x", F.lit(True))])
        import dataclasses as _dc
        no_uid = _dc.replace(CFG, uid_fields=None)
        with _pt.raises(ValueError, match="uid_col"):
            stream_ingest(spark, src, raw.schema, no_uid, out, ckpt,
                          validation_rules=[("x", F.lit(True))],
                          error_path=str(tmp_path_factory.mktemp("dl2_err")))


class TestConfigCompare:
    def test_same_diff_and_onesided_keys(self):
        from datawave_spark.sources.ingest import IngestConfig, compare_configs
        a = IngestConfig("dtA", date_field="ts", uid_fields=["id"],
                         field_types={"CITY": "lc", "NUM": "number"},
                         num_shards=32)
        b = IngestConfig("dtB", date_field="ts", uid_fields=["id"],
                         field_types={"CITY": "lcNoDiacritics"},
                         num_shards=16)
        r = compare_configs(a, b)
        assert "date_field" in r["same"] and "uid_fields" in r["same"]
        assert "field_types.CITY" in r["diff"] and "num_shards" in r["diff"]
        assert r["left_only"] == ["field_types.NUM"]
        assert r["right_only"] == []
        # datatype NAME is excluded (prefix-stripping parity)
        assert not any("datatype" in k for ks in r.values() for k in ks)

    def test_identical_configs(self):
        from datawave_spark.sources.ingest import IngestConfig, compare_configs
        a = IngestConfig("x", date_field="ts")
        r = compare_configs(a, IngestConfig("y", date_field="ts"))
        assert r["diff"] == r["left_only"] == r["right_only"] == []


class TestStreamRollup:
    def _events(self, spark, ids):
        import datetime as dt
        rows = [(i, dt.datetime(2024, 1, 1 + (i % 2), i % 24),
                 "click" if i % 2 else "view", float(i)) for i in ids]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, "
                  "value double")

    def _agg(self, df):
        return {(r.hour, r.event_type): (r.n, round(r.sum_value, 4))
                for r in df.groupBy(
                    F.date_trunc("hour", "ts").alias("hour"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("sum_value")).collect()}

    def test_stream_folds_into_rollup(self, spark, tmp_path_factory):
        from datawave_spark.streaming.ingest import stream_rollup
        src = str(tmp_path_factory.mktemp("roll_src"))
        roll = str(tmp_path_factory.mktemp("roll_out")) + "/rollup"
        ck = str(tmp_path_factory.mktemp("roll_ck"))
        ev = self._events(spark, range(30))
        ev.write.mode("overwrite").parquet(src)
        q = stream_rollup(spark, src, ev.schema, roll, ck)
        q.awaitTermination(120)
        got = {(r.hour, r.event_type): (r.n, round(r.sum_value, 4))
               for r in spark.read.parquet(roll).collect()}
        assert got == self._agg(ev)

    def test_epoch_key_makes_retries_idempotent(self, spark,
                                                tmp_path_factory):
        """The foreachBatch retry contract: a refold with the same
        (query, epoch) key must be a no-op per already-swapped day,
        including after a crash BETWEEN days of a multi-day batch."""
        from datawave_spark.sources.maintenance import refresh_rollup
        roll = str(tmp_path_factory.mktemp("roll_epoch")) + "/rollup"
        ev = self._events(spark, range(30))   # spans 2 days
        # simulate a crash after only day 1 of epoch qX.0 was folded
        day1 = ev.filter(F.col("ts").cast("date") == "2024-01-01")
        assert refresh_rollup(spark, roll, day1, epoch_key="qX.0") == 1
        # the retry delivers the FULL batch under the same key: the
        # already-swapped day is skipped, the missing day is folded
        assert refresh_rollup(spark, roll, ev, epoch_key="qX.0") == 1
        got = {(r.hour, r.event_type): (r.n, round(r.sum_value, 4))
               for r in spark.read.parquet(roll).collect()}
        assert got == self._agg(ev)
        # a full re-retry is a complete no-op
        assert refresh_rollup(spark, roll, ev, epoch_key="qX.0") == 0
        # the NEXT epoch folds again (its key is new)
        assert refresh_rollup(spark, roll, day1, epoch_key="qX.1") == 1
