"""Audit (selector extraction + record), edge dictionary, and the
bulk-results export round trip."""

import os

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans.audit import (
    AuditRecord, audit_record, extract_selectors, split_selectors,
)

SF = "/root/testdata/sf0.001"


class TestSelectorExtraction:
    def test_positive_eq_only(self):
        q = ("EVENT_TYPE == 'purchase' || "
             "(EVENT_TYPE == 'click' && VALUE > 300) || "
             "!(EVENT_TYPE == 'refund')")
        assert extract_selectors(q) == ["purchase", "click"]

    def test_double_negation_is_positive(self):
        assert extract_selectors("!(!(A == 'x'))") == ["x"]

    def test_ne_is_not_a_selector(self):
        # the reference collects ASTEQNode only; != contributes nothing
        assert extract_selectors("A != 'x' && B == 'y'") == ["y"]

    def test_numeric_literal_stringified(self):
        assert extract_selectors("USER_ID == 42") == ["42"]

    def test_function_args_excluded(self):
        q = "filter:includeRegex(FOO, 'ba.*') && A == 'keep'"
        assert extract_selectors(q) == ["keep"]

    def test_lucene_fallback(self):
        # not valid JEXL -> parsed as LUCENE; fielded term is an EQ
        assert extract_selectors("EVENT_TYPE:purchase") == ["purchase"]

    def test_split_extractor(self):
        assert split_selectors("a;b; c", ";") == ["a", "b", "c"]
        assert split_selectors("a;b;c", ";", use_splits=[0, 2]) == ["a", "c"]
        assert split_selectors("whole query") == ["whole query"]

    def test_audit_record_fields(self):
        rec = audit_record("A == 'x'", "EventQuery", "cn=u", "A,B",
                           audit_type="PASSIVE")
        assert isinstance(rec, AuditRecord)
        assert rec.selectors == ("x",)
        assert rec.audit_type == "PASSIVE"

    def test_bad_audit_type_rejected(self):
        with pytest.raises(ValueError):
            audit_record("A == 'x'", "L", "u", "A", audit_type="LOUD")


class TestEdgeDictionary:
    def test_dictionary_rows(self, spark):
        from datawave_spark.edges import EdgeDefinition, edge_dictionary
        ev = spark.createDataFrame(
            [(1, "a", "2024-01-01"), (1, "b", "2024-01-03"),
             (2, "a", "2024-01-02")],
            "uid int, kind string, day string").withColumn(
                "day", F.to_timestamp("day"))
        defs = [EdgeDefinition("uid", "kind", "t1", "rel"),
                EdgeDefinition("kind", "uid", "t2", "ler",
                               precondition="KIND == 'a'")]
        rows = {r["edge_type"]: r for r in
                edge_dictionary(ev, defs, date_col="day").collect()}
        assert rows["t1"]["n_edges"] == 3
        assert rows["t1"]["n_sources"] == 2          # uids 1,2
        assert rows["t1"]["n_sinks"] == 2            # kinds a,b
        assert rows["t1"]["source_field"] == "uid"
        assert rows["t1"]["has_precondition"] is False
        assert rows["t1"]["first_day"] == "2024-01-01"
        assert rows["t1"]["last_day"] == "2024-01-03"
        assert rows["t2"]["n_edges"] == 2            # precondition kept 'a'
        assert rows["t2"]["has_precondition"] is True


class TestBulkExport:
    def test_round_trip_parquet(self, spark, tmp_path):
        from datawave_spark.plans.export import export_results, read_export
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("m"))
        out = str(tmp_path / "exp")
        export_results(df, out, partitions=3)
        back = read_export(spark, out)
        assert back.count() == 100
        assert {f.name for f in back.schema.fields} == {"id", "m"}
        # idempotent re-run (overwrite commit, OutputCommitter parity)
        export_results(df.filter("id < 10"), out, partitions=1)
        assert read_export(spark, out).count() == 10
        assert os.path.exists(os.path.join(out, "_SUCCESS"))

    def test_round_trip_json(self, spark, tmp_path):
        from datawave_spark.plans.export import export_results, read_export
        df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
        out = str(tmp_path / "expj")
        export_results(df, out, fmt="json")
        back = read_export(spark, out, fmt="json").select("a", "b")
        assert sorted(r["b"] for r in back.collect()) == ["x", "y"]

    def test_bad_format_rejected(self, spark):
        from datawave_spark.plans.export import export_results
        with pytest.raises(ValueError):
            export_results(spark.range(1), "/tmp/nope", fmt="csvx")

    def test_export_never_collects(self, spark):
        # plan shape: the export entry's returned frame scans the
        # export files, not the original parquet
        import __spark_entry__ as entrymod
        df = entrymod.queries()["bulk_export_query"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bulk_purchase" in plan


class TestDecorate:
    def test_first_source_with_value_wins(self, spark):
        from datawave_spark.operators.decorate import decorate_events
        df = spark.createDataFrame(
            [(1, "a", None), (2, None, "b"), (3, None, None)],
            "id int, s1 string, s2 string")
        out = {r["id"]: r["u"] for r in decorate_events(
            df, "u", {"s1": "1:@field_value@",
                      "s2": "2:@field_value@"}).collect()}
        assert out[1] == "1:a"          # first pattern wins
        assert out[2] == "2:b"          # falls through to second
        assert out[3] is None           # no source -> new field NULL

    def test_existing_destination_kept_when_no_source(self, spark):
        from datawave_spark.operators.decorate import decorate_events
        df = spark.createDataFrame([(1, None, "old")],
                                   "id int, s1 string, u string")
        out = decorate_events(df, "u", {"s1": "x@field_value@"}).collect()
        assert out[0]["u"] == "old"

    def test_unknown_source_rejected(self, spark):
        import pytest as _pt
        from datawave_spark.operators.decorate import decorate_events
        df = spark.createDataFrame([(1,)], "id int")
        with _pt.raises(ValueError):
            decorate_events(df, "u", {"nope": "x"})
        with _pt.raises(ValueError):
            decorate_events(df, "u", {})


class TestReviewFixes:
    def test_edge_dictionary_keeps_zero_edge_defs(self, spark):
        from datawave_spark.edges import EdgeDefinition, edge_dictionary
        ev = spark.createDataFrame([(1, "a", 5.0)],
                                   "uid int, kind string, value double")
        defs = [EdgeDefinition("uid", "kind", "live", "r"),
                EdgeDefinition("uid", "kind", "dead", "r",
                               precondition="VALUE > 1000000")]
        rows = {r["edge_type"]: r for r in
                edge_dictionary(ev, defs).collect()}
        assert rows["live"]["n_edges"] == 1
        assert rows["dead"]["n_edges"] == 0      # present, not dropped
        assert rows["dead"]["n_sources"] == 0
        assert rows["dead"]["first_day"] is None

    def test_edge_dictionary_empty_defs_rejected(self, spark):
        import pytest as _pt
        from datawave_spark.edges import edge_dictionary
        ev = spark.createDataFrame([(1,)], "uid int")
        with _pt.raises(ValueError):
            edge_dictionary(ev, [])

    def test_filtered_logic_never_initializes_gated_delegate(self, spark):
        from datawave_spark.plans.composite import (FilterByParameter,
                                                    filtered_logic)

        def exploding():
            raise RuntimeError("delegate setup must not run when gated")

        out = filtered_logic(exploding, [FilterByParameter("go")], {},
                             [], schema="a int, b string")
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["a", "b"]

    def test_unparseable_query_audits_with_no_selectors(self):
        rec = audit_record("((broken", "EventQuery", "cn=u", "A")
        assert rec.selectors == ()
        assert rec.query == "((broken"
