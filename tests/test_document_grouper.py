"""DocumentGrouperTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/common/grouping/DocumentGrouperTest.java
— documents as ad-hoc (name-encoded grouping context) entry lists;
expected groups/counts/aggregates verbatim).

Pins the DocumentGrouper.java:118 pairing rules: direct matches on
(GROUP, INSTANCE), the unmatched-entry drop rule, the
no-direct-match cross product, and group-key-level aggregation
(values attach once per key, not per tuple)."""

import pytest

from datawave_spark.operators.grouping import document_grouper

SCHEMA = ("uid string, ENTRIES array<struct<name:string, "
          "values:array<string>>>")


def doc(uid, *entries):
    return (uid, [{"name": n, "values": list(vs)} for n, vs in entries])


def run(spark, docs, gf, af=None):
    df = spark.createDataFrame(docs, SCHEMA)
    out = document_grouper(df, "ENTRIES", gf, af)
    return {tuple(r[f] for f in gf): r.asDict() for r in out.collect()}


class TestDocumentGrouper:
    def test_single_field_group_and_instance(self, spark):
        d = doc("d1",
                ("GENDER.FOO.1", ["MALE"]), ("GENDER.FOO.2", ["FEMALE"]),
                ("GENDER.FOO.3", ["FEMALE"]), ("GENDER.BAR.1", ["MALE"]),
                ("GENDER.BAR.2", ["FEMALE"]))
        got = run(spark, [d], ["GENDER"])
        assert {k: v["record_count"] for k, v in got.items()} == \
            {("MALE",): 2, ("FEMALE",): 3}

    def test_direct_matches_with_nested_junk(self, spark):
        # testGroupingFieldsWithMatchingGroupsAndInstancesAndDirectMatches
        d = doc("d1",
                ("AGE.FOO.A.B.C.1", ["24"]), ("AGE.FOO.A.B.2", ["20"]),
                ("AGE.FOO.C.3", ["20"]), ("AGE.BAR.B.C.1", ["40"]),
                ("AGE.BAR.V.A.2", ["20"]),
                ("GENDER.FOO.A.C.1", ["MALE"]),
                ("GENDER.FOO.V.S.2", ["FEMALE"]),
                ("GENDER.FOO.F.3", ["FEMALE"]),
                ("GENDER.FOO.F.G.4", ["FEMALE"]),   # no AGE match: drop
                ("GENDER.BAR.V.C.A.1", ["MALE"]),
                ("GENDER.BAR.G.S.2", ["FEMALE"]))
        got = run(spark, [d], ["AGE", "GENDER"])
        assert {k: v["record_count"] for k, v in got.items()} == \
            {("24", "MALE"): 1, ("20", "FEMALE"): 3, ("40", "MALE"): 1}

    def test_cross_group_cartesian(self, spark):
        # testGroupingFieldsWithMatchingGroupsAndInstances
        d = doc("d1",
                ("AGE.FOO.1", ["24"]), ("AGE.FOO.2", ["20"]),
                ("AGE.FOO.3", ["20"]),
                ("GENDER.FOO.1", ["MALE"]), ("GENDER.FOO.2", ["FEMALE"]),
                ("GENDER.FOO.3", ["FEMALE"]),
                ("GENDER.FOO.4", ["FEMALE"]),       # dropped
                ("BUILDING.BAR.1", ["West"]), ("BUILDING.BAR.2", ["East"]))
        got = run(spark, [d], ["AGE", "GENDER", "BUILDING"])
        assert {k: v["record_count"] for k, v in got.items()} == {
            ("24", "MALE", "West"): 1, ("24", "MALE", "East"): 1,
            ("20", "FEMALE", "West"): 2, ("20", "FEMALE", "East"): 2}

    def test_instance_only_single(self, spark):
        d = doc("d1", ("GENDER.1", ["MALE", "FEMALE"]),
                ("GENDER.2", ["MALE", "FEMALE"]), ("GENDER.3", ["FEMALE"]))
        got = run(spark, [d], ["GENDER"])
        assert {k: v["record_count"] for k, v in got.items()} == \
            {("MALE",): 2, ("FEMALE",): 3}

    def test_instance_only_multi_is_cartesian(self, spark):
        # testGroupingMultipleFieldsWithInstanceOnly: instance without
        # a GROUP token never direct-matches
        d = doc("d1",
                ("BUILDING.1", ["West", "East"]), ("BUILDING.2", ["West"]),
                ("AGE.1", ["20"]), ("AGE.2", ["24"]))
        got = run(spark, [d], ["BUILDING", "AGE"])
        assert {k: v["record_count"] for k, v in got.items()} == {
            ("West", "20"): 2, ("West", "24"): 2,
            ("East", "20"): 1, ("East", "24"): 1}

    def test_no_instance(self, spark):
        # testGroupingBySingleFieldWithoutInstance / Multiple
        d = doc("d1", ("GENDER", ["MALE", "FEMALE"]))
        got = run(spark, [d], ["GENDER"])
        assert {k: v["record_count"] for k, v in got.items()} == \
            {("MALE",): 1, ("FEMALE",): 1}
        d2 = doc("d1", ("GENDER", ["MALE", "FEMALE"]),
                 ("BUILDING", ["East", "West", "North"]))
        got = run(spark, [d2], ["GENDER", "BUILDING"])
        assert len(got) == 6
        assert all(v["record_count"] == 1 for v in got.values())

    def test_across_multiple_documents(self, spark):
        # testGroupingBySingleFieldAcrossMultipleDocuments: the
        # cross-document combine sums per-document partials
        docs = [
            doc("d1", ("GENDER.FOO.1", ["MALE"]),
                ("GENDER.FOO.2", ["FEMALE"])),
            doc("d2", ("GENDER.1", ["MALE", "FEMALE"])),
            doc("d3", ("GENDER", ["FEMALE"])),
        ]
        got = run(spark, docs, ["GENDER"])
        assert {k: v["record_count"] for k, v in got.items()} == \
            {("MALE",): 2, ("FEMALE",): 3}

    def test_aggregation_with_direct_matches(self, spark):
        # testAggregatingFieldWithGroupingContextAndInstanceWith
        # DirectMatches: AGE.FOO.6 has no GENDER match → excluded
        d = doc("d1",
                ("GENDER.FOO.1", ["MALE"]), ("GENDER.FOO.2", ["FEMALE"]),
                ("GENDER.FOO.3", ["MALE"]), ("GENDER.FOO.4", ["FEMALE"]),
                ("GENDER.FOO.5", ["FEMALE"]),
                ("AGE.FOO.1", ["20"]), ("AGE.FOO.2", ["5"]),
                ("AGE.FOO.3", ["15"]), ("AGE.FOO.4", ["30"]),
                ("AGE.FOO.5", ["50"]), ("AGE.FOO.6", ["100"]))
        got = run(spark, [d], ["GENDER"], ["AGE"])
        m, f = got[("MALE",)], got[("FEMALE",)]
        assert (m["record_count"], m["AGE_sum"], m["AGE_cnt"],
                m["AGE_max"], m["AGE_min"]) == (2, 35.0, 2, 20.0, 15.0)
        assert abs(m["AGE_avg"] - 17.5) < 1e-9
        assert (f["record_count"], f["AGE_sum"], f["AGE_cnt"],
                f["AGE_max"], f["AGE_min"]) == (3, 85.0, 3, 50.0, 5.0)
        assert abs(f["AGE_avg"] - 85.0 / 3) < 1e-6

    def test_aggregation_without_direct_matches(self, spark):
        # ...WithNoDirectMatches: every AGE value aggregates to every
        # group key
        d = doc("d1",
                ("GENDER.FOO.1", ["MALE"]), ("GENDER.FOO.2", ["FEMALE"]),
                ("GENDER.FOO.3", ["MALE"]), ("GENDER.FOO.4", ["FEMALE"]),
                ("GENDER.FOO.5", ["FEMALE"]),
                ("AGE.BAR.1", ["20"]), ("AGE.BAR.2", ["5"]),
                ("AGE.BAR.3", ["15"]), ("AGE.HAT.1", ["30"]),
                ("AGE.HAT.2", ["50"]))
        got = run(spark, [d], ["GENDER"], ["AGE"])
        for key, cnt in ((("MALE",), 2), (("FEMALE",), 3)):
            g = got[key]
            assert (g["record_count"], g["AGE_sum"], g["AGE_cnt"],
                    g["AGE_max"], g["AGE_min"]) == \
                (cnt, 120.0, 5, 50.0, 5.0)
            assert abs(g["AGE_avg"] - 24.0) < 1e-9
