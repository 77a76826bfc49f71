"""GroupingTest corpus port (reference warehouse/query-core/src/test/
java/datawave/query/transformer/GroupingTest.java over the WiseGuys
non-model data — GENDER/AGE as parallel grouping-context arrays;
expected Group counts and AGE metrics verbatim).

Pins the DocumentGrouper pairing contract: multi-field #GROUPBY groups
the SAME-CONTEXT instance tuples (AGE.i, GENDER.i), never their
cartesian product, and metric fields aggregate the instances paired
with the group key's context.  GROUP_FIELDS_BATCH_SIZE is an Accumulo
tserver paging knob with no result-shape effect — n/a here."""

import pytest

from pyspark.sql import functions as F

from datawave_spark.compiler import compile_query
from datawave_spark.operators.grouping import group_by

# givenNonModelData: the [CS] docs with concrete GENDER/AGE
ROWS = [
    ("CORLEONE",
     ["MALE", "MALE", "MALE", "FEMALE", "MALE", "MALE"],
     [24.0, 22.0, 20.0, 18.0, 40.0, 22.0]),
    ("SOPRANO", ["MALE", "FEMALE"], [16.0, 18.0]),
    ("CAPONE", ["MALE", "MALE", "MALE", "MALE"],
     [30.0, 34.0, 20.0, 40.0]),
    ("ANDOLINI", None, [12.0]),
    ("TATTAGLIA", ["MALE"], [70.0]),
]
SCHEMA = "UUID string, GENDER array<string>, AGE array<double>"
FT = {"UUID": "lcNoDiacritics", "GENDER": "lcNoDiacritics"}

# expectGroup(...) from testGroupByAgeAndGenderWithBatchSizeOfSix
EXPECTED_PAIRS = {
    ("FEMALE", 18.0): 2,
    ("MALE", 30.0): 1, ("MALE", 34.0): 1, ("MALE", 16.0): 1,
    ("MALE", 40.0): 2, ("MALE", 20.0): 2, ("MALE", 24.0): 1,
    ("MALE", 22.0): 2,
}


@pytest.fixture(scope="module")
def guys(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def cs(guys):
    return compile_query(guys, "UUID =~ '^[CS].*'", field_types=FT) \
        .cache()


class TestGroupingTransform:
    def test_group_by_age_and_gender_pairs(self, cs):
        # multi-field groupBy pairs by grouping context — the verbatim
        # 8 expected groups (a cartesian explode would give 36
        # CORLEONE combos and wrong counts everywhere)
        out = group_by(cs, ["GENDER", "AGE"])
        got = {(r.GENDER, r.AGE): r.record_count for r in out.collect()}
        assert got == EXPECTED_PAIRS

    def test_group_by_age_only(self, cs):
        # testGroupByAgeWithBatchSizeOfSix
        out = group_by(cs, ["AGE"])
        got = {r.AGE: r.record_count for r in out.collect()}
        assert got == {18.0: 2, 30.0: 1, 34.0: 1, 16.0: 1, 40.0: 2,
                       20.0: 2, 24.0: 1, 22.0: 2}

    def test_group_by_gender_only(self, cs):
        # testGroupByGenderWithBatchSizeOfZero/Six
        out = group_by(cs, ["GENDER"])
        got = {r.GENDER: r.record_count for r in out.collect()}
        assert got == {"MALE": 10, "FEMALE": 2}

    def test_gender_with_all_age_metrics(self, cs):
        # testGroupingByGenderAndAllAgeMetrics: AGE aggregates pair
        # with the GENDER instance of the same context
        out = group_by(cs, ["GENDER"],
                       [("COUNT", "AGE", "age_count"),
                        ("MAX", "AGE", "age_max"),
                        ("MIN", "AGE", "age_min"),
                        ("SUM", "AGE", "age_sum"),
                        ("AVERAGE", "AGE", "age_avg")])
        got = {r.GENDER: r.asDict() for r in out.collect()}
        m = got["MALE"]
        assert (m["record_count"], m["age_count"], m["age_max"],
                m["age_min"], m["age_sum"]) == (10, 10, 40.0, 16.0,
                                                268.0)
        assert abs(m["age_avg"] - 26.8) < 1e-9
        f = got["FEMALE"]
        assert (f["record_count"], f["age_count"], f["age_max"],
                f["age_min"], f["age_sum"], f["age_avg"]) == \
            (2, 2, 18.0, 18.0, 36.0, 18.0)

    def test_lucene_function_form(self, guys):
        # testGroupByLuceneFunction: #GROUPBY('AGE','$GENDER') through
        # the LUCENE front-end + planner ('$'-escaped field args)
        from datawave_spark.plans.planner import QueryPlanner
        res = QueryPlanner(guys, field_types=FT).plan(
            "(UUID:C* or UUID:S*) and #GROUPBY('AGE','$GENDER')",
            syntax="LUCENE")
        got = {(r.GENDER, r.AGE): r.record_count
               for r in res.df.collect()}
        assert got == EXPECTED_PAIRS

    def test_non_numerical_aggregate_drops(self, guys):
        # testSummingNonNumericalValue / testAveragingNonNumericalValue:
        # the reference raises per-value; aggregates here skip
        # unparseable values (DIVERGENCES rows 9-10 totality stance)
        out = group_by(guys.filter("UUID = 'CORLEONE'"), ["UUID"],
                       [("SUM", "GENDER", "s"), ("AVERAGE", "GENDER", "a")])
        row = out.collect()[0]
        assert row.s is None and row.a is None
