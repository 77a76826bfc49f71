"""SimpleGroupFieldNameParser port + group_structs re-association.

Reference: ingest-core .../normalizer/SimpleGroupFieldNameParser.java
(name splitting + offset trimming), GroupingRequiredFilterFunctions.java
:141 (context = last dot component).
"""

import pytest
from pyspark.sql import functions as F

from datawave_spark.sources.grouped_fields import (
    extract_trimmed_components, group_structs, parse_group_field_name,
    trim_group,
)


class TestNameParsing:
    def test_simple_split(self):
        # extractFieldNameComponents:31-50 — first dot splits
        assert parse_group_field_name("FIELD") == ("FIELD", None)
        assert parse_group_field_name("NAME.1") == ("NAME", "1")
        assert parse_group_field_name("NAME.PERSON_1.2") \
            == ("NAME", "PERSON_1.2")

    @pytest.mark.parametrize("group,expected", [
        ("PARENT_0.CHILD_1", "PARENT.CHILD"),   # offsets stripped
        ("P1_0.P2_3", "P1.P2"),
        ("FOO_BAR", "FOO_BAR"),                 # '_' + non-digit kept
        ("PLAIN", "PLAIN"),
        ("A_12.B_3.C_4", "A.B.C"),
    ])
    def test_trim_group(self, group, expected):
        # trimGroup:168-196
        assert trim_group(group) == expected

    def test_extract_trimmed_components(self):
        # extractTrimmedGroupAndSubGroup:86-117, all four branches
        assert extract_trimmed_components("FIELD") == ("FIELD", None, None)
        assert extract_trimmed_components("NAME.1") == ("NAME", None, "1")
        assert extract_trimmed_components("NAME.PERSON.1") \
            == ("NAME", "PERSON", "1")
        # parent offsets present → trimmed group, subgroup null (the
        # Java leaves subgroup unset on the trimmed branch)
        assert extract_trimmed_components("NAME.PARENT_0.CHILD_1.2") \
            == ("NAME", "PARENT.CHILD", None)


class TestGroupStructs:
    def test_reassociation(self, spark):
        rows = [
            (1, [("NAME.PERSON_1.0", "alice"), ("AGE.PERSON_1.0", "30"),
                 ("NAME.PERSON_1.1", "bob"), ("AGE.PERSON_1.1", "40"),
                 ("COLOR", "red")]),                 # ungrouped: ignored
            (2, [("NAME.PERSON_1.0", "carol")]),     # missing member → NULL
            (3, []),
        ]
        df = spark.createDataFrame(
            rows, "id int, fields array<struct<name:string,value:string>>")
        out = group_structs(df, "fields", ["NAME", "AGE"], "GROUPS") \
            .orderBy("id").collect()
        # members are ARRAYS: a context can repeat a field (multimap)
        assert [tuple(g) for g in out[0].GROUPS] \
            == [(["alice"], ["30"]), (["bob"], ["40"])]
        assert [tuple(g) for g in out[1].GROUPS] == [(["carol"], [])]
        assert out[2].GROUPS == []

    def test_cross_group_contexts_do_not_mix(self, spark):
        # PERSON_1.0 and PERSON_2.0 share subgroup '0' — the index-0
        # convention associates them (getMatchToRightOfPeriod(name, 0)),
        # while '.1' names land in a different struct
        rows = [(1, [("NAME.PERSON_1.0", "alice"), ("AGE.PERSON_2.0", "30"),
                     ("AGE.PERSON_1.1", "99")])]
        df = spark.createDataFrame(
            rows, "id int, fields array<struct<name:string,value:string>>")
        out = group_structs(df, "fields", ["NAME", "AGE"]).collect()
        assert [tuple(g) for g in out[0].GROUPS] \
            == [(["alice"], ["30"]), ([], ["99"])]

    def test_repeated_member_within_context_matches_any(self, spark):
        # the reference's multimap can hold TWO values of one field in
        # one subgroup; matching is any-value (review r9)
        from datawave_spark.compiler import compile_query
        rows = [(1, [("NAME.P.0", "bob"), ("NAME.P.0", "click"),
                     ("OWNER.P.0", "3")]),
                (2, [("NAME.P.0", "bob"), ("OWNER.P.0", "3")])]
        df = spark.createDataFrame(
            rows, "id int, fields array<struct<name:string,value:string>>")
        df = group_structs(df, "fields", ["NAME", "OWNER"], "ITEMS")
        hits = compile_query(
            df, "grouping:matchesInGroup(NAME, 'click', OWNER, 3)")
        assert [r.id for r in hits.select("id").collect()] == [1]

    def test_matches_in_group_over_parsed_structs(self, spark):
        # end-to-end: flat grouped names → structs → grouping function
        from datawave_spark.compiler import compile_query
        rows = [
            (1, [("NAME.P.0", "click"), ("OWNER.P.0", "3")]),   # hit
            (2, [("NAME.P.0", "click"), ("OWNER.P.1", "3")]),   # split ctx
            (3, [("NAME.P.0", "view"), ("OWNER.P.0", "3")]),    # wrong name
        ]
        df = spark.createDataFrame(
            rows, "id int, fields array<struct<name:string,value:string>>")
        df = group_structs(df, "fields", ["NAME", "OWNER"], "ITEMS")
        hits = compile_query(
            df, "grouping:matchesInGroup(NAME, 'click', OWNER, 3)")
        assert [r.id for r in hits.select("id").collect()] == [1]

    def test_plan_is_shuffle_free(self, spark):
        rows = [(1, [("NAME.P.0", "x")])]
        df = spark.createDataFrame(
            rows, "id int, fields array<struct<name:string,value:string>>")
        plan = group_structs(df, "fields", ["NAME"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
