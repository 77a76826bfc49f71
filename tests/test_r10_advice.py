"""Round-10 advice fixes, each pinned by test:

1. LUCENE /regex/ terms unescape ONLY '\\/' (AccumuloSyntaxParser:464's
   discardEscapeChar with escape set {'/'}) — '\\d' survives as regex.
2. Single-quoted LUCENE function args use the restricted escape set
   {'(' ')' ',' '"' '\\'' '\\\\'} (AccumuloSyntaxParser:399).
3. grouping matchers regex-match numeric members against the
   NORMALIZED string form ('30', not '30.0').
4. geowave line predicates: an empty/None LINESTRING row is False for
   every op (no phantom (0,0) vertex).
5. planner._normalization_fails validates datetime literals
   driver-side (grammar port) — same verdicts as Spark try_cast.
6. '$ALIAS' identifiers model-expand like 'ALIAS'
   (JexlASTHelper.deconstructIdentifier before QueryModel expansion).
"""

import numpy as np
import pandas as pd
import pytest

from datawave_spark.compiler import compile_query
from datawave_spark.jexl.parser import parse as jexl
from datawave_spark.lucene.parser import parse_lucene


def uids(df):
    return sorted(r.uid for r in df.select("uid").collect())


class TestLuceneEscapes:
    def test_regex_term_keeps_class_escapes(self):
        # '\d' must reach the regex engine intact
        node = parse_lucene(r"FIELD:/C\d+/")
        assert node == jexl(r"FIELD =~ 'C\d+'")

    def test_regex_term_unescapes_slash_only(self):
        node = parse_lucene(r"FIELD:/a\/b\w/")
        assert node == jexl(r"FIELD =~ 'a/b\w'")

    def test_regex_term_double_backslash(self):
        # Java discardEscapeChar: '\\' emits one backslash and re-arms
        # the escape — '\\b' (literal-backslash + b) survives intact
        node = parse_lucene(r"FIELD:/a\\b/")
        assert node.value.value == "a\\\\b"

    def test_quoted_function_arg_keeps_regex_escapes(self, spark):
        df = spark.createDataFrame(
            [("a", "C12"), ("b", "Cd+"), ("c", "xyz")],
            "uid string, F string")
        out = compile_query(df, parse_lucene(r"uid:* AND #INCLUDE(F, 'C\d+')"))
        assert uids(out) == ["a"]

    def test_quoted_function_arg_unescapes_quote(self):
        node = parse_lucene(r"#INCLUDE(F, 'it\'s')")
        lit = node.args[-1]
        assert lit.value == "it's"


class TestGroupingNumericRegex:
    def test_regex_matches_normalized_numeric_form(self, spark):
        # stored 30.0 (double member) must match regex '3[0-9]' the way
        # the reference matches the normalized '30'
        df = spark.createDataFrame(
            [("a", [{"NAME": "bob", "AG": 30.0}]),
             ("b", [{"NAME": "bob", "AG": 45.0}]),
             ("c", [{"NAME": "ann", "AG": 31.0}])],
            "uid string, FAM array<struct<NAME string, AG double>>")
        q = "grouping:matchesInGroup(NAME, 'bob', AG, '3[0-9]')"
        assert uids(compile_query(df, q)) == ["a"]

    def test_regex_matches_parallel_numeric_array(self, spark):
        df = spark.createDataFrame(
            [("a", ["bob"], [30.0]), ("b", ["bob"], [45.0])],
            "uid string, NAME array<string>, AG array<double>")
        q = "grouping:matchesInGroup(NAME, 'bob', AG, '3[0-9]')"
        assert uids(compile_query(df, q)) == ["a"]


class TestEmptyLinestring:
    def test_empty_rows_false_every_op(self):
        from datawave_spark.functions._geowave_purepy import (
            line_rows_predicate, parse_wkt)
        ring = parse_wkt("POLYGON ((-1 -1, 1 -1, 1 1, -1 1, -1 -1))")[1]
        # (0,0) lies inside the query ring — the phantom-vertex trap
        rows = pd.Series([None, [], [0.0, 0.0, 0.5, 0.5]])
        for op in ("intersects", "within", "covered_by", "crosses",
                   "contains", "covers", "overlaps"):
            v = line_rows_predicate(rows, op, ring)
            assert not v[0] and not v[1], (op, v)
        # the real chain row still evaluates
        assert line_rows_predicate(rows, "intersects", ring)[2]
        assert line_rows_predicate(rows, "within", ring)[2]


class TestDatetimeParseableDriverSide:
    CASES = ["2024-01-05", "2024-1-5", "2024-01-05 10:11:12",
             "2024-01-05T10:11:12.123", "2024-01-05 10:11:12Z",
             "2024-01-05 10:11:12+05:30", "2024", "2024-02",
             "2024-02-30", "2024-13-01", "not-a-date", "2024-01-05 25:00",
             "2024-01-05 10:61", "20240105", "2024-01-05 10:11:12 UTC",
             "  2024-06-07 ", "2024-01-05 10:11:60"]

    def test_matches_spark_try_cast(self, spark):
        from pyspark.sql import functions as F
        from datawave_spark.plans.planner import _spark_datetime_parseable
        rows = spark.createDataFrame([(c,) for c in self.CASES], "s string") \
            .select("s", F.col("s").try_cast("timestamp").alias("ts")) \
            .collect()
        for r in rows:
            assert _spark_datetime_parseable(r.s) == (r.ts is not None), r.s


class TestDollarAliasModelExpansion:
    MODEL = {"AG": ["AGE", "ETA"]}

    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(
            [("a", 10.0, None), ("b", None, 30.0), ("c", None, None)],
            "uid string, AGE double, ETA double")

    def test_dollar_alias_eq(self, spark, df):
        plain = uids(compile_query(df, "AG == 30", model=self.MODEL))
        escaped = uids(compile_query(df, "$AG == 30", model=self.MODEL))
        assert plain == escaped == ["b"]

    def test_dollar_alias_method(self, spark, df):
        plain = uids(compile_query(df, "AG.min() > 5", model=self.MODEL))
        escaped = uids(compile_query(df, "$AG.min() > 5", model=self.MODEL))
        assert plain == escaped == ["a", "b"]
