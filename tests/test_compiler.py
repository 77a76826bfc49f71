"""AST→Column compiler tests over an in-memory multi-value event frame —
the analogue of the reference's functional query tests
(warehouse/query-core/src/test/java/datawave/query/testframework/
AbstractFunctionalQuery.java): tiny corpus, query, expected uid set.
"""

import pytest

from datawave_spark.compiler import compile_query

ROWS = [
    # uid, CITY (multi), STATE (multi), NUM (scalar), NAME, GEO "lat,lon"
    ("a", ["rome", "milan"], ["lazio"], 10.0, "Alice", "41.9,12.5"),
    ("b", ["rome"], ["lombardy"], 25.0, "Bob", "45.5,9.2"),
    ("c", ["paris"], ["idf"], 5.0, "Carol", "48.9,2.3"),
    ("d", [], None, None, "Ótto", "0.0,0.0"),
    ("e", ["london", "rome"], ["greater-london"], 25.0, None, "51.5,-0.1"),
]
SCHEMA = "uid string, CITY array<string>, STATE array<string>, NUM double, NAME string, GEO string"


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def uids(df):
    return sorted(r.uid for r in df.select("uid").collect())


def test_any_value_eq(spark, events):
    assert uids(compile_query(events, "CITY == 'rome'")) == ["a", "b", "e"]


def test_ne_means_no_value_matches(spark, events):
    # DatawaveArithmetic: A != 'x' ⇔ no value of A equals x; rows with
    # empty/missing CITY satisfy it.
    assert uids(compile_query(events, "CITY != 'rome'")) == ["c", "d"]


def test_scalar_numeric_range(spark, events):
    assert uids(compile_query(events, "NUM > 10 && NUM <= 25")) == ["b", "e"]


def test_and_or_not(spark, events):
    q = "(CITY == 'rome' && NUM > 20) || STATE == 'idf'"
    assert uids(compile_query(events, q)) == ["b", "c", "e"]
    assert uids(compile_query(events, "!(CITY == 'rome') && NUM == null")) == ["d"]


def test_regex_full_match(spark, events):
    # =~ is Java Pattern.matches → full match, so 'ro' matches nothing
    assert uids(compile_query(events, "CITY =~ 'ro'")) == []
    assert uids(compile_query(events, "CITY =~ 'ro.*'")) == ["a", "b", "e"]
    assert uids(compile_query(events, "CITY !~ 'ro.*'")) == ["c", "d"]


def test_numeric_regex(spark, events):
    # '=~' on a number-typed field: the regex pattern must NOT pass
    # through the numeric normalizer (float('25.*') raises and the term
    # would silently compile to constant False).
    assert uids(compile_query(events, "NUM =~ '25.*'",
                              field_types={"NUM": "number"})) == ["b", "e"]
    assert uids(compile_query(events, "NUM !~ '25.*'",
                              field_types={"NUM": "number"})) == ["a", "c", "d"]
    # same on an untyped (noop) numeric column
    assert uids(compile_query(events, "NUM =~ '25.*'")) == ["b", "e"]


def test_null_checks(spark, events):
    assert uids(compile_query(events, "NUM == null")) == ["d"]
    assert uids(compile_query(events, "CITY == null")) == ["d"]
    assert uids(compile_query(events, "!(NAME == null)")) == ["a", "b", "c", "d"]


def test_field_to_field(spark, events):
    df = spark.createDataFrame(
        [("x", 1.0, 1.0), ("y", 1.0, 2.0)], "uid string, A double, B double")
    assert uids(compile_query(df, "A == B")) == ["x"]
    assert uids(compile_query(df, "A != B")) == ["y"]


def test_normalizer_lc_no_diacritics(spark, events):
    df = compile_query(events, "NAME == 'otto'",
                       field_types={"NAME": "lcNoDiacritics"})
    assert uids(df) == ["d"]


def test_normalizer_geo_zorder(spark, events):
    # GeoType parity: a metadata-bound geo field normalizes "lat,lon"
    # to a z-order (geohash) string on both the literal and the column.
    df = compile_query(events, "GEO == '41.9,12.5'",
                       field_types={"GEO": "geo"})
    assert uids(df) == ["a"]
    from datawave_spark.normalizers import get_normalizer
    from datawave_spark.functions.geohash import geohash_py
    assert get_normalizer("geo").normalize_literal("41.9,12.5") == \
        geohash_py(41.9, 12.5, 8)


class TestListNormalizers:
    """OneToManyNormalizerType parity (BaseIngestHelper.java:722-737;
    ListType/LcNoDiacriticsListType/NumberListType): one raw delimited
    value → many normalized values, any-element match semantics."""

    ROWS = [
        ("a", "Rome; Café-Paris ,London", "3;14,6"),
        ("b", "BERLIN", "2"),
        ("c", "", None),
        ("d", "café-paris", "5;5"),
    ]
    SCHEMA = "uid string, TAGS string, NUMS string"

    @pytest.fixture(scope="class")
    def lists(self, spark):
        return spark.createDataFrame(self.ROWS, self.SCHEMA).cache()

    def test_eq_matches_any_element(self, spark, lists):
        df = compile_query(lists, "TAGS == 'CAFÉ-PARIS'",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["a", "d"]

    def test_ne_means_no_element_matches(self, spark, lists):
        df = compile_query(lists, "TAGS != 'rome'",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["b", "c", "d"]

    def test_regex_over_elements(self, spark, lists):
        df = compile_query(lists, "TAGS =~ 'lon.*'",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["a"]

    def test_number_list_range(self, spark, lists):
        df = compile_query(lists, "NUMS >= 6",
                           field_types={"NUMS": "numberList"})
        assert uids(df) == ["a"]

    def test_normalize_to_many_python_side(self):
        from datawave_spark.normalizers import get_normalizer
        n = get_normalizer("lcNoDiacriticsList")
        assert n.normalize_to_many("Rome; Café-Paris ,,London") == \
            ["rome", "cafe-paris", "london"]
        assert get_normalizer("numberList").normalize_to_many("3;14") \
            == [3.0, 14.0]

    def test_raw_array_column_fans_each_element(self, spark):
        # multi-raw-value case (BaseIngestHelper's per-value fan-out):
        # an ArrayType column of RAW delimited strings matches any
        # element of any fan-out — not a nested-array comparison
        rows = [("a", ["Rome;Café-Paris", "London"]),
                ("b", ["BERLIN"]), ("c", None), ("d", ["", ";;"])]
        df0 = spark.createDataFrame(rows, "uid string, TAGS array<string>")
        df = compile_query(df0, "TAGS == 'CAFÉ-PARIS'",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["a"]
        df = compile_query(df0, "TAGS != 'rome'",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["b", "c", "d"]
        df = compile_query(df0, "TAGS =~ 'lon.*'",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["a"]

    def test_null_means_empty_fanout(self, spark, lists):
        # raw '' fans out to zero elements — the same null semantics
        # the at-rest array form gives an empty array
        df = compile_query(lists, "TAGS == null",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["c"]
        df = compile_query(lists, "NUMS != null",
                           field_types={"NUMS": "numberList"})
        assert uids(df) == ["a", "b", "d"]

    def test_null_empty_fanout_raw_array(self, spark):
        rows = [("a", ["Rome"]), ("b", ["", ";,"]), ("c", None), ("d", [])]
        df0 = spark.createDataFrame(rows, "uid string, TAGS array<string>")
        df = compile_query(df0, "TAGS == null",
                           field_types={"TAGS": "lcNoDiacriticsList"})
        assert uids(df) == ["b", "c", "d"]

    def test_at_rest_array_column_round_trip(self, spark, lists):
        # ingest-side: norm.col writes the normalized ARRAY; query-side
        # the stored array takes the plain ArrayType any-value path
        from datawave_spark.normalizers import get_normalizer
        from pyspark.sql import functions as F
        n = get_normalizer("lcNoDiacriticsList")
        stored = lists.withColumn("TAGS", n.col(F.col("TAGS")))
        df = compile_query(stored, "TAGS == 'CAFÉ-PARIS'",
                           field_types={"TAGS": "lcNoDiacritics"},
                           at_rest={"TAGS"})
        assert uids(df) == ["a", "d"]


def test_anyfield_expansion(spark, events):
    # _ANYFIELD_ == 'rome' → OR over string-ish fields
    assert uids(compile_query(events, "_ANYFIELD_ == 'rome'")) == ["a", "b", "e"]
    assert uids(compile_query(events, "_ANYFIELD_ == 25")) == ["b", "e"]


def test_query_model_alias(spark, events):
    # QueryModelVisitor parity: LOCATION → CITY OR STATE
    df = compile_query(events, "LOCATION == 'idf'",
                       model={"LOCATION": ["CITY", "STATE"]})
    assert uids(df) == ["c"]


def test_unknown_field_is_false(spark, events):
    assert uids(compile_query(events, "NOPE == 'x'")) == []
    assert uids(compile_query(events, "NOPE != 'x'")) == ["a", "b", "c", "d", "e"]


class TestFilterFunctions:
    def test_is_null_not_null(self, spark, events):
        assert uids(compile_query(events, "filter:isNull(NUM)")) == ["d"]
        assert uids(compile_query(events, "filter:isNotNull(CITY)")) == ["a", "b", "c", "e"]

    def test_include_exclude_regex(self, spark, events):
        assert uids(compile_query(events, "filter:includeRegex(CITY, 'mil.*')")) == ["a"]
        assert uids(compile_query(events, "filter:excludeRegex(CITY, '.*o.*')")) == ["c", "d"]

    def test_occurrence(self, spark, events):
        assert uids(compile_query(events, "filter:occurrence(CITY, '>', 1)")) == ["a", "e"]
        assert uids(compile_query(events, "filter:occurrence(CITY, 2)")) == ["a", "e"]

    def test_matches_at_least_count_of(self, spark, events):
        q = "filter:matchesAtLeastCountOf(2, CITY, 'ROME', 'MILAN', 'OSLO')"
        assert uids(compile_query(events, q)) == ["a"]

    def test_occurrence_java_size_semantics(self, spark):
        """getSizeOf exactly: scalar (even NULL — getSizeOf(Object)
        returns 1 for any non-Iterable) is 1; a NULL array is the null
        Object → 1.  Mixed arrays follow the Java's sourcedFromEvent
        rule: when ANY non-null (event-sourced ValueTuple) elements
        exist, only THEY count — ['x', None, 'y'] is 2, not 3; only an
        all-null/empty array falls back to the total element count."""
        df = spark.createDataFrame(
            [("s_null", None, None),
             ("s_val", "x", None),
             ("a_null", None, None),
             ("a_two", None, ["x", "y"]),
             ("a_with_null", None, ["x", None, "y"]),
             ("a_all_null", None, [None, None]),
             ("a_empty", None, [])],
            "uid string, S string, A array<string>")
        assert uids(compile_query(df, "filter:occurrence(S, '==', 1)")) \
            == ["a_all_null", "a_empty", "a_null", "a_two",
                "a_with_null", "s_null", "s_val"]
        assert uids(compile_query(df, "filter:occurrence(A, '==', 1)")) \
            == ["a_null", "s_null", "s_val"]
        assert uids(compile_query(df, "filter:occurrence(A, '==', 2)")) \
            == ["a_all_null", "a_two", "a_with_null"]
        assert uids(compile_query(df, "filter:occurrence(A, '==', 3)")) \
            == []
        assert uids(compile_query(df, "filter:occurrence(A, '==', 0)")) \
            == ["a_empty"]

    def test_matches_at_least_dedups_first_matches(self, spark):
        """Two regexes whose FIRST match is the same value contribute
        ONE set element (the Java FunctionalSet accumulation); a later
        value matching the second regex is NOT consulted once the first
        value matched it."""
        df = spark.createDataFrame(
            [("one", ["rome", "milan"]), ("two", ["rome", "oslo"])],
            "uid string, CITY array<string>")
        # both patterns first-match 'rome' for row one? no: 'm.*'
        # first-matches 'milan'... use patterns that collide on rome
        q = "filter:matchesAtLeastCountOf(2, CITY, 'r.*', '.*ome')"
        assert uids(compile_query(df, q)) == []   # both first-match rome
        q2 = "filter:matchesAtLeastCountOf(2, CITY, 'r.*', 'm.*')"
        assert uids(compile_query(df, q2)) == ["one"]

    def test_jexl_regex_operator_java_pattern_flags(self, spark):
        """`=~` runs through DefaultArithmetic → JexlPatternCache in
        the reference: CASE_INSENSITIVE | DOTALL on every pattern, full
        match — 'CLICK' =~ 'cli.*' is true even on an un-normalized
        field, and '.' crosses newlines; `!~` is its exact negation."""
        df = spark.createDataFrame(
            [("ci", "CLICK"), ("nl", "a\nb"), ("no", "view")],
            "uid string, V string")
        assert uids(compile_query(df, "V =~ 'cli.*'")) == ["ci"]
        assert uids(compile_query(df, "V =~ 'a.b'")) == ["nl"]
        assert uids(compile_query(df, "V !~ 'cli.*'")) == ["nl", "no"]

    def test_multiline_flag_omission_pinned(self, spark):
        """Pinned divergence: JexlPatternCache compiles with MULTILINE
        too (JexlPatternCache.java:30), but (?m) is deliberately
        omitted from java_full_match — it would turn the full-match
        anchors into per-line anchors.  The one observable case is a
        USER-embedded ^/$ inside the pattern against a multi-line
        value: Java's 'a$.*' full-matches 'a\\nb' ($ line-anchors after
        'a', DOTALL .* eats the rest); this engine's $ stays
        end-of-input, so it does not match.  Single-line values agree
        in both engines (see DIVERGENCES.md)."""
        df = spark.createDataFrame(
            [("ml", "a\nb"), ("sl", "a")], "uid string, V string")
        # Java (MULTILINE): ["ml", "sl"]; ours: embedded $ stays global
        assert uids(compile_query(df, "V =~ 'a$.*'")) == ["sl"]

    def test_include_regex_java_pattern_flags(self, spark):
        """JexlPatternCache compiles with CASE_INSENSITIVE | DOTALL:
        'click' matches 'CLICK', and '.' crosses newlines."""
        df = spark.createDataFrame(
            [("ci", "CLICK"), ("nl", "a\nb"), ("no", "view")],
            "uid string, V string")
        assert uids(compile_query(df, "filter:includeRegex(V, 'cli.*')")) \
            == ["ci"]
        assert uids(compile_query(df, "filter:includeRegex(V, 'a.b')")) \
            == ["nl"]

    def test_between_and_length(self, spark, events):
        assert uids(compile_query(events, "f:between(NUM, 6, 25)")) == ["a", "b", "e"]
        assert uids(compile_query(events, "f:length(CITY, 6, 6)")) == ["e"]

    def test_between_inclusivity_flags(self, spark):
        """QueryFunctions.between 5-arg overload: explicit per-bound
        inclusivity booleans."""
        df = spark.createDataFrame(
            [("lo", 6.0), ("mid", 10.0), ("hi", 25.0)],
            "uid string, NUM double")
        assert uids(compile_query(
            df, "f:between(NUM, 6, false, 25, false)")) == ["mid"]
        assert uids(compile_query(
            df, "f:between(NUM, 6, true, 25, false)")) == ["lo", "mid"]
        assert uids(compile_query(
            df, "f:between(NUM, 6, false, 25, true)")) == ["hi", "mid"]

    def test_geo_bbox(self, spark, events):
        q = "geo:within_bounding_box(GEO, '40.0,8.0', '46.0,13.0')"
        assert uids(compile_query(events, q)) == ["a", "b"]

    def test_geo_circle(self, spark, events):
        q = "geo:within_circle(GEO, '41.9,12.5', 1.0)"
        assert uids(compile_query(events, q)) == ["a"]


class TestDates:
    @pytest.fixture(scope="class")
    def dated(self, spark):
        return spark.createDataFrame(
            [("a", "2024-01-15"), ("b", "2024-06-01"), ("c", "2025-01-01")],
            "uid string, WHEN string")

    def test_after_before_between(self, spark, dated):
        assert uids(compile_query(dated, "filter:afterDate(WHEN, '2024-05-01')")) == ["b", "c"]
        assert uids(compile_query(dated, "filter:beforeDate(WHEN, '2024-05-01')")) == ["a"]
        assert uids(compile_query(
            dated, "filter:betweenDates(WHEN, '2024-01-01', '2024-12-31')")) == ["a", "b"]

    def test_pattern_arg(self, spark):
        df = spark.createDataFrame([("a", "20240115"), ("b", "20250601")],
                                   "uid string, WHEN string")
        q = "filter:betweenDates(WHEN, '20240101', '20241231', 'yyyyMMdd')"
        assert uids(compile_query(df, q)) == ["a"]

    def test_granularity_bump_bounds(self, spark):
        """The Java bound arithmetic, exactly (r7 parity fix):
        afterDate bumps its start by the literal's granularity
        (getTime(start, true) — 'after 2024-05-01' = on/after May 2),
        beforeDate is strictly-< the un-bumped end (getTime(end) - 1),
        betweenDates spans the WHOLE end unit (getTime(end, true) - 1
        — the end day's 23:59:59.999 is in)."""
        df = spark.createDataFrame(
            [("in_start_day", "2024-05-01 10:00:00"),
             ("next_day", "2024-05-02 00:00:00"),
             ("end_day_pm", "2024-01-10 23:59:59"),
             ("end_next_mid", "2024-01-11 00:00:00"),
             ("before_edge", "2024-04-30 23:59:59"),
             ("at_end_mid", "2024-05-01 00:00:00")],
            "uid string, WHEN string")
        assert uids(compile_query(
            df, "filter:afterDate(WHEN, '2024-05-01')")) == ["next_day"]
        assert uids(compile_query(
            df, "filter:beforeDate(WHEN, '2024-05-01')")) == \
            ["before_edge", "end_day_pm", "end_next_mid"]
        assert uids(compile_query(
            df, "filter:betweenDates(WHEN, '2024-01-05', '2024-01-10')")) \
            == ["end_day_pm"]
        # month-granularity literal bumps by a MONTH: the whole of
        # April is in (April 30 23:59:59 < May 1), May 1+ is out
        assert uids(compile_query(
            df, "filter:betweenDates(WHEN, '2024-January', '2024-April')")) \
            == ["before_edge", "end_day_pm", "end_next_mid"]


class TestGroupingContext:
    @pytest.fixture(scope="class")
    def grouped(self, spark):
        # One struct per sibling group — the representation DataWave
        # emulates with FIELD.context.instance flat names.
        return spark.createDataFrame(
            [("a", [{"NAME": "bob", "AGE": "40"}, {"NAME": "ann", "AGE": "9"}]),
             ("b", [{"NAME": "bob", "AGE": "9"}]),
             ("c", [{"NAME": "zed", "AGE": "40"}])],
            "uid string, FAMILY array<struct<NAME string, AGE string>>")

    def test_matches_in_group(self, spark, grouped):
        q = "grouping:matchesInGroup(NAME, 'bob', AGE, '40')"
        assert uids(compile_query(grouped, q)) == ["a"]

    def test_cross_group_would_differ(self, spark, grouped):
        # plain AND matches across groups — 'b' has bob and (age 9);
        # grouping respects siblinghood
        q = "NAME == 'bob' && AGE == '9'"
        plain = compile_query(grouped.selectExpr(
            "uid", "transform(FAMILY, g -> g.NAME) as NAME",
            "transform(FAMILY, g -> g.AGE) as AGE"), q)
        assert uids(plain) == ["a", "b"]
        grouped_q = "grouping:matchesInGroup(NAME, 'bob', AGE, '9')"
        assert uids(compile_query(grouped, grouped_q)) == ["b"]

    def test_atom_values_match(self, spark):
        df = spark.createDataFrame(
            [("a", [{"X": "1", "Y": "1"}]), ("b", [{"X": "1", "Y": "2"}])],
            "uid string, G array<struct<X string, Y string>>")
        assert uids(compile_query(df, "grouping:atomValuesMatch(X, Y)")) == ["a"]

    def test_group_values_are_regexes(self, spark, grouped):
        """The reference matches each value arg through includeRegex
        (JexlPatternCache CI/DOTALL full match), so wildcards and case
        differences work — and metacharacters are live."""
        q = "grouping:matchesInGroup(NAME, 'B.*', AGE, '4.')"
        assert uids(compile_query(grouped, q)) == ["a"]   # bob/40, CI 'B'
        q2 = "grouping:matchesInGroup(NAME, 'z..', AGE, '40')"
        assert uids(compile_query(grouped, q2)) == ["c"]

    def test_get_groups_for_matches_predicate(self, spark, grouped):
        # collection form is truthy iff non-empty → same rows as
        # matchesInGroup in a predicate position
        q = "grouping:getGroupsForMatchesInGroup(NAME, 'bob', AGE, '40')"
        assert uids(compile_query(grouped, q)) == ["a"]

    def test_matching_group_indices_value_form(self, spark, grouped):
        from datawave_spark.functions.grouping import matching_group_indices
        out = matching_group_indices(grouped, [("NAME", "bob"), ("AGE", "40")])
        got = {r.uid: r.matching_groups for r in out.collect()}
        assert got == {"a": [0], "b": [], "c": []}

    def test_matching_group_indices_multiple(self, spark):
        from datawave_spark.functions.grouping import matching_group_indices
        df = spark.createDataFrame(
            [("a", [{"N": "x"}, {"N": "y"}, {"N": "x"}]), ("b", [])],
            "uid string, G array<struct<N string>>")
        out = matching_group_indices(df, [("N", "x")])
        got = {r.uid: r.matching_groups for r in out.collect()}
        assert got == {"a": [0, 2], "b": []}


class TestMoreFilterFunctions:
    def test_get_all_matches(self, spark, events):
        q = "filter:getAllMatches(CITY, 'ro.*')"
        assert uids(compile_query(events, q)) == ["a", "b", "e"]

    def test_time_function(self, spark):
        df = spark.createDataFrame(
            [("a", "2024-01-02 00:00:00", "2024-01-01 00:00:00"),
             ("b", "2024-01-01 00:30:00", "2024-01-01 00:00:00")],
            "uid string, END string, START string")
        q = "filter:timeFunction(END, START, '-', '>', 3600000)"
        assert uids(compile_query(df, q)) == ["a"]


class TestGroupingContextGroupBy:
    def test_group_by_context_tuples(self, spark):
        from datawave_spark.operators.grouping import group_by_context
        df = spark.createDataFrame(
            [("a", [{"NAME": "bob", "AGE": "40"}, {"NAME": "ann", "AGE": "9"}]),
             ("b", [{"NAME": "bob", "AGE": "40"}]),
             ("c", [{"NAME": "bob", "AGE": "9"}])],
            "uid string, FAM array<struct<NAME string, AGE string>>")
        out = group_by_context(df, "FAM", ["NAME", "AGE"],
                               [("AVERAGE", "AGE", "avg_age")])
        rows = {(r.NAME, r.AGE): r.record_count for r in out.collect()}
        # (bob, 40) pairs only from the SAME sibling group: docs a+b
        assert rows[("bob", "40")] == 2
        assert rows[("bob", "9")] == 1
        assert rows[("ann", "9")] == 1


class TestReverseIndex:
    def test_suffix_lookup(self, spark):
        from datawave_spark.sources.index_frame import (
            build_index, build_reverse_index, suffix_uids)
        df = spark.createDataFrame(
            [("a", "anderson"), ("b", "johnson"), ("c", "smith")],
            "uid string, NAME string")
        idx = build_index(df, ["NAME"], "uid")
        ridx = build_reverse_index(idx)
        got = sorted(r.uid for r in suffix_uids(ridx, "NAME", "son").collect())
        assert got == ["a", "b"]


class TestGeoWave:
    @pytest.fixture(scope="class")
    def points(self, spark):
        return spark.createDataFrame(
            [("a", "41.9,12.5"), ("b", "48.9,2.3"), ("c", "35.7,139.7"),
             ("d", "0.5,0.5"), ("e", None)],
            "uid string, GEO string")

    def test_intersects_polygon(self, spark, points):
        # box around western europe (WKT is lon lat order)
        q = "geowave:intersects(GEO, 'POLYGON((0 35, 15 35, 15 55, 0 55, 0 35))')"
        assert uids(compile_query(points, q)) == ["a", "b"]

    def test_within_triangle(self, spark, points):
        q = "geowave:within(GEO, 'POLYGON((0 0, 2 0, 0 2, 0 0))')"
        assert uids(compile_query(points, q)) == ["d"]

    def test_point_equality(self, spark, points):
        q = "geowave:intersects(GEO, 'POINT(12.5 41.9)')"
        assert uids(compile_query(points, q)) == ["a"]

    def test_crosses_always_false_for_points(self, spark, points):
        q = "geowave:crosses(GEO, 'POLYGON((0 0, 2 0, 0 2, 0 0))')"
        assert uids(compile_query(points, q)) == []


class TestArithmeticCompile:
    def test_arith_cmp_matches_sql(self, spark):
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            [(1, 10.0, 3), (2, 40.0, 100), (3, None, 5), (4, 25.0, None)],
            "id long, v double, u long")
        out = compile_query(df, "V * 2 + U > 50")
        assert sorted(r.id for r in out.collect()) == [2]
        # != is total: NULL operands satisfy the inequality
        out2 = compile_query(df, "V * 2 != 20.0")
        assert sorted(r.id for r in out2.collect()) == [2, 3, 4]
        out3 = compile_query(df, "!(V * 2 != 20.0)")
        assert sorted(r.id for r in out3.collect()) == [1]

    def test_field_both_sides(self, spark):
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame([(1, 10.0, 3), (2, 4.0, 100)],
                                   "id long, v double, u long")
        out = compile_query(df, "V > U - 90")
        assert sorted(r.id for r in out.collect()) == [1]

    def test_array_field_rejected(self, spark):
        import pytest
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
        with pytest.raises(Exception, match="multi-valued"):
            compile_query(df, "V * 2 > 3").collect()


class TestCompareFunction:
    """filter:compare — the reference's field-vs-field set comparison
    (EvaluationPhaseFilterFunctions.compareFields), all operators x
    ANY/ALL, including the empty-set edge cases the Java switch
    fall-through produces."""

    def _run(self, spark, rows, query):
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            rows, "id long, a array<double>, b array<double>")
        return sorted(r.id for r in compile_query(df, query).collect())

    ROWS = [
        (1, [1.0, 5.0], [3.0, 4.0]),   # overlap range
        (2, [1.0, 2.0], [3.0, 4.0]),   # strictly below
        (3, [9.0],      [3.0, 4.0]),   # strictly above
        (4, [3.0, 4.0], [3.0, 4.0]),   # equal sets
        (5, [3.0],      [3.0, 9.0]),   # intersecting, not equal
        (6, [],         []),           # both empty
        (7, [1.0],      []),           # one empty
    ]

    def test_eq_any_is_intersection(self, spark):
        got = self._run(spark, self.ROWS, "filter:compare(A, '==', 'ANY', B)")
        assert got == [4, 5, 6]        # both-empty -> true (reference)

    def test_eq_all_is_set_equality(self, spark):
        got = self._run(spark, self.ROWS, "filter:compare(A, '==', 'ALL', B)")
        assert got == [4, 6]

    def test_ne_any_is_not_set_equal(self, spark):
        got = self._run(spark, self.ROWS, "filter:compare(A, '!=', 'ANY', B)")
        assert got == [1, 2, 3, 5, 7]  # both-empty -> false

    def test_ne_all_is_disjoint(self, spark):
        got = self._run(spark, self.ROWS, "filter:compare(A, '!=', 'ALL', B)")
        assert got == [1, 2, 3, 7]

    def test_lt_any_min_vs_max(self, spark):
        # ANY '<': min(a) < max(b); empty sets -> false (Java fallthrough)
        got = self._run(spark, self.ROWS, "filter:compare(A, '<', 'ANY', B)")
        assert got == [1, 2, 4, 5]

    def test_lt_all_max_vs_min(self, spark):
        # ALL '<': max(a) < min(b)
        got = self._run(spark, self.ROWS, "filter:compare(A, '<', 'ALL', B)")
        assert got == [2]

    def test_ge_all(self, spark):
        # ALL '>=': min(a) >= max(b) — the reference's bound-based ALL
        # is stricter than pairwise intuition: the equal sets of row 4
        # FAIL it (min 3 >= max 4 is false), exactly as compareFields does
        got = self._run(spark, self.ROWS, "filter:compare(A, '>=', 'ALL', B)")
        assert got == [3]

    def test_string_fields_compare_lowercased(self, spark):
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            [(1, "Click", "CLICK"), (2, "view", "click")],
            "id long, a string, b string")
        got = sorted(r.id for r in compile_query(
            df, "filter:compare(A, '==', 'ANY', B)").collect())
        assert got == [1]

    def test_mixed_numeric_string_compare_raises(self, spark):
        # Documented divergence: the reference lexicographically
        # compares heterogeneous per-field encodings (external
        # NumericalEncoder) — unreproducible byte-for-byte, so we
        # refuse instead of silently comparing '10' < '9' as strings.
        import pytest
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            [(1, 10.0, "9")], "id long, a double, b string")
        with pytest.raises(ValueError, match="mixed numeric/string"):
            compile_query(df, "filter:compare(A, '<', 'ANY', B)").collect()


class TestPeriodAndTimeFunctions:
    def test_match_left_of_period_peels_field_name(self, spark):
        from datawave_spark.functions.filter_functions import (
            match_left_of_period)
        from pyspark.sql import functions as F
        df = spark.createDataFrame(
            [("FIELD.a.b.c",), ("FIELD.a",), ("bare",)], "v string")
        got = [tuple(r) for r in df.select(
            match_left_of_period(F.col("v"), 0).alias("p0"),
            match_left_of_period(F.col("v"), 1).alias("p1")).collect()]
        # 'FIELD.a.b.c' peels to 'a.b.c': pos 0 -> 'a.b', pos 1 -> 'a'
        assert got[0] == ("a.b", "a")
        # 'FIELD.a' peels to 'a': zero periods left -> NULL (reference
        # returns null on insufficient grouping info)
        assert got[1] == (None, None)
        assert got[2] == (None, None)

    def test_match_right_of_period_no_peel(self, spark):
        from datawave_spark.functions.filter_functions import (
            match_right_of_period)
        from pyspark.sql import functions as F
        df = spark.createDataFrame([("FIELD.a.b.c",), ("x",)], "v string")
        got = [tuple(r) for r in df.select(
            match_right_of_period(F.col("v"), 0).alias("p0"),
            match_right_of_period(F.col("v"), 1).alias("p1"),
            match_right_of_period(F.col("v"), 3).alias("p3")).collect()]
        assert got[0] == ("c", "b.c", None)   # only 3 periods -> pos 3 NULL
        assert got[1] == (None, None, None)

    def test_get_time_and_next_time(self, spark):
        from datawave_spark.functions.filter_functions import (
            value_next_time_millis, value_time_millis)
        from pyspark.sql import functions as F
        df = spark.createDataFrame([("2024-01-15 00:00:00",)], "v string")
        row = df.select(
            value_time_millis(F.col("v")).alias("t"),
            value_next_time_millis(F.col("v"), "DAY").alias("nd"),
            value_next_time_millis(F.col("v"), "HOUR").alias("nh")).head()
        assert row.nd - row.t == 86_400_000
        assert row.nh - row.t == 3_600_000

    def test_value_functions_usable_in_query_comparisons(self, spark):
        """Value-returning functions are REACHABLE from query strings:
        ``filter:getTime(F) > lit`` parses and compiles (funcall opens a
        comparison; FuncNode operands compile through the arithmetic
        path) — review r6 found registration without reachability."""
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            [(1, "2024-01-15 00:00:00", "F.a.b"),
             (2, "2023-01-15 00:00:00", "F.a"),
             (3, None, None)],
            "id long, ts string, g string")
        got = sorted(r.id for r in compile_query(
            df, "filter:getTime(TS) > 1704067200000").collect())
        assert got == [1]        # 2024 only; NULL field never throws
        got = sorted(r.id for r in compile_query(
            df, "filter:getMatchToRightOfPeriod(G, 0) == 'b'").collect())
        assert got == [1]
        got = sorted(r.id for r in compile_query(
            df, "filter:getNextTime(TS, 'DAY') > filter:getTime(TS)"
        ).collect())
        assert got == [1, 2]     # function-vs-function comparison

    def test_empty_field_is_nonmatch_not_error(self, spark):
        """ANSI mode: element access over an empty value set must be
        NULL (non-match), never INVALID_ARRAY_INDEX (review r6)."""
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame([(1, None)], "id long, ts string")
        assert compile_query(df, "filter:getTime(TS) > 0").count() == 0

    def test_compare_ignores_null_array_elements(self, spark):
        """NULL elements are absence, not values: Spark's array set ops
        match NULL to NULL, which would fake an intersection between
        genuinely disjoint sets (review r6)."""
        from datawave_spark.compiler import compile_query
        df = spark.createDataFrame(
            [(1, [None, 3.0], [None, 5.0])],
            "id long, a array<double>, b array<double>")
        assert compile_query(
            df, "filter:compare(A, '==', 'ANY', B)").count() == 0
        assert compile_query(
            df, "filter:compare(A, '!=', 'ALL', B)").count() == 1
