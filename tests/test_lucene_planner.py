"""LUCENE front-end + rewrite passes + planner lifecycle tests —
modeled on the reference's LuceneQueryTest / QueryPlanTest /
visitor-level tests."""

import pytest

from datawave_spark.compiler.rewrite import (
    ThresholdExceeded, count_terms, dedup_terms, default_pipeline, depth,
    extract_options, flatten, prune, rewrite_negations, validate_thresholds,
)
from datawave_spark.jexl.ast import (
    AndNode, CmpNode, FuncNode, Identifier, Literal, NotNode, OrNode,
)
from datawave_spark.jexl.parser import parse as jexl
from datawave_spark.lucene.parser import parse_lucene
from datawave_spark.plans import QueryPlanner


class TestLucene:
    def test_fielded_term(self):
        assert parse_lucene("CITY:rome") == jexl("CITY == 'rome'")

    def test_implicit_and_and_or(self):
        assert parse_lucene("CITY:rome STATE:lazio") == jexl(
            "CITY == 'rome' && STATE == 'lazio'")
        assert parse_lucene("CITY:rome OR CITY:paris") == jexl(
            "CITY == 'rome' || CITY == 'paris'")

    def test_not_and_parens(self):
        assert parse_lucene("(CITY:rome OR CITY:milan) AND NOT NUM:5") == \
            jexl("(CITY == 'rome' || CITY == 'milan') && !(NUM == '5')")

    def test_wildcards(self):
        assert parse_lucene("CITY:ro*") == jexl("CITY =~ 'ro.*'")
        assert parse_lucene("CITY:r?me") == jexl("CITY =~ 'r.me'")

    def test_range_terms(self):
        # r8: LUCENE ranges are BOUNDED (LuceneToJexlQueryParser emits
        # the _Bounded_ marker) — same-value semantics via RangeNode
        assert parse_lucene("NUM:[5 TO 10]") == \
            jexl("((_Bounded_ = true) && (NUM >= '5' && NUM <= '10'))")
        assert parse_lucene("NUM:{5 TO 10}") == \
            jexl("((_Bounded_ = true) && (NUM > '5' && NUM < '10'))")

    def test_unfielded(self):
        assert parse_lucene("rome") == jexl("_ANYFIELD_ == 'rome'")

    def test_phrase(self):
        node = parse_lucene('TEXT:"hello world"')
        assert node == FuncNode("content", "phrase",
                                (Identifier("TEXT"), Literal("hello"),
                                 Literal("world")))

    def test_hash_include(self):
        node = parse_lucene("CITY:rome AND #INCLUDE(STATE, laz.*)")
        assert isinstance(node, AndNode)
        assert node.terms[1] == FuncNode("filter", "includeRegex",
                                         (Identifier("STATE"),
                                          Literal("laz.*")))

    def test_hash_include_multi_pair_combiners(self):
        # AbstractEvaluationPhaseFunction.java:22-91: leading OR/AND
        # word, then (field, value) pairs; bare pairs combine with AND.
        node = parse_lucene("#INCLUDE(OR, CITY, ro.*, STATE, laz.*)")
        assert isinstance(node, OrNode)
        assert node.terms == (
            FuncNode("filter", "includeRegex",
                     (Identifier("CITY"), Literal("ro.*"))),
            FuncNode("filter", "includeRegex",
                     (Identifier("STATE"), Literal("laz.*"))))
        node2 = parse_lucene("#INCLUDE(CITY, ro.*, STATE, laz.*)")
        assert isinstance(node2, AndNode)
        node3 = parse_lucene("#INCLUDE(rome)")
        assert node3 == FuncNode("filter", "includeRegex",
                                 (Identifier("_ANYFIELD_"),
                                  Literal("rome")))

    def test_hash_isnotnull(self):
        assert parse_lucene("#ISNOTNULL(CITY)") == FuncNode(
            "filter", "isNotNull", (Identifier("CITY"),))

    def test_hash_groupby_unique(self):
        node = parse_lucene("CITY:rome #GROUPBY(STATE) #SUM(NUM)")
        assert node.terms[1] == FuncNode("f", "groupby", (Identifier("STATE"),))
        node2 = parse_lucene("CITY:rome #UNIQUE(UID[DAY])")
        assert node2.terms[1] == FuncNode("f", "unique", (Identifier("UID[DAY]"),))
        node3 = parse_lucene("CITY:rome #UNIQUE_BY_DAY(UID)")
        assert node3.terms[1] == FuncNode("f", "unique", (Identifier("UID[DAY]"),))

    def test_hash_jexl_passthrough(self):
        assert parse_lucene('#JEXL("A == \'1\'")') == jexl("A == '1'")

    def test_hash_date_loaded(self):
        # DateFunction.java:52-71 / Loaded.java:55-73 translations
        assert parse_lucene("#DATE(TS, after, '2024-01-01')") == FuncNode(
            "filter", "afterDate", (Identifier("TS"), Literal("2024-01-01")))
        assert parse_lucene("#DATE(TS, '2024-01-01', '2024-02-01')") == \
            FuncNode("filter", "betweenDates",
                     (Identifier("TS"), Literal("2024-01-01"),
                      Literal("2024-02-01")))
        assert parse_lucene("#LOADED(before, '2024-01-01')") == FuncNode(
            "filter", "beforeLoadDate",
            (Identifier("LOAD_DATE"), Literal("2024-01-01")))

    def test_hash_matches_and_get_all(self):
        assert parse_lucene('#MATCHES(PROPS, "x.*")') == FuncNode(
            "f", "matchRegex", (Identifier("PROPS"), Literal("x.*")))
        node = parse_lucene('#GET_ALL_MATCHES(NAME, "a.*", TYPE, "b.*")')
        assert isinstance(node, AndNode) and len(node.terms) == 2
        assert node.terms[0] == FuncNode(
            "filter", "getAllMatches", (Identifier("NAME"), Literal("a.*")))

    def test_hash_evaluation_only_unwraps(self):
        # EvaluationOnly.java wraps in ((_Eval_ = true) && ...) — the
        # marker is a planner no-op here, the subquery remains.
        assert parse_lucene('#EVALUATION_ONLY("CITY:rome")') == \
            jexl("CITY == 'rome'")

    def test_hash_options_extraction(self):
        node = parse_lucene(
            'CITY:rome #OPTIONS("limit.fields", "NAME=2", "hit.list", "true")')
        _, opts = extract_options(node)
        assert opts.limit_fields == {"NAME": 2}
        assert opts.extra == {"hit.list": "true"}

    def test_hash_geo_and_geowave(self):
        assert parse_lucene('#GEO(bounding_box, PT, "-10_-10", "10_10")') == \
            FuncNode("geo", "within_bounding_box",
                     (Identifier("PT"), Literal("-10_-10"), Literal("10_10")))
        assert parse_lucene(
            '#INTERSECTS(GEOM, "POLYGON((0 0, 1 0, 1 1, 0 0))")') == \
            FuncNode("geowave", "intersects",
                     (Identifier("GEOM"),
                      Literal("POLYGON((0 0, 1 0, 1 1, 0 0))")))

    def test_hash_unique_by_tenth_of_hour(self):
        node = parse_lucene("CITY:rome #UNIQUE_BY_TENTH_OF_HOUR(TS)")
        assert node.terms[1] == FuncNode(
            "f", "unique", (Identifier("TS[TENTH_OF_HOUR]"),))

    def test_hash_atom_values_match(self):
        assert parse_lucene("#ATOM_VALUES_MATCH(NAME, ALIAS)") == FuncNode(
            "grouping", "atomValuesMatch",
            (Identifier("NAME"), Identifier("ALIAS")))


class TestRewrites:
    def test_flatten(self):
        n = jexl("A == '1' && (B == '2' && (C == '3' && D == '4'))")
        f = flatten(n)
        assert isinstance(f, AndNode) and len(f.terms) == 4

    def test_dedup(self):
        n = flatten(jexl("A == '1' && A == '1' && B == '2'"))
        assert len(dedup_terms(n).terms) == 2

    def test_rewrite_negations(self):
        assert rewrite_negations(jexl("A != '1'")) == NotNode(jexl("A == '1'"))

    def test_prune(self):
        n = AndNode((Literal(True), jexl("A == '1'")))
        assert prune(n) == jexl("A == '1'")
        assert prune(OrNode((Literal(True), jexl("A == '1'")))) == Literal(True)
        assert prune(NotNode(Literal(False))) == Literal(True)

    def test_extract_options(self):
        node = default_pipeline(parse_lucene(
            "CITY:rome #GROUPBY(STATE) #SUM(NUM) #UNIQUE(UID[HOUR]) #LIMIT_FIELDS(CITY=2)"))
        rest, opts = extract_options(node)
        assert rest == jexl("CITY == 'rome'")
        assert opts.groupby == ["STATE"]
        assert opts.aggregations == [("SUM", "NUM")]
        assert opts.unique == {"UID": "HOUR"}
        assert opts.limit_fields == {"CITY": 2}

    def test_thresholds(self):
        n = jexl(" && ".join(f"F{i} == '{i}'" for i in range(10)))
        assert count_terms(n) == 10
        assert depth(n) >= 2
        with pytest.raises(ThresholdExceeded):
            validate_thresholds(n, max_terms=5)


class TestPlanner:
    @pytest.fixture(scope="class")
    def events(self, spark):
        rows = [
            ("a", ["rome", "milan"], 10.0, "2024-01-01 10:00:00"),
            ("b", ["rome"], 25.0, "2024-01-01 11:00:00"),
            ("c", ["paris"], 5.0, "2024-01-02 09:00:00"),
            ("d", ["rome"], 30.0, "2024-01-02 09:30:00"),
        ]
        df = spark.createDataFrame(
            rows, "uid string, CITY array<string>, NUM double, TS string")
        from pyspark.sql import functions as F
        return df.withColumn("TS", F.to_timestamp("TS")).cache()

    def test_lucene_end_to_end(self, events):
        qp = QueryPlanner(events)
        res = qp.plan("CITY:rome AND NUM:[10 TO 30]", syntax="LUCENE")
        assert sorted(r.uid for r in res.df.collect()) == ["a", "b", "d"]
        assert "CITY == 'rome'" in res.plan_string

    def test_groupby_option(self, events):
        qp = QueryPlanner(events)
        res = qp.plan("CITY:rome #GROUPBY(CITY) #SUM(NUM)", syntax="LUCENE")
        rows = {r.CITY: r for r in res.df.collect()}
        assert rows["rome"].record_count == 3
        assert rows["rome"].sum_num == 65.0
        assert rows["milan"].record_count == 1

    def test_unique_option(self, events):
        qp = QueryPlanner(events)
        res = qp.plan("CITY:rome #UNIQUE(TS[DAY])", syntax="LUCENE")
        assert res.df.count() == 2  # two distinct days

    def test_limit_fields(self, events):
        qp = QueryPlanner(events)
        res = qp.plan("CITY:rome #LIMIT_FIELDS(CITY=1)", syntax="LUCENE")
        row = [r for r in res.df.collect() if r.uid == "a"][0]
        assert row.CITY == ["rome"] and row.CITY_count == 2

    def test_pages(self, events):
        qp = QueryPlanner(events)
        res = qp.plan("NUM > 0", syntax="JEXL")
        pages = list(res.pages(page_size=3))
        assert [len(p) for p in pages] == [3, 1]

    def test_plan_string_stability(self, events):
        qp = QueryPlanner(events)
        res = qp.plan("(CITY:rome AND (CITY:rome AND NUM:5))", syntax="LUCENE")
        # flatten + dedup applied
        assert res.plan_string == "(CITY == 'rome' && NUM == '5')"

    def test_pluggable_rewrite_rule(self, events):
        # applyRules hook (DefaultQueryPlanner.java:2174): a custom
        # AST->AST rule runs after the default pipeline and its effect
        # shows in the plan string — a deployment rule mapping the
        # legacy POP field onto the stored NUM column
        from datawave_spark.jexl import (AndNode, CmpNode, Identifier,
                                         NotNode, OrNode)

        def walk(node):
            if isinstance(node, CmpNode) and node.field.name == "POP":
                return CmpNode(node.op, Identifier("NUM"), node.value)
            if isinstance(node, (AndNode, OrNode)):
                return type(node)(tuple(walk(t) for t in node.terms))
            if isinstance(node, NotNode):
                return NotNode(walk(node.term))
            return node

        qp = QueryPlanner(events, rules=[walk])
        res = qp.plan("POP == 5", syntax="JEXL")
        assert "NUM == 5" in res.plan_string
        want = QueryPlanner(events).plan("NUM == 5").df.count()
        assert res.df.count() == want

    


class TestExcerptOption:
    def test_excerpt_fields_through_planner(self, spark):
        from datawave_spark.plans import QueryPlanner
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "no relevant animals here at all")],
            "doc_id long, BODY string")
        qp = QueryPlanner(df)
        res = qp.plan('BODY:"brown fox" #EXCERPT_FIELDS(BODY)',
                      syntax="LUCENE")
        rows = res.df.collect()
        assert [r.doc_id for r in rows] == [1]
        ex_cols = [c for c in res.df.columns if "excerpt" in c]
        assert ex_cols, "excerpt columns attached"
        first = rows[0][ex_cols[0]]
        assert any("brown" in e for e in first)


class TestReverseModel:
    def test_result_columns_renamed_to_alias(self, spark):
        # QueryModelVisitor reverse mapping (DefaultQueryPlanner.java:
        # 1342): results come back in the alias vocabulary the user
        # queried in; multi-member aliases get _2 suffixes (DataFrame
        # columns must be unique where the reference's attribute bag
        # holds duplicates under one name)
        df = spark.createDataFrame(
            [("a", "rome", "lazio"), ("b", "oslo", "ostlandet")],
            "uid string, CITY string, STATE string")
        qp = QueryPlanner(df, model={"LOCATION": ["CITY", "STATE"]})
        res = qp.plan("LOCATION == 'rome'")
        assert res.df.columns == ["uid", "LOCATION", "LOCATION_2"]
        assert [r.uid for r in res.df.collect()] == ["a"]
        # the alias expands to concrete fields inside the compiled
        # Catalyst predicate (the physical columns are what's filtered)
        assert "CITY" in res.spark_plan()

    def test_unmodeled_columns_untouched(self, spark):
        df = spark.createDataFrame(
            [("a", "rome", 7)], "uid string, CITY string, NUM long")
        qp = QueryPlanner(df, model={"LOCATION": ["CITY"]})
        res = qp.plan("LOCATION == 'rome'")
        assert res.df.columns == ["uid", "LOCATION", "NUM"]


class TestNoExpansion:
    def test_noexpansion_skips_model(self, spark):
        df = spark.createDataFrame(
            [("a", "rome", "lazio")], "uid string, CITY string, STATE string")
        qp = QueryPlanner(df, model={"LOCATION": ["CITY", "STATE"]})
        # with expansion: LOCATION:lazio matches via STATE
        assert [r.uid for r in qp.plan("LOCATION:lazio", syntax="LUCENE")
                .df.collect()] == ["a"]
        # with #NOEXPANSION(LOCATION): alias unresolved → no match
        res = qp.plan("LOCATION:lazio #NOEXPANSION(LOCATION)", syntax="LUCENE")
        assert res.df.count() == 0
        assert res.options.noexpansion == ["LOCATION"]


class TestWhindex:
    def test_value_specific_remap(self):
        from datawave_spark.compiler.rewrite import whindex
        node = jexl("GEO_FIELD == 'landmark1' && OTHER == 'x'")
        out = whindex(node, {("GEO_FIELD", "landmark1"): "GEO_LANDMARKS"})
        assert out == jexl("GEO_LANDMARKS == 'landmark1' && OTHER == 'x'")
        # non-configured values untouched
        node2 = jexl("GEO_FIELD == 'other_value'")
        assert whindex(node2, {("GEO_FIELD", "landmark1"): "X"}) == node2


class TestComposite:
    def test_expand_and_query(self, spark):
        from datawave_spark.compiler.rewrite import expand_composites
        from datawave_spark.compiler.columns import (CompileContext,
                                                     compile_node)
        from datawave_spark.sources.ingest import composite_column
        import datawave_spark.functions  # noqa: F401
        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "x")],
            "id long, F1 string, F2 string")
        df = composite_column(df, ["F1", "F2"], "F1_F2")
        node = jexl("F1 == 'a' && F2 == 'x'")
        rewritten = expand_composites(node, {("F1", "F2"): "F1_F2"})
        assert str(rewritten) == "F1_F2 == 'a\x00x'"
        ctx = CompileContext.for_dataframe(df)
        got = [r.id for r in df.filter(compile_node(rewritten, ctx)).collect()]
        assert got == [1]

    def test_partial_match_untouched(self):
        from datawave_spark.compiler.rewrite import expand_composites
        node = jexl("F1 == 'a' && F3 == 'z'")
        assert expand_composites(node, {("F1", "F2"): "C"}) == node

    def test_duplicate_member_field_not_collapsed(self):
        # A member field appearing twice in the AND must keep all
        # original terms (collapsing on the last value would rewrite an
        # unsatisfiable/multi-match conjunction into a wrong composite).
        from datawave_spark.compiler.rewrite import expand_composites
        node = jexl("F1 == 'a' && F1 == 'b' && F2 == 'x'")
        assert expand_composites(node, {("F1", "F2"): "C"}) == node

    def test_array_member_field_not_collapsed(self):
        # composite_column concatenates a cast array — it can never
        # equal the joined scalar parts, so array members opt out.
        from datawave_spark.compiler.rewrite import expand_composites
        node = jexl("F1 == 'a' && F2 == 'x'")
        assert expand_composites(node, {("F1", "F2"): "C"},
                                 array_fields={"F1"}) == node

    def test_planner_wires_composites_end_to_end(self, spark):
        # QueryPlanTest parity: the planner's plan_string shows the
        # collapsed composite term, and the query runs over the
        # ingest-generated composite column.
        from datawave_spark.sources.ingest import composite_column
        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "x")],
            "id long, F1 string, F2 string")
        df = composite_column(df, ["F1", "F2"], "F1_F2")
        planner = QueryPlanner(df, composites={("F1", "F2"): "F1_F2"})
        res = planner.plan("F1 == 'a' && F2 == 'x'")
        assert "F1_F2" in res.plan_string
        assert [r.id for r in res.df.collect()] == [1]

    def test_planner_wires_whindex_and_composites(self, spark):
        # whindex remap runs BEFORE composite expansion (reference order
        # 1384 → 1550): GEO=='landmark' remaps to GEO_L, which then
        # completes the (GEO_L, TYPE) composite.
        from datawave_spark.sources.ingest import composite_column
        df = spark.createDataFrame(
            [(1, "landmark", "poi"), (2, "landmark", "road"), (3, "x", "poi")],
            "id long, GEO_L string, TYPE string")
        df = composite_column(df, ["GEO_L", "TYPE"], "GEO_L_TYPE")
        planner = QueryPlanner(
            df,
            whindex_mappings={("GEO", "landmark"): "GEO_L"},
            composites={("GEO_L", "TYPE"): "GEO_L_TYPE"})
        res = planner.plan("GEO == 'landmark' && TYPE == 'poi'")
        assert "GEO_L_TYPE" in res.plan_string
        assert [r.id for r in res.df.collect()] == [1]

    def test_planner_skips_composite_for_array_member(self, spark):
        df = spark.createDataFrame(
            [(1, ["a"], "x")], "id long, F1 array<string>, F2 string")
        planner = QueryPlanner(df, composites={("F1", "F2"): "C"})
        res = planner.plan("F1 == 'a' && F2 == 'x'")
        assert "C ==" not in res.plan_string
        assert [r.id for r in res.df.collect()] == [1]

    def test_tokenize_uses_real_doc_id(self, spark):
        # The first column is NOT assumed to be a key: with a non-unique
        # first column, on-the-fly tokenization must not merge token
        # maps across rows (content:phrase would match documents that
        # never contained the terms).
        df = spark.createDataFrame(
            [(1, "the quick brown fox"), (1, "lazy dog sleeps")],
            "grp int, TEXT string")
        res = QueryPlanner(df).plan("content:phrase(TEXT, 'quick', 'brown')")
        rows = res.df.collect()
        assert len(rows) == 1
        assert rows[0].TEXT == "the quick brown fox"


class TestOrderByCost:
    """OrderByCostVisitor parity (visitors/order/OrderByCostVisitor.java
    + FieldCostComparator): AND/OR children reorder by estimated cost —
    asserted on the plan string, QueryPlanTest-style."""

    STATS = {"EVENT_TYPE": 5, "EVENT_ID": 10_000}

    def test_and_orders_eq_range_func(self):
        from datawave_spark.compiler.rewrite import order_by_cost
        node = jexl("filter:includeRegex(EVENT_TYPE, 'cl.*') && "
                    "VALUE > 100 && EVENT_TYPE == 'click'")
        got = str(order_by_cost(default_pipeline(node), self.STATS))
        assert got == ("(EVENT_TYPE == 'click' && VALUE > 100 && "
                       "filter:includeRegex(EVENT_TYPE, 'cl.*'))")

    def test_and_puts_selective_eq_first(self):
        from datawave_spark.compiler.rewrite import order_by_cost
        node = jexl("EVENT_TYPE == 'click' && EVENT_ID == 7")
        got = str(order_by_cost(default_pipeline(node), self.STATS))
        # EVENT_ID matches 1/10000 of rows vs 1/5 — it goes first
        assert got == "(EVENT_ID == 7 && EVENT_TYPE == 'click')"

    def test_or_puts_likely_true_first(self):
        from datawave_spark.compiler.rewrite import order_by_cost
        node = jexl("EVENT_ID == 7 || EVENT_TYPE == 'click'")
        got = str(order_by_cost(default_pipeline(node), self.STATS))
        # each row stops at the first TRUE disjunct: high-match first
        assert got == "(EVENT_TYPE == 'click' || EVENT_ID == 7)"

    def test_planner_from_stats_same_results(self, spark):
        from datawave_spark.sources import prepared
        from datawave_spark.sources.parquet import read_parquet
        sf = "/root/testdata/sf0.001"
        ev = read_parquet(spark, f"{sf}/events.parquet")
        q = "filter:includeRegex(EVENT_TYPE, 'cl.*') && VALUE > 400 && EVENT_TYPE == 'click'"
        plain = QueryPlanner(ev).plan(q)
        stats = QueryPlanner.from_stats(ev, prepared.index_stats(spark, sf))
        ordered = stats.plan(q)
        assert ordered.plan_string.startswith("(EVENT_TYPE == 'click'")
        a = {r.event_id for r in plain.df.select("event_id").collect()}
        b = {r.event_id for r in ordered.df.select("event_id").collect()}
        assert a == b


class TestCompareFunction:
    def test_compare_routes_to_filter_compare(self, spark):
        from datawave_spark.lucene.parser import parse_lucene
        from datawave_spark.jexl.ast import FuncNode
        n = parse_lucene("#COMPARE(VALUE, '<', 'ANY', USER_ID)")
        assert isinstance(n, FuncNode)
        assert (n.namespace, n.name) == ("filter", "compare")
        df = spark.createDataFrame([(1, 2.0, 10), (2, 20.0, 10)],
                                   "id long, VALUE double, USER_ID long")
        from datawave_spark.compiler import compile_query
        assert [r.id for r in compile_query(df, n).collect()] == [1]

    def test_compare_all_mode_set_semantics(self, spark):
        """ALL mode (r6): Compare.java's full mode surface — ALL '<' is
        max(a) < min(b) over the value SETS."""
        from datawave_spark.compiler import compile_query
        from datawave_spark.lucene.parser import parse_lucene
        n = parse_lucene("#COMPARE(A, '<', 'ALL', B)")
        df = spark.createDataFrame(
            [(1, [1.0, 2.0], [3.0, 4.0]),    # max(a)=2 < min(b)=3
             (2, [1.0, 5.0], [3.0, 4.0])],   # max(a)=5 not < 3
            "id long, a array<double>, b array<double>")
        assert [r.id for r in compile_query(df, n).collect()] == [1]


class TestPredict:
    """QueryExecutorBean.predict:993 parity: stats-driven cost
    prediction before execution."""

    @pytest.fixture(scope="class")
    def planner(self, spark):
        from datawave_spark.plans import QueryPlanner
        df = spark.createDataFrame(
            [("a", "rome", 1.0), ("b", "paris", 2.0),
             ("c", "rome", 3.0), ("d", "rome", 4.0)],
            "uid string, CITY string, NUM double")
        return QueryPlanner(df, stats={"CITY": 2, "NUM": 4})

    def test_eq_uses_stats_cardinality(self, planner):
        p = planner.predict("CITY == 'rome'")
        assert p["selectivity"] == 0.5
        assert p["estimated_rows"] == round(0.5 * p["total_rows"])

    def test_and_multiplies_or_unions(self, planner):
        a = planner.predict("CITY == 'rome' && NUM == 5")["selectivity"]
        o = planner.predict("CITY == 'rome' || NUM == 5")["selectivity"]
        assert a == pytest.approx(0.5 * 0.25)
        assert o == pytest.approx(1 - 0.5 * 0.75)

    def test_negation_complements(self, planner):
        p = planner.predict("!(CITY == 'rome')")
        assert p["selectivity"] == pytest.approx(0.5)

    def test_unknown_field_defaults(self, planner):
        p = planner.predict("MYSTERY == 'x'")
        assert p["selectivity"] == pytest.approx(0.1)


class TestPhraseSlop:
    def test_slop_becomes_within(self):
        # SlopQueryNodeBuilder.java:46 → JexlWithinNode.java:24
        node = parse_lucene('TEXT:"hello world"~3')
        assert node == FuncNode("content", "within",
                                (Identifier("TEXT"), Literal(3),
                                 Literal("hello"), Literal("world")))

    def test_unfielded_slop(self):
        node = parse_lucene('"a b"~2')
        assert node == FuncNode("content", "within",
                                (Literal(2), Literal("a"), Literal("b")))

    def test_single_word_slop_ignored(self):
        # reference SelectorNode branch: within of one term is nonsense
        node = parse_lucene('TEXT:"solo"~5')
        assert node == CmpNode("==", Identifier("TEXT"), Literal("solo"))

    def test_slop_combines_with_boolean(self):
        node = parse_lucene('TEXT:"a b"~1 AND CITY:rome')
        assert isinstance(node, AndNode)
        assert node.terms[0].name == "within"


class TestControlledParser:
    def test_disallowed_field_rejected(self):
        from datawave_spark.lucene.controlled import (ControlledQueryError,
                                                      parse_controlled)
        with pytest.raises(ControlledQueryError, match="SECRET"):
            parse_controlled("SECRET:x AND CITY:rome",
                             allowed_fields=["CITY"])

    def test_allowed_and_unfielded_pass(self):
        from datawave_spark.lucene.controlled import parse_controlled
        node = parse_controlled("CITY:rome AND bare", allowed_fields=["CITY"])
        assert isinstance(node, AndNode)

    def test_function_field_args_checked(self):
        from datawave_spark.lucene.controlled import (ControlledQueryError,
                                                      parse_controlled)
        with pytest.raises(ControlledQueryError):
            parse_controlled("#ISNOTNULL(HIDDEN)", allowed_fields=["CITY"])

    def test_include_exclude_rewrite(self):
        from datawave_spark.lucene.controlled import controlled_rewrite
        q = controlled_rewrite("CITY:rome",
                               included_values={"K": ["a", "b"]},
                               excluded_values={"X": ["c"]})
        # the include group is parenthesized so EVERY exclude applies
        # regardless of which include alternative matched (bare
        # concatenation would parse as inc1 OR (inc2 AND exc))
        assert q == ("(CITY:rome) AND ((#INCLUDE(K, a) OR #INCLUDE(K, b))"
                     " AND #EXCLUDE(X, c))")

    def test_excludes_apply_to_every_include_alternative(self):
        """Semantic regression for the precedence trap: with two
        include alternatives and one exclude, the parsed tree must
        apply the exclude on BOTH paths."""
        from datawave_spark.jexl.ast import AndNode, FuncNode, OrNode
        from datawave_spark.lucene.controlled import parse_controlled
        node = parse_controlled("CITY:rome",
                                included_values={"K": ["a", "b"]},
                                excluded_values={"X": ["c"]})
        # shape: AND(base, AND(OR(inc,inc), exc)) modulo flattening —
        # the exclude must NOT live under the OR
        def or_contains_exclude(n):
            if isinstance(n, OrNode):
                return any(isinstance(t, FuncNode) and t.name == "excludeRegex"
                           for t in n.terms) or any(
                    or_contains_exclude(t) for t in n.terms)
            if isinstance(n, AndNode):
                return any(or_contains_exclude(t) for t in n.terms)
            return False
        assert not or_contains_exclude(node)

    def test_rewrite_fields_implicitly_allowed(self):
        from datawave_spark.lucene.controlled import parse_controlled
        node = parse_controlled("CITY:rome", allowed_fields=["CITY"],
                                included_values={"STATE": ["laz.*"]})
        assert isinstance(node, AndNode)


class TestUUIDParser:
    def _types(self):
        from datawave_spark.lucene.controlled import UUIDType
        return [UUIDType("PAGE_ID", allow_wildcard_after=3),
                UUIDType("EVENT_UUID")]

    def test_equality_on_registered_field(self):
        from datawave_spark.lucene.controlled import parse_uuid_query
        node = parse_uuid_query("PAGE_ID:abc123 OR EVENT_UUID:9",
                                self._types())
        assert isinstance(node, OrNode)

    def test_unregistered_field_rejected(self):
        from datawave_spark.lucene.controlled import (ControlledQueryError,
                                                      parse_uuid_query)
        with pytest.raises(ControlledQueryError, match="not a registered"):
            parse_uuid_query("OTHER:1", self._types())

    def test_wildcard_position_enforced(self):
        from datawave_spark.lucene.controlled import (ControlledQueryError,
                                                      parse_uuid_query)
        parse_uuid_query("PAGE_ID:abc*", self._types())      # pos 3: ok
        with pytest.raises(ControlledQueryError, match="wildcard"):
            parse_uuid_query("PAGE_ID:ab*", self._types())   # pos 2: no
        with pytest.raises(ControlledQueryError, match="wildcard"):
            parse_uuid_query("EVENT_UUID:9*", self._types())  # never

    def test_range_rejected(self):
        from datawave_spark.lucene.controlled import (ControlledQueryError,
                                                      parse_uuid_query)
        with pytest.raises(ControlledQueryError):
            parse_uuid_query("PAGE_ID:[a TO b]", self._types())
