"""#LENIENT / #STRICT field semantics.

Reference: ExpandMultiNormalizedTerms.java:296-420 (failed-normalization
handling per marker), QueryOptionsFromQueryVisitor.java:40,258-266
(f:lenient / f:strict take FIELD LISTS), QueryModelVisitor.java:316-351
(strict+lenient conflict → neither, with a warning),
DroppedExpression.java:70-82 (a dropped term becomes truthy
assignments, so it vanishes from an AND and satisfies an OR).

The pinned behavioral difference: a term whose literal fails the
field's normalization is UNSATISFIABLE by default (and under #STRICT,
whose raw evaluation-only term can never match typed storage), but is
DROPPED under #LENIENT — an AND keeps its other conjuncts' matches.
"""

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans.planner import QueryPlanner


@pytest.fixture(scope="module")
def events(spark, tables):
    return tables["events"]


class TestLenientStrict:
    def test_default_failed_normalization_is_unsatisfiable(self, events):
        # VALUE is a double column: the literal 'abc' fails float() —
        # compile_cmp's cannot-match branch
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && VALUE == 'abc'")
        assert res.df.count() == 0

    def test_lenient_drops_the_failing_term(self, events):
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && VALUE == 'abc' && f:lenient('VALUE')")
        clicks = events.filter(F.col("event_type") == "click").count()
        assert res.df.count() == clicks > 0
        assert res.options.lenient == ["VALUE"]

    def test_lenient_keeps_valid_literals_exact(self, events):
        # a literal that DOES normalize is not dropped — lenient only
        # forgives failures
        base = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && VALUE > 50")
        lenient = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && VALUE > 50 && f:lenient('VALUE')")
        assert lenient.df.count() == base.df.count() > 0

    def test_lenient_dropped_term_removed_from_or(self, events):
        # LenientFieldsTest.java:276 ("NAM == 'abc40'" → []): a dropped
        # branch generates NO candidates — the OR returns only the
        # surviving branches' matches, never all rows
        res = QueryPlanner(events).plan(
            "(EVENT_TYPE == 'click' || VALUE == 'abc') && f:lenient('VALUE')")
        clicks = events.filter(F.col("event_type") == "click").count()
        assert res.df.count() == clicks

    def test_lenient_fully_dropped_query_is_empty(self, events):
        # LenientFieldsTest.java:270 ("AG > 'abc10'" → []): a query
        # whose every term dropped has no executable term → zero rows
        res = QueryPlanner(events).plan(
            "VALUE == 'abc' && f:lenient('VALUE')")
        assert res.df.count() == 0
        res_or = QueryPlanner(events).plan(
            "(VALUE == 'abc' || VALUE == 'xyz') && f:lenient('VALUE')")
        assert res_or.df.count() == 0

    def test_strict_stays_unsatisfiable(self, events):
        # strict keeps the raw term evaluation-only; over typed storage
        # that is our cannot-match FALSE (an unnormalizable stored
        # value is NULL col-side and can never equal the raw literal)
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && VALUE == 'abc' && f:strict('VALUE')")
        assert res.df.count() == 0
        assert res.options.strict == ["VALUE"]

    def test_conflicting_markers_apply_neither(self, events):
        # reference warns and applies neither (QueryModelVisitor:320)
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && VALUE == 'abc' "
            "&& f:lenient('VALUE') && f:strict('VALUE')")
        assert res.df.count() == 0

    def test_lenient_other_fields_unaffected(self, events):
        # the field list is exact: lenient on VALUE does not forgive a
        # failing literal on TS
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && TS == 'not-a-date' "
            "&& f:lenient('VALUE')")
        # TS is timestamp-typed; 'not-a-date' fails its normalization →
        # unsatisfiable (not dropped: TS is not in the lenient list)
        assert res.df.count() == 0

    def test_unparseable_datetime_literal_is_nonmatch_not_abort(
            self, events):
        # r9 regression: a malformed literal against a raw timestamp
        # column must compile to a non-match (try_cast-NULL literal),
        # never an ANSI CAST_INVALID_INPUT whole-scan abort
        from datawave_spark.compiler import compile_query
        assert compile_query(events, "TS == 'not-a-date'").count() == 0
        assert compile_query(events, "TS >= '2024-01-05'").count() == \
            events.filter(
                F.col("ts") >= F.lit("2024-01-05").cast("timestamp")).count()

    def test_lenient_datetime_field_drops(self, events):
        # the plan-time fails() check validates datetime literals
        # through Spark's own cast
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && TS == 'not-a-date' "
            "&& f:lenient('TS')")
        clicks = events.filter(F.col("event_type") == "click").count()
        assert res.df.count() == clicks > 0

    def test_lucene_lenient_end_to_end(self, events):
        res = QueryPlanner(events).plan(
            "EVENT_TYPE:click AND VALUE:abc #LENIENT(VALUE)",
            syntax="LUCENE")
        clicks = events.filter(F.col("event_type") == "click").count()
        assert res.df.count() == clicks > 0

    def test_lenient_typed_string_field(self, events):
        # a STRING field typed 'number': literal fails normalization →
        # lenient drops; default is unsatisfiable
        df = events.withColumn("CODE", F.col("user_id").cast("string"))
        strict_plan = QueryPlanner(
            df, field_types={"CODE": "number"}).plan(
            "EVENT_TYPE == 'click' && CODE == 'zz9'")
        lenient_plan = QueryPlanner(
            df, field_types={"CODE": "number"}).plan(
            "EVENT_TYPE == 'click' && CODE == 'zz9' && f:lenient('CODE')")
        clicks = df.filter(F.col("event_type") == "click").count()
        assert strict_plan.df.count() == 0
        assert lenient_plan.df.count() == clicks > 0

    def test_lenient_model_alias_drops_only_if_all_expansions_fail(
            self, events):
        # alias → [VALUE (double), PROPS (string)]: 'abc' normalizes on
        # PROPS, so the expansion keeps its good branch and lenient
        # must NOT drop the term
        model = {"V": ["VALUE", "PROPS"]}
        res = QueryPlanner(events, model=model).plan(
            "EVENT_TYPE == 'click' && V == 'abc' && f:lenient('V')")
        assert res.df.count() == 0  # PROPS == 'abc' matches nothing, but
        # the term survived: OR-of-branches evaluated (not dropped)
        res2 = QueryPlanner(events, model={"V": ["VALUE", "TS"]}).plan(
            "EVENT_TYPE == 'click' && V == 'abc' && f:lenient('V')")
        clicks = events.filter(F.col("event_type") == "click").count()
        assert res2.df.count() == clicks > 0  # both expansions fail → drop


class TestLenientReviewRegressions:
    """r9 review findings pinned."""

    def test_lenient_range_one_bad_bound_keeps_the_other(self, events):
        # ExpandMultiNormalizedTerms drops per-TERM: a bounded range
        # with one failing bound keeps evaluating the surviving bound
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && ((_Bounded_ = true) && "
            "(VALUE >= 'abc10' && VALUE <= 18)) && f:lenient('VALUE')")
        expect = events.filter(
            (F.col("event_type") == "click") & (F.col("value") <= 18))
        assert res.df.count() == expect.count() > 0

    def test_negated_dropped_term_is_false(self, events):
        # !(dropped) — the DROPPED marker evaluates truthy, so its
        # negation is FALSE: the conjunct kills the query, never
        # vanishes
        res = QueryPlanner(events).plan(
            "EVENT_TYPE == 'click' && !(VALUE == 'abc') "
            "&& f:lenient('VALUE')")
        assert res.df.count() == 0

    def test_lenient_date_normalizer_literal(self, events):
        # a 'date'-typed temporal field whose normalizer itself rejects
        # the literal: lenient drops, default stays a plan (not a crash)
        df = events.withColumn("WHEN", F.col("ts"))
        res = QueryPlanner(df, field_types={"WHEN": "date"}).plan(
            "EVENT_TYPE == 'click' && WHEN == 'bogus' "
            "&& f:lenient('WHEN')")
        clicks = df.filter(F.col("event_type") == "click").count()
        assert res.df.count() == clicks > 0
