"""Plan-shape guards for the round-11 optimizations: these assert the
physical-plan properties the r11 changes bought, so a future optimizer
or code change that silently undoes them fails a test instead of a
bench.  (Same genre as test_plan_quality — at scale the plan shape IS
the performance.)"""

import re

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestGeowaveSpreadSurvives:
    def test_exact_udf_filter_stays_above_the_spread(self, spark):
        """The geowave exact pandas UDF must evaluate ABOVE the
        spread's round-robin exchange (parallel Python stage).  The
        UDF is deterministic in value but marked nondeterministic
        precisely so the optimizer cannot push the filter back through
        the repartition onto the single-split scan — if this ordering
        regresses, the whole Arrow pass collapses onto one task."""
        df = entrymod.queries()["geowave_polygon_data"](spark, SF)
        plan = _executed(df)
        udf = plan.find("ArrowEvalPython")
        rr = plan.find("RoundRobinPartitioning")
        assert udf != -1, "exact UDF stage missing from the plan"
        assert rr != -1, "spread exchange missing from the plan"
        # tree prints root-first: the UDF stage above the exchange
        # appears earlier in the string
        assert udf < rr, "exact UDF evaluated below the spread exchange"

    def test_single_argument_udf(self, spark):
        """The exact UDF takes ONE column argument (the WKT string):
        EvalPython's argument projection gets no subexpression
        elimination, so every extra argument re-evaluates its whole
        interpreted subtree per row (the r11 4-argument regression)."""
        df = entrymod.queries()["geowave_polygon_data"](spark, SF)
        plan = _executed(df)
        m = re.search(r"ArrowEvalPython \[exact\((.*?)\)#\d+\]", plan)
        assert m is not None
        # one top-level argument expression: a single format_string call
        assert m.group(1).startswith("format_string")


class TestSimhashBlockFramePersisted:
    def test_self_join_consumes_cached_block_frame(self, spark):
        """Both sides of the block-permutation self-join must read the
        persisted (id, block, val, int-signature) frame: without the
        barrier each side re-runs the posexplode + bucket-cap
        aggregation + semi-join from the signature cache (the r11
        before-plan shows that subtree once per side)."""
        df = entrymod.queries()["dedup_simhash_pairs"](spark, SF)
        plan = _executed(df)
        # the top-level (non-cached) region of the plan is everything
        # above the first InMemoryRelation expansion; within it the
        # candidate join's children are InMemoryTableScans, so no
        # Generate (posexplode) may appear before the first
        # InMemoryTableScan
        first_scan = plan.find("InMemoryTableScan")
        assert first_scan != -1, "block frame not persisted"
        head = plan[:first_scan]
        assert "Generate" not in head, (
            "posexplode re-runs outside the persisted block frame")
        assert "LeftSemi" not in head, (
            "bucket-cap semi-join re-runs outside the persisted frame")
