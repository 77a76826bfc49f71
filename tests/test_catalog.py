"""Multi-datatype catalog + IngestTypePruning tests."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.jexl.ast import Literal
from datawave_spark.jexl.parser import parse as jexl
from datawave_spark.plans.catalog import (
    DatatypeSpec, EventCatalog, prune_missing_fields,
)


class TestPruneMissing:
    def test_positive_leaf_folds_false(self):
        n = prune_missing_fields(jexl("GHOST == 'x'"), {"REAL"})
        assert n == Literal(False)

    def test_negated_leaf_folds_true(self):
        n = prune_missing_fields(jexl("GHOST != 'x'"), {"REAL"})
        assert n == Literal(True)

    def test_or_keeps_viable_branch(self):
        n = prune_missing_fields(jexl("GHOST == 'x' || REAL == 'y'"), {"REAL"})
        assert n == jexl("REAL == 'y'")

    def test_and_with_missing_dies(self):
        n = prune_missing_fields(jexl("GHOST == 'x' && REAL == 'y'"), {"REAL"})
        assert n == Literal(False)


class TestCatalog:
    @pytest.fixture(scope="class")
    def catalog(self, spark):
        people = spark.createDataFrame(
            [("p1", "alice", 30.0), ("p2", "bob", 40.0)],
            "uid string, NAME string, AGE double")
        orgs = spark.createDataFrame(
            [("o1", "acme", "alice"), ("o2", "globex", "carol")],
            "uid string, ORG string, NAME string")
        return EventCatalog({"people": people, "orgs": DatatypeSpec(orgs)})

    def test_union_across_datatypes(self, catalog):
        out = catalog.query("NAME == 'alice'", select=["uid", "NAME"])
        rows = sorted((r.datatype, r.uid) for r in out.collect())
        assert rows == [("orgs", "o1"), ("people", "p1")]

    def test_datatype_pruned_entirely(self, catalog):
        plans = catalog.plan_per_datatype("AGE > 20")
        assert plans["orgs"] is None       # orgs has no AGE: no scan
        assert plans["people"] is not None
        out = catalog.query("AGE > 20", select=["uid"])
        assert {r.datatype for r in out.collect()} == {"people"}

    def test_missing_column_nulls(self, catalog):
        out = catalog.query("NAME == 'alice'", select=["uid", "ORG"])
        got = {r.datatype: r.ORG for r in out.collect()}
        assert got["orgs"] == "acme" and got["people"] is None

    def test_fully_pruned_raises(self, catalog):
        with pytest.raises(ValueError):
            catalog.query("NOPE == 'x' && ALSO_NOPE == 'y'")

    def test_dollar_escaped_field_not_pruned(self):
        # '$FIELD' must deconstruct to FIELD before the availability
        # check, like compile_cmp does (advice r10)
        n = prune_missing_fields(jexl("$REAL == 'x'"), {"REAL"})
        assert n != Literal(False)
        n = prune_missing_fields(jexl("filter:isNull($REAL)"), {"REAL"})
        assert n != Literal(False)

    def test_real_event_datatype_column_survives(self, spark):
        # a frame that genuinely carries EVENT_DATATYPE keeps its data:
        # the pseudo-field is only synthesized when absent (advice r10)
        df = spark.createDataFrame(
            [("e1", "imported"), ("e2", "native")],
            "uid string, EVENT_DATATYPE string")
        cat = EventCatalog({"feed": df})
        out = cat.query("EVENT_DATATYPE == 'imported'",
                        select=["uid", "EVENT_DATATYPE"])
        rows = [(r.uid, r.EVENT_DATATYPE) for r in out.collect()]
        assert rows == [("e1", "imported")]


class TestFederatedCatalog:
    """RemoteEventQueryLogic analog: a query fans out to every
    registered deployment, merges by name, and a deployment where
    every datatype prunes is never scanned."""

    @pytest.fixture(scope="class")
    def fed(self, spark):
        from datawave_spark.plans.catalog import FederatedCatalog
        local_people = spark.createDataFrame(
            [("p1", "alice", 30.0), ("p2", "bob", 40.0)],
            "uid string, NAME string, AGE double")
        remote_people = spark.createDataFrame(
            [("r1", "alice", 22.0)],
            "uid string, NAME string, AGE double")
        remote_orgs = spark.createDataFrame(
            [("r9", "acme")], "uid string, ORG string")
        return FederatedCatalog({
            "local": EventCatalog({"people": local_people}),
            "remote": EventCatalog({"people": remote_people,
                                    "orgs": remote_orgs}),
        })

    def test_union_across_deployments(self, fed):
        out = fed.query("NAME == 'alice'", select=["uid", "NAME"])
        rows = sorted((r.deployment, r.datatype, r.uid)
                      for r in out.collect())
        assert rows == [("local", "people", "p1"),
                        ("remote", "people", "r1")]

    def test_deployment_pruned_entirely(self, fed):
        # ORG exists only in the remote deployment: local is skipped
        out = fed.query("ORG == 'acme'", select=["uid", "ORG"])
        rows = [(r.deployment, r.uid) for r in out.collect()]
        assert rows == [("remote", "r9")]

    def test_all_deployments_pruned_raises(self, fed):
        with pytest.raises(ValueError, match="every deployment"):
            fed.query("GHOST == 'x'")

    def test_empty_registry_raises(self):
        from datawave_spark.plans.catalog import FederatedCatalog
        with pytest.raises(ValueError):
            FederatedCatalog({})
