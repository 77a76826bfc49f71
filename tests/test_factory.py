"""QueryLogicFactory — the REST create path (logic-by-name dispatch,
parameter validation, audit, paging)."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans.factory import (QueryLogicFactory,
                                          QueryParameters, RunningQuery)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def factory(spark):
    from datawave_spark.sources.parquet import read_parquet
    ev = read_parquet(spark, f"{SF}/events.parquet")
    return QueryLogicFactory({"events": ev},
                             discovery_fields=["event_type"])


class TestFactory:
    def test_event_query_dispatch_and_audit(self, factory):
        rq = factory.create("EventQuery", QueryParameters(
            query="EVENT_TYPE == 'view' && VALUE > 200",
            user_dns=("cn=u",)))
        assert isinstance(rq, RunningQuery)
        assert rq.audit.selectors == ("view",)
        assert rq.audit.logic_class == "EventQuery"
        assert rq.df.count() > 0
        assert rq.df.filter("event_type != 'view'").count() == 0

    def test_begin_end_prune(self, factory):
        rq = factory.create("EventQuery", QueryParameters(
            query="EVENT_TYPE == 'view'", begin="2024-01-08",
            end="2024-01-08"))
        days = {r[0] for r in rq.df.select(
            F.col("ts").cast("date").cast("string")).distinct().collect()}
        assert days <= {"2024-01-08"}

    def test_count_and_discovery_logics(self, factory):
        n = factory.create("CountQuery", QueryParameters(
            query="EVENT_TYPE == 'view'")).df.first()["record_count"]
        assert n > 0
        disc = factory.create("DiscoveryQuery", QueryParameters(
            query="anything")).df
        assert {"field", "value", "day", "cnt"} <= set(disc.columns)

    def test_lookup_uuid_logic(self, factory):
        rq = factory.create("LookupUUID",
                            QueryParameters(query="event_id:17"))
        rows = rq.df.collect()
        assert len(rows) == 1 and rows[0]["event_id"] == 17
        with pytest.raises(ValueError):
            factory.create("LookupUUID", QueryParameters(query="noval"))

    def test_unknown_logic_and_bad_params(self, factory):
        with pytest.raises(KeyError, match="unknown query logic"):
            factory.create("NopeQuery", QueryParameters(query="A == 'x'"))
        with pytest.raises(ValueError):
            factory.create("EventQuery", QueryParameters(query=""))
        with pytest.raises(ValueError):
            factory.create("EventQuery", QueryParameters(
                query="A == 'x'", begin="2024-02-01", end="2024-01-01"))
        with pytest.raises(ValueError):
            factory.create("EventQuery", QueryParameters(
                query="A == 'x'", pagesize=0))

    def test_paging(self, factory):
        rq = factory.create("EventQuery", QueryParameters(
            query="EVENT_TYPE == 'view'", pagesize=7))
        pages = list(rq.pages())
        total = sum(len(p) for p in pages)
        assert total == rq.df.count()
        assert all(len(p) == 7 for p in pages[:-1])

    def test_register_custom_logic(self, factory):
        factory.register(
            "TopValues",
            lambda fac, qp: fac.tables["events"]
            .orderBy(F.desc("value")).limit(3).select("event_id", "value"))
        rq = factory.create("TopValues", QueryParameters(query="n/a"))
        assert rq.df.count() == 3
        assert "TopValues" in factory.logic_names()
