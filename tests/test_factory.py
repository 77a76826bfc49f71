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


class TestFactoryExtendedLogics:
    def test_content_query(self, spark):
        from datawave_spark.sources.parquet import read_parquet
        docs = read_parquet(spark, f"{SF}/documents.parquet")
        fac = QueryLogicFactory({"documents": docs})
        rq = fac.create("ContentQuery", QueryParameters(query="3, 7"))
        rows = {r["doc_id"] for r in rq.df.collect()}
        assert rows == {3, 7}
        with pytest.raises(ValueError):
            fac.create("ContentQuery", QueryParameters(query=" , "))

    def test_tld_family_logics(self, spark):
        ev = spark.createDataFrame(
            [("h.1.x", "a", 10.0), ("h.1.x.c1", "b", 5.0),
             ("h.2.y", "b", 1.0)],
            "uid string, kind string, value double")
        fac = QueryLogicFactory({"events": ev}, date_col="missing")
        # child matches VALUE > 4 -> TLD rollup returns whole family
        fam = fac.create("TLDEventQuery", QueryParameters(
            query="VALUE > 4")).df
        assert {r["uid"] for r in fam.collect()} == {"h.1.x", "h.1.x.c1"}
        par = fac.create("ParentQuery", QueryParameters(
            query="KIND == 'b' && VALUE > 4")).df
        assert {r["uid"] for r in par.collect()} == {"h.1.x"}

    def test_edge_event_query_requires_config(self, spark):
        ev = spark.createDataFrame([(1, "x")], "user_id int, event_type string")
        edges = spark.createDataFrame(
            [("1", "x", "t", "r")],
            "source string, sink string, edge_type string, relationship string")
        fac = QueryLogicFactory({"events": ev, "edges": edges},
                                date_col="missing")
        with pytest.raises(ValueError, match="edge_source_field"):
            fac.create("EdgeEventQuery", QueryParameters(query="TYPE == 't'"))
        fac2 = QueryLogicFactory({"events": ev, "edges": edges},
                                 date_col="missing",
                                 edge_source_field="user_id",
                                 edge_sink_field="event_type")
        out = fac2.create("EdgeEventQuery",
                          QueryParameters(query="TYPE == 't'")).df
        assert out.count() == 1
