"""Edge build/query/chain/k-hop and TLD hierarchy tests — modeled on the
reference's edge query tests and TLD/Ancestor query tests."""

import pytest
from pyspark.sql import functions as F

from datawave_spark.edges import (
    EdgeDefinition, build_edges, edge_events, edge_query, k_hop,
    stats_edges,
)
from datawave_spark.operators.tld import (
    ancestors_match, parents_only, tld_key, tld_rollup,
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, "alice", ["p1", "p2"], "login", "2024-01-01"),
        (2, "bob", ["p1"], "login", "2024-01-01"),
        (3, "alice", ["p3"], "purchase", "2024-01-02"),
        (4, "carol", [], "login", "2024-01-02"),
    ]
    return spark.createDataFrame(
        rows, "eid long, user string, phones array<string>, act string, d string").cache()


@pytest.fixture(scope="module")
def edges(events):
    defs = [
        EdgeDefinition("user", "phones", "user_phone", "owns"),
        EdgeDefinition("user", "act", "user_act", "did",
                       precondition="ACT == 'login'"),
    ]
    return build_edges(events, defs, date_col="d").cache()


class TestEdges:
    def test_build_fanout(self, edges):
        up = edges.filter(F.col("edge_type") == "user_phone")
        assert up.count() == 4  # alice×2 + bob×1 + alice×1
        assert sorted((r.source, r.sink) for r in up.collect()) == [
            ("alice", "p1"), ("alice", "p2"), ("alice", "p3"), ("bob", "p1")]

    def test_precondition(self, edges):
        ua = edges.filter(F.col("edge_type") == "user_act")
        # only login events produce edges; carol has no phones but logs in
        assert sorted(r.source for r in ua.collect()) == ["alice", "bob", "carol"]

    def test_stats_edges(self, edges):
        w = {(r.source, r.sink): r.weight
             for r in stats_edges(edges).collect()}
        assert w[("alice", "p1")] == 1

    def test_edge_query_virtual_fields(self, edges):
        got = edge_query(edges, "SOURCE == 'alice' && TYPE == 'user_phone'")
        assert got.count() == 3
        got2 = edge_query(edges, "SINK == 'p1' && !(SOURCE == 'bob')")
        assert [r.source for r in got2.collect()] == ["alice"]

    def test_edge_event_chain(self, edges, events):
        sel = edge_query(edges, "TYPE == 'user_phone' && SINK == 'p1'")
        evs = edge_events(sel, events, "user")
        assert sorted(r.eid for r in evs.collect()) == [1, 2, 3]

    def test_k_hop(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("a", "x")],
            "source string, sink string") \
            .withColumn("edge_type", F.lit("t")) \
            .withColumn("relationship", F.lit("")) \
            .withColumn("attribute1", F.lit(None).cast("string")) \
            .withColumn("edge_date", F.lit(None).cast("date"))
        got = {r.vertex: r.hop for r in
               k_hop(e, "SOURCE == 'a'", hops=3).collect()}
        assert got == {"b": 1, "x": 1, "c": 2, "d": 3}


class TestTLD:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            ("h1.h2.h3", "parent", 1.0),
            ("h1.h2.h3.1", "childA", 9.0),
            ("h1.h2.h3.1.1", "grandchild", 2.0),
            ("x1.x2.x3", "parent", 3.0),
            ("x1.x2.x3.1", "childB", 4.0),
        ]
        return spark.createDataFrame(rows, "uid string, NAME string, V double").cache()

    def test_tld_key(self, spark):
        df = spark.createDataFrame([("a.b.c.d.e",)], "uid string")
        assert df.select(tld_key(F.col("uid")).alias("k")).first().k == "a.b.c"

    def test_rollup_matches_whole_family(self, docs):
        fam = tld_rollup(docs, "NAME == 'childa'",
                         parts=3)
        assert fam.count() == 0  # normalization not applied: exact value
        fam = tld_rollup(docs, "NAME == 'childA'", parts=3)
        assert sorted(r.uid for r in fam.collect()) == [
            "h1.h2.h3", "h1.h2.h3.1", "h1.h2.h3.1.1"]

    def test_parents_only(self, docs):
        assert sorted(r.uid for r in parents_only(docs).collect()) == [
            "h1.h2.h3", "x1.x2.x3"]

    def test_ancestors_match(self, docs):
        # childA matches → childA + its descendants (grandchild), not parent
        got = ancestors_match(docs, "NAME == 'childA'")
        assert sorted(r.uid for r in got.collect()) == [
            "h1.h2.h3.1", "h1.h2.h3.1.1"]

    def test_parent_query_returns_parent_of_match(self, docs):
        from datawave_spark.operators.tld import parent_query
        # grandchild matches → its immediate parent (childA) returned
        got = parent_query(docs, "NAME == 'grandchild'")
        assert sorted(r.uid for r in got.collect()) == ["h1.h2.h3.1"]

    def test_parent_query_tld_match_returns_itself(self, docs):
        from datawave_spark.operators.tld import parent_query
        got = parent_query(docs, "V == 3")
        assert sorted(r.uid for r in got.collect()) == ["x1.x2.x3"]

    def test_parent_query_dedupes_parents(self, spark):
        from datawave_spark.operators.tld import parent_query
        df = spark.createDataFrame(
            [("f.a.b", 0.0), ("f.a.b.1", 9.0), ("f.a.b.2", 9.0)],
            "uid string, V double")
        got = parent_query(df, "V == 9")
        assert sorted(r.uid for r in got.collect()) == ["f.a.b"]


class TestDatedEdges:
    def test_same_day_collapses_to_combined(self, spark):
        from datawave_spark.edges import EdgeDefinition, dated_edges
        ev = spark.createDataFrame(
            [(1, 2, "2024-01-01", "2024-01-01"),
             (3, 4, "2024-01-01", "2024-01-03")],
            "a long, b long, ed string, ad string")
        out = dated_edges(ev, [EdgeDefinition("a", "b", "t")], "ed", "ad")
        rows = {(r.source, r.date_type, str(r.edge_date))
                for r in out.collect()}
        assert ("1", "ACTIVITY_AND_EVENT", "2024-01-01") in rows
        assert ("3", "EVENT_ONLY", "2024-01-01") in rows
        assert ("3", "ACTIVITY_ONLY", "2024-01-03") in rows
        assert len(rows) == 3

    def test_no_activity_date_means_all_combined(self, spark):
        from datawave_spark.edges import EdgeDefinition, dated_edges
        ev = spark.createDataFrame([(1, 2, "2024-01-01")],
                                   "a long, b long, ed string")
        out = dated_edges(ev, [EdgeDefinition("a", "b", "t")], "ed")
        assert [r.date_type for r in out.collect()] == ["ACTIVITY_AND_EVENT"]

    def test_null_dates_route_null_safe(self, spark):
        """Rows with one NULL date must not vanish (== and != are both
        null-false): the dated side still writes; rows whose branch
        date is NULL are dropped — an edge key needs a date."""
        from datawave_spark.edges import EdgeDefinition, dated_edges
        ev = spark.createDataFrame(
            [(1, 2, None, "2024-01-05"),    # null event date
             (3, 4, "2024-01-06", None),    # null activity date
             (5, 6, None, None)],           # fully undated: no edge
            "a long, b long, ed string, ad string")
        out = dated_edges(ev, [EdgeDefinition("a", "b", "t")], "ed", "ad")
        rows = {(r.source, r.date_type, str(r.edge_date))
                for r in out.collect()}
        assert rows == {
            ("1", "ACTIVITY_ONLY", "2024-01-05"),
            ("3", "EVENT_ONLY", "2024-01-06"),
        }


class TestTldReferee:
    """r8 referee: tld_rollup / ancestors_match vs a python family /
    ancestor-chain evaluator over random dotted hierarchies (the
    TLDQueryIterator and AncestorQueryLogic contracts, by
    construction)."""

    def test_random_hierarchies(self, spark):
        import random
        rng = random.Random(31)
        from datawave_spark.operators.tld import (ancestors_match,
                                                  tld_rollup)
        for trial in range(4):
            rows = []
            for f in range(rng.randint(3, 8)):
                tld = f"h{f}.x.y"
                rows.append((tld, rng.choice(["a", "b", "c"])))
                for c in range(rng.randint(0, 4)):
                    child = f"{tld}.{c + 1}"
                    rows.append((child, rng.choice(["a", "b", "c"])))
                    for g in range(rng.randint(0, 2)):
                        rows.append((f"{child}.{g + 1}",
                                     rng.choice(["a", "b", "c"])))
            df = spark.createDataFrame(rows, "uid string, tag string")
            val = rng.choice(["a", "b"])
            q = f"TAG == '{val}'"

            def fam(u):
                return ".".join(u.split(".")[:3])

            match = {u for u, t in rows if t == val}
            fams = {fam(u) for u in match}
            want_r = sorted(u for u, _ in rows if fam(u) in fams)

            def ancs(u):
                segs = u.split(".")
                return {".".join(segs[:i])
                        for i in range(3, len(segs) + 1)}

            want_a = sorted(u for u, _ in rows if ancs(u) & match)
            got_r = sorted(r.uid for r in tld_rollup(df, q).collect())
            got_a = sorted(r.uid for r in
                           ancestors_match(df, q).collect())
            assert got_r == want_r, (trial, val)
            assert got_a == want_a, (trial, val)
