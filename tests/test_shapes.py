"""ShapesTest corpus port (reference warehouse/query-core/src/test/
java/datawave/query/ShapesTest.java:72, data from
util/ShapesIngest.java:140-245) — the multi-datatype / datatype-filter
functional corpus: 12 documents across FIVE ingest types (triangle,
quadrilateral, pentagon, hexagon, octagon), with per-type-only fields
(ONLY_TRI .. ONLY_OCT) that make ingest-type reasoning observable.

Expected UID sets are verbatim from the Java (UIDs here are the
document seed names the reference hashes into murmur UIDs — the sets
are defined by which documents match, not by hash spelling).

Exercises: equality/OR/intersection over the catalog union, the
DATATYPE_FILTER_SET parameter, rebuildDatatypeFilter /
reduceIngestTypes / pruneQueryByIngestTypes (IngestTypeVisitor +
IngestTypePruningVisitor ports), exclusive-filter rejection, leading /
trailing regex expansion, and the pre-index sort options
(DefaultJexlNodeComparator lexicographic tiebreak; FieldCostComparator
counts)."""

import pytest

from datawave_spark.plans.catalog import (
    DatatypeSpec, EventCatalog, IngestTypes, InvalidQueryException,
    UNKNOWN_TYPE, prune_ingest_types)
from datawave_spark.jexl.parser import parse as jexl
from datawave_spark.compiler.rewrite import default_pipeline


# ShapesIngest.writeData rows (shard 20240202_0; LcNoDiacritics
# normalizers except EDGES=Number)
TRIANGLES = [
    ("acute", 3, "triangle", "acute", "tri"),
    ("equilateral", 3, "triangle", "equilateral", "tri"),
    ("isosceles", 3, "triangle", "isosceles", "tri"),
]
QUADS = [
    ("square", 4, "quadrilateral", "square", "quad"),
    ("rectangle", 4, "quadrilateral", "rectangle", "quad"),
    ("rhombus", 4, "quadrilateral", "rhombus", "quad"),
    ("rhomboid", 4, "quadrilateral", "rhomboid", "quad"),
    ("trapezoid", 4, "quadrilateral", "trapezoid", "quad"),
    ("kite", 4, "quadrilateral", "kite", "quad"),
]
OTHERS = [
    ("pentagon", 5, "pentagon", "regular", "penta", "ONLY_PENTA"),
    ("hexagon", 6, "hexagon", "regular", "hexa", "ONLY_HEX"),
    ("octagon", 8, "octagon", "regular", "octa", "ONLY_OCT"),
]

TRIANGLE_UIDS = {"acute", "equilateral", "isosceles"}
QUAD_UIDS = {"square", "rectangle", "rhombus", "rhomboid",
             "trapezoid", "kite"}
OTHER_UIDS = {"pentagon", "hexagon", "octagon"}
ALL_UIDS = TRIANGLE_UIDS | QUAD_UIDS | OTHER_UIDS
ALL_TYPES = {"triangle", "quadrilateral", "pentagon", "hexagon",
             "octagon"}


@pytest.fixture(scope="module")
def catalog(spark):
    def frame(rows, only_field):
        schema = (f"UUID string, EDGES double, SHAPE string, "
                  f"TYPE string, {only_field} string")
        return spark.createDataFrame(
            [(u, float(e), s, t, o) for u, e, s, t, o in rows], schema)

    tri = frame(TRIANGLES, "ONLY_TRI")
    quad = frame(QUADS, "ONLY_QUAD")
    types = {"triangle": tri, "quadrilateral": quad}
    for u, e, s, t, o, fld in OTHERS:
        types[s] = frame([(u, e, s, t, o)], fld)
    ft = {"EDGES": "number", "SHAPE": "lcNoDiacritics",
          "TYPE": "lcNoDiacritics"}
    return EventCatalog({name: DatatypeSpec(df, field_types=ft)
                         for name, df in types.items()})


def uids(df):
    return {r.UUID for r in df.select("UUID").collect()}


def plan_str(node):
    return str(node)


class TestBasicQueries:
    def test_triangles(self, catalog):
        assert uids(catalog.query("SHAPE == 'triangle'")) == TRIANGLE_UIDS

    def test_quadrilaterals(self, catalog):
        assert uids(catalog.query("SHAPE == 'quadrilateral'")) == QUAD_UIDS

    def test_pentagon_hexagon_octagon(self, catalog):
        for name in ("pentagon", "hexagon", "octagon"):
            assert uids(catalog.query(f"SHAPE == '{name}'")) == {name}

    def test_triangles_and_quadrilaterals(self, catalog):
        got = uids(catalog.query(
            "SHAPE == 'triangle' || SHAPE == 'quadrilateral'"))
        assert got == TRIANGLE_UIDS | QUAD_UIDS

    def test_all_shapes(self, catalog):
        q = ("SHAPE == 'triangle' || SHAPE == 'quadrilateral' || "
             "SHAPE == 'pentagon' || SHAPE == 'hexagon' || "
             "SHAPE == 'octagon'")
        assert uids(catalog.query(q)) == ALL_UIDS

    def test_intersection_no_filter(self, catalog):
        got = uids(catalog.query("SHAPE == 'hexagon' && ONLY_HEX == 'hexa'"))
        assert got == {"hexagon"}


class TestDatatypeFilterParameter:
    def test_filter_for_triangles(self, catalog):
        got = uids(catalog.query(
            "SHAPE == 'triangle' || SHAPE == 'quadrilateral'",
            datatype_filter={"triangle"}))
        assert got == TRIANGLE_UIDS

    def test_filter_for_quadrilaterals(self, catalog):
        got = uids(catalog.query(
            "SHAPE == 'triangle' || SHAPE == 'quadrilateral'",
            datatype_filter={"quadrilateral"}))
        assert got == QUAD_UIDS

    def test_correct_filter_keeps_both(self, catalog):
        got = uids(catalog.query(
            "SHAPE == 'triangle' || SHAPE == 'quadrilateral'",
            datatype_filter={"triangle", "quadrilateral"}))
        assert got == TRIANGLE_UIDS | QUAD_UIDS

    def test_simple_query_filter(self, catalog):
        got = uids(catalog.query("SHAPE == 'hexagon'",
                                 datatype_filter={"hexagon"}))
        assert got == {"hexagon"}

    def test_filter_with_extra_types(self, catalog):
        # ShapesTest.testFilterWithExtraTypes: full filter set keeps
        # the filter, reduce/rebuild shrink it to {hexagon}
        node, eff = catalog.plan("ONLY_HEX == 'hexa'",
                                 datatype_filter=set(ALL_TYPES))
        assert eff == ALL_TYPES
        _, eff = catalog.plan("ONLY_HEX == 'hexa'",
                              datatype_filter=set(ALL_TYPES),
                              reduce_ingest_types=True)
        assert eff == {"hexagon"}
        _, eff = catalog.plan("ONLY_HEX == 'hexa'",
                              datatype_filter=set(ALL_TYPES),
                              rebuild_datatype_filter=True)
        assert eff == {"hexagon"}
        got = uids(catalog.query("ONLY_HEX == 'hexa'",
                                 datatype_filter=set(ALL_TYPES)))
        assert got == {"hexagon"}

    def test_exclusive_filter_raises_all_option_combos(self, catalog):
        # ShapesTest.testExclusiveFilter*: ONLY_HEX has no ingest type
        # in {triangle} — InvalidQueryException under every option
        for opts in ({}, {"reduce_ingest_types": True},
                     {"rebuild_datatype_filter": True},
                     {"prune_query_by_ingest_types": True}):
            with pytest.raises(InvalidQueryException):
                catalog.plan("ONLY_HEX == 'hexa'",
                             datatype_filter={"triangle"}, **opts)


class TestRebuildReducePrune:
    Q3 = ("SHAPE == 'pentagon' || SHAPE == 'hexagon' || "
          "SHAPE == 'octagon'")

    def test_final_filter_when_none_specified(self, catalog):
        node, eff = catalog.plan(self.Q3)
        assert eff == set()
        assert uids(catalog.query(self.Q3)) == OTHER_UIDS

    def test_build_filter_from_query_fields(self, catalog):
        # SHAPE is common across all five datatypes
        node, eff = catalog.plan(self.Q3, rebuild_datatype_filter=True)
        assert eff == ALL_TYPES

    def test_reduce_with_empty_filter_stays_empty(self, catalog):
        node, eff = catalog.plan(self.Q3, reduce_ingest_types=True)
        assert eff == set()

    def test_reduce_no_change_when_filter_narrower(self, catalog):
        node, eff = catalog.plan(
            self.Q3, datatype_filter={"pentagon", "hexagon", "octagon"},
            reduce_ingest_types=True)
        assert eff == {"pentagon", "hexagon", "octagon"}

    COMPOUND = ("(SHAPE == 'pentagon' || SHAPE == 'hexagon' || "
                "SHAPE == 'octagon') && "
                "(ONLY_PENTA == 'penta' || ONLY_HEX == 'hexa')")

    def test_reduce_intersects_with_query_types(self, catalog):
        node, eff = catalog.plan(
            self.COMPOUND,
            datatype_filter={"pentagon", "hexagon", "octagon"},
            reduce_ingest_types=True)
        # query ingest types = 5 ∩ ({pentagon} ∪ {hexagon})
        assert eff == {"pentagon", "hexagon"}
        # the query itself remains intact
        assert node == default_pipeline(jexl(self.COMPOUND))
        got = uids(catalog.query(
            self.COMPOUND,
            datatype_filter={"pentagon", "hexagon", "octagon"},
            reduce_ingest_types=True))
        assert got == {"pentagon", "hexagon"}

    def test_prune_reduces_filter_keeps_query(self, catalog):
        node, eff = catalog.plan(
            self.COMPOUND,
            datatype_filter={"pentagon", "hexagon", "octagon"},
            prune_query_by_ingest_types=True)
        assert eff == {"pentagon", "hexagon"}
        assert node == default_pipeline(jexl(self.COMPOUND))

    def test_reduce_and_prune(self, catalog):
        node, eff = catalog.plan(
            self.COMPOUND,
            datatype_filter={"pentagon", "hexagon", "octagon"},
            reduce_ingest_types=True, prune_query_by_ingest_types=True)
        assert eff == {"pentagon", "hexagon"}
        assert node == default_pipeline(jexl(self.COMPOUND))
        got = uids(catalog.query(
            self.COMPOUND,
            datatype_filter={"pentagon", "hexagon", "octagon"},
            reduce_ingest_types=True, prune_query_by_ingest_types=True))
        assert got == {"pentagon", "hexagon"}

    NESTED = ("ONLY_HEX == 'hexa' && (SHAPE == 'hexagon' || "
              "ONLY_QUAD == 'square')")
    NESTED_PRUNED = "ONLY_HEX == 'hexa' && SHAPE == 'hexagon'"

    def test_prune_nested_term(self, catalog):
        # ShapesTest.testPruneNestedTermAllPermutations: natural prune
        # drops the ONLY_QUAD term (exclusive of the hexagon context)
        node, _ = catalog.plan(self.NESTED,
                               prune_query_by_ingest_types=True)
        assert node == default_pipeline(jexl(self.NESTED_PRUNED))
        got = uids(catalog.query(self.NESTED,
                                 prune_query_by_ingest_types=True))
        assert got == {"hexagon"}

    def test_permutations(self, catalog):
        # all 8 option combos agree on results; prune changes the plan
        for prune_opt in (False, True):
            for reduce_opt in (False, True):
                for rebuild_opt in (False, True):
                    node, _ = catalog.plan(
                        self.NESTED,
                        prune_query_by_ingest_types=prune_opt,
                        reduce_ingest_types=reduce_opt,
                        rebuild_datatype_filter=rebuild_opt)
                    expect = self.NESTED_PRUNED if prune_opt else self.NESTED
                    assert node == default_pipeline(jexl(expect))
                    got = uids(catalog.query(
                        self.NESTED,
                        prune_query_by_ingest_types=prune_opt,
                        reduce_ingest_types=reduce_opt,
                        rebuild_datatype_filter=rebuild_opt))
                    assert got == {"hexagon"}


class TestRegexExpansion:
    def test_trailing_regex_single_term(self, catalog):
        assert uids(catalog.query("TYPE =~ 'acu.*'")) == {"acute"}

    def test_trailing_regex_multiple_terms(self, catalog):
        got = uids(catalog.query("TYPE =~ 'rhomb.*'"))
        assert got == {"rhombus", "rhomboid"}

    def test_leading_regex_single_term(self, catalog):
        assert uids(catalog.query("SHAPE =~ '.*angle'")) == TRIANGLE_UIDS

    def test_leading_regex_multiple_terms(self, catalog):
        assert uids(catalog.query("SHAPE =~ '.*gon'")) == OTHER_UIDS

    def test_leading_regex_with_datatype_filter(self, catalog):
        got = uids(catalog.query(
            "SHAPE =~ '.*gon'", datatype_filter={"pentagon", "octagon"}))
        assert got == {"pentagon", "octagon"}


class TestIngestTypeVisitorUnit:
    """Direct IngestTypeVisitor parity pins."""

    FT = {"SHAPE": ALL_TYPES, "ONLY_HEX": {"hexagon"},
          "ONLY_QUAD": {"quadrilateral"}, "ONLY_PENTA": {"pentagon"}}

    def test_leaf_and_or_and(self):
        ing = IngestTypes(self.FT)
        assert ing.of_query(jexl("ONLY_HEX == 'x'")) == {"hexagon"}
        assert ing.of_query(jexl("ONLY_HEX == 'x' || ONLY_QUAD == 'y'")) \
            == {"hexagon", "quadrilateral"}
        assert ing.of_query(jexl("SHAPE == 's' && ONLY_HEX == 'x'")) \
            == {"hexagon"}
        # disjoint intersection → empty
        assert ing.of_query(jexl("ONLY_QUAD == 'y' && ONLY_HEX == 'x'")) \
            == set()

    def test_unknown_field_collapses_to_unknown(self):
        ing = IngestTypes(self.FT)
        assert ing.of_query(jexl("MYSTERY == 'x' || ONLY_HEX == 'x'")) \
            == {UNKNOWN_TYPE}

    def test_disjoint_intersection_prunes_whole_query(self):
        node = default_pipeline(jexl("ONLY_QUAD == 'y' && ONLY_HEX == 'x'"))
        assert prune_ingest_types(node, self.FT) is None

    def test_null_equality_drops_from_intersection(self):
        # A && C == null where C is exclusive → C term evaluates true
        node = default_pipeline(
            jexl("ONLY_HEX == 'x' && ONLY_QUAD == null"))
        out = prune_ingest_types(node, self.FT)
        assert out == default_pipeline(jexl("ONLY_HEX == 'x'"))

    def test_not_null_kills_intersection(self):
        # A && !(C == null) for exclusive C evaluates false → AND dies
        node = default_pipeline(
            jexl("ONLY_HEX == 'x' && ONLY_QUAD != null"))
        assert prune_ingest_types(node, self.FT) is None


class TestSortOptions:
    """ShapesTest.testSortQueryPreIndexWithImpliedCounts /
    WithFieldCounts — pre-index term ordering."""

    def test_implied_counts_lexicographic(self):
        # DefaultJexlNodeComparator: same class cost → junction →
        # LEXICOGRAPHIC, so TYPE-term sorts after SHAPE-term
        from datawave_spark.compiler.rewrite import order_by_implied_cost
        node = order_by_implied_cost(
            jexl("TYPE == 'pentagon' || SHAPE == 'triangle'"))
        assert node == jexl("SHAPE == 'triangle' || TYPE == 'pentagon'")

    def test_field_counts_order(self):
        # FieldCostComparator: SHAPE count 23, TYPE count 21 → the
        # lower-count TYPE term sorts first
        from datawave_spark.compiler.rewrite import order_by_cost
        node = order_by_cost(
            jexl("SHAPE == 'triangle' || TYPE == 'pentagon'"),
            {"SHAPE": 23, "TYPE": 21})
        assert node == jexl("TYPE == 'pentagon' || SHAPE == 'triangle'")
