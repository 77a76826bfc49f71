"""DataTypeQueryTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/DataTypeQueryTest.java — the generic + usa
cities datatypes under one catalog; data verbatim from
generic-cities.csv / usa-cities.csv).

EVENT_DATATYPE is a QUERYABLE pseudo-field (BaseRawData.java:28
appends it to every event) — '== / !=' against it restricts which
datatype frames contribute; the DATATYPE_FILTER_SET parameter does the
same from the option side (its semantics pinned in
tests/test_shapes.py)."""

import pytest

from datawave_spark.plans.catalog import DatatypeSpec, EventCatalog

from test_anyfield_cities import FT, ROWS as GENERIC_ROWS, SCHEMA

USA_ROWS = [
    ("20150606", "usa-rome-ky-6", "Rome", "Kentucky", "United States",
     "North America", "USA", "NA", 170.0, "0_0"),
    ("20150707", "usa-rome-mo-7", "Rome", "Missouri", "United States",
     "North America", "USA", "NA", 110.0, "0_0"),
    ("20150707", "usa-rome-in-7", "Rome", "Indiana", "United States",
     "North America", "USA", "NA", 190.0, "0_0"),
    ("20150808", "usa-rome-mo-8", "Rome", "Missouri", "United States",
     "North America", "USA", "NA", 110.0, "0_0"),
    ("20150808", "usa-rome-oh-8", "Rome", "Ohio", "United States",
     "North America", "USA", "NA", 100.0, "0_0"),
    ("20150909", "usa-rome-ky-9", "Rome", "Kansas", "United States",
     "North America", "USA", "NA", 180.0, "0_0"),
    ("20150909", "usa-rome-ia-9", "Rome", "Iowa", "United States",
     "North America", "USA", "NA", 120.0, "0_0"),
    ("20151010", "usa-rome-ms-10", "Rome", "Mississippi",
     "United States", "North America", "USA", "NA", 130.0, "0_0"),
    ("20151010", "usa-rome-oh-10", "Rome", "Ohio", "United States",
     "North America", "USA", "NA", 100.0, "0_0"),
    ("20151111", "usa-rome-il-11", "Rome", "Illinois", "United States",
     "North America", "USA", "NA", 150.0, "0_0"),
]

STATES = ("'ohio'", "'missouri'")


def expected(rows, pred):
    cols = ("START_DATE", "EVENT_ID", "CITY", "STATE", "COUNTRY",
            "CONTINENT", "CODE", "ACCESS", "NUM", "GEO")
    return {r[1] for r in rows if pred(dict(zip(cols, r)))}


@pytest.fixture(scope="module")
def catalog(spark):
    return EventCatalog({
        "generic": DatatypeSpec(
            spark.createDataFrame(GENERIC_ROWS, SCHEMA),
            field_types=FT),
        "usa": DatatypeSpec(
            spark.createDataFrame(USA_ROWS, SCHEMA), field_types=FT),
    })


def run(cat, q, **kw):
    out = cat.query(q, select=["EVENT_ID"], **kw)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


class TestDataTypeQuery:
    def test_datatype_equal_in_query(self, catalog):
        # testDataTypeEqualInQuery
        for dt, rows in (("generic", GENERIC_ROWS), ("usa", USA_ROWS)):
            for st in ("ohio", "missouri"):
                q = (f"STATE == '{st}' && EVENT_DATATYPE == '{dt}'")
                want = expected(rows,
                                lambda r: r["STATE"].lower() == st)
                assert run(catalog, q) == want, (dt, st)

    def test_datatype_not_equal_in_query(self, catalog):
        # testDataTypeNotEqualInQuery
        for dt, other in (("generic", USA_ROWS), ("usa", GENERIC_ROWS)):
            for st in ("ohio", "missouri"):
                q = f"STATE == '{st}' && EVENT_DATATYPE != '{dt}'"
                want = expected(other,
                                lambda r: r["STATE"].lower() == st)
                assert run(catalog, q) == want, (dt, st)

    def test_simple_param_equals_in_query_form(self, catalog):
        # testSimpleParam: the DATATYPE_FILTER_SET parameter ≡ the
        # in-query EVENT_DATATYPE conjunct
        for dt in ("generic", "usa"):
            for st in ("ohio", "missouri"):
                via_param = run(catalog, f"STATE == '{st}'",
                                datatype_filter={dt})
                via_field = run(catalog, f"STATE == '{st}' && "
                                         f"EVENT_DATATYPE == '{dt}'")
                assert via_param == via_field, (dt, st)

    def test_multi_datatype_filter(self, catalog):
        # testMultiDatatype: both datatypes in the filter
        for st in ("ohio", "missouri"):
            got = run(catalog, f"STATE == '{st}'",
                      datatype_filter={"generic", "usa"})
            want = expected(GENERIC_ROWS + USA_ROWS,
                            lambda r: r["STATE"].lower() == st)
            assert got == want and want, st

    def test_bounded_range_with_filter(self, catalog):
        # testRange: degenerate bounded NUM range under the filter
        for num in (100, 110):
            q = f"((_Bounded_ = true) && (NUM >= {num} && NUM <= {num}))"
            got = run(catalog, q, datatype_filter={"generic"})
            want = expected(GENERIC_ROWS,
                            lambda r: float(r["NUM"]) == num)
            assert got == want and want, num
