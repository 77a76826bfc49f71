"""Flatten-family corpus port (reference warehouse/query-core/src/
test/java/datawave/query/{SimpleFlatten,NormalFlatten,GroupedFlatten}
QueryTest.java; data verbatim from src/test/resources/input/
city-flatten.json; modes from ingest-json/util/JsonObjectFlattener
.java FlattenMode).

SIMPLE keeps only top-level primitives; NORMAL path-prefixes nested
names (CAPITAL_CITY); GROUPED answers the LEAF name across grouping
contexts (CITY = capital|large|small) — the bounded FOUNDED range is
SAME-VALUE over those contexts where the unbounded conjunction is
independent any-value (GroupedFlattenQueryTest.testFoundedRange
Unbounded/Bounded pins exactly that split)."""

import json

import pytest

from datawave_spark.compiler import compile_query
from datawave_spark.sources.readers import flatten_json

DOCS = [
    {"STARTDATE": "20150606", "EVENTID": "flat-or-6", "STATE": "OreGOn",
     "CAPITAL": {"CITY": "saLEm", "FOUNDED": 1842,
                 "COUNTIES": ["marion", "polk"]},
     "LARGE": {"CITY": "porTLand", "FOUNDED": 1845,
               "COUNTIES": ["multnomah", "washington", "clackamas"]},
     "small": {"CITY": "Austin", "FOUNDED": 1888, "COUNTIES": ["Grant"]}},
    {"STARTDATE": "20150707", "EVENTID": "flat-tx-7", "STATE": "Texas",
     "CAPITAL": {"CITY": "Austin", "FOUNDED": 1835,
                 "COUNTIES": ["Hays", "travis", "williamson"]},
     "large": {"CITY": "Dallas", "FOUNDED": 1856,
               "COUNTIES": ["dallas", "collin", "denton", "rockwall",
                            "kaufman"]},
     "small": {"CITY": "Portland", "FOUNDED": 1950,
               "COUNTIES": ["nueces", "san patricio"]}},
    {"STARTDATE": "20150808", "EVENTID": "flat-ka-8", "STATE": "kansas",
     "CAPITAL": {"CITY": "topeka", "FOUNDED": 1854,
                 "COUNTIES": ["shawnee"]},
     "large": {"CITY": "kansas city", "FOUNDED": 1872,
               "COUNTIES": ["wyandotte"]},
     "small": {"CITY": "portland", "FOUNDED": 1886,
               "COUNTIES": ["sumner"]}},
]
# the reference flattener canonicalizes field-name case; the JSON's
# mixed large/LARGE, small/CAPITAL spellings land on one name
CANON = []
for d in DOCS:
    c = {}
    for k, v in d.items():
        c[k.upper()] = v
    CANON.append(c)


@pytest.fixture(scope="module")
def raw(spark):
    return spark.read.json(
        spark.sparkContext.parallelize(
            [json.dumps(c) for c in CANON]))


def ids(df, q, ft):
    out = compile_query(df, q, field_types=ft)
    vals = set()
    for r in out.select("EVENTID").collect():
        v = r.EVENTID
        # grouped mode wraps every leaf (EVENTID included) in an array
        vals.add(v[0] if isinstance(v, list) else v)
    return vals


LC = "lcNoDiacritics"


class TestSimpleFlatten:
    def test_state_and_dictionary(self, raw):
        flat = flatten_json(raw, "simple")
        assert {c.upper() for c in flat.columns} == \
            {"STARTDATE", "EVENTID", "STATE"}
        ft = {c: LC for c in flat.columns}
        assert ids(flat, "STATE == 'teXas'", ft) == {"flat-tx-7"}
        got = ids(flat, "STATE == 'teXas' || STATE == 'oReGon'", ft)
        assert got == {"flat-tx-7", "flat-or-6"}

    def test_error_data_dictionary(self, raw):
        # testErrorDataDictionary: CITY does not survive SIMPLE
        # flattening → strict nonexistent-field validation raises
        from datawave_spark.plans import QueryPlanner
        from datawave_spark.plans.catalog import InvalidQueryException
        flat = flatten_json(raw, "simple")
        with pytest.raises(InvalidQueryException):
            QueryPlanner(flat).plan("CITY == 'salem'")


class TestNormalFlatten:
    FT = {"STATE": LC, "CAPITAL_CITY": LC, "SMALL_CITY": LC,
          "LARGE_CITY": LC, "CAPITAL_COUNTIES": LC,
          "CAPITAL_FOUNDED": "number"}

    def test_paths(self, raw):
        flat = flatten_json(raw, "normal")
        assert ids(flat, "STATE == 'texas'", self.FT) == {"flat-tx-7"}
        assert ids(flat, "CAPITAL_CITY == 'saLEM' && "
                         "SMALL_CITY == 'auStin'", self.FT) \
            == {"flat-or-6"}
        assert ids(flat, "STATE == 'kAnsAs' || "
                         "CAPITAL_CITY == 'auStin'", self.FT) \
            == {"flat-ka-8", "flat-tx-7"}
        assert ids(flat, "SMALL_CITY == 'portLAnd' && "
                         "STATE == 'KansAs'", self.FT) == {"flat-ka-8"}

    def test_county_and_founded(self, raw):
        flat = flatten_json(raw, "normal")
        assert ids(flat, "CAPITAL_COUNTIES == 'marion'", self.FT) \
            == {"flat-or-6"}
        assert ids(flat, "((_Bounded_ = true) && "
                         "(CAPITAL_FOUNDED > 1840 && "
                         "CAPITAL_FOUNDED < 1860))", self.FT) \
            == {"flat-or-6", "flat-ka-8"}
        assert ids(flat, "CAPITAL_FOUNDED == 1854", self.FT) \
            == {"flat-ka-8"}


class TestGroupedFlatten:
    FT = {"STATE": LC, "CITY": LC, "COUNTIES": LC, "FOUNDED": "number"}

    def test_leaf_names(self, raw):
        flat = flatten_json(raw, "grouped")
        assert ids(flat, "STATE == 'texas'", self.FT) == {"flat-tx-7"}
        # CITY answers ANY grouping context
        assert ids(flat, "CITY == 'auStin'", self.FT) == \
            {"flat-or-6", "flat-tx-7"}
        assert ids(flat, "CITY == 'auStin' || STATE == 'KansAs'",
                   self.FT) == {"flat-or-6", "flat-tx-7", "flat-ka-8"}
        assert ids(flat, "CITY == 'portLAnd' && STATE == 'KansAs'",
                   self.FT) == {"flat-ka-8"}
        assert ids(flat, "COUNTIES == 'marion'", self.FT) \
            == {"flat-or-6"}
        assert ids(flat, "FOUNDED == 1854", self.FT) == {"flat-ka-8"}

    def test_founded_range_unbounded_vs_bounded(self, raw):
        flat = flatten_json(raw, "grouped")
        # UNBOUNDED: independent any-value bounds — every row has one
        # founded > 1850 and one < 1860 (GroupedFlattenQueryTest's own
        # comment), so the city term decides
        got = ids(flat, "CITY == 'AuStiN' && FOUNDED > 1850 && "
                        "FOUNDED < 1860", self.FT)
        assert got == {"flat-or-6", "flat-tx-7"}
        # BOUNDED: SAME value inside (1850, 1860) — only flat-tx-7's
        # large 1856 qualifies among Austin rows
        got = ids(flat, "CITY == 'AuStiN' && ((_Bounded_ = true) && "
                        "(FOUNDED > 1850 && FOUNDED < 1860))", self.FT)
        assert got == {"flat-tx-7"}

    def test_grouped_and_normal(self, raw):
        flat = flatten_json(raw, "grouped_and_normal")
        ft = self.FT | TestNormalFlatten.FT
        # both name sets answer on one frame
        assert ids(flat, "CITY == 'auStin'", ft) == \
            {"flat-or-6", "flat-tx-7"}
        assert ids(flat, "CAPITAL_CITY == 'auStin'", ft) \
            == {"flat-tx-7"}
        assert ids(flat, "CITY == 'topeka' && CAPITAL_FOUNDED == 1854",
                   ft) == {"flat-ka-8"}
