"""IfThisTestFailsThenHitTermsAreBroken corpus port (reference
warehouse/query-core/src/test/java/datawave/query/
IfThisTestFailsThenHitTermsAreBroken.java — MoreTestData corpus shared
with tests/test_occurrence_context.py; queries, expected UUID lists,
AND the expected per-instance hit-term multimaps verbatim from
expectedHitTerms at :104).

Pins value-level HIT_TERM tracking (HitListArithmetic.java:21): each
returned document carries 'FIELD.instance:value' for every value that
satisfied a positive leaf — hits from OTHER documents never leak in,
and occurrence/isNotNull assertions contribute no hits."""

import pytest

from datawave_spark.operators.hit_terms import with_value_hit_terms

from test_occurrence_context import FT, ROWS, SCHEMA

# (query, {uid: {expected hit terms}})
CASES = [
    ("UUID == 'First' || UUID == 'Second'",
     {"First": {"UUID.0:First"}, "Second": {"UUID.0:Second"}}),
    ("( UUID == 'First' || UUID == 'Second' ) && "
     "( FOO == 'FOO' || BAR == 'BAR' )",
     {"First": {"FOO.0:FOO", "UUID.0:First"},
      "Second": {"BAR.0:BAR", "UUID.0:Second"}}),
    ("( UUID == 'First' || UUID == 'Second' ) && NAME == 'NAME0'",
     {"First": {"NAME.0:NAME0", "UUID.0:First"},
      "Second": {"NAME.1:NAME0", "UUID.0:Second"}}),
    ("( UUID == 'First' || UUID == 'Second' ) && NAME == 'Haiqu' && "
     "FOO == 'FOO'",
     {"First": {"UUID.0:First", "NAME.2:Haiqu", "FOO.0:FOO"}}),
    ("( UUID == 'First' || UUID == 'Second' ) && NAME == 'Haiqu' && "
     "BAR == 'BAR'",
     {"Second": {"UUID.0:Second", "NAME.2:Haiqu", "BAR.0:BAR"}}),
    ("( UUID == 'First' || UUID == 'Second' || UUID == 'Third') && "
     "NAME == 'Haiqu' && BAR == 'BAR'",
     {"Second": {"UUID.0:Second", "NAME.2:Haiqu", "BAR.0:BAR"}}),
    ("( UUID == 'First' || UUID == 'Second' || UUID == 'Third') && "
     "filter:includeRegex(NAME,'Haiqu') && "
     "filter:includeRegex(BAR,'BAR')",
     {"Second": {"UUID.0:Second", "NAME.2:Haiqu", "BAR.0:BAR"}}),
    ("UUID == 'Second' && BAR == 'BAR'",
     {"Second": {"UUID.0:Second", "BAR.0:BAR"}}),
    ("NAME == 'Haiqu' && BAR == 'BAR' && "
     "filter:occurrence(NAME, '==', 3)",
     {"Second": {"NAME.2:Haiqu", "BAR.0:BAR"}}),
    ("UUID == 'First' && filter:isNotNull(NAME)",
     {"First": {"UUID.0:First"}}),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in ROWS], SCHEMA).cache()


@pytest.mark.parametrize("query,expected", CASES,
                         ids=[c[0][:48] for c in CASES])
def test_hit_terms(docs, query, expected):
    out = with_value_hit_terms(docs, query, field_types=FT)
    got = {r.uid: set(r.HIT_TERM)
           for r in out.select("uid", "HIT_TERM").collect()}
    assert set(got) == set(expected), query
    for uid, terms in expected.items():
        assert got[uid] == terms, (query, uid)
