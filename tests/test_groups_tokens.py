"""GroupsQueryTest + TokensQueryTest corpus port (reference
warehouse/query-core/src/test/java/datawave/query/{GroupsQueryTest,
TokensQueryTest}.java; data verbatim from
src/test/resources/input/city-groups.csv).

Data model (GroupsDataType.GroupField): CITY.EAST/CITY.WEST share the
query field CITY (grouped instances → a parallel array here), same for
STATE and COUNT (NumberType); TOKENS is a TOKENIZED zone
(ContentCSVColumnBasedHandler + TOKEN_INDEX_ALLOWLIST) — the event
keeps the full raw value and the token terms match through the
index/TF side, modeled as [raw] + whitespace tokens in the value array
plus a TOKENS_tf offset map for the content: functions.

Expected sets referee-evaluated over the raw tuples (the reference's
QueryJexl/getExpectedKeyResponse)."""

import pytest

from datawave_spark.compiler import compile_query
from datawave_spark.lucene.parser import parse_lucene

# city-groups.csv: START_DATE, EVENT_ID, CITY.EAST, STATE.EAST,
# COUNT.EAST, CITY.WEST, STATE.WEST, COUNT.WEST, TOKENS
RAW = [
    ("20150606", "group-cha-cor-6", "chapel hill", "north carolina", 57,
     "corvallis", "oregon", 54, "durham eugene wake"),
    ("20150606", "group-dur-eug-6", "durham", "north carolina", 252,
     "eugene", "oregon", 156, "charlotte portland"),
    ("20150707", "group-dov-cco-7", "Dover", "deleware", 36,
     "chico", "california", 86, "seaford salem seattle"),
    ("20150707", "group-cha-oly-7", "charlottesville", "virginia", 47,
     "olympia", "washington", 46, "richmond tocoma"),
    ("20150707", "group-bur-fla-7", "burlington", "vermont", 42,
     "flagstaff", "arizona", 66, "nashua yuma"),
    ("20150708", "group-mon-sal-7", "montpilier", "vermont", 8,
     "salem", "oregon", 155, "concord beaverton"),
    ("20150708", "group-sal-van-7", "salem", "Massachusetts", 41,
     "vancover", "washington", 162, "springfield olympia"),
]

ROWS = [
    (sd, eid, [ce, cw], [se, sw], [float(ne), float(nw)],
     [toks] + toks.split(),
     {t: [i] for i, t in enumerate(toks.split())})
    for (sd, eid, ce, se, ne, cw, sw, nw, toks) in RAW
]
SCHEMA = ("START_DATE string, EVENT_ID string, CITY array<string>, "
          "STATE array<string>, COUNT array<double>, "
          "TOKENS array<string>, TOKENS_tf map<string, array<int>>")
FT = {"START_DATE": "lcNoDiacritics", "EVENT_ID": "lcNoDiacritics",
      "CITY": "lcNoDiacritics", "STATE": "lcNoDiacritics",
      "COUNT": "number", "TOKENS": "lcNoDiacritics"}
# GroupsIndexConfiguration index = CITY/STATE/COUNT; TokensQueryTest
# adds TOKENS (fields.addIndexField(TOKENS))
ANY = {"CITY", "STATE", "COUNT", "TOKENS"}


def expected(pred):
    out = set()
    for (sd, eid, ce, se, ne, cw, sw, nw, toks) in RAW:
        row = {"EVENT_ID": eid, "CITY": [ce, cw], "STATE": [se, sw],
               "COUNT": [float(ne), float(nw)],
               "TOKENS": [toks] + toks.split()}
        if pred(row):
            out.add(eid)
    return out


def has(row, field, value):
    return any(str(v).lower() == value.lower() for v in row[field])


@pytest.fixture(scope="module")
def groups(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q, **kw):
    out = compile_query(df, q, field_types=FT, **kw)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


class TestGroups:
    def test_same(self, groups):
        # testSame: CITY covers both grouped instances — 'chico' (a
        # WEST city) and 'dover' (the same row's EAST city) answer
        # identically, case-insensitively
        chico = run(groups, "CITY == 'chiCO'")
        dover = run(groups, "CITY == 'doVer'")
        assert chico == dover == {"group-dov-cco-7"}

    def test_equivalent(self, groups):
        # testEquivalent: STATE == 'north carolina' ≡ CITY == 'durham'
        # || CITY == 'corvallis' on this corpus
        state = run(groups, "STATE == 'north carolina'")
        city = run(groups, "CITY == 'durham' || CITY == 'corvallis'")
        assert state == city == expected(
            lambda r: has(r, "STATE", "north carolina"))

    def test_composite_range(self, groups):
        # testCompositeRange: bounded SAME-VALUE range over the COUNT
        # array + a city disjunction
        q = ("STATE == 'oregon' && (CITY == 'olympia' || "
             "CITY == 'salem') && ((_Bounded_ = true) && "
             "(COUNT > 40 && COUNT < 170))")
        want = expected(lambda r: has(r, "STATE", "oregon")
                        and (has(r, "CITY", "olympia")
                             or has(r, "CITY", "salem"))
                        and any(40 < c < 170 for c in r["COUNT"]))
        assert run(groups, q) == want and want

    def test_composite_multi_range(self, groups):
        # testCompositeMultiRange: (A && R1) || R2 — JEXL precedence
        q = ("STATE == 'oregon' && ((_Bounded_ = true) && "
             "(COUNT > 22 && COUNT < 44)) || ((_Bounded_ = true) && "
             "(COUNT > 125 && COUNT < 170))")
        want = expected(
            lambda r: (has(r, "STATE", "oregon")
                       and any(22 < c < 44 for c in r["COUNT"]))
            or any(125 < c < 170 for c in r["COUNT"]))
        assert run(groups, q) == want and want

    def test_composite_multi_or(self, groups):
        # testCompositeMultiOr: numeric equality disjunction
        q = ("STATE == 'oregon' && (COUNT == 155 || COUNT == 36 || "
             "COUNT == 54 || COUNT == 66)")
        want = expected(lambda r: has(r, "STATE", "oregon")
                        and any(c in (155, 36, 54, 66)
                                for c in r["COUNT"]))
        assert run(groups, q) == want and want

    def test_composite_complex(self, groups):
        # testCompositeComplex: nested conj/range/value-list
        q = ("STATE == 'oregon' && ((CITY == 'salem' && COUNT == 41) "
             "|| ((_Bounded_ = true) && (COUNT > 40 && COUNT < 70)) "
             "|| (COUNT == 47 || COUNT == 36 || COUNT == 155))")
        want = expected(
            lambda r: has(r, "STATE", "oregon")
            and ((has(r, "CITY", "salem")
                  and any(c == 41 for c in r["COUNT"]))
                 or any(40 < c < 70 for c in r["COUNT"])
                 or any(c in (47, 36, 155) for c in r["COUNT"])))
        assert run(groups, q) == want and want


class TestTokens:
    def test_token_match(self, groups):
        # testTokenMatch: equality against a TOKEN of the zone
        for city, want in (("salem", {"group-dov-cco-7"}),
                           ("olympia", {"group-sal-van-7"}),
                           ("yuma", {"group-bur-fla-7"})):
            got = run(groups, f"TOKENS == '{city}'")
            assert got == expected(lambda r: has(r, "TOKENS", city)) \
                == want, city

    def test_field_match(self, groups):
        # testFieldMatch: equality against the FULL raw value
        got = run(groups, "TOKENS == 'nashua yuma'")
        assert got == {"group-bur-fla-7"}

    def test_lucene_token_slop(self, groups):
        # testLuceneToken: TOKENS:"yuma"~4 — single-word phrase
        # ignores the slop (SelectorNode branch) → plain equality
        node = parse_lucene('TOKENS:"yuma"~4')
        out = compile_query(groups, node, field_types=FT)
        assert {r.EVENT_ID for r in out.select("EVENT_ID").collect()} \
            == {"group-bur-fla-7"}

    def test_lucene_field_slop(self, groups):
        # testLuceneField: TOKENS:"nashua yuma"~4 → content:within
        # over the zone's term offsets — same rows as the raw equality
        node = parse_lucene('TOKENS:"nashua yuma"~4')
        out = compile_query(groups, node, field_types=FT)
        assert {r.EVENT_ID for r in out.select("EVENT_ID").collect()} \
            == run(groups, "TOKENS == 'nashua yuma'") \
            == {"group-bur-fla-7"}

    def test_any_field(self, groups):
        # testAnyField over the indexed set (CITY/STATE/COUNT/TOKENS)
        for city in ("salem", "olympia", "yuma"):
            got = run(groups, f"_ANYFIELD_ == '{city}'", anyfield=ANY)
            want = expected(lambda r: any(
                has(r, f, city) for f in ("CITY", "STATE", "TOKENS")))
            assert got == want and want, city

    def test_or_any_field(self, groups):
        # testOrAnyField
        got = run(groups, "_ANYFIELD_ == 'olympia' || "
                          "_ANYFIELD_ == 'durham'", anyfield=ANY)
        want = expected(lambda r: any(
            has(r, f, "olympia") or has(r, f, "durham")
            for f in ("CITY", "STATE", "TOKENS")))
        assert got == want and want

    def test_regex_any_field(self, groups):
        # testRegexAnyField: _ANYFIELD_ =~ 'c.*'
        import re as _re
        got = run(groups, "_ANYFIELD_ =~ 'c.*'", anyfield=ANY)
        want = expected(lambda r: any(
            _re.match(r"(?is)^c.*$", str(v))
            for f in ("CITY", "STATE", "TOKENS") for v in r[f]))
        assert got == want and want
