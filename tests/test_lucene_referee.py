"""LUCENE execution referee (round 8): random LUCENE queries run
through parse_lucene + the Column compiler vs an INDEPENDENT Python
evaluator implementing the reference semantics row-by-row
(LuceneToJexlQueryParser emission contract + DefaultArithmetic
evaluation):

- every LUCENE value is a STRING literal ("FIELD1 == '99999'",
  TestLuceneToJexlQueryParser.java:157); numeric behavior comes from
  the FIELD's type (a double column = NumberType), never the
  literal's spelling;
- wildcards evaluate via JexlPatternCache — (?is), full match;
- ranges are BOUNDED (the _Bounded_ marker, :305): SAME-VALUE
  semantics on multi-valued fields — one value satisfies both bounds;
- unfielded terms expand to every field, each branch normalizing the
  literal under that field's type (failure drops the branch only);
- comparisons are any-value over a field's value set; NOT is total.

The r8 sweep this test pins found four real bugs: numeric-looking
terms were typed into int/float literals (JexlArithmetic coercion
where the reference string-compares, 'F:99999' matched '099999');
_typed_literal silently kept an unparseable literal as a string
against a numeric column (ANSI whole-scan abort on 'VAL <= Y');
_ANYFIELD_ filtered expansion by the literal's spelling (unfielded
'5.0' never reached a double column); and LUCENE ranges compiled to
two INDEPENDENT any-value bounds (["a" TO "b"] on a multi-valued
field matched when different values satisfied each bound).
"""

from __future__ import annotations

import random
import re

import pytest

from datawave_spark.compiler import compile_query
from datawave_spark.lucene.parser import parse_lucene

ROWS = [
    ("r0", "rome",   ["x", "Y"],    "10",    5.0),
    ("r1", "Milan",  ["y"],         "099",   None),
    ("r2", "romeo",  ["x", None],   "99999", -1.5),
    ("r3", None,     [],            None,    0.0),
    ("r4", "10",     None,          "abc",   2.0),
    ("r5", "rome",   ["z", "x"],    "9.5",   5.0),
    ("r6", "R",      ["a b"],       "0",     7.25),
]
SCHEMA = "uid string, CITY string, TAGS array<string>, NUM string, VAL double"
ROWD = [dict(uid=u, CITY=c, TAGS=t, NUM=n, VAL=v) for u, c, t, n, v in ROWS]
FIELDS = ["CITY", "TAGS", "NUM", "VAL"]


def _values(row, f):
    v = row.get(f)
    if v is None:
        return []
    return [x for x in v if x is not None] if isinstance(v, list) else [v]


def _eval_leaf(row, field, kind, payload):
    fields = FIELDS if field == "_ANYFIELD_" else [field]
    for f in fields:
        numeric = f == "VAL"          # double column == NumberType field
        for v in _values(row, f):
            s = str(v)
            if kind == "eq":
                if numeric:
                    try:
                        if float(v) == float(payload):
                            return True
                    except ValueError:
                        pass          # literal fails normalization
                elif s == payload:
                    return True
            elif kind == "wild":
                rx = "".join(".*" if ch == "*" else "." if ch == "?"
                             else re.escape(ch) for ch in payload)
                # numeric values regex-match through their canonical
                # number string ('5', not the double render '5.0') —
                # the engine-wide rule (raw_match_string, pinned by the
                # MatchRegexTest port's real expected rows)
                if numeric:
                    s = re.sub(r"\.0$", "", s)
                if re.fullmatch("(?is)" + rx, s):
                    return True
            else:                      # bounded range, SAME value
                lo, hi, lo_inc, hi_inc = payload
                if numeric:
                    try:
                        flo, fhi, fv = float(lo), float(hi), float(v)
                    except ValueError:
                        continue      # a bound fails normalization
                    ok = (fv >= flo if lo_inc else fv > flo) and \
                         (fv <= fhi if hi_inc else fv < fhi)
                else:
                    ok = (s >= lo if lo_inc else s > lo) and \
                         (s <= hi if hi_inc else s < hi)
                if ok:
                    return True
    return False


class _L:
    def __init__(self, field, kind, payload, text):
        self.field, self.kind, self.payload, self.text = \
            field, kind, payload, text

    def ev(self, row):
        return _eval_leaf(row, self.field, self.kind, self.payload)


class _N:
    def __init__(self, op, kids):
        self.op, self.kids = op, kids

    @property
    def text(self):
        if self.op == "NOT":
            return f"NOT ({self.kids[0].text})"
        return "(" + f" {self.op} ".join(k.text for k in self.kids) + ")"

    def ev(self, row):
        if self.op == "NOT":
            return not self.kids[0].ev(row)
        agg = all if self.op == "AND" else any
        return agg(k.ev(row) for k in self.kids)


def _gen_leaf(rng):
    field = rng.choice(FIELDS + ["_ANYFIELD_"])
    f_txt = "" if field == "_ANYFIELD_" else field + ":"
    kind = rng.choice(["eq", "eq", "wild", "range"])
    if kind == "eq":
        v = rng.choice(["rome", "Milan", "10", "099", "99999", "x", "Y",
                        "9.5", "5.0", "abc"])
        return _L(field, "eq", v, f_txt + v)
    if kind == "wild":
        v = rng.choice(["rom*", "r?me", "*o*", "1*", "?", "M*", "*9"])
        return _L(field, "wild", v, f_txt + v)
    if field == "_ANYFIELD_":
        return _gen_leaf(rng)          # unfielded ranges: not valid
    lo, hi = sorted(rng.sample(["0", "10", "9.5", "a", "rome", "z",
                                "099", "Y"], 2))
    lo_inc, hi_inc = rng.random() < .5, rng.random() < .5
    txt = (f"{f_txt}{'[' if lo_inc else '{'}{lo} TO {hi}"
           f"{']' if hi_inc else '}'}")
    return _L(field, "range", (lo, hi, lo_inc, hi_inc), txt)


def _gen_tree(rng, depth=0):
    if depth >= 2 or rng.random() < 0.45:
        return _gen_leaf(rng)
    node = _N(rng.choice(["AND", "OR"]),
              [_gen_tree(rng, depth + 1) for _ in range(2)])
    if rng.random() < 0.3:
        node = _N("NOT", [node])
    return node


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def test_random_queries_match_referee(spark, corpus):
    rng = random.Random(808)
    mismatches = []
    for _ in range(120):
        t = _gen_tree(rng)
        node = parse_lucene(t.text)
        got = {r.uid for r in
               compile_query(corpus, node).select("uid").collect()}
        want = {row["uid"] for row in ROWD if t.ev(row)}
        if got != want:
            mismatches.append((t.text, sorted(want), sorted(got)))
    assert not mismatches, mismatches[:5]


def test_bounded_range_same_value_on_array(spark, corpus):
    """TAGS:[a TO rome} — r0's TAGS ['x','Y'] has 'x'>= 'a' and
    'Y' < 'rome' on DIFFERENT values; a bounded range must NOT match
    (the pre-r8 two-independent-bounds compilation did)."""
    got = {r.uid for r in
           compile_query(corpus, parse_lucene("TAGS:[a TO rome}"))
           .select("uid").collect()}
    assert got == {"r6"}               # only 'a b' is inside [a, rome)


def test_numeric_spelling_is_string_semantics(spark, corpus):
    """NUM:99999 must NOT match stored '099999'-style variants: string
    equality on an untyped field (the reference emits 'NUM == '99999'')."""
    got = {r.uid for r in
           compile_query(corpus, parse_lucene("NUM:99999"))
           .select("uid").collect()}
    assert got == {"r2"}
    got = {r.uid for r in
           compile_query(corpus, parse_lucene("NUM:10"))
           .select("uid").collect()}
    assert got == {"r0"}               # not r5's '10.0', not '099'


def test_unfielded_reaches_numeric_columns(spark, corpus):
    got = {r.uid for r in
           compile_query(corpus, parse_lucene("5.0"))
           .select("uid").collect()}
    assert got == {"r0", "r5"}         # VAL == 5.0 via _ANYFIELD_
