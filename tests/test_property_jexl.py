"""Property-based tests: the JEXL compiler against a pure-Python
evaluator implementing DataWave's documented semantics (any-value
comparisons, no-value-matches negation, total predicates).

This is the dual-execution oracle idea (SURVEY §5) at the unit level:
hypothesis generates random query trees + the Python referee evaluates
them row-by-row; the Spark result must agree exactly.
"""

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datawave_spark.compiler import compile_query
from datawave_spark.jexl.ast import (
    AndNode, CmpNode, Identifier, JexlNode, Literal, NotNode, OrNode,
)

# -------- fixed corpus: multi-value string field, scalar num, nullables
ROWS = [
    ("r0", ["alpha", "beta"], 1.0),
    ("r1", ["beta"], 5.5),
    ("r2", ["gamma", "alpha", "beta"], -3.0),
    ("r3", [], None),
    ("r4", ["delta"], 0.0),
    ("r5", None, 7.25),
    ("r6", ["alpha"], 5.5),
]
SCHEMA = "uid string, TAGS array<string>, NUM double"

STRINGS = ["alpha", "beta", "gamma", "delta", "nope"]
NUMBERS = [-3.0, 0.0, 1.0, 5.5, 7.25, 100.0]


def leaf_strategy():
    str_leaf = st.builds(
        lambda op, v: CmpNode(op, Identifier("TAGS"), Literal(v)),
        st.sampled_from(["==", "!="]), st.sampled_from(STRINGS))
    re_leaf = st.builds(
        lambda op, v: CmpNode(op, Identifier("TAGS"), Literal(v[:2] + ".*")),
        st.sampled_from(["=~", "!~"]), st.sampled_from(STRINGS))
    num_leaf = st.builds(
        lambda op, v: CmpNode(op, Identifier("NUM"), Literal(v)),
        st.sampled_from(["==", "!=", "<", ">", "<=", ">="]),
        st.sampled_from(NUMBERS))
    null_leaf = st.builds(
        lambda f, op: CmpNode(op, Identifier(f), Literal(None)),
        st.sampled_from(["TAGS", "NUM"]), st.sampled_from(["==", "!="]))
    return st.one_of(str_leaf, re_leaf, num_leaf, null_leaf)


def tree_strategy(depth: int = 3):
    return st.recursive(
        leaf_strategy(),
        lambda kids: st.one_of(
            st.builds(lambda a, b: AndNode((a, b)), kids, kids),
            st.builds(lambda a, b: OrNode((a, b)), kids, kids),
            st.builds(NotNode, kids),
        ),
        max_leaves=6)


# ---------------------------------------- pure-Python referee evaluator

def _values(row, field):
    if field == "TAGS":
        return row[1] or []
    return [] if row[2] is None else [row[2]]


def eval_node(node: JexlNode, row) -> bool:
    if isinstance(node, AndNode):
        return all(eval_node(t, row) for t in node.terms)
    if isinstance(node, OrNode):
        return any(eval_node(t, row) for t in node.terms)
    if isinstance(node, NotNode):
        return not eval_node(node.term, row)
    assert isinstance(node, CmpNode)
    vals = _values(row, node.field.name)
    lit = node.value.value
    if lit is None:
        empty = len(vals) == 0
        return empty if node.op == "==" else not empty
    if node.op in ("=~", "!~"):
        hit = any(re.fullmatch(str(lit), str(v)) for v in vals)
        return hit if node.op == "=~" else not hit
    ops = {"==": lambda v: v == lit, "<": lambda v: v < lit,
           ">": lambda v: v > lit, "<=": lambda v: v <= lit,
           ">=": lambda v: v >= lit}
    if node.op == "!=":
        return not any(v == lit for v in vals)
    return any(ops[node.op](v) for v in vals)


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=tree_strategy())
def test_compiler_matches_python_referee(spark, pdf, tree):
    expected = sorted(r[0] for r in ROWS if eval_node(tree, r))
    got = sorted(r.uid for r in compile_query(pdf, str(tree)).collect())
    assert got == expected, f"query {tree} → {got}, referee says {expected}"


@settings(max_examples=40, deadline=None)
@given(tree=tree_strategy())
def test_parser_roundtrip(tree):
    from datawave_spark.jexl.parser import parse
    assert parse(str(tree)) == tree


# ---------------- LUCENE ↔ JEXL front-end equivalence (property)

class TestLuceneJexlEquivalence:
    """Both syntax front-ends compile onto the same AST, so a random
    boolean tree rendered in LUCENE and in JEXL must select identical
    rows — the reference's LuceneToJexlQueryParser contract."""

    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(tree=st.recursive(
        st.one_of(
            st.builds(lambda v: ("TAGS", v), st.sampled_from(STRINGS)),
            st.builds(lambda v: ("NUM", v),
                      st.sampled_from(["5.5", "1.0", "0.0", "100.0"]))),
        lambda kids: st.one_of(
            st.builds(lambda a, b: ("AND", a, b), kids, kids),
            st.builds(lambda a, b: ("OR", a, b), kids, kids),
            st.builds(lambda a: ("NOT", a), kids)),
        max_leaves=6))
    def test_same_rows(self, spark, tree):
        from datawave_spark.lucene.parser import parse_lucene
        from datawave_spark.jexl.parser import parse as parse_jexl

        def lucene(t):
            if t[0] == "AND":
                return f"({lucene(t[1])} AND {lucene(t[2])})"
            if t[0] == "OR":
                return f"({lucene(t[1])} OR {lucene(t[2])})"
            if t[0] == "NOT":
                return f"(NOT {lucene(t[1])})"
            f, v = t
            return f"{f}:{v}"

        def jexl(t):
            if t[0] == "AND":
                return f"({jexl(t[1])} && {jexl(t[2])})"
            if t[0] == "OR":
                return f"({jexl(t[1])} || {jexl(t[2])})"
            if t[0] == "NOT":
                return f"!({jexl(t[1])})"
            f, v = t
            return f"{f} == '{v}'"

        df = spark.createDataFrame(ROWS, SCHEMA)
        got_l = {r.uid for r in
                 compile_query(df, parse_lucene(lucene(tree))).collect()}
        got_j = {r.uid for r in
                 compile_query(df, parse_jexl(jexl(tree))).collect()}
        assert got_l == got_j


# ------------------- round-4 parser properties (no Spark session used)

class TestLuceneSlopProperties:
    @given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                    min_size=2, max_size=5),
           st.integers(min_value=0, max_value=20))
    def test_slop_phrase_roundtrip(self, words, slop):
        from datawave_spark.jexl.ast import FuncNode
        from datawave_spark.lucene.parser import parse_lucene
        node = parse_lucene(f'F:"{" ".join(words)}"~{slop}')
        assert node == FuncNode("content", "within",
                                (Identifier("F"), Literal(slop),
                                 *[Literal(w) for w in words]))

    @given(st.text(alphabet="abcdefgh", min_size=1, max_size=8))
    def test_single_word_slop_is_equality(self, word):
        from datawave_spark.lucene.parser import parse_lucene
        node = parse_lucene(f'F:"{word}"~4')
        assert node == CmpNode("==", Identifier("F"), Literal(word))


class TestUUIDWildcardProperties:
    @given(st.text(alphabet="abcdef123", min_size=1, max_size=12),
           st.integers(min_value=0, max_value=12))
    def test_first_wildcard_index_inverse(self, selector, pos):
        """Inserting '*' at position i in a plain selector must be
        located at exactly i through the regex translation."""
        from datawave_spark.lucene.controlled import _first_wildcard_index
        from datawave_spark.lucene.parser import _wildcard_to_regex
        pos = min(pos, len(selector))
        wild = selector[:pos] + "*" + selector[pos:]
        assert _first_wildcard_index(_wildcard_to_regex(wild)) == pos

    @given(st.integers(min_value=1, max_value=8),
           st.integers(min_value=0, max_value=8))
    def test_wildcard_position_policy(self, allow_after, pos):
        """A wildcard at position p parses iff p >= allow_wildcard_after
        — the UUIDType policy, for every (policy, position) pair."""
        from datawave_spark.lucene.controlled import (
            ControlledQueryError, UUIDType, parse_uuid_query)
        sel = "abcdefgh"[:max(pos, 1)]
        q = f"U:{sel[:pos]}*{sel[pos:]}" if pos <= len(sel) else None
        if q is None:
            return
        types = [UUIDType("U", allow_wildcard_after=allow_after)]
        if pos >= allow_after:
            parse_uuid_query(q, types)
        else:
            with pytest.raises(ControlledQueryError):
                parse_uuid_query(q, types)


# ---------------- filter:compare vs a Python referee of compareFields

def _compare_referee(a, b, op, mode):
    """EvaluationPhaseFilterFunctions.compareFields, re-stated in
    Python: distinct non-null value sets, ==/!= set rules with the
    both-empty edge cases, min/max-bound inequalities with the Java
    switch's empty-set fall-through to false.

    Scope note: this referee was transcribed from the same Java source
    as the implementation, so the fuzz catches Spark-expression
    mechanics bugs (set ops, null handling, bound construction), not a
    shared misreading of the Java — the INDEPENDENT check on the
    semantics themselves is the hand-derived truth tables in
    tests/test_compiler.py::TestCompareFunction (whose ge_all case was
    corrected AGAINST intuition by reading compareFields)."""
    sa, sb = set(a), set(b)
    any_ = mode == "ANY"
    if op in ("==", "="):
        if not sa and not sb:
            return True
        return bool(sa & sb) if any_ else sa == sb
    if op == "!=":
        if not sa and not sb:
            return False
        return sa != sb if any_ else not (sa & sb)
    if not sa or not sb:
        return False
    lo1, hi1, lo2, hi2 = min(sa), max(sa), min(sb), max(sb)
    return {("<", True): lo1 < hi2, ("<", False): hi1 < lo2,
            ("<=", True): lo1 <= hi2, ("<=", False): hi1 <= lo2,
            (">", True): hi1 > lo2, (">", False): lo1 > hi2,
            (">=", True): hi1 >= lo2, (">=", False): lo1 >= hi2,
            }[(op, any_)]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
        st.tuples(st.lists(st.sampled_from([1.0, 2.0, 3.0, 5.0, 9.0]),
                           max_size=4),
                  st.lists(st.sampled_from([1.0, 2.0, 3.0, 5.0, 9.0]),
                           max_size=4)),
        min_size=1, max_size=8),
       op=st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
       mode=st.sampled_from(["ANY", "ALL"]))
def test_filter_compare_matches_referee(spark, rows, op, mode):
    from datawave_spark.compiler import compile_query
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id long, a array<double>, b array<double>")
    got = sorted(r.id for r in compile_query(
        df, f"filter:compare(A, '{op}', '{mode}', B)").collect())
    want = sorted(i for i, (a, b) in enumerate(rows)
                  if _compare_referee(a, b, op, mode))
    assert got == want, (op, mode, rows)
