"""Adversarial referee fuzz for the JEXL→Column compiler SPINE —
the round-7 referee discipline (ported-Java referees + hypothesis)
pointed at the most load-bearing component instead of the filter:
functions.

Referee = DatawaveArithmetic / DatawaveInterpreter evaluation semantics
ported to Python (jexl/DatawaveArithmetic.java:24,50-120 any-value set
semantics; DatawaveInterpreter.java:71 per-document total evaluation):

- a comparison against a missing/null/empty field is FALSE, so its JEXL
  negation is TRUE;
- multi-valued fields compare with implicit-EXISTS over their non-null
  values; ``!=`` / ``!~`` mean NO value matches;
- ``=~`` is ``Pattern.matches`` (full match) with JexlPatternCache's
  CASE_INSENSITIVE | DOTALL flags ((?m) pinned out — DIVERGENCES.md #7);
- ``== null`` is an is-null test (scalar NULL; array NULL or empty);
- field-to-field comparison is ANY×ANY over both value sets.

Every generated case runs THREE ways — the Spark compiler
(datawave_spark.compiler), this referee, and an independent DuckDB SQL
translation of the same AST — and all three must agree.  The leaf sweep
enumerates every (op × field × literal) combination in ONE Spark job /
ONE DuckDB query; the hypothesis property generates random AND/OR/NOT
trees over them.  Together they exceed the 200-case directive by an
order of magnitude (≈500 enumerated leaves + 40 random trees × rows).
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawave_spark.compiler import compile_query
from datawave_spark.compiler.columns import CompileContext, compile_node
from datawave_spark.jexl.parser import parse

# ---------------------------------------------------------------- data

# Column kinds: (name, spark type, duckdb type, literal pool)
STR_POOL = ["a", "b", "B", "10", "9", "a\nb"]
NUM_POOL = [0, 1, 9, 10]
DBL_POOL = [0.5, 10.0]
REGEX_POOL = ["a.*", "B", "1.", ".*0", "a.b"]

FIELDS = {
    "S": "str",      # scalar string
    "S2": "str",     # scalar string (field-to-field partner)
    "A": "astr",     # array<string>
    "N": "num",      # scalar long
    "D": "dbl",      # scalar double
    "M": "anum",     # array<long>
    "L": "lc",       # lc-normalized string (stored lowercase, at rest)
    "X": "str",      # NOT in the schema — missing-field semantics
}

SPARK_SCHEMA = ("id long, S string, S2 string, A array<string>, "
                "N long, D double, M array<long>, L string")

# Deterministic adversarial row set for the enumerated sweep: all-null,
# empty arrays, null-element arrays, boundary values, case variants,
# a multi-line value (DOTALL), numeric strings (lexicographic traps).
SWEEP_ROWS = [
    # (S, S2, A, N, D, M, L)
    (None, None, None, None, None, None, None),
    ("a", "a", ["a"], 1, 0.5, [1], "a"),
    ("B", "b", ["b", "B"], 10, 10.0, [10, 0], "b"),
    ("10", "9", ["10", "9"], 9, 0.5, [9], "c"),
    ("a\nb", "a", ["a\nb", None], 0, 10.0, [0, None], "a"),
    ("b", None, [], None, None, [], None),
    (None, "B", [None], 1, None, [None], "b"),
    ("9", "10", ["a", None, "B"], 10, 0.5, [1, 9, 10], "c"),
]


def sweep_df(spark):
    return spark.createDataFrame(
        [(i, *r) for i, r in enumerate(SWEEP_ROWS)], SPARK_SCHEMA)


def sweep_pandas():
    return pd.DataFrame(
        [{"id": i, "S": r[0], "S2": r[1], "A": r[2], "N": r[3],
          "D": r[4], "M": r[5], "L": r[6]} for i, r in
         enumerate(SWEEP_ROWS)])


# ---------------------------------------------------------- the referee

def _values(row: dict, field: str) -> list:
    """Non-null value set of a field — absent/NULL → empty (the
    reference's FunctionalSet holds only actual values)."""
    v = row.get(field)
    if v is None:
        return []
    if isinstance(v, list):
        return [x for x in v if x is not None]
    return [v]


def _java_str(v) -> str:
    """The string form =~ sees: Spark's cast-to-string on the element
    type (long → '10', double → '10.0' — same as Java's toString)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def ref_leaf(op: str, values: list, lit) -> bool:
    """ANY-value comparison vs a literal (DatawaveArithmetic set
    semantics).  ``values`` are the field's non-null values."""
    if op == "=~":
        pat = re.compile(f"^(?:{lit})$", re.I | re.S)
        return any(pat.match(_java_str(v)) for v in values)
    cmp = {"==": lambda a, b: a == b, "<": lambda a, b: a < b,
           ">": lambda a, b: a > b, "<=": lambda a, b: a <= b,
           ">=": lambda a, b: a >= b}[op]
    return any(cmp(v, lit) for v in values)


def ref_eval(node_kind, row: dict) -> bool:
    """Evaluate a generated AST tuple against one row — the ported
    reference semantics (see module docstring)."""
    kind = node_kind[0]
    if kind == "and":
        return all(ref_eval(t, row) for t in node_kind[1])
    if kind == "or":
        return any(ref_eval(t, row) for t in node_kind[1])
    if kind == "not":
        return not ref_eval(node_kind[1], row)
    if kind == "cmp":
        _, op, field, lit = node_kind
        if lit is None:                        # FIELD ==/!= null
            v = row.get(field) if field in row else None
            is_null = v is None or (isinstance(v, list) and len(v) == 0)
            return is_null if op == "==" else not is_null
        if field == "L":
            lit = lit.lower()                  # lc normalizer folding
        neg = op in ("!=", "!~")
        pos = {"!=": "==", "!~": "=~"}.get(op, op)
        values = _values(row, field)
        if (FIELDS.get(field) in ("str", "astr")
                and isinstance(lit, (int, float))
                and not isinstance(lit, bool) and pos != "=~"):
            # JexlArithmetic numeric coercion: NUMBER literal vs string
            # field compares numerically on values that parse; an
            # unparseable stored value is a non-match (never an error)
            parsed = []
            for v in values:
                try:
                    parsed.append(float(v))
                except (TypeError, ValueError):
                    pass
            hit = ref_leaf(pos, parsed, float(lit))
        else:
            hit = ref_leaf(pos, values, lit)
        return not hit if neg else hit
    if kind == "fcmp":
        _, op, f1, f2 = node_kind
        neg = op == "!="
        pos = "==" if neg else op
        hit = ref_leaf_pairs(pos, _values(row, f1), _values(row, f2))
        return not hit if neg else hit
    if kind == "range":
        # BOUNDED range (r8): SAME-VALUE semantics — one value must
        # satisfy BOTH bounds (QueryPropertyMarker BOUNDED_RANGE)
        _, field, lo_op, lo, hi_op, hi = node_kind
        if field == "L":
            lo, hi = lo.lower(), hi.lower()
        cmp = {"<": lambda a, b: a < b, ">": lambda a, b: a > b,
               "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b}
        values = _values(row, field)
        coerce = (FIELDS.get(field) in ("str", "astr")
                  and any(isinstance(b, (int, float))
                          and not isinstance(b, bool) for b in (lo, hi)))
        if coerce:
            try:
                flo, fhi = float(lo), float(hi)
            except (TypeError, ValueError):
                return False
            for v in values:
                try:
                    fv = float(v)
                except (TypeError, ValueError):
                    continue
                if cmp[lo_op](fv, flo) and cmp[hi_op](fv, fhi):
                    return True
            return False
        return any(cmp[lo_op](v, lo) and cmp[hi_op](v, hi)
                   for v in values)
    raise ValueError(node_kind)


def ref_leaf_pairs(op: str, left: list, right: list) -> bool:
    cmp = {"==": lambda a, b: a == b, "<": lambda a, b: a < b,
           ">": lambda a, b: a > b, "<=": lambda a, b: a <= b,
           ">=": lambda a, b: a >= b}[op]
    return any(cmp(x, y) for x in left for y in right)


# --------------------------------------------- render / translate an AST

def to_jexl(node) -> str:
    kind = node[0]
    if kind == "and":
        return "(" + " && ".join(to_jexl(t) for t in node[1]) + ")"
    if kind == "or":
        return "(" + " || ".join(to_jexl(t) for t in node[1]) + ")"
    if kind == "not":
        return f"!({to_jexl(node[1])})"
    if kind == "cmp":
        _, op, field, lit = node
        if lit is None:
            rendered = "null"
        elif isinstance(lit, str):
            # raw newline inside the quotes — the JEXL escape rule is
            # \x → x, so '\n' would collapse to a literal 'n'
            body = lit.replace("\\", "\\\\").replace("'", "\\'")
            rendered = f"'{body}'"
        else:
            rendered = repr(lit)
        return f"{field} {op} {rendered}"
    if kind == "fcmp":
        _, op, f1, f2 = node
        return f"{f1} {op} {f2}"
    if kind == "range":
        _, field, lo_op, lo, hi_op, hi = node

        def lit(x):
            if isinstance(x, str):
                body = x.replace("\\", "\\\\").replace("'", "\\'")
                return f"'{body}'"
            return repr(x)
        return (f"((_Bounded_ = true) && ({field} {lo_op} {lit(lo)} && "
                f"{field} {hi_op} {lit(hi)}))")
    raise ValueError(node)


def _duck_lit(lit) -> str:
    if isinstance(lit, str):
        return "'" + lit.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
    return repr(lit)


def to_duckdb(node) -> str:
    """Independent SQL translation of the reference semantics (NOT a
    port of the Spark compiler): COALESCE-totalized any-value EXISTS
    via list_filter, regexp_full_match with RE2 (?is) flags."""
    kind = node[0]
    if kind == "and":
        return "(" + " AND ".join(to_duckdb(t) for t in node[1]) + ")"
    if kind == "or":
        return "(" + " OR ".join(to_duckdb(t) for t in node[1]) + ")"
    if kind == "not":
        return f"(NOT {to_duckdb(node[1])})"
    if kind == "cmp":
        _, op, field, lit = node
        is_arr = FIELDS[field] in ("astr", "anum")
        missing = field == "X"
        if lit is None:
            if missing:
                base = "TRUE"
            elif is_arr:
                base = f"({field} IS NULL OR len({field}) = 0)"
            else:
                base = f"({field} IS NULL)"
            return base if op == "==" else f"(NOT {base})"
        if field == "L":
            lit = lit.lower()
        neg = op in ("!=", "!~")
        pos = {"!=": "==", "!~": "=~"}.get(op, op)
        coerce = (FIELDS[field] in ("str", "astr")
                  and isinstance(lit, (int, float))
                  and not isinstance(lit, bool) and pos != "=~")
        if missing:
            base = "FALSE"
        elif coerce:
            sqlop = "=" if pos == "==" else pos
            v = repr(float(lit))
            if is_arr:
                base = (f"COALESCE(len(list_filter({field}, x -> "
                        f"TRY_CAST(x AS DOUBLE) {sqlop} {v})) > 0, "
                        f"FALSE)")
            else:
                base = (f"COALESCE(TRY_CAST({field} AS DOUBLE) "
                        f"{sqlop} {v}, FALSE)")
        elif pos == "=~":
            pat = _duck_lit(f"(?is)(?:{lit})")
            if is_arr:
                base = (f"COALESCE(len(list_filter({field}, x -> "
                        f"regexp_full_match(CAST(x AS VARCHAR), {pat})))"
                        f" > 0, FALSE)")
            else:
                base = (f"COALESCE(regexp_full_match(CAST({field} AS "
                        f"VARCHAR), {pat}), FALSE)")
        else:
            sqlop = "=" if pos == "==" else pos
            v = _duck_lit(lit)
            if is_arr:
                base = (f"COALESCE(len(list_filter({field}, "
                        f"x -> x {sqlop} {v})) > 0, FALSE)")
            else:
                base = f"COALESCE({field} {sqlop} {v}, FALSE)"
        return f"(NOT {base})" if neg else base
    if kind == "fcmp":
        _, op, f1, f2 = node
        neg = op == "!="
        pos = "==" if neg else op
        sqlop = "=" if pos == "==" else pos
        a1 = FIELDS[f1] in ("astr", "anum")
        a2 = FIELDS[f2] in ("astr", "anum")
        if a1 and a2:
            base = (f"COALESCE(len(list_filter({f1}, x -> COALESCE("
                    f"len(list_filter({f2}, y -> y {_flip(sqlop)} x)) > 0,"
                    f" FALSE))) > 0, FALSE)")
        elif a1:
            base = (f"COALESCE(len(list_filter({f1}, "
                    f"x -> x {sqlop} {f2})) > 0, FALSE)")
        elif a2:
            base = (f"COALESCE(len(list_filter({f2}, "
                    f"y -> {f1} {sqlop} y)) > 0, FALSE)")
        else:
            base = f"COALESCE({f1} {sqlop} {f2}, FALSE)"
        return f"(NOT {base})" if neg else base
    if kind == "range":
        _, field, lo_op, lo, hi_op, hi = node
        is_arr = FIELDS[field] in ("astr", "anum")
        if field == "X":
            return "FALSE"
        if field == "L":
            lo, hi = lo.lower(), hi.lower()
        coerce = (FIELDS[field] in ("str", "astr")
                  and any(isinstance(b, (int, float))
                          and not isinstance(b, bool) for b in (lo, hi)))
        if coerce:
            vlo, vhi = repr(float(lo)), repr(float(hi))
            body = (f"TRY_CAST({{x}} AS DOUBLE) {_sqlop(lo_op)} {vlo} AND "
                    f"TRY_CAST({{x}} AS DOUBLE) {_sqlop(hi_op)} {vhi}")
        else:
            vlo, vhi = _duck_lit(lo), _duck_lit(hi)
            body = (f"{{x}} {_sqlop(lo_op)} {vlo} AND "
                    f"{{x}} {_sqlop(hi_op)} {vhi}")
        if is_arr:
            return (f"COALESCE(len(list_filter({field}, x -> "
                    f"{body.format(x='x')})) > 0, FALSE)")
        return f"COALESCE({body.format(x=field)}, FALSE)"
    raise ValueError(node)


def _sqlop(op: str) -> str:
    return "=" if op == "==" else op


def _flip(sqlop: str) -> str:
    return {"=": "=", "<": ">", ">": "<", "<=": ">=", ">=": "<="}[sqlop]


# ------------------------------------------------------ enumerated sweep

def leaf_cases() -> list:
    """Every (op × field × type-compatible literal) combination, plus
    regex and null-literal variants — ~500 cases."""
    cases = []
    for field, kind in FIELDS.items():
        if kind in ("str", "astr", "lc"):
            pool, repool = STR_POOL, REGEX_POOL
        elif kind in ("num", "anum"):
            pool, repool = NUM_POOL, REGEX_POOL[:2]
        else:
            pool, repool = DBL_POOL, REGEX_POOL[:2]
        for op in ("==", "!=", "<", ">", "<=", ">="):
            for lit in pool:
                cases.append(("cmp", op, field, lit))
        for op in ("=~", "!~"):
            for pat in repool:
                cases.append(("cmp", op, field, pat))
        for op in ("==", "!="):
            if field != "X":          # missing-field null semantics are
                cases.append(("cmp", op, field, None))  # unpinned (doc'd)
        if kind in ("str", "astr"):
            # JexlArithmetic numeric coercion: NUMBER literals against
            # string fields ('10' == 10, '010' == 10, '10.0' >= 10)
            for op in ("==", "!=", "<", ">", "<=", ">="):
                for lit in (10, 9, 0.5):
                    cases.append(("cmp", op, field, lit))
    for f1, f2 in (("S", "S2"), ("S", "A"), ("A", "S2"), ("N", "D"),
                   ("N", "M"), ("M", "N")):
        for op in ("==", "!=", "<", ">", "<=", ">="):
            cases.append(("fcmp", op, f1, f2))
    # BOUNDED ranges (r8): same-value semantics, every field kind,
    # string + numeric-coercion bounds, all inclusivity combinations
    range_bounds = {
        "S": [("B", "b"), ("10", "a\nb"), (9, 10), (0.5, 10)],
        "A": [("B", "b"), ("10", "a"), (9, 10)],
        "N": [(0, 9), (1, 10), (9, 9)],
        "M": [(0, 10), (9, 10)],
        "D": [(0.5, 10.0), (0.5, 0.5)],
        "L": [("A", "B"), ("a", "b")],
        "X": [("a", "b")],
    }
    for field, pool in range_bounds.items():
        for lo, hi in pool:
            for lo_op, hi_op in ((">=", "<="), (">", "<"), (">=", "<")):
                cases.append(("range", field, lo_op, lo, hi_op, hi))
    return cases


def _spark_truth(spark, df, nodes) -> list[list[bool]]:
    """Compile every generated AST through the REAL pipeline (JEXL
    string → parser → compile_node → Column) and evaluate them all in
    ONE job; NULL ≡ False (WHERE-clause reading)."""
    ctx = CompileContext.for_dataframe(df, field_types={"L": "lc"},
                                       at_rest={"L"})
    cols = [compile_node(parse(to_jexl(n)), ctx).alias(f"c{i}")
            for i, n in enumerate(nodes)]
    rows = df.select("id", *cols).orderBy("id").collect()
    return [[bool(row[f"c{i}"]) if row[f"c{i}"] is not None else False
             for i in range(len(nodes))] for row in rows]


def test_leaf_sweep_three_way():
    """~500 enumerated leaf predicates × 8 adversarial rows: the Spark
    compiler, the ported-Java referee, and the independent DuckDB
    translation must agree on every (case, row) bit."""
    from datawave_spark.session import get_spark
    spark = get_spark("compiler_referee")
    cases = leaf_cases()
    assert len(cases) >= 200, "sweep must exceed the 200-case directive"
    df = sweep_df(spark)
    got = _spark_truth(spark, df, cases)

    rows = [dict(zip(("S", "S2", "A", "N", "D", "M", "L"), r))
            for r in SWEEP_ROWS]
    con = duckdb.connect()
    con.register("t", sweep_pandas())
    sql = "SELECT id, " + ", ".join(
        f"{to_duckdb(n)} AS c{i}" for i, n in enumerate(cases)) + \
        " FROM t ORDER BY id"
    duck = con.execute(sql).fetchall()

    bad = []
    for ri, row in enumerate(rows):
        for ci, case in enumerate(cases):
            want = ref_eval(case, row)
            s = got[ri][ci]
            d = bool(duck[ri][ci + 1])
            if not (s == d == want):
                bad.append((to_jexl(case), ri, {"spark": s, "duckdb": d,
                                                "referee": want}))
    assert not bad, bad[:10]


# ------------------------------------------------------- random trees

LEAF_ST = st.one_of(
    st.tuples(st.just("cmp"),
              st.sampled_from(["==", "!=", "<", ">", "<=", ">="]),
              st.sampled_from(["S", "S2", "A", "L", "X"]),
              st.sampled_from(STR_POOL)),
    st.tuples(st.just("cmp"),
              st.sampled_from(["==", "!=", "<", ">", "<=", ">="]),
              st.sampled_from(["N", "M"]),
              st.sampled_from(NUM_POOL)),
    st.tuples(st.just("cmp"), st.sampled_from(["==", "!=", "<", ">"]),
              st.just("D"), st.sampled_from(DBL_POOL)),
    st.tuples(st.just("cmp"), st.sampled_from(["=~", "!~"]),
              st.sampled_from(["S", "A", "L"]),
              st.sampled_from(REGEX_POOL)),
    st.tuples(st.just("cmp"), st.sampled_from(["==", "!="]),
              st.sampled_from(["S", "A", "N", "M", "L"]), st.none()),
    st.tuples(st.just("cmp"),
              st.sampled_from(["==", "!=", "<", ">", "<=", ">="]),
              st.sampled_from(["S", "A", "X"]),
              st.sampled_from(NUM_POOL + DBL_POOL)),
    st.tuples(st.just("fcmp"),
              st.sampled_from(["==", "!=", "<", ">", "<=", ">="]),
              st.sampled_from(["S", "A"]), st.sampled_from(["S2"])),
    # BOUNDED ranges (r8): string, numeric, and numeric-coercion bounds
    st.tuples(st.just("range"), st.sampled_from(["S", "A", "L", "X"]),
              st.sampled_from([">=", ">"]), st.sampled_from(STR_POOL),
              st.sampled_from(["<=", "<"]), st.sampled_from(STR_POOL)),
    st.tuples(st.just("range"), st.sampled_from(["N", "M", "D"]),
              st.sampled_from([">=", ">"]), st.sampled_from(NUM_POOL),
              st.sampled_from(["<=", "<"]), st.sampled_from(NUM_POOL)),
    st.tuples(st.just("range"), st.sampled_from(["S", "A"]),
              st.sampled_from([">=", ">"]), st.sampled_from(NUM_POOL),
              st.sampled_from(["<=", "<"]),
              st.sampled_from(NUM_POOL + DBL_POOL)),
)

TREE_ST = st.recursive(
    LEAF_ST,
    lambda kids: st.one_of(
        st.tuples(st.just("and"), st.lists(kids, min_size=2, max_size=3)),
        st.tuples(st.just("or"), st.lists(kids, min_size=2, max_size=3)),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=6)

ROW_ST = st.tuples(
    st.sampled_from(STR_POOL + [None]),
    st.sampled_from(STR_POOL + [None]),
    st.one_of(st.none(), st.lists(st.sampled_from(STR_POOL + [None]),
                                  max_size=3)),
    st.sampled_from(NUM_POOL + [None]),
    st.sampled_from(DBL_POOL + [None]),
    st.one_of(st.none(), st.lists(st.sampled_from(NUM_POOL + [None]),
                                  max_size=3)),
    st.sampled_from(["a", "b", "c", None]),
)


class TestRandomTrees:
    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(tree=TREE_ST,
           rows=st.lists(ROW_ST, min_size=4, max_size=10))
    def test_tree_three_way(self, spark, tree, rows):
        """Random AND/OR/NOT trees over every leaf family, rendered to
        JEXL text and run through parse → compile → filter (the REAL
        pipeline, De Morgan push-down included), vs the referee vs the
        DuckDB translation of the same tree."""
        df = spark.createDataFrame(
            [(i, *r) for i, r in enumerate(rows)], SPARK_SCHEMA)
        q = to_jexl(tree)
        got = sorted(r.id for r in compile_query(
            df, q, field_types={"L": "lc"}, at_rest={"L"}).collect())

        dicts = [dict(zip(("S", "S2", "A", "N", "D", "M", "L"), r))
                 for r in rows]
        want = sorted(i for i, row in enumerate(dicts)
                      if ref_eval(tree, row))

        con = duckdb.connect()
        con.register("t", pd.DataFrame(
            [{"id": i, **d} for i, d in enumerate(dicts)]))
        duck = sorted(r[0] for r in con.execute(
            f"SELECT id FROM t WHERE {to_duckdb(tree)} ORDER BY id")
            .fetchall())

        assert got == want == duck, q
