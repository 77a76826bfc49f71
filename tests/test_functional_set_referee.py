"""FunctionalSet method-surface referee.

The round-9 method compilation (functions/functional_set.py) vs an
independent Python port of the reference semantics
(collections/FunctionalSet.java: min/max over normalized values with
unparseable elements skipped, compareWith normalizing the reference
literal through the element type, size/isEmpty/contains over the tuple
set; QueryModelVisitor.expandBinaryNodeFromModel: alias methods expand
to an OR of concrete-member comparisons, '!=' with AND).

Fuzzed over random multi-valued rows — numeric domains stored BOTH as
double arrays and as number-typed string arrays (with planted
unparseable elements), lc-normalized string domains with mixed case.
"""

import random

import pytest

from datawave_spark.plans.planner import QueryPlanner

N_ROWS = 120
SEED = 20260816


def _mk_rows(rng):
    rows = []
    for i in range(N_ROWS):
        nums = [round(rng.uniform(-50, 150), 1)
                for _ in range(rng.randint(0, 4))]
        snums = [str(v) for v in nums]
        if rng.random() < 0.25:
            snums = snums + ["notanum"]      # unparseable element
        words = [rng.choice(["Alpha", "beta", "GAMMA", "delta", "Omega"])
                 for _ in range(rng.randint(0, 3))]
        nums2 = [round(rng.uniform(-50, 150), 1)
                 for _ in range(rng.randint(0, 3))]
        rows.append((i, nums, snums, words, nums2))
    return rows


def _py_set(vals, kind):
    """comparable set per the engine's _comparable contract."""
    out = []
    for v in vals or []:
        if kind == "number":
            try:
                out.append(float(v))
            except (TypeError, ValueError):
                continue
        else:
            out.append(str(v).lower())       # lc normalizer
    return out


def _py_method(vals, method, arg=None, op=None):
    if method == "size":
        return len(vals)
    if method == "isEmpty":
        return len(vals) == 0
    if method == "min":
        return min(vals) if vals else None
    if method == "max":
        return max(vals) if vals else None
    if method == "greaterThan":
        return [v for v in vals if v > arg]
    if method == "lessThan":
        return [v for v in vals if v < arg]
    if method == "compareWith":
        cmpf = {"==": lambda a, b: a == b, "<": lambda a, b: a < b,
                ">": lambda a, b: a > b, "<=": lambda a, b: a <= b,
                ">=": lambda a, b: a >= b}[op]
        return [v for v in vals if cmpf(v, arg)]
    raise AssertionError(method)


def _py_cmp(a, op, b):
    # JEXL ne = !(equals): a NULL side never EQUALS, so '!=' is true
    # (the engine's documented total-negation stance); ordered
    # comparisons with NULL are false
    if op == "!=":
        return not (a == b)
    if a is None or b is None:
        return False
    return {"==": a == b, "<": a < b, ">": a > b,
            "<=": a <= b, ">=": a >= b}[op]


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(SEED)
    rows = _mk_rows(rng)
    df = spark.createDataFrame(
        rows, "id int, NUMS array<double>, SNUMS array<string>, "
              "WORDS array<string>, NUMS2 array<double>")
    return df.cache(), rows


class TestFunctionalSetReferee:
    def _run(self, spark_df, query, field_types=None, model=None):
        qp = QueryPlanner(spark_df, field_types=field_types, model=model,
                          reverse_model={})
        return {r.id for r in qp.plan(query).df.select("id").collect()}

    def test_minmax_comparisons(self, frame):
        df, rows = frame
        rng = random.Random(SEED + 1)
        for trial in range(40):
            target = rng.choice(["NUMS", "SNUMS"])
            method = rng.choice(["min", "max"])
            op = rng.choice(["==", "!=", "<", ">", "<=", ">="])
            lit = round(rng.uniform(-60, 160), 1)
            q = f"{target}.{method}() {op} {lit}"
            got = self._run(df, q, field_types={"SNUMS": "number"})
            want = set()
            for row in rows:
                vals = _py_set(row[1] if target == "NUMS" else row[2],
                               "number")
                extreme = _py_method(vals, method)
                # '!=' over a scalar method value: NULL side -> false
                if _py_cmp(extreme, op, lit):
                    want.add(row[0])
            assert got == want, (q, sorted(got ^ want)[:5])

    def test_filtered_set_sizes(self, frame):
        df, rows = frame
        rng = random.Random(SEED + 2)
        for trial in range(40):
            target = rng.choice(["NUMS", "SNUMS"])
            method = rng.choice(["greaterThan", "lessThan", "compareWith"])
            cw_op = rng.choice(["==", "<", ">", "<=", ">="])
            lit = round(rng.uniform(-60, 160), 1)
            k = rng.randint(0, 3)
            op = rng.choice(["==", ">=", "<", ">"])
            if method == "compareWith":
                q = (f"{target}.compareWith({lit},'{cw_op}')"
                     f".size() {op} {k}")
            else:
                q = f"{target}.{method}({lit}).size() {op} {k}"
            got = self._run(df, q, field_types={"SNUMS": "number"})
            want = set()
            for row in rows:
                vals = _py_set(row[1] if target == "NUMS" else row[2],
                               "number")
                kept = _py_method(vals, method, arg=lit,
                                  op=cw_op if method == "compareWith"
                                  else None)
                if _py_cmp(len(kept), op, k):
                    want.add(row[0])
            assert got == want, (q, sorted(got ^ want)[:5])

    def test_string_domain_and_contains(self, frame):
        df, rows = frame
        rng = random.Random(SEED + 3)
        for trial in range(25):
            word = rng.choice(["Alpha", "beta", "GAMMA", "nope"])
            mode = rng.choice(["contains", "isEmpty", "size"])
            if mode == "contains":
                q = f"WORDS.contains('{word}') == true"
                pred = lambda vals: word.lower() in vals  # noqa: E731
            elif mode == "isEmpty":
                q = "WORDS.isEmpty() == true"
                pred = lambda vals: len(vals) == 0        # noqa: E731
            else:
                k = rng.randint(0, 3)
                q = f"WORDS.size() >= {k}"
                pred = lambda vals, k=k: len(vals) >= k   # noqa: E731
            got = self._run(df, q,
                            field_types={"WORDS": "lcNoDiacritics"})
            want = {row[0] for row in rows
                    if pred(_py_set(row[3], "string"))}
            assert got == want, (q, sorted(got ^ want)[:5])

    def test_model_alias_or_expansion(self, frame):
        df, rows = frame
        rng = random.Random(SEED + 4)
        model = {"N": ["NUMS", "NUMS2"]}
        for trial in range(25):
            method = rng.choice(["min", "max"])
            op = rng.choice(["==", "<", ">", "<=", ">=", "!="])
            lit = round(rng.uniform(-60, 160), 1)
            q = f"N.{method}() {op} {lit}"
            got = self._run(df, q, model=model)
            want = set()
            for row in rows:
                # cartesian/OR expansion; '!=' combines with AND
                # (QueryModelVisitor requiresAnd)
                verdicts = []
                for vals in (row[1], row[4]):
                    extreme = _py_method(_py_set(vals, "number"), method)
                    verdicts.append(_py_cmp(extreme, op, lit))
                hit = all(verdicts) if op == "!=" else any(verdicts)
                if hit:
                    want.add(row[0])
            assert got == want, (q, sorted(got ^ want)[:5])
