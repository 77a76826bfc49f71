"""Content-functions referee (round 8): Spark
``content:phrase/adjacent/within`` vs Python ports of the reference's
two evaluators, fuzzed over random per-document term-offset maps.

Referee semantics (positions only — no skip words or score filtering,
i.e. TermWeightPosition with lowOffset == offset and zeroOffsetMatch
true, the shape our tokenizer produces):

- ``within`` — ContentUnorderedEvaluator.MultiOffsetMatcher
  (ContentUnorderedEvaluator.java:199,230): repeated terms SHARE one
  offset list, each occurrence consuming a distinct position; match
  iff some selection (one slot per term) spans ≤ distance.
- ``adjacent`` — defined as ``within(terms.length - 1, terms)``
  (ContentFunctions.java:141), NOT pairwise ±1.
- ``phrase`` — ContentOrderedEvaluator with distance 1: ∃ p1..pk with
  p_{i-1} <= p_i <= p_{i-1}+1 (equal-position steps match for
  DIFFERENT terms; a repeated term must advance — isSameTerm,
  ContentOrderedEvaluator.java:164,330).

The r8 sweep this test pins found the prior implementations diverging
on all three: phrase required exactly +1 steps (missed equal-position
tokens), adjacent was a two-term-only pairwise ±1, and within let a
repeated term reuse one position (plus a documented k>3 over-match,
now exact for any k).
"""

from __future__ import annotations

import heapq
import itertools
import random

import pytest

from datawave_spark.compiler import compile_query

VOCAB = ["a", "b", "c"]


# ---------------- referee: ContentUnorderedEvaluator.MultiOffsetMatcher
def unordered_match(distance, terms, offmap):
    terms_seen = {}
    entries = []
    seq = 0
    for t in terms:
        lst = offmap.get(t)
        if lst is not None:
            if t not in terms_seen:
                terms_seen[t] = list(lst)
            lst = terms_seen[t]
        if not lst:
            return False
        mn = lst.pop(0)
        mx = max(max(lst), mn) if lst else mn
        entries.append([mn, seq, t, lst, mx])
        seq += 1
    heap = [(e[0], e[1], e) for e in entries]
    heapq.heapify(heap)
    max_off = max(e[0] for e in entries)
    while True:
        _, _, o = heapq.heappop(heap)
        if max_off - o[0] <= distance:
            return True
        if max_off - o[4] > distance:
            return False
        if not o[3]:
            return False
        o[0] = o[3].pop(0)
        max_off = max(max_off, o[0])
        heapq.heappush(heap, (o[0], o[1], o))


# ---------------- referee: ContentOrderedEvaluator (DP semantics)
def ordered_match(distance, terms, offmap):
    lists = [offmap.get(t, []) for t in terms]
    if any(not l for l in lists):
        return False
    reach = set(lists[0])
    for i in range(1, len(terms)):
        same = terms[i] == terms[i - 1]
        reach = {p for p in lists[i]
                 if any(q <= p <= q + distance and not (same and p == q)
                        for q in reach)}
        if not reach:
            return False
    return True


def _gen_corpus(seed: int, n: int):
    rng = random.Random(seed)
    cases = []
    for _ in range(n):
        m = {}
        for t in VOCAB:
            k = rng.randint(0, 4)
            m[t] = sorted(rng.sample(range(0, 8), k)) if k else []
        cases.append(m)
    return cases


@pytest.fixture(scope="module")
def corpus(spark):
    cases = _gen_corpus(seed=88, n=40)
    rows = [(f"d{i}", {t: v for t, v in m.items() if v})
            for i, m in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "uid string, text_tf map<string,array<int>>").cache()
    df.count()
    yield cases, df
    df.unpersist()


def _check(df, cases, queries):
    mismatches = []
    for fn, d, terms in queries:
        targs = ", ".join(f"'{t}'" for t in terms)
        q = (f"content:within({d}, {targs})" if fn == "within"
             else f"content:{fn}({targs})")
        got = {r.uid for r in compile_query(df, q).select("uid").collect()}
        want = set()
        for i, m in enumerate(cases):
            mm = {t: list(v) for t, v in m.items()}
            ok = (ordered_match(1, terms, mm) if fn == "phrase"
                  else unordered_match(len(terms) - 1, terms, mm)
                  if fn == "adjacent"
                  else unordered_match(d, terms, mm))
            if ok:
                want.add(f"d{i}")
        if got != want:
            mismatches.append((q, sorted(want), sorted(got)))
    assert not mismatches, mismatches[:3]


class TestContentReferee:
    def test_pairs_exhaustive(self, spark, corpus):
        """Every (fn × 2-term combination × distance) — includes the
        repeated-term ('a','a') and distance-0 classes."""
        cases, df = corpus
        queries = []
        for terms in itertools.product(VOCAB, repeat=2):
            queries.append(("phrase", None, list(terms)))
            queries.append(("adjacent", None, list(terms)))
            for d in (0, 1, 2):
                queries.append(("within", d, list(terms)))
        _check(df, cases, queries)

    def test_triples_sampled(self, spark, corpus):
        cases, df = corpus
        rng = random.Random(3)
        queries = []
        for terms in rng.sample(list(itertools.product(VOCAB, repeat=3)),
                                12):
            queries.append(("phrase", None, list(terms)))
            queries.append(("adjacent", None, list(terms)))
            queries.append(("within", rng.choice((0, 1, 2)), list(terms)))
        _check(df, cases, queries)

    def test_k4_exact(self, spark, corpus):
        """k=4 was a documented conservative over-match before r8 —
        the window-anchor form is exact for any k."""
        cases, df = corpus
        rng = random.Random(4)
        queries = []
        for terms in rng.sample(list(itertools.product(VOCAB, repeat=4)),
                                8):
            queries.append(("phrase", None, list(terms)))
            queries.append(("within", rng.choice((1, 3)), list(terms)))
        _check(df, cases, queries)

    def test_same_position_different_terms(self, spark):
        """Synonym-style same-position tokens: phrase takes a 0-step
        across different terms; within(0) spans them; a repeated term
        may NOT reuse one position."""
        rows = [("e0", {"a": [5], "b": [5]}),      # a,b both at 5
                ("e1", {"a": [3]}),                 # single a
                ("e2", {"a": [3, 4]})]              # two a's
        df = spark.createDataFrame(
            rows, "uid string, text_tf map<string,array<int>>")

        def uids(q):
            return sorted(r.uid for r in
                          compile_query(df, q).select("uid").collect())

        assert uids("content:phrase('a', 'b')") == ["e0"]
        assert uids("content:within(0, 'a', 'b')") == ["e0"]
        assert uids("content:adjacent('a', 'b')") == ["e0"]
        assert uids("content:within(1, 'a', 'a')") == ["e2"]
        assert uids("content:phrase('a', 'a')") == ["e2"]
        assert uids("content:within(0, 'a', 'a')") == []
