"""Graph-operator referee (round 8): k_hop and pagerank vs independent
python implementations over random graphs.

- k_hop (edges.py): BFS frontier via iterative self-join, minimal hop
  per vertex, hop-1 = sinks of the start predicate's edges — referee
  is a dict-based BFS.
- pagerank (operators/components.py): power iteration with
  dangling-mass redistribution — referee is the textbook per-node
  loop with the same conventions (nodes = src ∪ dst of distinct
  non-null edges, d=0.85, ranks sum to 1); agreement to 1e-6 after 10
  rounds checks the join/agg/dangling algebra exactly, not just shape.
"""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from datawave_spark.edges import k_hop
from datawave_spark.operators.components import pagerank


def _rand_edges(rng, n_lo=5, n_hi=14, m_hi=40):
    n = rng.randint(n_lo, n_hi)
    out = set()
    for _ in range(rng.randint(4, m_hi)):
        out.add((f"v{rng.randrange(n)}", f"v{rng.randrange(n)}"))
    return sorted(out)


def test_k_hop_matches_bfs(spark):
    rng = random.Random(77)
    for trial in range(5):
        edges = _rand_edges(rng)
        etypes = ["knows", "sends"]
        rows = [(s, t, rng.choice(etypes)) for s, t in edges]
        df = spark.createDataFrame(
            rows, "source string, sink string, edge_type string")
        start = rng.choice(etypes)
        hops = rng.randint(2, 4)
        got = {(r.vertex, r.hop) for r in
               k_hop(df, f"TYPE == '{start}'", hops=hops).collect()}

        adj = defaultdict(set)
        for s, t, _ty in rows:
            adj[s].add(t)
        frontier = {t for s, t, ty in rows if ty == start}
        best = {v: 1 for v in frontier}
        for h in range(2, hops + 1):
            frontier = {t for v in frontier for t in adj[v]
                        if t not in best}
            for v in frontier:
                best[v] = h
        assert got == set(best.items()), (trial, start, hops)


def test_pagerank_matches_power_iteration(spark):
    rng = random.Random(78)
    for trial in range(3):
        edges = _rand_edges(rng, 4, 10, 25)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.rank for r in pagerank(df, iters=10).collect()}

        nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
        N, d = len(nodes), 0.85
        out = defaultdict(set)
        for s, t in edges:
            out[s].add(t)
        r = {v: 1.0 / N for v in nodes}
        for _ in range(10):
            dangling = sum(r[v] for v in nodes if not out[v])
            r = {v: (1 - d) / N + d * (
                sum(r[u] / len(out[u]) for u in nodes if v in out[u])
                + dangling / N) for v in nodes}
        assert set(got) == set(r), trial
        worst = max(abs(got[v] - r[v]) for v in r)
        assert worst < 1e-6, (trial, worst)
        assert abs(sum(got.values()) - 1.0) < 1e-6
