"""Deterministic label propagation: community structure on fixtures
with known answers, parity with an independent numpy replica, and the
dense-vs-CC contrast that motivates the operator."""

from __future__ import annotations

import numpy as np

from eeg_data_lake_spark.operators.graph import (
    connected_components,
    label_propagation,
)


def _lpa_numpy(edges, n_iter=10):
    """Independent replica: synchronous self-inclusive LPA,
    most-votes then min-label."""
    nodes = sorted({x for e in edges for x in e})
    adj = {u: [] for u in nodes}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    adj = {u: sorted(set(vs)) for u, vs in adj.items()}
    label = {u: u for u in nodes}
    for _ in range(n_iter):
        new = {}
        for u in nodes:
            votes = {}
            for v in adj[u] + [u]:  # self-vote, like the operator
                votes[label[v]] = votes.get(label[v], 0) + 1
            m = max(votes.values())
            new[u] = min(l for l, c in votes.items() if c == m)
        label = new
    return label


def _run(spark, edges, max_iter=10):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in label_propagation(df, max_iter=max_iter).collect()
    }


def test_two_cliques_with_a_bridge(spark):
    """Two 4-cliques joined by one edge: LPA keeps them as two
    communities, CC fuses them into one component."""
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    got = _run(spark, edges)
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(10, 14)}) == 1
    assert got[0] != got[10]  # two communities survive the bridge
    cc = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert len(set(cc.values())) == 1  # CC sees one blob


def test_matches_numpy_replica(spark):
    rng = np.random.default_rng(7)
    # two planted communities + sparse noise edges
    edges = set()
    for base in (0, 50):
        for _ in range(120):
            a, b = rng.integers(base, base + 20, size=2)
            if a != b:
                edges.add((int(min(a, b)), int(max(a, b))))
    for _ in range(5):
        a = int(rng.integers(0, 20)); b = int(rng.integers(50, 70))
        edges.add((a, b))
    edges = sorted(edges)
    got = _run(spark, edges, max_iter=8)
    want = _lpa_numpy(edges, n_iter=8)
    assert got == want


def test_singleton_edge(spark):
    got = _run(spark, [(1, 2)])
    assert got == {1: 1, 2: 1}  # adopt the neighbor's min label
