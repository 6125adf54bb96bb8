"""Luby MIS invariants on random graphs + determinism."""

from __future__ import annotations


def _edges_df(spark, edges):
    return spark.createDataFrame(sorted(edges), "src long, dst long")


def test_mis_independence_and_maximality(spark):
    import numpy as np

    rng = np.random.default_rng(23)
    nodes = list(range(60))
    edges = set()
    for _ in range(150):
        a, b = sorted(rng.choice(nodes, size=2, replace=False).tolist())
        if a != b:
            edges.add((a, b))
    from cyber_etl_spark.graph.algorithms import luby_mis

    mis = {r.id for r in luby_mis(_edges_df(spark, edges)).collect()}
    present = {n for e in edges for n in e}
    adj = {n: set() for n in present}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # independence: no edge inside the set
    assert not any(a in mis and b in mis for a, b in edges)
    # maximality: every non-MIS node has a MIS neighbor
    for n in present - mis:
        assert adj[n] & mis, n


def test_mis_deterministic_across_runs(spark):
    from cyber_etl_spark.graph.algorithms import luby_mis

    edges = [(i, i + 1) for i in range(40)] + [(i, i + 7) for i in range(30)]
    df = _edges_df(spark, edges)
    a = sorted((r.id, r.round) for r in luby_mis(df).collect())
    b = sorted((r.id, r.round) for r in luby_mis(df.repartition(7)).collect())
    assert a == b and len(a) > 0
