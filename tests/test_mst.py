"""Borůvka MSF kernel vs driver union-find Kruskal on toy graphs."""

from __future__ import annotations


def _kruskal(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    picked = []
    for d, s, t in sorted(edges):
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
            picked.append((s, t))
    return sorted(picked)


def _run(spark, edges, tail_cap):
    from cyber_etl_spark.operators.mst import boruvka_msf

    df = spark.createDataFrame(
        [(s, t, d) for d, s, t in edges], "src long, dst long, d long"
    )
    got = sorted((r.src, r.dst) for r in boruvka_msf(df, tail_cap=tail_cap).collect())
    assert got == _kruskal(edges), (got, _kruskal(edges))
    return got


def test_boruvka_path_chain_forces_rounds(spark):
    # strictly decreasing weights along a path: worst-case pointer chains
    edges = [(i, i, i + 1) for i in range(1, 30)]
    got = _run(spark, edges, tail_cap=2)
    assert len(got) == 29  # a path's MST is the path itself


def test_boruvka_random_graph_and_forest(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    # two disconnected clusters -> spanning FOREST (2 trees)
    edges = set()
    for base in (0, 100):
        nodes = list(range(base, base + 20))
        for _ in range(60):
            s, t = sorted(rng.choice(nodes, size=2, replace=False).tolist())
            if s != t:
                edges.add((s, t))
    edges = [(int(rng.integers(0, 50)) * 1000 + i, s, t)
             for i, (s, t) in enumerate(sorted(edges))]  # distinct order keys
    got = _run(spark, edges, tail_cap=4)
    assert len(got) == 38  # 20+20 nodes, 2 components -> V - C edges


def test_boruvka_tail_only_path(spark):
    # tail_cap above V: zero distributed rounds, pure driver union-find
    edges = [(10, 1, 2), (20, 2, 3), (5, 1, 3), (7, 4, 5)]
    got = _run(spark, edges, tail_cap=64)
    assert got == [(1, 2), (1, 3), (4, 5)]
