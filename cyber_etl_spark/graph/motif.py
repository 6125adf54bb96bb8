"""Composable path/motif expansion over edge DataFrames.

The reference answers its Cypher neighborhood patterns (writeup p.5,
``MATCH (n)-[a]-(o)-[b]-(p) WHERE n.login = "cclauss"``) inside Neo4j;
here the same motifs compile to chained hash joins over the (src, dst)
edge list.  This module is the generic form of the previously hard-coded
two-hop joins (plans/graphops.py q31, pipeline/graph_queries.py), so a
NEW pattern is a one-liner instead of hand-written join plumbing.

Scale notes:
- :func:`paths` enumerates paths — output is multiplicative in degree,
  which is the semantics Cypher gives an unaggregated MATCH.  Push node
  filters down via ``node_filters`` (applied the moment a position's
  column exists, so Catalyst prunes before the next join) rather than
  filtering the returned frame.
- :func:`neighborhood` is the set-semantics variant (BFS layers with a
  per-hop ``distinct``), which is what reachability questions want —
  path enumeration on a dense graph explodes combinatorially even when
  the distinct node set stays small.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NodeFilter = Column | Callable[[Column], Column]


def _apply(df: DataFrame, filters: Mapping[int, NodeFilter], pos: int) -> DataFrame:
    f = filters.get(pos)
    if f is None:
        return df
    cond = f(F.col(f"n{pos}")) if callable(f) else f
    return df.where(cond)


def paths(
    edges: DataFrame,
    hops: int,
    node_filters: Mapping[int, NodeFilter] | None = None,
) -> DataFrame:
    """All ``hops``-length paths → one row per path, columns n0..n{hops}.

    ``edges`` is a directed (src, dst) list — pass a symmetrized list
    (e.g. :func:`..algorithms._sym`'s output or a builder that emits both
    directions) for Cypher's undirected ``-[]-`` semantics.

    ``node_filters`` maps a position (0 = path start) to either a ready
    Column predicate or a callable receiving that position's node column
    — the ``WHERE n.login = ...`` part of the motif.  Filters are applied
    as soon as the position's column exists, so each restricts the join
    pipeline immediately (the start filter reaches the first edge scan as
    a pushed predicate).
    """
    if hops < 1:
        raise ValueError("hops must be >= 1")
    filters = dict(node_filters or {})
    e = edges.select("src", "dst")
    out = e.select(F.col("src").alias("n0"), F.col("dst").alias("n1"))
    out = _apply(_apply(out, filters, 0), filters, 1)
    for h in range(2, hops + 1):
        step = e.select(F.col("src").alias(f"n{h - 1}"), F.col("dst").alias(f"n{h}"))
        out = _apply(out.join(step, f"n{h - 1}"), filters, h)
    # USING-joins float the key column to the front — restore path order
    return out.select(*[f"n{i}" for i in range(hops + 1)])


def path_counts(
    edges: DataFrame,
    hops: int,
    start_filter: NodeFilter,
) -> DataFrame:
    """Number of ``hops``-length paths from the filtered start vertices to
    each endpoint → (node, n_paths).

    The scale-correct form of counting what :func:`paths` enumerates:
    n_paths(v, k) = Σ_u n_paths(u, k-1) · A(u, v), aggregated BETWEEN
    hops — state stays |V| rows per hop, where enumeration materializes
    degᵏ rows before its final groupBy (measured 5.5s vs ~0.5s for 3
    hops on the sf0.1 co-supply graph; at 100 TB enumeration is simply
    not runnable).  Same result as ``paths(...).groupBy(n_k).count()``.
    """
    if hops < 1:
        raise ValueError("hops must be >= 1")
    e = edges.select("src", "dst")
    first = _apply(
        e.select(F.col("src").alias("n0"), F.col("dst").alias("node")),
        {0: start_filter},
        0,
    )
    state = first.groupBy("node").agg(F.count(F.lit(1)).alias("n_paths"))
    for _ in range(hops - 1):
        state = (
            e.join(state, e.src == state.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("n_paths").alias("n_paths"))
        )
    return state


def neighborhood(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 2,
    include_seeds: bool = False,
) -> DataFrame:
    """Distinct nodes within ``hops`` of ``seeds`` (column ``id``) → (id).

    Layered expansion with a per-hop ``distinct`` — the set-semantics
    reachability the reference's two-hop neighborhood question actually
    asks, with shuffle volume bounded by the distinct frontier instead of
    the path count.  Layer k is the neighbor set of layer k-1 (nodes can
    reappear across layers; the final union dedupes), matching the plain
    hop1 ∪ hop2 reading of the Cypher pattern.
    """
    if hops < 1:
        raise ValueError(f"neighborhood requires hops >= 1, got {hops}")
    e = edges.select("src", "dst")
    frontier = seeds.select(F.col("id")).distinct()
    layers: list[DataFrame] = []
    for _ in range(hops):
        frontier = (
            e.join(frontier, e.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        layers.append(frontier)
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionByName(layer)
    out = out.distinct()
    if not include_seeds:
        out = out.join(seeds.select("id").distinct(), "id", "left_anti")
    return out
