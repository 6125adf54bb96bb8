"""Property-graph construction from relational tables.

The reference materializes node/edge CSVs and bulk-loads Neo4j
(README.md:11, writeup p.2); here the graph IS a pair of DataFrames —
vertices and directed edge lists — and the algorithms in
:mod:`.algorithms` run on them inside the same Spark job.  No external
graph database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import SessionMemo, session_token
from ..sources import read_table

_EDGE_CACHE: dict[tuple[int, str], DataFrame] = SessionMemo()


def co_supply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric supplier–supplier edges: two suppliers are connected when
    they supply at least one common part (via lineitem).

    Mirrors the reference's implicit co-occurrence graphs (alert–actor
    MENTIONED weights, data_integration.ipynb:2783).  Built as
    distinct-project → self-equi-join on the part key — the join shuffles
    on ``l_partkey`` which is high-cardinality and evenly distributed, so
    this scales linearly; hot parts (skewed keys) are split by AQE.
    """
    key = (session_token(spark), sf_dir)
    if key in _EDGE_CACHE:
        return _EDGE_CACHE[key]
    # projection of the weighted build: one expensive self-join serves the
    # whole graph-query suite (weighted rows are exactly the distinct
    # pairs), materialized once per (session, dataset).
    edges = co_supply_edges_weighted(spark, sf_dir).select("src", "dst")
    edges._cyber_symmetric = True  # both directions present by construction
    _EDGE_CACHE[key] = edges
    return edges


def co_supply_edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, weight) — weight = number of distinct co-supplied
    parts.  The weighted analogue of :func:`co_supply_edges`, mirroring
    the reference's weighted MENTIONED edges (data_integration.ipynb:2783
    cell 49 computes per-edge weights for the GDS projection).
    Symmetric by construction (both directions emitted with equal
    weight)."""
    key = (session_token(spark), sf_dir, "weighted")
    if key in _EDGE_CACHE:
        return _EDGE_CACHE[key]
    # One shuffle groups suppliers per part (collect_set dedupes), then the
    # i<j pair expansion happens IN-STAGE (posexplode + slice of the sorted
    # set) feeding straight into a partial hash agg — no self-join shuffle,
    # and only half the pairs are ever generated; the symmetric mirror is a
    # cheap union AFTER aggregation.  Skew guard at 100 TB: a part with k
    # suppliers would expand k²/2 rows in one task, so sets larger than
    # the chunk threshold are decomposed into chunk-pair rows and
    # scattered across the cluster (operators/skew.chunked_pair_expand)
    # — bounded task input regardless of the hottest key's degree.
    li = read_table(spark, sf_dir, "lineitem")
    sup = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    # fewer, larger expansion tasks make the partial aggregation over the
    # pair keys far more effective (each task covers more of the key
    # space before the shuffle).  The coalesce is lazy — same single job
    # — and sized off the fact-table row count (a metadata-cheap count),
    # so at real scale the target exceeds the current partitions and
    # nothing changes.
    from .algorithms import _compact

    # Materialize the per-part supplier sets BEFORE expansion: the
    # expansion plan references `sup` from multiple generator branches,
    # and without a checkpoint each branch re-runs the collect_set
    # aggregation over the fact table.  The materialized aggregate is
    # tiny (one row per part) and also makes the max-degree statistic a
    # near-free scan.
    sup = (
        _compact(sup, li.count(), rows_per_part=5_000_000)
        .localCheckpoint(eager=True)
    )
    max_deg = sup.agg(F.max(F.size("ss"))).collect()[0][0] or 0
    from ..operators.skew import chunked_pair_expand

    upper = (
        # max_size: observed stat lets the operator drop the heavy-path
        # branches entirely when no key is actually skewed (the common
        # case); a genuinely hot part still takes the chunk-scatter path.
        chunked_pair_expand(sup, "ss", chunk=4096, max_size=max_deg)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .localCheckpoint(eager=True)  # materialize the half; mirror is free
    )
    edges = upper.unionByName(
        upper.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    edges._cyber_symmetric = True  # mirror union emits both directions
    _EDGE_CACHE[key] = edges
    return edges
