"""Generic motif/path API (graph/motif.py) — the composable form of the
reference's Cypher neighborhood patterns (writeup p.5)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _path_edges(spark):
    # directed path 1→2→3→4 plus a branch 2→5 and a cycle edge 4→1
    rows = [(1, 2), (2, 3), (3, 4), (2, 5), (4, 1)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_paths_enumerates_and_filters(spark):
    from cyber_etl_spark.graph.motif import paths

    e = _path_edges(spark)
    got = {tuple(r) for r in paths(e, 2).collect()}
    assert got == {(1, 2, 3), (1, 2, 5), (2, 3, 4), (3, 4, 1), (4, 1, 2)}
    # start filter as a callable (the WHERE n0 = ... of the motif)
    got = {tuple(r) for r in paths(e, 2, {0: lambda c: c == 1}).collect()}
    assert got == {(1, 2, 3), (1, 2, 5)}
    # mid-position filter as a ready Column
    got = {tuple(r) for r in paths(e, 2, {1: F.col("n1") == 4}).collect()}
    assert got == {(3, 4, 1)}


def test_paths_filters_push_before_joins(spark):
    """The start filter must restrict the FIRST edge scan, not the joined
    result — otherwise a selective motif still pays the full expansion."""
    import re

    from cyber_etl_spark.graph.motif import paths

    e = _path_edges(spark)
    plan = (
        paths(e, 3, {0: lambda c: c == 1})
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the literal predicate lands on the scan's src column (pushed below
    # every join), never as a post-join Filter on the aliased n0
    assert re.search(r"Filter .*src#\d+L? = 1\b", plan), plan
    for line in plan.splitlines():
        if "Filter" in line:
            assert "n0#" not in line, line


def test_neighborhood_matches_handcount(spark):
    from cyber_etl_spark.graph.motif import neighborhood

    e = _path_edges(spark)
    seeds = spark.createDataFrame([(1,)], "id long")
    # hop1 of 1 = {2}; hop2 = neighbors(2) = {3, 5}
    got = {r.id for r in neighborhood(e, seeds, hops=2).collect()}
    assert got == {2, 3, 5}
    # include_seeds keeps 1 when reachable (cycle 4→1 is 3 hops away, so
    # only via include_seeds here)
    got = {r.id for r in neighborhood(e, seeds, hops=2, include_seeds=True).collect()}
    assert got == {2, 3, 5}


def test_neighborhood_excludes_seed_on_cycle(spark):
    from cyber_etl_spark.graph.motif import neighborhood

    e = _path_edges(spark)
    seeds = spark.createDataFrame([(2,)], "id long")
    # hop1(2)={3,5}, hop2={4} — and from seed 4 the cycle returns 1
    assert {r.id for r in neighborhood(e, seeds, hops=2).collect()} == {3, 4, 5}
    seeds4 = spark.createDataFrame([(4,)], "id long")
    # 4→1→2: seed excluded, cycle nodes kept
    assert {r.id for r in neighborhood(e, seeds4, hops=2).collect()} == {1, 2}


def test_q31_unchanged_through_motif_api(spark, sf_smoke):
    """q31 re-expressed via neighborhood() must keep its oracle shape
    (the registry oracle run covers values; pin non-emptiness and schema
    here for a fast signal)."""
    from cyber_etl_spark.plans import QUERIES

    df = QUERIES["q31_two_hop_neighborhood"].builder(spark, sf_smoke)
    assert df.columns == ["node"]
    assert df.count() > 0


def test_path_counts_equals_enumeration(spark):
    """The aggregated recurrence must count exactly what enumeration
    enumerates, per endpoint, at every depth."""
    from cyber_etl_spark.graph.motif import path_counts, paths

    e = _path_edges(spark)
    for k in (1, 2, 3, 4):
        enum = {
            (r[0], r[1])
            for r in paths(e, k, {0: lambda c: c == 1})
            .groupBy(f"n{k}")
            .count()
            .collect()
        }
        rec = {(r.node, r.n_paths) for r in path_counts(e, k, lambda c: c == 1).collect()}
        assert rec == enum, k


def test_neighborhood_rejects_zero_hops(spark):
    from cyber_etl_spark.graph.motif import neighborhood

    e = _path_edges(spark)
    seeds = spark.createDataFrame([(1,)], "id long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hops >= 1"):
        neighborhood(e, seeds, hops=0)
