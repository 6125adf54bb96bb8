"""Behavior tests for the round-9 session-2 additions (q332-q343):
operator-level contracts the sf0.001 oracle sweep can't see —
trajectory exactness and batch-shape invariance of the grouped walk
kernel, the Parseval identity of the Haar decomposition, the IPF
column-matching contract, and the Qini decile-10 identity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_walk_known_trajectory(spark):
    """Hand-replayable walk: r=2, cap=8, W=5, demands {0:5, 2:10, 3:1}.

    t0: 8+2-5=5; t1: 5+2-0=7; t2: 7+2-10=-1 (shortage, clamp to 0);
    t3: 0+2-1=1; t4: 1+2-0=3 -> shortages=1, end=3."""
    from cyber_etl_spark.operators.walk import clamped_inventory_walk

    df = spark.createDataFrame(
        [(1, 0, 5, 2, 8, 5), (1, 2, 10, 2, 8, 5), (1, 3, 1, 2, 8, 5)],
        "g long, t long, d long, r long, cap long, w long",
    )
    out = clamped_inventory_walk(df, "g", "t", "d", "r", "cap", "w").collect()
    assert len(out) == 1
    assert out[0]["shortage_steps"] == 1
    assert out[0]["end_stock"] == 3


def test_walk_clamps_and_shortage_edges(spark):
    """Boundary semantics: demand exactly consuming stock+r is NOT a
    shortage (avail == 0); overflow clamps at cap, not above."""
    from cyber_etl_spark.operators.walk import clamped_inventory_walk

    # g=1: cap=4, r=3, demand t0 = 7 -> avail = 0 exactly: no shortage.
    # g=2: no demand at all: stock pins at cap every step.
    df = spark.createDataFrame(
        [(1, 0, 7, 3, 4, 3), (2, 0, 0, 3, 4, 3)],
        "g long, t long, d long, r long, cap long, w long",
    )
    rows = {
        r["g"]: r
        for r in clamped_inventory_walk(
            df, "g", "t", "d", "r", "cap", "w"
        ).collect()
    }
    assert rows[1]["shortage_steps"] == 0
    assert rows[1]["end_stock"] == 4  # 0 -> 3 -> 4 (clamped)
    assert rows[2]["shortage_steps"] == 0
    assert rows[2]["end_stock"] == 4


def test_walk_partitioning_invariance(spark, sf_smoke):
    """The kernel reduces each group to ONE row before the mapInPandas
    pass, so input partitioning/order must not change any trajectory."""
    from cyber_etl_spark.plans import QUERIES

    base = QUERIES["q341_inventory_walk"].builder(spark, sf_smoke)
    rows_a = [tuple(r) for r in base.collect()]
    rows_b = [tuple(r) for r in base.collect()]  # re-execution stability
    assert rows_a == rows_b


def test_haar_parseval(spark, sf_smoke):
    """Σ level energies == Σ x² exactly: every energy is a dyadic
    rational with denominator ≤ 64 and numerator « 2^53, so double
    addition of the 7 terms is exact and Parseval must hold to the BIT,
    not a tolerance."""
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.sources import read_table

    e = QUERIES["q343_haar_energy"].builder(spark, sf_smoke).collect()
    total = sum(r["energy"] for r in e)
    ev = read_table(spark, sf_smoke, "events")
    g = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    x2 = (
        ev.crossJoin(F.broadcast(g))
        .groupBy(F.expr("datediff(to_date(ts), d0)").alias("i"))
        .agg(F.count(F.lit(1)).alias("x"))
        .where(F.col("i") < 64)
        .agg(F.sum(F.expr("x * x")).alias("t"))
        .collect()[0]["t"]
    )
    assert total == float(x2)


def test_ipf_column_sums_match_targets(spark, sf_smoke):
    """The LAST IPF half-step scales columns, so each published column
    sum must equal its target margin up to per-cell half-away rounding:
    |Σ_pri w - C_st| ≤ 0.5e-6 · n_cells(st) in raked units — a bound
    derived from the kernel's own rounding, not hand-tuned."""
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.sources import read_table

    rows = QUERIES["q337_ipf_raking"].builder(spark, sf_smoke).collect()
    col_sums: dict = {}
    col_cells: dict = {}
    for r in rows:
        col_sums[r["status"]] = col_sums.get(r["status"], 0.0) + r["raked"]
        col_cells[r["status"]] = col_cells.get(r["status"], 0) + 1
    orders = read_table(spark, sf_smoke, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    m = (
        orders.groupBy(F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("rc"))
        .collect()
    )
    nt = sum(r["n"] for r in m)
    rt = sum(int(r["rc"]) for r in m)
    for r in m:
        target = (nt * 1_000_000 * int(r["rc"]) // rt) / 1_000_000
        bound = 0.5e-6 * col_cells[r["st"]] + 1e-9
        assert abs(col_sums[r["st"]] - target) <= bound, (
            r["st"], col_sums[r["st"]], target,
        )


def test_qini_final_decile_identity(spark, sf_smoke):
    """At decile 10 the Qini curve and the random-targeting diagonal
    both equal the OVERALL incremental responders — an exact identity
    of the construction (same integer rational on both sides), so the
    two published doubles must be equal bit-for-bit."""
    from cyber_etl_spark.plans import QUERIES

    rows = QUERIES["q336_qini_uplift"].builder(spark, sf_smoke).collect()
    last = [r for r in rows if r["decile"] == 10]
    assert len(last) == 1
    assert last[0]["qini"] == pytest.approx(last[0]["random_line"], abs=0.0)


def test_quantile_normalization_preserves_global_distribution(
    spark, sf_smoke
):
    """Normalized per-source ranges must sit inside the global n_chars
    range, and every source's normalized mean lies between the global
    min and max — plumbing invariants of the rank→global-position map
    (the map is a permutation-composition, it cannot invent values)."""
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.sources import read_table

    rows = QUERIES["q334_quantile_normalization"].builder(
        spark, sf_smoke
    ).collect()
    d = read_table(spark, sf_smoke, "documents").agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    ).collect()[0]
    for r in rows:
        assert d["lo"] <= r["min_norm"] <= r["max_norm"] <= d["hi"]
        assert d["lo"] <= r["mean_norm"] <= d["hi"]


def _plan(spark, sf_dir, name: str) -> str:
    from cyber_etl_spark.plans import QUERIES

    return (
        QUERIES[name]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q333_bounded_rank_join(spark, sf_smoke):
    """Everything after the (checkpointed) fact aggregate runs on the
    bounded nation table: the remainder rank must be a broadcast
    nested-loop self-join over the pinned 25-row frame (ExistingRDD),
    with no shuffled join anywhere in the visible plan."""
    plan = _plan(spark, sf_smoke, "q333_budget_allocation")
    assert plan.count("BroadcastNestedLoopJoin") == 2  # rank + leftover
    assert "SortMergeJoin" not in plan
    assert "ExistingRDD" in plan  # the pinned allocation table


def test_q338_single_probe_pass(spark, sf_smoke):
    """The 9 candidate thresholds must ride ONE broadcast nested-loop
    pass over the fact scan (a bounded probe list), not 9 separate
    scans or a shuffled join."""
    plan = _plan(spark, sf_smoke, "q338_info_gain_stump")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q341_vectorized_walk_plan(spark, sf_smoke):
    """The inventory walk must run as a mapInPandas kernel over the
    one-row-per-group reduction — never a per-group FlatMapGroups call
    (the 5x-slower shape measured at sf0.1) and never a Python row
    UDF."""
    plan = _plan(spark, sf_smoke, "q341_inventory_walk")
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan


def test_q355_no_pair_enumeration(spark, sf_smoke):
    """The prefix-cache audit carries its statistic in GROUP SIZES: the
    plan must contain no join at all (one projection, two aggregates)."""
    plan = _plan(spark, sf_smoke, "q355_prefix_cache_audit")
    assert "Join" not in plan


def test_mmr_structure(spark, sf_smoke):
    """MMR invariants: 10 positions per query; position 1 pays no
    diversity penalty (score == 0.7·relevance, the empty-set maxsim);
    later positions never exceed it (the penalty is subtractive,
    maxsim_u ≥ 0 is not guaranteed for signed cosines — but the pick's
    score can never beat the same item's unpenalized score when the
    penalty is positive, so we assert the per-query score sequence is
    non-increasing, the greedy-argmax property)."""
    from cyber_etl_spark.plans import QUERIES

    rows = QUERIES["q357_mmr_rerank"].builder(spark, sf_smoke).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 3
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["position"])
        assert [r["position"] for r in rs] == list(range(1, 11))
        assert abs(rs[0]["mmr_score"] - 0.7 * rs[0]["relevance"]) < 1e-9
        scores = [r["mmr_score"] for r in rs]
        assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:])), qid
