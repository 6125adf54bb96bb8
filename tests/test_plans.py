"""Physical-plan regression tests — the properties that decide whether a
query survives a 100× scale-up (SURVEY.md BASELINE north-star rules).

A correctness-green query with the wrong plan (full-column scan,
shuffle join against a 25-row dimension, global sort for a top-k) is a
bug at 100 TB even though no oracle catches it; these tests pin the plan.
"""

from __future__ import annotations

import pytest


def _plan(spark, sf_dir, name: str) -> str:
    from cyber_etl_spark.plans import QUERIES

    return (
        QUERIES[name]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


@pytest.fixture(scope="module")
def registry_plans(spark, sf_smoke) -> dict[str, str]:
    """Every registered query's physical-plan string, built ONCE per test
    module run and shared by the registry-wide audits — building 300+
    plans costs ~2 min (kernel builders execute bounded checkpoint jobs),
    and three audits each rebuilding them was the dominant suite cost
    (r9 durations profile: 3 x ~115 s)."""
    from cyber_etl_spark.plans import QUERIES

    return {
        name: q.builder(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        for name, q in sorted(QUERIES.items())
    }


def test_q01_scan_prunes_columns_and_pushes_filter(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q01_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # only the 6 needed columns reach the scan
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    assert "l_shipdate" in scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q05_dimension_joins_broadcast(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q05_region_volume")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_q10_topk_avoids_global_sort(spark, sf_smoke):
    assert "TakeOrderedAndProject" in _plan(spark, sf_smoke, "q10_global_topk")


def test_q06_semi_join_planned(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q06_semi_join")
    assert "LeftSemi" in plan


def test_whole_stage_codegen_everywhere_cheap(spark, sf_smoke, registry_plans):
    """The relational suite must stay JVM-side: no Python eval nodes in
    any oracle-checked query plan.  Exceptions are explicit: q39 scores
    millions of wide-vector pairs where the Arrow-vectorized numpy kernel
    beats interpreted `aggregate` folds ~10× (functions/vectors.py
    cosine_pandas) — and even there, row-at-a-time BatchEvalPython is
    still forbidden."""
    from cyber_etl_spark.plans import QUERIES

    VECTORIZED_OK = {
        "q39_neardup_embedding",
        # q209 exists to exercise the Python UDTF extension point (its
        # docstring names q56 as the fast native twin); Arrow-optimized,
        # and only per-doc token counts cross the Python boundary
        "q209_udtf_chunking",
    }
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        plan = registry_plans[name]
        # row-at-a-time pickled Python is banned EVERYWHERE, including
        # the sanctioned vectorized surfaces (plan node names have the
        # Exec suffix stripped — "BatchEvalPython" is what toString
        # prints, and ArrowEvalPython* does not contain it)
        assert "BatchEvalPython" not in plan, name
        if name not in VECTORIZED_OK:
            assert "ArrowEvalPython" not in plan, name
        # Spark's exact `percentile(` aggregate buffers every group value
        # in ONE aggregation buffer — an executor OOM for a global group
        # at 100 TB.  All exact quantiles must go through the distributed
        # range-partition selection kernel (operators/quantiles.py);
        # `percentile_approx(` (the q88 sketch) is the only sanctioned
        # built-in and does not match this substring.
        assert "percentile(" not in plan, name


def test_q22_lsh_verification_is_candidate_first(spark, sf_smoke):
    """The LSH exact-verify must never run the unfiltered inverted-index
    self-join (shingle-code ⋈ shingle-code, id<id residual) — that
    shuffles O(Σ posting-list²) rows regardless of how few candidates LSH
    produced, nullifying the O(n·bands) claim on boilerplate-heavy
    corpora.  Candidate-first: the old path's LeftSemi post-filter is
    gone, and every join touching the shingle code is keyed by a
    candidate id as well.  Asserted on the OPERATOR plan (the q22
    registry entry now serves a memoized checkpoint, whose plan is a
    scan)."""
    from cyber_etl_spark.operators.dedup import minhash_lsh_pairs
    from cyber_etl_spark.sources import read_table

    docs = read_table(spark, sf_smoke, "documents")
    plan = (
        minhash_lsh_pairs(docs, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" not in plan
    for line in plan.splitlines():
        if "Join" in line and "code#" in line:
            assert "id_a#" in line or "id_b#" in line, line


def test_q106_incremental_never_self_joins_corpus(spark, sf_smoke):
    """Incremental dedup's plan must contain no id<id self-join residual:
    candidates come from ONE cross-side band join (new × corpus), and
    verification is candidate-first — the corpus is never paired with
    itself, which is the whole point of the incremental shape."""
    plan = _plan(spark, sf_smoke, "q106_incremental_dedup")
    assert "LeftSemi" not in plan
    for line in plan.splitlines():
        if "Join" in line:
            assert "< id" not in line and "<= id" not in line, line


def test_q71_exists_is_semi_join_with_residual(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q71_exists_subquery")
    # the EXISTS must decorrelate to a semi join on the order key with the
    # date comparison as a residual, never a cartesian/BNLJ
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q72_brand_filter_broadcasts(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q72_scalar_subquery")
    # the filtered part dimension is tiny → must reach lineitem as a
    # broadcast, and the brand predicate must push into the part scan
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(p_brand,Brand#2)" in plan


def test_q65_set_ops_become_joins(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "q65_set_ops")
    # Catalyst rewrites INTERSECT/EXCEPT into semi/anti joins — pin it
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q122_bloom_prefilter_sits_below_the_join(spark, sf_smoke):
    """The probe-side Bloom membership test (bit_get over the bitmap
    literal) must appear as a Filter in the plan — i.e. the fact scan is
    filtered BEFORE any join shuffle, which is the operator's entire
    scale claim (probe shuffle volume ∝ selectivity + FP rate)."""
    plan = _plan(spark, sf_smoke, "q122_bloom_prefilter_join")
    assert "bit_get" in plan, plan[:2000]
    # plans print top-down (join above its children): the membership test
    # must live BELOW the join — in a child Filter, not a post-join
    # residual — so every bit_get occurrence follows the first Join node
    join_hits = [i for i in (plan.find("Join"), plan.find("join")) if i >= 0]
    assert join_hits and min(join_hits) < plan.find("bit_get"), plan[:2000]


def test_q130_kernel_plan_shape(spark, sf_smoke):
    """The MAD query (r6: distributed exact-quantile kernel) must show
    the kernel's scale contract in its final plan: NO WindowExec (the
    old per-group percentile buffer is gone), both group-median tables
    broadcast back (never a sort-merge join against a |groups|-row
    frame — one of the two joins rides the checkpointed deviation
    frame), and exactly one hashpartitioning exchange for the final
    per-source rollup."""
    plan = _plan(spark, sf_smoke, "q130_mad_outliers")
    assert "Window" not in plan
    assert "percentile(" not in plan
    assert plan.count("BroadcastHashJoin") == 1  # mad join (med join is
    # inside the eagerly-checkpointed deviation frame)
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_q134_groupby_reuses_window_partitioning(spark, sf_smoke):
    """The per-stream aggregate after the lag window must not re-shuffle:
    both key on (user_id, event_type)."""
    plan = _plan(spark, sf_smoke, "q134_burst_collapse")
    assert plan.count("Exchange hashpartitioning") == 1


def test_registry_wide_no_cartesian_product(registry_plans):
    """Generic scale invariant over EVERY registered query: plans must
    contain no non-broadcast CartesianProduct — the one operator shape
    that is always wrong at 100 TB (every intended cross join in the
    registry is a broadcast 1-row statistic or bounded probe list, which
    plans as BroadcastNestedLoopJoin).  Also smoke-builds every plan, so
    an AnalysisException in any registered builder fails here without
    executing anything (the shared registry_plans fixture builds them)."""
    flagged = [
        name for name, plan in registry_plans.items() if "CartesianProduct" in plan
    ]
    assert not flagged, flagged


def test_registry_wide_no_single_task_low_card_windows(spark, sf_smoke, registry_plans):
    """Registry-wide scale invariant (r6 verdict): a full-output window
    partitioned ONLY by low-cardinality keys funnels each key's entire
    data through one window task — correct and fast at sf0.1, a
    single-reducer sort-and-scan at 100 TB.  Such running totals / rank
    distributions must go through the distributed prefix kernel
    (operators/prefix.py), whose windows are self-identifying in the
    plan: the partition-local pass keys on `_pid` and the bounded
    control-table pass on `_gp_`-prefixed columns.

    Exemptions, in order:
    - spec contains `_pid`/`_gp_` → the prefix kernel's own windows;
    - spec contains any column NOT in the known low-cardinality set →
      per-task group size is bounded by the high-card key;
    - plan contains WindowGroupLimit → a top-k rank window whose cut
      Spark pushes map-side (the per-task buffer is k rows, not the
      group) — coarse per-plan, acceptable because every such query's
      only low-card window IS the rank window;
    - AGG_INPUT_OK → the window's input is a post-aggregation table
      (bounded rows; stated in each query's docstring): q97 per-(year,
      month) revenue, q78/q145 vocabulary frequency tables, q132 two
      per-doc retrieval score tables.
    """
    import re

    from cyber_etl_spark.plans import QUERIES

    LOW_CARD = {
        "source", "event_type", "lang", "split", "order_year",
        "o_orderpriority", "o_orderstatus", "l_returnflag", "l_linestatus",
        "c_mktsegment", "p_brand", "n_name", "r_name",
        # common ALIASES of the same keys — a rename must not let a
        # full-output low-card window evade the audit (q197 lesson)
        "nation", "brand", "region", "flag", "status", "type", "priority",
    }
    AGG_INPUT_OK = {
        "q97_ratio_to_report", "q78_vocab_build",
        "q145_bpe_tokenize", "q132_hybrid_rrf",
        # q197: window input is the (nation x brand) aggregate — both
        # dimensions are fixed vocabularies, bounded by construction
        "q197_topn_plus_other",
        # q210: cumulative windows over the per-DAY Kaplan-Meier grid —
        # one row per distinct event day, bounded by the calendar
        "q210_kaplan_meier",
        # q213: centered moving average over the same per-DAY grid
        "q213_seasonal_decomposition",
        # q216: CUSUM cumulative + argmax windows over the per-DAY grid
        # (calendar x 5 types, bounded by construction)
        "q216_cusum_changepoint",
        # q268: Nelson-Aalen cumulative hazard over the same per-DAY
        # grid as q210 (one row per distinct event day)
        "q268_nelson_aalen",
        # q275: vocabulary index assignment — the window's input is the
        # distinct-token table (the q78 vocabulary class)
        "q275_mlm_masking_plan",
        # q279: water-fill rank/prefix windows over the per-source
        # aggregate (5 rows, bounded by the source vocabulary)
        "q279_token_budget_allocation",
        # q286: cumulative LTV over the (cohort x age) quarter grid —
        # bounded by the calendar squared
        "q286_cohort_ltv",
        # q288: lag/lead over the per-DAY grid (calendar x 5 types,
        # the q213 convention)
        "q288_peak_detection",
        # q291: CUSUM windows over the total per-DAY grid at two
        # recursion levels (bounded by the calendar, the q216 class)
        "q291_binary_segmentation",
        # q297: row-number over the calendar spine for the lag-7 naive
        # baseline (bounded by the calendar, the q213 class)
        "q297_hw_backtest",
        # q324: lag over the distinct (type, day) grid (calendar x 5
        # types, the q288 convention)
        "q324_data_gap_audit",
        # q325: cumulative risk-set windows over the per-DAY grid
        # (the q210 class, carried per cohort in the same pass)
        "q325_logrank_test",
        # q328: rank-median over the pairwise-slope table — bounded by
        # the CALENDAR squared, never the corpus
        "q328_theil_sen_trend",
        # q346: cumulative LLR over the per-DAY grid (the q216 class)
        "q346_sprt_replay",
        # q347: median rank-pick + run-boundary lag over the per-DAY
        # grid (the q216/q288 class)
        "q347_runs_test",
    }
    spec_pat = re.compile(r"windowspecdefinition\(([^)]*)\)")
    flagged = []
    for name, plan in registry_plans.items():
        has_wgl = "WindowGroupLimit" in plan
        for m in spec_pat.finditer(plan):
            # kernel windows are self-identifying ANYWHERE in the spec:
            # the local pass partitions by _pid, the control pass
            # partitions by _gp_* or (global case, where Catalyst folds
            # the constant partition column away) orders by _pid
            if "_pid" in m.group(1) or "_gp_" in m.group(1):
                continue
            cols = []
            for tok in m.group(1).split(", "):
                if " ASC" in tok or " DESC" in tok or tok.startswith(
                    "specifiedwindowframe"
                ):
                    break
                cols.append(re.sub(r"#\d+L?", "", tok).strip())
            if any(c not in LOW_CARD for c in cols if c):
                continue
            if has_wgl or name in AGG_INPUT_OK:
                continue
            flagged.append((name, tuple(cols)))
    assert not flagged, flagged
