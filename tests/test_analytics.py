"""Behavior tests for the round-7 analytics operators: the Misra–Gries
heavy-hitter kernel's superset guarantee under adversarial partitioning,
and the SymSpell deletion-neighborhood join's losslessness on crafted
insert/delete/substitute cases."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_frequent_items_exact_under_adversarial_partitioning(spark):
    """The MG candidate pass may emit different supersets under
    different input splits; the exact verify pass must erase that: the
    final answer equals the plain groupBy twin for 1, 3 and 32 input
    partitions, including at a phi where heavy and non-heavy items are
    one occurrence apart."""
    from cyber_etl_spark.operators.heavyhitters import frequent_items

    # 3 heavy items (>N/10), many light ones.  N = 100.
    rows = (
        [("hot_a",)] * 20
        + [("hot_b",)] * 15
        + [("hot_c",)] * 11
        + [("warm",)] * 10  # exactly N/10 -> NOT heavy (strict >)
        + [(f"cold_{i}",) for i in range(44)]
    )
    assert len(rows) == 100
    df = spark.createDataFrame(rows, "item string")
    expected = {("hot_a", 20), ("hot_b", 15), ("hot_c", 11)}
    for parts in (1, 3, 32):
        got = {
            (r.item, r.cnt)
            for r in frequent_items(
                df.repartition(parts), "item", phi_denom=10
            ).collect()
        }
        assert got == expected, f"parts={parts}: {got}"


def test_frequent_items_low_cardinality_degenerates_to_exact(spark):
    """When distinct items < k the summaries never trim, so every item
    is a candidate and the output is the full exact histogram filtered
    by the threshold."""
    from cyber_etl_spark.operators.heavyhitters import frequent_items

    df = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, "item string")
    got = {(r.item, r.cnt) for r in frequent_items(df, "item", phi_denom=1000).collect()}
    assert got == {("x", 5), ("y", 3)}


def test_frequent_items_rejects_bad_phi(spark):
    import pytest

    from cyber_etl_spark.operators.heavyhitters import frequent_items

    df = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(ValueError, match="positive rational"):
        frequent_items(df, "item", phi_denom=0)


def test_symspell_join_losslessness_crafted(spark):
    """The position-qualified deletion-neighborhood join must surface
    every edit-distance-1 pair class WITHOUT a levenshtein verify:
    substitution (same length, same deletion position), insertion/
    deletion (identity-key match), and must NOT pair strings at
    distance 2 — including the same-key-different-position trap
    ('abc'/'bca' share deletion key 'bc' but are distance 2)."""
    from cyber_etl_spark.operators.similarity import symspell_lev1_pairs

    names = [
        "alpha",   # vs "alpha_": insertion; vs "alpba": substitution
        "alpha_",
        "alpba",
        "alph",    # deletion of 'a'
        "beta",    # isolated
        "bxta",    # distance 1 from beta (substitution)
        "bxtz",    # distance 1 from bxta, 2 from beta -> only one pair
        "abc",     # shares deletion key 'bc' with 'bca' at different
        "bca",     # positions -> distance 2, must NOT pair
    ]
    df = spark.createDataFrame([(n,) for n in names], "c_name string")
    got = {
        (r.name_a, r.name_b)
        for r in symspell_lev1_pairs(df, "c_name").collect()
    }
    assert got == {
        ("alpha", "alpha_"),
        ("alpba", "alpha"),
        ("alph", "alpha"),
        ("beta", "bxta"),
        ("bxta", "bxtz"),
    }


def test_pq_adc_knn_partition_invariant_and_shaped(spark):
    """The PQ pipeline is exact-integer end to end, so the result must
    be bit-identical under any input partitioning; each query gets
    exactly k neighbors with non-negative ADC distances."""
    from cyber_etl_spark.operators.ann import pq_adc_knn
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {(r.query_id, r.neighbor_id, r.adc) for r in pq_adc_knn(emb, k=5).collect()}
    b = {
        (r.query_id, r.neighbor_id, r.adc)
        for r in pq_adc_knn(emb.repartition(17), k=5).collect()
    }
    assert a == b
    by_q = {}
    for q, n, d in a:
        assert d >= 0 and n != q
        by_q.setdefault(q, []).append(d)
    assert all(len(v) == 5 for v in by_q.values())


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    from cyber_etl_spark.operators.ann import pq_adc_knn
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_adc_knn(emb, m=7)


def test_text_index_lifecycle_parity_and_pruned_reads(spark, sf_smoke, tmp_path):
    """Persisted-index parity: save -> load -> query returns exactly the
    in-memory answer, and the loaded postings scan carries the token
    filter down to parquet (PushedFilters), so a keyword query reads
    posting runs instead of the corpus."""
    from cyber_etl_spark.operators.textindex import (
        bm25_topk,
        build_text_index,
        load_text_index,
        save_text_index,
    )
    from cyber_etl_spark.sources import read_table

    docs = read_table(spark, sf_smoke, "documents")
    postings, doclens, stats = build_text_index(docs)
    terms = ["scan", "merge", "batch"]
    direct = [(r.doc_id, r.bm25) for r in bm25_topk(postings, doclens, stats, terms).collect()]

    save_text_index(postings, doclens, stats, str(tmp_path / "tidx"))
    lp, ld, ls = load_text_index(spark, str(tmp_path / "tidx"))
    loaded = [(r.doc_id, r.bm25) for r in bm25_topk(lp, ld, ls, terms).collect()]
    assert loaded == direct and len(direct) == 10

    from pyspark.sql import functions as F

    plan = lp.where(F.col("token").isin(terms))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "token" in plan


def test_triplet_mining_block_invariant(spark):
    """The blocked per-anchor reduction must be invariant to the block
    count (losslessness of block-local extremes + global merge): 1
    block == many tiny blocks, including tie cases."""
    from cyber_etl_spark.operators.ann import triplet_mining
    from cyber_etl_spark.sources import read_table

    from pyspark.sql import functions as F2

    # deterministic subset (a bare limit() has no ordering contract and
    # re-executes per job — the two runs could mine different rows)
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").where(
        F2.col("vec_id") < 60
    )
    a = {tuple(r) for r in triplet_mining(emb, n_blocks=1).collect()}
    b = {tuple(r) for r in triplet_mining(emb, n_blocks=13).collect()}
    assert a == b and len(a) == 60


def test_markov_attribution_properties(spark, sf_smoke):
    """Removal effects are MONOTONE by construction: deleting a channel
    only removes Q entries, so every variant's absorption probability is
    bounded by the base chain's; effects lie in [0, 1] and the base row
    carries no effect."""
    from cyber_etl_spark.plans import QUERIES

    rows = {
        r.channel: r
        for r in QUERIES["q236_markov_attribution"]
        .builder(spark, sf_smoke)
        .collect()
    }
    base = rows.pop("base")
    assert base.removal_effect is None and 0 < base.p_conv <= 1
    assert rows  # every non-purchase channel present
    for r in rows.values():
        assert 0.0 <= r.p_conv <= base.p_conv + 1e-9
        assert 0.0 <= r.removal_effect <= 1.0
