"""Behavioral checks for the approximate operators (no SQL oracle).

LSH is deterministic given its fixed seeds, but its *spec* is recall
against the exact result — that's what these tests pin down.
"""

from __future__ import annotations


def _pair_set(pdf, a, b):
    return set(map(tuple, pdf[[a, b]].values))


def test_lsh_knn_recall(spark, sf_smoke):
    from cyber_etl_spark.plans import QUERIES

    exact = QUERIES["q24_knn_bruteforce"].builder(spark, sf_smoke).toPandas()
    approx = QUERIES["q25_knn_lsh"].builder(spark, sf_smoke).toPandas()
    e = _pair_set(exact, "query_id", "neighbor_id")
    a = _pair_set(approx, "query_id", "neighbor_id")
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"LSH recall@10 dropped to {recall:.3f}"
    # LSH top-k can only contain pairs that are genuine corpus members
    assert len(approx) == len(exact)


def test_minhash_recall_and_soundness(spark, sf_smoke):
    from cyber_etl_spark.plans import QUERIES

    exact = QUERIES["q21_neardup_jaccard"].builder(spark, sf_smoke).toPandas()
    lsh = QUERIES["q22_neardup_minhash_lsh"].builder(spark, sf_smoke).toPandas()
    je = _pair_set(exact, "id_a", "id_b")
    jl = _pair_set(lsh, "id_a", "id_b")
    assert jl <= je, "MinHash+verify must never emit a sub-threshold pair"
    assert len(je & jl) / max(len(je), 1) >= 0.9


def test_simhash_finds_planted_neardups(spark, sf_smoke):
    """The corpus contains planted near-duplicates (Jaccard ≥ 0.8); the
    simhash operator at hamming ≤ 3 should find a non-empty overlapping
    subset of them."""
    from cyber_etl_spark.plans import QUERIES

    sim = QUERIES["q23_neardup_simhash"].builder(spark, sf_smoke).toPandas()
    jac = QUERIES["q21_neardup_jaccard"].builder(spark, sf_smoke).toPandas()
    assert len(sim) > 0
    overlap = _pair_set(sim, "id_a", "id_b") & _pair_set(jac, "id_a", "id_b")
    assert len(overlap) > 0


def test_ivf_knn_recall(spark, sf_smoke):
    from cyber_etl_spark.plans import QUERIES

    exact = QUERIES["q24_knn_bruteforce"].builder(spark, sf_smoke).toPandas()
    ivf = QUERIES["q40_knn_ivf"].builder(spark, sf_smoke).toPandas()
    e = _pair_set(exact, "query_id", "neighbor_id")
    a = _pair_set(ivf, "query_id", "neighbor_id")
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall@10 dropped to {recall:.3f}"
    # every query still returns a full top-10 from its probed cells
    assert ivf.groupby("query_id").size().min() == 10
