"""Empty-input robustness: operators must degrade to empty results, not
crash — at 100 TB an empty partition, an empty update batch, or a
filter that matches nothing is an everyday event, and a plan that
NPEs/div-zeros on it takes the whole job down."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id BIGINT, text STRING")


def test_dedup_family_on_empty_corpus(spark):
    from cyber_etl_spark.operators.dedup import (
        exact_duplicate_mapping,
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_neardup_pairs,
    )

    docs = _empty_docs(spark)
    assert exact_duplicate_mapping(docs).count() == 0
    assert jaccard_pairs(docs).count() == 0
    assert minhash_lsh_pairs(docs).count() == 0
    assert simhash_neardup_pairs(docs).count() == 0


def test_simhash_degenerate_docs(spark):
    """NULL / empty / whitespace-only texts must behave like the oracle's
    explode: no fingerprint row (not a crash, not an all-ones 2^60-1)."""
    from cyber_etl_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, ""), (4, "   "), (5, "alpha beta gamma")],
        "doc_id BIGINT, text STRING",
    )
    fp = simhash_fingerprints(docs).toPandas()
    assert sorted(fp["id"]) == [1, 5]
    assert (fp["simhash"] < 2**60 - 1).all()
    pairs = simhash_neardup_pairs(docs).toPandas()
    assert [(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])] == [(1, 5)]


def test_ann_on_empty_corpus(spark):
    from cyber_etl_spark.operators.ann import (
        brute_force_knn,
        cosine_neardup_pairs,
    )

    emb = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<FLOAT>")
    assert brute_force_knn(emb, emb).count() == 0
    assert cosine_neardup_pairs(emb).count() == 0


def test_graph_algorithms_on_empty_edges(spark):
    from cyber_etl_spark.graph.algorithms import (
        bfs_distances,
        connected_components,
        label_propagation,
    )

    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert connected_components(edges).count() == 0
    assert label_propagation(edges).count() == 0
    sources = spark.createDataFrame([], "id BIGINT")
    assert bfs_distances(edges, sources).count() == 0


def test_etl_ops_with_empty_sides(spark):
    from cyber_etl_spark.operators.etl import merge_upsert, scd2_intervals

    base = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    empty = spark.createDataFrame([], "k INT, v STRING")
    out = merge_upsert(base, empty, "k").collect()
    assert len(out) == 1 and out[0].merge_action == "unchanged"
    ins = merge_upsert(empty, base, "k").collect()
    assert len(ins) == 1 and ins[0].merge_action == "inserted"
    stream = spark.createDataFrame([], "k INT, a STRING, ts INT, eid INT")
    assert scd2_intervals(stream, "k", "a", "ts", "eid").count() == 0


def test_motif_family_on_empty_graph(spark):
    from cyber_etl_spark.graph.motif import neighborhood, path_counts, paths

    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    seeds = spark.createDataFrame([(1,)], "id BIGINT")
    assert paths(edges, 3).count() == 0
    assert path_counts(edges, 3, lambda c: c == 1).count() == 0
    assert neighborhood(edges, seeds, hops=2).count() == 0
    # and empty SEEDS over a real graph
    e = spark.createDataFrame([(1, 2), (2, 3)], "src BIGINT, dst BIGINT")
    no_seeds = spark.createDataFrame([], "id BIGINT")
    assert neighborhood(e, no_seeds, hops=2).count() == 0


def test_incremental_dedup_empty_sides(spark):
    from cyber_etl_spark.operators.dedup import minhash_lsh_pairs_incremental

    empty = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id BIGINT, text STRING"
    )
    assert minhash_lsh_pairs_incremental(empty, docs).count() == 0
    assert minhash_lsh_pairs_incremental(docs, empty).count() == 0
    assert minhash_lsh_pairs_incremental(empty, empty).count() == 0


def test_round5_operators_on_empty_inputs(spark):
    """BPE, quantization and the span family degrade to empty outputs on
    empty corpora (the BPE curve still reports step 0 = 0 symbols)."""
    from cyber_etl_spark.operators.ann import scalar_quantize_int8
    from cyber_etl_spark.operators.bpe import bpe_compression_curve, bpe_merges

    docs = _empty_docs(spark)
    assert bpe_merges(docs, num_merges=2).count() == 0
    curve = {r.step: r.total_symbols for r in bpe_compression_curve(docs, num_merges=1).collect()}
    assert curve[0] is None or curve[0] == 0  # SUM over empty → NULL
    emb = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    assert scalar_quantize_int8(emb).count() == 0


def test_span_queries_on_tiny_docs(spark):
    """Docs shorter than the 8-gram window produce no spans and survive
    the cut untouched."""
    import os
    import tempfile

    from cyber_etl_spark.plans import QUERIES

    rows = [(1, "short doc"), (2, "short doc"), (3, "x")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(
            os.path.join(d, "documents")
        )
        assert QUERIES["q139_repeated_spans"].builder(spark, d).count() == 0
        out = {r.doc_id: r for r in QUERIES["q140_span_cut"].builder(spark, d).collect()}
    assert all(out[i].n_removed == 0 for i in (1, 2, 3))
    assert out[1].clean_text == "short doc"


def test_hits_on_empty_edges(spark):
    from cyber_etl_spark.graph.algorithms import hits

    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    hubs, auths = hits(edges, iterations=2)
    assert hubs.count() == 0 and auths.count() == 0


def test_kmeans_family_on_empty_corpus(spark):
    """Empty corpus → empty centroids/assignments/pairs, not a
    plan-build-time error (the GEMM assignment degrades like the
    broadcast-argmax form it replaced)."""
    from cyber_etl_spark.operators.ann import ivf_knn, kmeans_fit, semantic_dedup

    emb = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    cents, assign = kmeans_fit(emb, n_cells=4, iters=1)
    assert cents.count() == 0 and assign.count() == 0
    assert semantic_dedup(emb, n_cells=4, iters=1).count() == 0
    assert ivf_knn(emb, emb, k=3, n_cells=4).count() == 0
