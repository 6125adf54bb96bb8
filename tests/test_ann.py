"""Behavioral checks for the approximate operators (no SQL oracle).

LSH is deterministic given its fixed seeds, but its *spec* is recall
against the exact result — that's what these tests pin down.
"""

from __future__ import annotations

import pytest


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


@pytest.mark.parametrize(
    "num_perm,bands",
    [(8, 4), (12, 4), (16, 8), (12, 6), (6, 6)],
    ids=["default-8x4", "3rows-12x4", "2rows-16x8", "2rows-12x6", "1row-6x6"],
)
def test_minhash_scheme_soundness(spark, sf_smoke, num_perm, bands):
    """The generalized band fold at ANY (num_perm, bands) scheme: verified
    output is a subset of the exact pairs (soundness — verification is
    exact regardless of banding), and high-similarity pairs (Jaccard ≥
    0.8, where every scheme's S-curve is near 1) are recalled."""
    from cyber_etl_spark.operators.dedup import minhash_lsh_pairs
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.sources import read_table

    exact = QUERIES["q21_neardup_jaccard"].builder(spark, sf_smoke).toPandas()
    lsh = minhash_lsh_pairs(
        read_table(spark, sf_smoke, "documents"),
        threshold=0.5,
        num_perm=num_perm,
        bands=bands,
    ).toPandas()
    je = _pair_set(exact, "id_a", "id_b")
    jl = _pair_set(lsh, "id_a", "id_b")
    assert jl <= je, f"scheme {num_perm}/{bands} emitted a sub-threshold pair"
    hi = _pair_set(exact[exact["jaccard"] >= 0.8], "id_a", "id_b")
    if hi:
        recall_hi = len(hi & jl) / len(hi)
        assert recall_hi >= 0.8, (
            f"scheme {num_perm}/{bands} recall on Jaccard>=0.8 pairs: {recall_hi:.3f}"
        )


def test_band_signatures_scheme_validation(spark):
    from cyber_etl_spark.operators.dedup import band_signatures

    sh = spark.createDataFrame([(1, "a b c")], ["id", "shingle"])
    with pytest.raises(ValueError, match="must divide"):
        band_signatures(sh, num_perm=10, bands=4)
    with pytest.raises(ValueError, match="num_perm >= bands"):
        band_signatures(sh, num_perm=2, bands=4)


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


def test_dynamic_block_sizing_invariance(spark, sf_smoke, monkeypatch):
    """Block count is derived from corpus bytes / target; shrinking the
    target to 8 KB forces many more than the 16-block floor, and both
    blocked-GEMM operators return identical results — block sizing is a
    memory/parallelism knob, never a semantics knob."""
    import cyber_etl_spark.operators.ann as ann
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    queries = emb.where(emb.vec_id < 20)

    base_knn = ann.brute_force_knn(emb, queries, k=10).toPandas()
    base_pairs = ann.cosine_neardup_pairs(emb, threshold=0.4).toPandas()

    v = emb.selectExpr("vec_id as id", "cast(embedding as array<double>) as v")
    assert ann._dynamic_n_blocks(v, target_bytes=8 * 1024) > 16

    monkeypatch.setattr(ann, "_TARGET_BLOCK_BYTES", 8 * 1024)
    many_knn = ann.brute_force_knn(emb, queries, k=10).toPandas()
    many_pairs = ann.cosine_neardup_pairs(emb, threshold=0.4).toPandas()

    knn_key = ["query_id", "neighbor_id"]
    assert sorted(map(tuple, base_knn[knn_key].values)) == sorted(
        map(tuple, many_knn[knn_key].values)
    )
    pair_key = ["id_a", "id_b", "cosine"]
    assert sorted(map(tuple, base_pairs[pair_key].values)) == sorted(
        map(tuple, many_pairs[pair_key].values)
    )


def test_semantic_dedup_drops_in_cell_neardups(spark, sf_smoke):
    """Every dropped doc has a surviving smaller-id in-cell neighbor at/
    above the threshold; survivors have no smaller-id in-cell neighbor."""
    import pandas as pd

    from cyber_etl_spark.operators.ann import semantic_neardup_pairs
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    assign, pairs = semantic_neardup_pairs(emb, n_cells=8, iters=2, threshold=0.4)
    a = assign.toPandas()
    p = pairs.toPandas()
    dropped = set(p["id_b"])
    survivors = set(a["id"]) - dropped
    # keep-first rule: every doc with a smaller-id neighbor is dropped,
    # and nothing else is
    from cyber_etl_spark.operators.ann import semantic_dedup

    surv_df = semantic_dedup(emb, n_cells=8, iters=2, threshold=0.4).toPandas()
    assert set(surv_df["vec_id"]) == survivors
    assert len(dropped) > 0, "fixture should contain in-cell near-duplicates"
    # pairs are genuinely within-cell
    cell_of = dict(zip(a["id"], a["cell"]))
    assert all(cell_of[x] == cell_of[y] for x, y in zip(p["id_a"], p["id_b"]))
    assert isinstance(surv_df, pd.DataFrame)


def test_semantic_dedup_block_split_invariance(spark, sf_smoke, monkeypatch):
    """Within-cell block splitting (skewed-cell guard) never changes the
    survivor set — sizing is memory-only, like the other GEMM operators."""
    import cyber_etl_spark.operators.ann as ann
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    base = ann.semantic_dedup(emb, n_cells=8, iters=2, threshold=0.4).toPandas()
    monkeypatch.setattr(ann, "_TARGET_BLOCK_BYTES", 8 * 1024)
    many = ann.semantic_dedup(emb, n_cells=8, iters=2, threshold=0.4).toPandas()
    key = ["vec_id", "cell"]
    assert sorted(map(tuple, base[key].values)) == sorted(map(tuple, many[key].values))


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """A seed that attracts no members must keep its centroid (no NULL
    centroid row, no lost cell) through further iterations."""
    from cyber_etl_spark.operators.ann import kmeans_fit

    # two tight clusters far apart; seeds are ids 0 and 1 — both in
    # cluster A, so after iteration 1 one seed owns everything near A and
    # the other may lose all members once B's pull moves a centroid.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.98, 0.02, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [-0.99, -0.01, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assign = kmeans_fit(df, n_cells=2, iters=3)
    c = cents.toPandas()
    assert len(c) == 2
    assert c["cv"].map(lambda v: v is None or any(x is None for x in v)).sum() == 0
    a = assign.toPandas()
    assert set(a["id"]) == {0, 1, 2, 3, 4}


def test_scalar_quantize_int8_bounds_and_reconstruction(spark):
    """int8 codes stay in [-127, 127], all-zero vectors are dropped, and
    dequantization reconstructs each element within one quantization
    step (scale)."""
    from cyber_etl_spark.operators.ann import scalar_quantize_int8

    rows = [
        (1, [1.0, -2.0, 0.5]),
        (2, [-0.001, 0.002, 0.0005]),
        (3, [0.0, 0.0, 0.0]),  # no direction -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r for r in scalar_quantize_int8(df).collect()}
    assert set(out) == {1, 2}
    for vid, vec in [(1, rows[0][1]), (2, rows[1][1])]:
        r = out[vid]
        assert all(-127 <= c <= 127 for c in r.codes)
        # the max-|x| element quantizes to ±127 exactly (or -127 via floor)
        assert max(abs(c) for c in r.codes) == 127
        for orig, dq in zip(vec, r.dequant):
            assert abs(orig - dq) <= r.scale + 1e-12


def test_ivf_index_save_load_roundtrip(spark, tmp_path):
    """The persisted-index query path returns exactly the inline-built
    ivf_knn results (build once, query many)."""
    from cyber_etl_spark.operators.ann import (
        ivf_assign,
        ivf_knn,
        load_ivf_index,
        save_ivf_index,
    )
    from cyber_etl_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    emb = read_table(spark, sf, "embeddings")
    queries = emb.where(emb.vec_id < 5)
    inline = ivf_knn(emb, queries, k=5, n_cells=8)
    cents, assign = ivf_assign(emb, n_cells=8)
    save_ivf_index(cents, assign, str(tmp_path / "ivf"))
    idx = load_ivf_index(spark, str(tmp_path / "ivf"))
    loaded = ivf_knn(emb, queries, k=5, index=idx)
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, loaded.collect()))
    assert a == b and len(a) == 25


def test_scalar_quantize_int8_negative_max_clamps_at_minus_127(spark):
    """A negative max-|x| element whose float divide lands below -127
    must clamp to -127, not floor to -128 (the int8 symmetric contract)."""
    from cyber_etl_spark.operators.ann import scalar_quantize_int8

    # x / (|x|/127) == -127.00000000000001 for this magnitude (verified):
    bad = -1.3445080768798998
    df = spark.createDataFrame(
        [(1, [bad, 0.5, 0.25])], "vec_id long, embedding array<double>"
    )
    r = scalar_quantize_int8(df).collect()[0]
    assert min(r.codes) == -127 and all(-127 <= c <= 127 for c in r.codes)


def test_ivf_index_append_lifecycle(spark, sf_smoke, tmp_path):
    """Incremental index maintenance: build+persist on half the corpus,
    append the other half, and the loaded index must (a) cover every id
    exactly once, (b) assign appended vectors exactly as the loaded
    centroids dictate, (c) serve ivf_knn queries that find an appended
    vector as its own nearest neighbor's twin."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.ann import (
        _quantized_vecs,
        ivf_assign,
        ivf_index_append,
        ivf_knn,
        load_ivf_index,
        nearest_centroid_assign,
        save_ivf_index,
    )
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    half = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    cents, assign = ivf_assign(half, n_cells=8)
    save_ivf_index(cents, assign, str(tmp_path / "ivf"))
    ivf_index_append(spark, str(tmp_path / "ivf"), rest)

    lcents, lassign = load_ivf_index(spark, str(tmp_path / "ivf"))
    n_total = emb.count()
    assert lassign.count() == n_total
    assert lassign.select("id").distinct().count() == n_total

    # appended rows match the definitional assignment vs loaded centroids
    want = {
        r["id"]: r["cell"]
        for r in nearest_centroid_assign(
            _quantized_vecs(rest, "vec_id", "embedding"), lcents
        ).collect()
    }
    got = {
        r["id"]: r["cell"]
        for r in lassign.join(
            rest.select(F.col("vec_id").alias("id")), "id", "left_semi"
        ).collect()
    }
    assert got == want

    # an appended vector is findable through the maintained index
    odd_id = rest.agg(F.min("vec_id")).collect()[0][0]
    q = emb.where(F.col("vec_id") == odd_id)
    res = ivf_knn(emb, q, k=5, index=(lcents, lassign))
    assert res.where(F.col("query_id") == odd_id).count() > 0


def test_ivf_index_append_idempotent_and_drift_audit(spark, sf_smoke, tmp_path):
    """A RETRIED append (same batch twice) must not duplicate ids — the
    anti-join against the persisted assignment ids makes the maintenance
    job idempotent (ADVICE r6) — and ivf_cell_stats(baseline=...) must
    report per-cell drift = exactly the appended counts."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.ann import (
        ivf_assign,
        ivf_cell_stats,
        ivf_index_append,
        load_ivf_index,
        save_ivf_index,
    )
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    half = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    cents, assign = ivf_assign(half, n_cells=8)
    save_ivf_index(cents, assign, str(tmp_path / "ivf"))
    baseline = ivf_cell_stats(load_ivf_index(spark, str(tmp_path / "ivf"))[1])

    first = ivf_index_append(spark, str(tmp_path / "ivf"), rest)
    n_rest = rest.count()
    assert first.count() == n_rest

    # retry the same maintenance job: nothing new to write
    second = ivf_index_append(spark, str(tmp_path / "ivf"), rest)
    assert second.count() == 0

    _, lassign = load_ivf_index(spark, str(tmp_path / "ivf"))
    assert lassign.count() == emb.count()
    assert lassign.select("id").distinct().count() == emb.count()

    # drift vs the build-time snapshot = the appended batch, cell by cell
    audit = ivf_cell_stats(lassign, baseline=baseline.select("cell", "n_vectors"))
    drift = {r["cell"]: r["drift"] for r in audit.collect()}
    appended = {
        r["cell"]: r["cnt"]
        for r in first.groupBy("cell").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert sum(drift.values()) == n_rest
    for cell, d in drift.items():
        assert d == appended.get(cell, 0)


def test_eps_neighbor_pairs_matches_exact_kernel(spark, sf_smoke):
    """The cell-pruned eps kernel is EXACT by contract: identical pair
    set and cosines to the all-pairs blocked-GEMM kernel on the real
    corpus — pruning is a cost knob, never a semantics knob (the q194
    r8-verdict fix).  Also pins the honesty note: at t=0.3 this corpus
    does not cluster tighter than the eps chord, so the kernel reports
    keeping every cell pair (degrading gracefully, not silently)."""
    import cyber_etl_spark.operators.ann as ann
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    stats: dict = {}
    got = ann.eps_neighbor_pairs(emb, threshold=0.3, _stats_out=stats).toPandas()
    want = ann.cosine_neardup_pairs(emb, threshold=0.3).toPandas()
    key = ["id_a", "id_b", "cosine"]
    assert sorted(map(tuple, got[key].values)) == sorted(map(tuple, want[key].values))
    assert stats["kept_cell_pairs"] == stats["total_cell_pairs"]  # honesty


def test_eps_neighbor_pairs_prunes_clustered_corpus(spark):
    """On a corpus that actually clusters (three tight orthogonal
    families, radius << eps chord), the triangle-inequality candidate
    step must PRUNE cross-family cell pairs — the kernel's 100 TB
    claim — while the output still equals the exact kernel's."""
    import numpy as np

    import cyber_etl_spark.operators.ann as ann

    rng = np.random.RandomState(7)
    dim, per = 16, 40
    rows = []
    for fam in range(3):
        center = np.zeros(dim)
        center[fam * 5] = 1.0
        for i in range(per):
            v = center + rng.normal(scale=0.02, size=dim)
            rows.append((fam * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    stats: dict = {}
    got = ann.eps_neighbor_pairs(
        emb, threshold=0.3, n_cells=6, iters=2, _stats_out=stats
    ).toPandas()
    want = ann.cosine_neardup_pairs(emb, threshold=0.3).toPandas()
    key = ["id_a", "id_b", "cosine"]
    assert sorted(map(tuple, got[key].values)) == sorted(map(tuple, want[key].values))
    # orthogonal families sit ~sqrt(2) apart with radii ~0.04: the
    # cross-family cell pairs are provably pair-free and must be pruned
    assert stats["kept_cell_pairs"] < stats["total_cell_pairs"], stats


def test_eps_neighbor_pairs_cell_cap(spark):
    import pytest as _pytest

    import cyber_etl_spark.operators.ann as ann

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="n_cells"):
        ann.eps_neighbor_pairs(emb, n_cells=100000)


def test_no_all_pairs_kernel_feeds_neighbor_graph_consumers():
    """Source audit (r8 verdict): registered queries whose pair table is
    an INTERMEDIATE eps-graph (fed into components / propagation / any
    downstream join) must use the candidate-first `eps_neighbor_pairs`
    kernel, never the exact all-pairs `cosine_neardup_pairs`.  The only
    sanctioned plan-side caller is q39, whose OUTPUT is the exact pair
    list itself (the pair-table modality query)."""
    import pathlib

    import cyber_etl_spark.plans as plans

    plans_dir = pathlib.Path(plans.__file__).parent
    offenders = []
    for path in sorted(plans_dir.glob("*.py")):
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if "cosine_neardup_pairs(" in code and "import" not in code:
                offenders.append(f"{path.name}:{lineno}")
    assert offenders == ["textops.py:715"], offenders


def test_eps_neighbor_pairs_subblock_invariance(spark, sf_smoke, monkeypatch):
    """Shrinking the block-size target forces n_sub > 1 (cells split into
    hash sub-blocks, candidate cell pairs expand to sub-block pairs) —
    results must be identical: sub-blocking is a memory knob, never a
    semantics knob (the cosine_neardup_pairs invariance contract carried
    to the eps kernel)."""
    import cyber_etl_spark.operators.ann as ann
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    base = ann.eps_neighbor_pairs(emb, threshold=0.3).toPandas()
    monkeypatch.setattr(ann, "_TARGET_BLOCK_BYTES", 8 * 1024)
    many = ann.eps_neighbor_pairs(emb, threshold=0.3).toPandas()
    key = ["id_a", "id_b", "cosine"]
    assert sorted(map(tuple, base[key].values)) == sorted(
        map(tuple, many[key].values)
    )
    assert len(base) > 0


def test_eps_neighbor_pairs_tiny_corpus(spark):
    """Fewer rows than n_cells: seeds collapse to the row count, cells
    stay consistent, and the exact pair semantics hold on a 3-row
    corpus (plus the empty corpus returns an empty frame)."""
    import cyber_etl_spark.operators.ann as ann

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = ann.eps_neighbor_pairs(emb, threshold=0.9).toPandas()
    assert sorted(map(tuple, got[["id_a", "id_b"]].values)) == [(1, 2)]
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ann.eps_neighbor_pairs(empty).count() == 0


def test_groupwise_max_cosine_block_invariant_and_exact(spark, sf_smoke, monkeypatch):
    """groupwise_max_cosine (q367's kernel): (a) block sizing never
    changes results (the brute_force_knn invariance contract); (b) the
    per-(query, group) max equals a naive per-group max over the
    brute-force score table; (c) self-matches are excluded; (d) the
    max_queries probe contract raises."""
    import pytest

    import cyber_etl_spark.operators.ann as ann
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    queries = emb.where(emb.vec_id < 15)

    base = ann.groupwise_max_cosine(emb, queries, "label").toPandas()
    monkeypatch.setattr(ann, "_TARGET_BLOCK_BYTES", 8 * 1024)
    many = ann.groupwise_max_cosine(emb, queries, "label").toPandas()
    key = ["query_id", "label", "cosine"]
    assert sorted(map(tuple, base[key].values)) == sorted(
        map(tuple, many[key].values)
    )

    # naive reference: exact per-(query, label) max over all pairs,
    # self-matches excluded, rounded after the max (monotone)
    import numpy as np

    rows = emb.selectExpr(
        "vec_id", "cast(embedding as array<double>) v", "label"
    ).collect()
    vecs = {r.vec_id: np.asarray(r.v) for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    qids = [r.vec_id for r in rows if r.vec_id < 15]
    want = {}
    for q in qids:
        for nid, v in vecs.items():
            if nid == q:
                continue
            c = float(
                vecs[q] @ v / (np.linalg.norm(vecs[q]) * np.linalg.norm(v))
            )
            k = (q, labels[nid])
            want[k] = max(want.get(k, -2.0), c)
    got = {
        (r.query_id, r.label): r.cosine for _, r in base.iterrows()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - round(v, 6)) < 2e-6, (k, got[k], v)

    with pytest.raises(ValueError, match="max_queries"):
        ann.groupwise_max_cosine(emb, emb, "label", max_queries=10).toPandas()
