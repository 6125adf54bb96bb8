"""Sink roundtrips and the threshold-sweep utility."""

from __future__ import annotations


def test_threshold_sweep_monotone(spark, sf_smoke):
    from cyber_etl_spark.operators.dedup import threshold_sweep
    from cyber_etl_spark.sources import read_table

    docs = read_table(spark, sf_smoke, "documents")
    sweep = threshold_sweep(docs, [0.2, 0.5, 0.9])
    counts = [c for _, c in sweep]
    assert counts == sorted(counts, reverse=True)  # higher t → fewer docs
    assert counts[0] > 0


def test_stop_shingle_prefilter(spark):
    """max_shingle_df drops boilerplate shingles before the inverted-index
    join: a footer shared by every doc stops creating candidate pairs, and
    Jaccard is computed consistently over the filtered sets."""
    from cyber_etl_spark.operators.dedup import jaccard_pairs

    footer = "copyright footer boilerplate company inc"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon " + footer),
            (2, "alpha beta gamma delta epsilon " + footer),
            (3, "zeta eta theta iota kappa " + footer),
            (4, "lambda mu nu xi omicron " + footer),
        ],
        "doc_id BIGINT, text STRING",
    )
    # default: the shared footer links EVERY doc pair above threshold 0.2
    base = jaccard_pairs(docs, threshold=0.2).toPandas()
    assert len(base) == 6
    # footer shingles appear in 4 docs > cap=2 → only the true near-dup
    # pair (1,2) survives, at jaccard 1.0 over its filtered shingle set
    filtered = jaccard_pairs(docs, threshold=0.2, max_shingle_df=2).toPandas()
    assert [(a, b) for a, b in zip(filtered["id_a"], filtered["id_b"])] == [(1, 2)]
    assert filtered["jaccard"].iloc[0] == 1.0


def test_jaccard_exact_string_key_matches_encoded(spark, sf_smoke):
    """encode_key=False (exact-string join for birthday-regime corpora)
    must produce identical pairs to the xxhash64-encoded default."""
    from cyber_etl_spark.operators.dedup import jaccard_pairs
    from cyber_etl_spark.sources import read_table

    docs = read_table(spark, sf_smoke, "documents")
    enc = jaccard_pairs(docs, threshold=0.5).toPandas()
    raw = jaccard_pairs(docs, threshold=0.5, encode_key=False).toPandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"], df["jaccard"].round(6)))
    assert key(enc) == key(raw)


def test_sink_roundtrips(spark, sf_smoke, tmp_path):
    from cyber_etl_spark.sources import read_table
    from cyber_etl_spark.sources.sinks import read_csv, write_csv, write_parquet

    nation = read_table(spark, sf_smoke, "nation")
    write_parquet(nation, str(tmp_path / "nation_pq"))
    back = spark.read.parquet(str(tmp_path / "nation_pq"))
    assert back.count() == nation.count()
    assert back.schema == nation.schema

    write_csv(nation, str(tmp_path / "nation_csv"), single_file=True)
    back_csv = read_csv(spark, str(tmp_path / "nation_csv"))
    assert back_csv.count() == nation.count()
    assert [f.name for f in back_csv.schema.fields] == [
        f.name for f in nation.schema.fields
    ]


def test_incremental_dedup_asymmetric(spark):
    """minhash_lsh_pairs_incremental pairs new ONLY against corpus:
    planted corpus-internal duplicates must never appear, planted
    new-vs-corpus near-dups must."""
    from cyber_etl_spark.operators.dedup import minhash_lsh_pairs_incremental

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup INSIDE the corpus — must not be reported
            (3, "completely different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base + " extra"),  # near-dup of corpus 1 and 2
            (101, "nothing in common whatsoever between these two documents"),
        ],
        "doc_id long, text string",
    )
    got = minhash_lsh_pairs_incremental(new, corpus, threshold=0.5).collect()
    pairs = {(r.id_new, r.id_corpus) for r in got}
    assert pairs == {(100, 1), (100, 2)}
    assert all(r.jaccard >= 0.5 for r in got)
    # ids never cross roles: left column is always a new-batch id
    assert all(r.id_new >= 100 for r in got)


def test_clustered_write_prunes_files(spark, sf_smoke, tmp_path):
    """write_parquet_clustered must produce disjoint per-file key ranges
    (footer min/max stats → file-level skipping for range predicates),
    with rows sorted inside each file."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.sources import read_table
    from cyber_etl_spark.sources.sinks import write_parquet_clustered

    orders = read_table(spark, sf_smoke, "orders")
    path = str(tmp_path / "orders_clustered")
    write_parquet_clustered(orders, path, ["o_orderdate"], num_files=4)

    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # per-file ranges must not overlap
    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .collect()
    )
    spans = sorted(((r.lo, r.hi) for r in spans))
    assert len(spans) > 1
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, "file key ranges overlap — no pruning possible"


def test_lsh_string_key_matches_encoded(spark, sf_smoke):
    """Candidate-first verification must agree between the xxhash64-coded
    join key and the raw-string key (the 100 TB-cardinality fallback)."""
    from cyber_etl_spark.operators.dedup import minhash_lsh_pairs
    from cyber_etl_spark.sources import read_table

    docs = read_table(spark, sf_smoke, "documents")
    enc = minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    raw = minhash_lsh_pairs(docs, threshold=0.5, encode_key=False).toPandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"], df["jaccard"].round(6)))
    assert key(enc) == key(raw)


def test_orc_jsonl_roundtrips(spark, sf_smoke, tmp_path):
    from cyber_etl_spark.sources import read_table
    from cyber_etl_spark.sources.sinks import (
        read_jsonl,
        read_orc,
        write_jsonl,
        write_orc,
    )

    nation = read_table(spark, sf_smoke, "nation")
    write_orc(nation, str(tmp_path / "nation_orc"))
    back = read_orc(spark, str(tmp_path / "nation_orc"))
    assert back.count() == nation.count() and back.schema == nation.schema

    write_jsonl(nation, str(tmp_path / "nation_jsonl"))
    back = read_jsonl(spark, str(tmp_path / "nation_jsonl"), schema=nation.schema)
    assert back.count() == nation.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_pairs_hint_duplicate_rows_tolerated(spark):
    """Duplicate candidate rows must not inflate n_common (jaccard > 1
    false passes) — _verify_candidates dedupes the hint internally."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.dedup import _pair_jaccard, shingle_sets

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
        ],
        "doc_id long, text string",
    )
    sh = shingle_sets(docs, "doc_id", "text")
    hint = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    clean = _pair_jaccard(sh, pairs_hint=hint).collect()[0]
    dup_hint = hint.unionByName(hint).unionByName(hint)  # 3 copies
    dup = _pair_jaccard(sh, pairs_hint=dup_hint).collect()[0]
    assert abs(clean.jaccard - dup.jaccard) < 1e-12
    assert 0.0 < clean.jaccard <= 1.0


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc embedded in a long superset: containment ~1.0 from the
    subset side while Jaccard stays below a dedup threshold."""
    from cyber_etl_spark.operators.dedup import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    cont = containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0].contain_a >= 0.99  # subset side
    jac = jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == []  # Jaccard misses the wrap


def test_pii_redaction_order_and_counts(spark):
    from pyspark.sql import functions as F

    from cyber_etl_spark.functions.pii import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io or 10.0.255.7 call 555-123-4567 x 1.2.3.4")],
        "id long, s string",
    )
    row = df.select(
        redact_pii(F.col("s")).alias("r"),
        *[c.alias(k) for k, c in pii_counts(F.col("s")).items()],
    ).collect()[0]
    assert row.r == "mail [EMAIL] or [IP] call [PHONE] x [IP]"
    assert (row.n_email, row.n_ip, row.n_phone) == (1, 2, 1)


def test_containment_empty_corpus(spark):
    from cyber_etl_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert containment_pairs(docs).count() == 0


def test_span_cut_owner_keeps_duplicate_loses(spark):
    """q140 semantics on a crafted pair: the min-id owner keeps the
    shared 8-gram span, the duplicate loses exactly the covered tokens,
    and non-shared text survives in both."""
    from cyber_etl_spark.plans import QUERIES
    import os, tempfile

    span = "one two three four five six seven eight"
    rows = [
        (1, f"{span} alpha beta"),
        (2, f"intro {span} outro"),
        (3, "totally different words here nothing shared at all"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(
            os.path.join(d, "documents")
        )
        out = {
            r.doc_id: r
            for r in QUERIES["q140_span_cut"].builder(spark, d).collect()
        }
    assert out[1].n_removed == 0 and out[1].clean_text == rows[0][1]
    assert out[2].n_removed == 8 and out[2].clean_text == "intro outro"
    assert out[3].n_removed == 0 and out[3].clean_text == rows[2][1]


def test_repeated_spans_min_span_only_removes(spark, sf_smoke):
    """Monotonicity of the (n, min_span) span scheme (r5 verdict item 7):
    at fixed n, raising min_span can only DROP spans — per-doc n_spans
    and covered_tokens weakly decrease and no new doc appears."""
    from cyber_etl_spark.plans.textops import repeated_spans

    fine = {
        r.doc_id: r for r in repeated_spans(spark, sf_smoke, n=5, min_span=5).collect()
    }
    coarse = {
        r.doc_id: r for r in repeated_spans(spark, sf_smoke, n=5, min_span=12).collect()
    }
    coarser = {
        r.doc_id: r for r in repeated_spans(spark, sf_smoke, n=5, min_span=20).collect()
    }
    assert fine, "fixture corpus must contain shared 5-gram spans"
    for hi, lo in ((coarse, fine), (coarser, coarse)):
        assert set(hi) <= set(lo)
        for doc_id, r in hi.items():
            assert r.n_spans <= lo[doc_id].n_spans
            assert r.covered_tokens <= lo[doc_id].covered_tokens


def test_repeated_spans_rejects_min_span_below_n(spark, sf_smoke):
    import pytest

    from cyber_etl_spark.plans.textops import repeated_spans

    with pytest.raises(ValueError, match="below shingle width"):
        repeated_spans(spark, sf_smoke, n=8, min_span=4)


def test_prefix_filter_losslessness_crafted(spark):
    """Prefix filtering must surface EVERY pair with Jaccard >= t, even
    when the shared tokens are the corpus's most COMMON ones (the case
    a rare-first prefix is most tempted to skip): with |x| = 4, t = 0.5
    the prefix indexes 4 - 2 + 1 = 3 shingles, so any pair sharing >= 2
    of 4 must collide in at least one prefix slot (pigeonhole)."""
    from cyber_etl_spark.operators.similarity import prefix_filter_jaccard_pairs

    rows = [
        (1, "a b c d e f"),   # shingles: abc bcd cde def
        (2, "a b c d x y"),   # shares abc bcd -> jaccard 2/6 < 0.5
        (3, "a b c d e z"),   # shares abc bcd cde -> 3/5 >= 0.5
        (4, "a b c d e f"),   # identical -> 4/4
        (5, "p q r s t u"),   # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(df, threshold=0.5, shingle_n=3).collect()
    }
    assert set(got) == {(1, 3), (1, 4), (3, 4)}
    assert got[(1, 4)] == 1.0
    assert got[(1, 3)] == 0.6  # 3 common / (4 + 4 - 3)
