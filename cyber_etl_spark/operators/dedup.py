"""Deduplication operator library for large-scale document corpora.

Exact, n-gram-Jaccard, MinHash+LSH and SimHash near-duplicate detection,
all as compositions of built-in DataFrame operators (explode / hash-join /
hash-agg) — no UDFs, no driver-side loops, so every stage distributes and
AQE handles skew.  This supersedes the reference's O(n·m) driver-side
similarity loop (alerts/cpe_product.ipynb:458-551, SURVEY.md J7/M4), which
cannot scale past a few thousand rows.

Hashing is md5-based (not Spark's murmur ``hash``) so the DuckDB oracle can
reproduce signatures bit-for-bit: lexicographic MIN over hex digests is a
valid MinHash permutation and is engine-independent.

Scale notes (100 TB corpus):
- ``shingle_sets`` is a flatMap: output ~tokens×1 rows, pruned to distinct
  per doc.  The inverted-index self-join in :func:`jaccard_pairs` shuffles
  on the shingle — hot shingles (boilerplate) are the classic skew source;
  AQE skew-join splits them, and callers can pre-drop ultra-frequent
  shingles (stop-shingle filter) the way production dedup pipelines do.
- :func:`minhash_lsh_pairs` is the scale path: candidate generation joins
  on (band, band_signature) — constant fan-out per doc (num_bands rows),
  so the shuffle volume is O(n·bands), independent of pair count.
- :func:`simhash_neardup_pairs` bands the fingerprint bits (pigeonhole:
  hamming ≤ bands-1 ⇒ some band equal), so candidate generation is again
  an equi-join, not a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import shingles, tokens


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) distinct word-n-gram pairs — the set representation
    used by every Jaccard-family operator."""
    toks = tokens(F.col(text_col))
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles(toks, n)).alias("shingle")
    ).distinct()
    # materialized once: the set representation is referenced 3+ times per
    # pair computation (sizes, both join sides) and by LSH verification —
    # without this the shingling re-executes per reference.
    return sh.localCheckpoint(eager=True)


def exact_duplicate_mapping(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: map every doc to the smallest id with identical text.

    groupBy(text) hash-aggregation — the canonical distributed exact-dedup.
    (Reference: drop_duplicates U2, used ~15×, e.g. data_integration.ipynb:675.)
    """
    canon = docs.groupBy(text_col).agg(F.min(id_col).alias("canonical_id"))
    return docs.join(canon, text_col).select(
        F.col(id_col).alias("id"), "canonical_id"
    )


def _verify_candidates(
    sh_a: DataFrame,
    sh_b: DataFrame,
    pairs: DataFrame,
    a_id: str,
    b_id: str,
    encode_key: bool = True,
) -> DataFrame:
    """Candidate-first exact Jaccard for a (a_id, b_id) candidate pair
    set over two shingle tables (which may be the same table) →
    (a_id, b_id, jaccard).

    The one implementation behind both the symmetric LSH verify and the
    incremental new-vs-corpus verify: join candidates to each side's
    shingle table (second join adds shingle-code equality so only
    shingles present in BOTH docs survive), count, then Jaccard from
    per-side set sizes.  Shuffle is O(|candidates| · avg_set_size),
    independent of posting-list skew.  ``encode_key`` as in
    :func:`_pair_jaccard` (xxhash64 codes vs raw strings past the
    64-bit birthday regime).

    ``pairs`` is deduplicated here: a duplicate candidate row multiplies
    ``n_common`` and can push jaccard past 1.0 (false threshold passes),
    so the count below is only correct over distinct pairs.  Centralizing
    the ``distinct`` keeps every caller — including external
    ``pairs_hint`` users — duplicate-tolerant at the cost of one
    aggregation over the (small) candidate set."""
    pairs = pairs.select(a_id, b_id).distinct()
    code = (lambda c: F.xxhash64(c)) if encode_key else (lambda c: F.col(c))
    ea = sh_a.select(F.col("id").alias(a_id), code("shingle").alias("code"))
    eb = sh_b.select(F.col("id").alias(b_id), code("shingle").alias("code"))
    common = pairs.join(ea, a_id).join(eb, [b_id, "code"]).select(a_id, b_id)
    counted = common.groupBy(a_id, b_id).agg(F.count(F.lit(1)).alias("n_common"))
    sa = sh_a.groupBy("id").agg(F.count(F.lit(1)).alias("na")).withColumnRenamed("id", a_id)
    sb = sh_b.groupBy("id").agg(F.count(F.lit(1)).alias("nb")).withColumnRenamed("id", b_id)
    return (
        counted.join(sa, a_id)
        .join(sb, b_id)
        .select(
            a_id,
            b_id,
            (F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))).alias(
                "jaccard"
            ),
        )
    )


def _pair_jaccard(
    sh: DataFrame,
    pairs_hint: DataFrame | None = None,
    encode_key: bool = True,
) -> DataFrame:
    """Common-shingle counts → Jaccard for (id_a < id_b) pairs.

    ``pairs_hint`` (optional candidate set) switches the plan to
    *candidate-first* verification — used by the LSH path.  Instead of
    enumerating every co-shingle pair via the inverted-index self-join
    and then semi-filtering (which shuffles O(Σ posting-list²) rows no
    matter how few candidates LSH produced — the exact blowup LSH exists
    to avoid, and on a boilerplate-heavy corpus the hot posting lists
    dominate), the candidate pairs are joined to the shingle table once
    per side: ``hint ⋈ sh ON id_a``, then ``⋈ sh ON (id_b, code)`` so
    only shingles present in BOTH docs survive, then count.  Shuffle is
    O(|candidates| · avg_set_size), independent of posting-list skew.
    Semantics are identical: per candidate pair, the number of common
    shingle codes.  ``pairs_hint`` may contain duplicate rows (they are
    deduplicated before counting — see :func:`_verify_candidates`).

    ``encode_key`` (default on) dictionary-encodes the join key:
    hashing/shuffling 8-byte fingerprints instead of ~20-byte shingle
    strings halves the inverted-index join cost.  xxhash64 is
    internal-only (the oracle never sees it; md5 is reserved for
    oracle-visible hashes).  SCALE BOUND: a cross-doc code collision
    silently inflates ``n_common`` — collision odds are |S|²/2⁶⁵ for |S|
    distinct shingles (≈2e-9 here, ~0.03 at 2³² ≈ 4·10⁹ shingles), so at
    100 TB-corpus shingle cardinalities pass ``encode_key=False`` to join
    on the exact strings (same plan shape, wider shuffle rows).
    """
    if pairs_hint is not None:
        # candidate-first: never materialize the inverted-index self-join
        return _verify_candidates(sh, sh, pairs_hint, "id_a", "id_b", encode_key)
    counted = _inverted_common(sh, encode_key)
    return _with_sizes(sh, counted).select(
        "id_a",
        "id_b",
        (F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))).alias(
            "jaccard"
        ),
    )


def _inverted_common(sh: DataFrame, encode_key: bool = True) -> DataFrame:
    """(id_a < id_b, n_common) common-shingle counts via the
    inverted-index self-join — shared by the Jaccard and containment
    verifiers."""
    if encode_key:
        enc = sh.select("id", F.xxhash64("shingle").alias("code"))
    else:
        enc = sh.select("id", F.col("shingle").alias("code"))
    a = enc.alias("a")
    b = enc.alias("b")
    common = a.join(
        b, (F.col("a.code") == F.col("b.code")) & (F.col("a.id") < F.col("b.id"))
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    return common.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_common"))


def _with_sizes(sh: DataFrame, counted: DataFrame) -> DataFrame:
    """Attach per-side shingle-set sizes (na, nb) to a pair-count table."""
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("nb"))
    return counted.join(sa, "id_a").join(sb, "id_b")


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    shingles_df: DataFrame | None = None,
    encode_key: bool = True,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs via inverted-index join.

    Replaces the reference's pruned nested loop (alerts/cpe_product.ipynb:
    514-520): only docs *sharing at least one shingle* ever meet, which is
    the distributed equivalent of its size-filter pruning but sound.
    ``shingles_df`` lets callers share one materialized shingle table
    across several dedup operators.  ``encode_key=False`` disables the
    xxhash64 join-key encoding for corpora whose distinct-shingle count
    approaches the 64-bit birthday regime (see :func:`_pair_jaccard`).

    ``max_shingle_df`` is the stop-shingle pre-filter (production dedup
    practice): shingles appearing in more than that many documents —
    boilerplate, the classic inverted-index skew source — are dropped
    from the shingle space BEFORE the join, so the hot posting lists
    never shuffle and Jaccard is computed over the filtered sets
    (consistently: sizes shrink with the index).  Default off: exact
    n-gram Jaccard, oracle-identical.
    """
    sh = shingles_df if shingles_df is not None else shingle_sets(docs, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return _pair_jaccard(sh, encode_key=encode_key).where(F.col("jaccard") >= threshold)


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    shingles_df: DataFrame | None = None,
    encode_key: bool = True,
) -> DataFrame:
    """Asymmetric near-subset pairs: containment(A→B) = |A∩B| / |A|.

    The dedup signal Jaccard misses: a short document wholly embedded in
    a boilerplate-wrapped superset has high containment but low Jaccard
    (|A∩B|/|A∪B| is dragged down by the wrapper).  Production curation
    pipelines (CCNet/RefinedWeb-style) use containment to drop the
    subset side.  Emits (id_a < id_b, contain_a, contain_b) for pairs
    where EITHER direction reaches ``threshold``; the caller drops the
    side whose containment is higher (it is the more-redundant one).

    Same plan skeleton as :func:`jaccard_pairs` — inverted-index
    equi-join, per-pair common counts, size join — so the scale story is
    identical: only docs sharing a shingle ever meet, shuffles key on
    uniformly distributed shingle codes.
    """
    sh = shingles_df if shingles_df is not None else shingle_sets(docs, id_col, text_col, n)
    counted = _inverted_common(sh, encode_key)
    scored = _with_sizes(sh, counted).select(
        "id_a",
        "id_b",
        (F.col("n_common") / F.col("na")).alias("contain_a"),
        (F.col("n_common") / F.col("nb")).alias("contain_b"),
    )
    return scored.where(
        F.greatest(F.col("contain_a"), F.col("contain_b")) >= threshold
    )


def band_signatures(sh: DataFrame, num_perm: int = 8, bands: int = 4) -> DataFrame:
    """(id, band, band_sig) MinHash band signatures over a shingle table.

    shingle → num_perm md5 permutations → min per permutation → per-band
    fold into one md5 signature.  Seeded by permutation index, so two
    independently-signed tables (e.g. a new batch vs the historical
    corpus in :func:`minhash_lsh_pairs_incremental`) produce JOINABLE
    signatures, and the DuckDB oracle reproduces them bit-for-bit.

    Permutation ``i`` feeds band ``i % bands``, row ``i // bands``; the
    band signature is ``md5(band | m0 | m1 | ... )`` over the per-row
    minima in row order.  Works for ANY (num_perm, bands) with
    ``bands | num_perm`` — production schemes tune precision/recall by
    rows-per-band (the LSH S-curve exponent), e.g. 128 perms / 16 bands
    for a sharper 0.8-Jaccard knee.  The fold stays ONE groupBy whatever
    the scheme: rows-per-band conditional mins are independent aggregate
    expressions over the same (id, band) grouping, so the shuffle is
    O(n · num_perm) rows into n · bands groups regardless.
    """
    if num_perm < bands:
        raise ValueError(f"need num_perm >= bands, got {num_perm} < {bands}")
    if num_perm % bands:
        raise ValueError(f"num_perm={num_perm} must divide into bands={bands}")
    rows_per_band = num_perm // bands
    # One md5 COLUMN per permutation over the (id, shingle) rows — the
    # former explode(seeds) fanned every shingle string out num_perm×
    # before hashing, paying num_perm hash-agg probes (and num_perm
    # copies of the shingle bytes) per shingle where one probe updating
    # num_perm min slots carries the same information (r12, guide §2.3:
    # shuffle/aggregate fewer, wider rows).  Hash inputs, min fold and
    # band-signature fold are byte-identical to the exploded form, so
    # persisted signatures and the q22-family oracles are unchanged.
    mins = sh.groupBy("id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))
            ).alias(f"p{i}")
            for i in range(num_perm)
        ]
    )
    # permutation i feeds band i % bands, row i // bands; the band
    # signature is md5(band | m0 | m1 | ...) over row-order minima
    band_rows = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[F.col(f"p{r * bands + b}") for r in range(rows_per_band)],
                    )
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    return mins.select("id", F.explode(band_rows).alias("_bs")).select(
        "id", F.col("_bs.band").alias("band"), F.col("_bs.band_sig").alias("band_sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 8,
    bands: int = 4,
    shingles_df: DataFrame | None = None,
    encode_key: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, exact-verified.

    shingle → num_perm md5 permutations → min per permutation → band
    signatures → equi-join on (band, signature) for candidates → exact
    Jaccard verification.  Candidate shuffle is O(n·bands) rows — the
    100 TB-scale replacement for any all-pairs comparison.

    Deterministic: md5 is seeded by permutation index, so Spark and the
    DuckDB oracle compute identical signatures (and identically miss the
    same sub-threshold-probability pairs — LSH recall is a function of the
    banding scheme, not the engine).
    """
    sh = shingles_df if shingles_df is not None else shingle_sets(docs, id_col, text_col, n)
    sig = band_signatures(sh, num_perm, bands)
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    candidates = (
        sa.join(
            sb,
            (F.col("sa.band") == F.col("sb.band"))
            & (F.col("sa.band_sig") == F.col("sb.band_sig"))
            & (F.col("sa.id") < F.col("sb.id")),
        )
        # dedup across bands happens inside _verify_candidates
        .select(F.col("sa.id").alias("id_a"), F.col("sb.id").alias("id_b"))
    )
    return _pair_jaccard(sh, pairs_hint=candidates, encode_key=encode_key).where(
        F.col("jaccard") >= threshold
    )


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 8,
    bands: int = 4,
    shingles_new: DataFrame | None = None,
    shingles_corpus: DataFrame | None = None,
    signatures_corpus: DataFrame | None = None,
    encode_key: bool = True,
) -> DataFrame:
    """Asymmetric LSH dedup: near-duplicates of NEW docs against an
    EXISTING corpus → (id_new, id_corpus, jaccard).

    ``shingles_new`` / ``shingles_corpus``: pre-built (id, shingle)
    tables (e.g. partitions of one shared shingle build, or the
    persisted corpus shingles of a real deployment) — skips re-shingling
    that side.  ``signatures_corpus``: the persisted corpus band-signature
    table (what a production deployment maintains between ingests, and
    what the streaming twin pins across micro-batches) — skips re-signing
    the corpus.

    The incremental-ingest shape of a production training-data pipeline:
    a crawl batch is deduped against the historical corpus WITHOUT
    re-pairing the corpus with itself.  Both sides are signed with the
    same seeded permutations (:func:`band_signatures`), so candidates are
    one equi-join on (band, band_sig) — shuffle O(|new|·bands +
    |corpus|·bands), and the |corpus|² term never exists.  In a real
    deployment the corpus signatures are computed once and persisted;
    only the (tiny) new-batch side is signed per ingest.

    Verification is candidate-first on both sides (join the candidate
    pairs to each shingle table, count equal shingles) — same economics
    as :func:`_pair_jaccard`'s hint path.
    """
    sh_new = (
        shingles_new
        if shingles_new is not None
        else shingle_sets(new_docs, id_col, text_col, n)
    )
    sh_old = (
        shingles_corpus
        if shingles_corpus is not None
        else shingle_sets(corpus_docs, id_col, text_col, n)
    )
    sig_new = band_signatures(sh_new, num_perm, bands)
    sig_old = (
        signatures_corpus
        if signatures_corpus is not None
        else band_signatures(sh_old, num_perm, bands)
    )
    cand = (
        sig_new.alias("a")
        .join(
            sig_old.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig")),
        )
        # dedup across bands happens inside _verify_candidates
        .select(F.col("a.id").alias("id_new"), F.col("b.id").alias("id_corpus"))
    )
    return _verify_candidates(
        sh_new, sh_old, cand, "id_new", "id_corpus", encode_key
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit long


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash fingerprint per document (id, simhash bigint).

    Token-frequency-weighted: each distinct token contributes its count ×
    (±1) per bit position, bit = sign of the weighted sum.  All arithmetic
    is md5-derived so the DuckDB oracle reproduces it exactly.

    Plan shape: one ``mapInPandas`` pass — fingerprints are per-document
    (embarrassingly parallel), so each Arrow batch tokenizes, md5-derives
    the per-token ±1 bit vectors (memoized across the batch — Zipf means
    few distinct tokens), and folds the weighted sign sum in integer
    numpy.  This replaces the relational formulation (explode → count →
    join bit table → two groupBys) whose intermediate is |doc-tokens|×60
    rows — a 60× row blowup a map-side kernel never materializes.  The
    integer md5 arithmetic is bit-identical to the DuckDB oracle's.
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id", docs.schema[id_col].dataType),
            StructField("simhash", LongType()),
        ]
    )
    nbits = _SIMHASH_BITS
    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    def fingerprint(batches):
        bitcache: dict[str, np.ndarray] = {}

        def token_signs(tok: str) -> np.ndarray:
            v = bitcache.get(tok)
            if v is None:
                h = hashlib.md5(tok.encode()).hexdigest()
                bits = np.array(
                    [(int(h[j // 4], 16) >> (j % 4)) & 1 for j in range(nbits)],
                    dtype=np.int64,
                )
                v = bitcache[tok] = 2 * bits - 1
            return v

        weights = (1 << np.arange(nbits, dtype=np.int64))
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["id"], pdf["text"]):
                # explode semantics: NULL / token-less docs emit NO row
                # (the relational formulation and the DuckDB oracle both
                # drop them at the unnest), instead of crashing on None
                # or emitting an all-ones fingerprint for "".
                if text is None or not isinstance(text, str):
                    continue
                counts: dict[str, int] = {}
                for tok in text.split(" "):
                    if tok:
                        counts[tok] = counts.get(tok, 0) + 1
                if not counts:
                    continue
                acc = np.zeros(nbits, dtype=np.int64)
                for tok, cnt in counts.items():
                    acc += cnt * token_signs(tok)
                ids.append(doc_id)
                fps.append(int(weights[acc >= 0].sum()))
            yield pd.DataFrame({"id": ids, "simhash": fps})

    return src.mapInPandas(fingerprint, schema=out_schema)


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation bands the 60 fingerprint bits into ``bands``
    15-bit segments and equi-joins on segment equality: by pigeonhole any
    pair with hamming ≤ bands-1 shares an identical segment, so for
    ``max_hamming ≤ bands-1`` this is exact, with equi-join (not cross
    join) shuffle economics — the standard Google-style simhash dedup plan.
    """
    assert max_hamming <= bands - 1, "banding is only exact for hamming <= bands-1"
    fp = simhash_fingerprints(docs, id_col, text_col)
    seg_bits = _SIMHASH_BITS // bands
    # static integer shifts per segment: fingerprints exceed 2^53, so any
    # double-typed division would silently drop low bits
    seg_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg"),
                (F.shiftright(F.col("simhash"), i * seg_bits) % (2**seg_bits)).alias(
                    "seg_val"
                ),
            )
            for i in range(bands)
        ]
    )
    segs = fp.select("id", "simhash", F.explode(seg_structs).alias("e")).select(
        "id", "simhash", F.col("e.seg").alias("seg"), F.col("e.seg_val").alias("seg_val")
    )
    a = segs.alias("a")
    b = segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def threshold_sweep(
    docs: DataFrame,
    thresholds: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> list[tuple[float, int]]:
    """Cluster-count elbow scan — SURVEY.md M5 (the reference plots
    cluster counts for thresholds 0.30-0.85, data_integration.ipynb:
    2200-2319).  A driver-side loop over parametrized jobs (explicitly
    NOT an engine operator); the expensive shingle/pair computation is
    shared across all thresholds: pairs are scored once, each threshold
    is a filter + distinct count."""
    sh = shingle_sets(docs, id_col, text_col, n)
    scored = _pair_jaccard(sh).localCheckpoint(eager=True)
    out = []
    for t in thresholds:
        pairs = scored.where(F.col("jaccard") >= t)
        n_clustered_docs = (
            pairs.select(F.col("id_a").alias("id"))
            .unionByName(pairs.select(F.col("id_b").alias("id")))
            .distinct()
            .count()
        )
        out.append((t, n_clustered_docs))
    return out
