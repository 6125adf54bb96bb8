"""Property-based tests (hypothesis): column expressions vs independent
Python reference implementations over generated inputs.

These target cross-dialect hazards — Java regex vs Python re, split
semantics, array ops — that example-based tests can miss.  Each property
runs a handful of generated corpora through ONE Spark job (not one job
per example) to keep runtime sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
TEXTS = st.lists(
    st.lists(WORD, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=25
)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_shingle_count_invariant(spark, texts):
    """|shingles(t, 3)| == max(0, |tokens| - 2) for every document."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.functions.text import shingles, tokens

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    toks = tokens(F.col("text"))
    out = df.select("id", F.size(toks).alias("n"), F.size(shingles(toks, 3)).alias("s"))
    for r in out.collect():
        expect = max(0, r.n - 2)
        assert r.s == expect, (r.n, r.s)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="CVE-0123456789 abc", max_size=40), min_size=1, max_size=20))
def test_cve_extraction_matches_python_re(spark, texts):
    """Java-regex extraction == Python re on the same pattern (F1)."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.functions.strings import CVE_PATTERN, extract_cve_ids

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    got = {r.id: list(r.c) for r in df.select("id", extract_cve_ids(F.col("text")).alias("c")).collect()}
    pat = re.compile(CVE_PATTERN)
    for i, t in enumerate(texts):
        assert got[i] == sorted(set(pat.findall(t))), t


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_jaccard_pairs_bounds_and_symmetry(spark, texts):
    """Emitted Jaccard values lie in (0, 1]; pair ids are ordered."""
    from cyber_etl_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = jaccard_pairs(df, threshold=0.01).collect()
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0
        assert r.id_a < r.id_b


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_lsh_pairs_subset_of_exact(spark, texts):
    """LSH-verified pairs ⊆ exact Jaccard pairs at the same threshold,
    with identical scores on the intersection (verification is exact, so
    LSH can only MISS pairs — banding recall — never invent or misscore
    them)."""
    from cyber_etl_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    exact = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs(df, threshold=0.3).collect()
    }
    lsh = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in minhash_lsh_pairs(df, threshold=0.3).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v, k


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_incremental_equals_cross_side_of_full(spark, texts):
    """Asymmetric LSH (new vs corpus) reports exactly the cross-side
    subset of full-corpus LSH pairs, re-oriented (id_new, id_corpus)."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    new = df.where(F.col("doc_id") % 3 == 0)
    corpus = df.where(F.col("doc_id") % 3 != 0)
    inc = {
        (r.id_new, r.id_corpus, round(r.jaccard, 9))
        for r in minhash_lsh_pairs_incremental(new, corpus, threshold=0.3).collect()
    }
    full = minhash_lsh_pairs(df, threshold=0.3).collect()
    want = set()
    for r in full:
        a_new, b_new = r.id_a % 3 == 0, r.id_b % 3 == 0
        if a_new and not b_new:
            want.add((r.id_a, r.id_b, round(r.jaccard, 9)))
        elif b_new and not a_new:
            want.add((r.id_b, r.id_a, round(r.jaccard, 9)))
    assert inc == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=60),
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=60),
)
def test_bloom_never_false_negative(spark, inserted, probed):
    """Core Bloom safety: every inserted key passes the membership test,
    whatever the key distribution (FPs allowed, FNs never)."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.bloom import bloom_build, bloom_might_contain

    small = spark.createDataFrame([(k,) for k in inserted], "k long")
    words = bloom_build(small, F.col("k"), num_bits=2048, k=4)
    hits = {
        r.k
        for r in small.where(
            bloom_might_contain(F.col("k"), words, 2048, 4)
        ).collect()
    }
    assert hits == set(inserted)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_zvalue_equals_bit_interleave(spark, pairs):
    """The portable modular-arithmetic z equals true bit interleaving."""
    from cyber_etl_spark.operators.layout import z_value

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "x long, y long")
    for r in df.select("x", "y", z_value("x", "y").alias("z")).collect():
        assert r.z == ref(r.x, r.y)


def _ref_bpe(texts: list[str], num_merges: int):
    """Pure-Python Sennrich learn_bpe reference: overlap-inclusive pair
    counts, greedy left-to-right merge, (freq desc, pair asc) tie-break."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    state = {tuple(w): c for w, c in words.items()}
    merges = []
    for step in range(1, num_merges + 1):
        pairs = Counter()
        for syms, c in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        fmax = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == fmax)
        merges.append((step, best[0], best[1], best[0] + best[1], fmax))
        new_state: dict[tuple, int] = {}
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + c
        state = new_state
    return merges


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=8).map(" ".join), min_size=1, max_size=6))
def test_bpe_matches_python_reference(spark, texts):
    """Distributed BPE == the classic driver-side algorithm on generated
    corpora (pins greedy overlap order, boundary exactness, tie-breaks
    beyond the fixed oracle corpus)."""
    from cyber_etl_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = [tuple(r) for r in bpe_merges(df, num_merges=3).orderBy("step").collect()]
    assert got == _ref_bpe(texts, 3), texts


def _ref_byte_bpe(texts: list[str], num_merges: int):
    """Pure-Python byte-level reference: the BYTE_PRETOK_RE regex split,
    UTF-8 bytes as uppercase hex symbols, then the same greedy merge."""
    import re
    from collections import Counter

    from cyber_etl_spark.operators.bpe import BYTE_PRETOK_RE

    words = Counter()
    for t in texts:
        for tok in re.findall(BYTE_PRETOK_RE, t):
            words[tok] += 1
    state = {
        tuple(f"{b:02X}" for b in w.encode("utf-8")): c for w, c in words.items()
    }
    merges = []
    for step in range(1, num_merges + 1):
        pairs = Counter()
        for syms, c in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        fmax = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == fmax)
        merges.append((step, best[0], best[1], best[0] + best[1], fmax))
        new_state: dict[tuple, int] = {}
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + c
        state = new_state
    return merges


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab1.é ", min_size=1, max_size=16),
        min_size=1,
        max_size=6,
    )
)
def test_byte_bpe_matches_python_reference(spark, texts):
    """Byte-level BPE == the driver-side reference on generated corpora
    mixing letters, digits, punctuation, spaces and a MULTI-BYTE char
    (é → two UTF-8 bytes) — pins the pre-tokenizer regex parity and the
    hex byte alphabet beyond the fixed oracle corpus."""
    from cyber_etl_spark.operators.bpe import byte_bpe_merges

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = [tuple(r) for r in byte_bpe_merges(df, num_merges=3).orderBy("step").collect()]
    assert got == _ref_byte_bpe(texts, 3), texts


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]),
        min_size=1,
        max_size=120,
    ),
    st.integers(min_value=2, max_value=12),
)
def test_frequent_items_matches_exact_reference(spark, items, phi_denom):
    """Two-pass Misra-Gries == a plain Python Counter filtered by the
    exact integer threshold, for arbitrary item streams and phi."""
    from collections import Counter

    from cyber_etl_spark.operators.heavyhitters import frequent_items

    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(7)
    got = {(r.item, r.cnt) for r in frequent_items(df, "item", phi_denom).collect()}
    n = len(items)
    want = {
        (i, c) for i, c in Counter(items).items() if c * phi_denom > n
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.text(alphabet="abcd", min_size=1, max_size=5), min_size=1, max_size=30)
)
def test_symspell_lev1_matches_bruteforce(spark, names):
    """Position-qualified SymSpell == brute-force Levenshtein <= 1 over
    arbitrary short strings (insert/delete/substitute all reachable
    within the alphabet; repeated chars exercise duplicate-key paths)."""
    from cyber_etl_spark.operators.similarity import symspell_lev1_pairs

    def lev(a: str, b: str) -> int:
        if abs(len(a) - len(b)) > 1:
            return 2
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    uniq = sorted(set(names))
    df = spark.createDataFrame([(n,) for n in names], "c_name string")
    got = {(r.name_a, r.name_b) for r in symspell_lev1_pairs(df, "c_name").collect()}
    want = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if lev(a, b) <= 1
    }
    assert got == want


@settings(max_examples=4, deadline=None)
@given(TEXTS)
def test_prefix_filter_matches_bruteforce_token_sets(spark, texts):
    """PPJoin prefix filtering (raw token sets, t=0.5) == brute-force
    set Jaccard over generated corpora — the losslessness property the
    q177 hash gate checks on the fixed corpus, here on arbitrary ones
    (including all-identical and fully-disjoint degenerate shapes)."""
    from cyber_etl_spark.operators.similarity import prefix_filter_jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(
            df, threshold=0.5, shingle_n=None
        ).collect()
    }
    sets = {i: set(t.split()) - {""} for i, t in enumerate(texts)}
    want = set()
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                jac = round(inter / (len(sets[i]) + len(sets[j]) - inter), 6)
                if jac >= 0.5:
                    want.add((i, j, jac))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),  # value in 1e-2 grid
            st.booleans(),  # side assignment
        ),
        min_size=1,
        max_size=60,
    )
)
def test_statcat_merge_identities_on_random_splits(spark, rows):
    """merge(build(A), build(B)) == build(A ∪ B) for the ew (additive)
    and minh (slot-MIN) catalog kinds on ARBITRARY generated multisets
    and ARBITRARY splits — the q387/q390 oracles pin one md5 split on
    one dataset; this pins the algebra itself."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.statcat import (
        equiwidth_counts,
        merge_catalogs,
        minhash_rows,
    )

    data = [(v / 100.0, side) for v, side in rows]
    full = spark.createDataFrame(data, "x double, side boolean")
    a, b = full.where("side"), full.where("NOT side")

    def canon(df):
        return sorted(
            (r.tbl, r.col, r.kind, r.r, r.b, int(r.v)) for r in df.collect()
        )

    ew_full = canon(equiwidth_counts(full, "t", "x", 3_000_000))
    ew_merged = canon(
        merge_catalogs(
            equiwidth_counts(a, "t", "x", 3_000_000),
            equiwidth_counts(b, "t", "x", 3_000_000),
        )
    )
    assert ew_merged == ew_full

    mh_full = canon(minhash_rows(full, "t", "x", slots=4))
    mh_merged = canon(
        merge_catalogs(
            minhash_rows(a, "t", "x", slots=4),
            minhash_rows(b, "t", "x", slots=4),
        )
    )
    assert mh_merged == mh_full
