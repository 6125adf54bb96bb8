"""Behavior tests for distributed BPE merge training (operators/bpe.py).

Pins the algorithmic contract the q131 oracle also encodes — greedy
left-to-right merge order on overlapping runs, overlap-inclusive pair
counting, deterministic tie-breaks — on adversarial micro-corpora the
synthetic tables don't contain."""

from pyspark.sql import functions as F

from cyber_etl_spark.operators.bpe import bpe_merges


def _rows(df):
    return [tuple(r) for r in df.orderBy("step").collect()]


def test_bpe_learns_frequent_pair_first(spark):
    # "ab" appears 3x as a character pair (2 in 'abab' + 1 in 'ab'... word
    # counts: 'abab' x2 -> pairs per word: (a,b),(b,a),(a,b)) weighted.
    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], ["doc_id", "text"]
    )
    out = _rows(bpe_merges(docs, num_merges=2))
    # 'abab' count 3: pairs (a,b)x2,(b,a)x1 per occurrence -> ab=6, ba=3
    # 'cd' count 3: (c,d)=3.  First merge: ab (freq 6).
    assert out[0] == (1, "a", "b", "ab", 6)
    # after merging: 'abab' -> [ab, ab] so (ab,ab)=3; cd=3; ba gone.
    # tie 3 vs 3 breaks lexicographically: ('ab','ab') < ('c','d').
    assert out[1] == (1 + 1, "ab", "ab", "abab", 3)


def test_bpe_greedy_overlap_run(spark):
    # 'aaa': overlapping pair (a,a) counts twice, but a greedy
    # left-to-right merge rewrites it to [aa, a], never [a, aa].
    docs = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
    out = _rows(bpe_merges(docs, num_merges=2))
    assert out[0] == (1, "a", "a", "aa", 2)
    # round 2 must see [aa, a]: the only remaining pair is (aa, a).
    assert out[1] == (2, "aa", "a", "aaa", 1)


def test_bpe_symbol_boundaries_not_substrings(spark):
    # After 'ca' exists as one symbol, pair (a, b) must not match the
    # 'a' inside it: words 'cab' and 'ab' share the substring "ab" but
    # only 'ab' the word contributes once 'ca' has merged.
    docs = spark.createDataFrame(
        [(1, "cab cab cab ab")], ["doc_id", "text"]
    )
    out = _rows(bpe_merges(docs, num_merges=2))
    # round 1: (c,a)=3, (a,b)=4 -> merge (a,b) freq 4.
    assert out[0] == (1, "a", "b", "ab", 4)
    # round 2: 'cab' -> [c, ab] x3, 'ab' -> [ab]. Only pair (c, ab)=3.
    assert out[1] == (2, "c", "ab", "cab", 3)


def test_bpe_single_char_words_and_validation(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    # no adjacent pairs exist in 1-char words -> zero merge rows
    assert bpe_merges(docs, num_merges=1).count() == 0
    with pytest.raises(ValueError):
        bpe_merges(docs, num_merges=0)


def test_bpe_compression_curve_drops_by_merge_freq(spark):
    """Each curve step drops total symbols by the non-overlapping
    occurrence count of that round's merge (= freq only when no
    occurrences overlap)."""
    from cyber_etl_spark.operators.bpe import bpe_compression_curve

    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], ["doc_id", "text"]
    )
    curve = {r.step: r.total_symbols for r in bpe_compression_curve(docs, num_merges=2).collect()}
    # chars: 'abab' cnt 3 -> 12, 'cd' cnt 3 -> 6: total 18
    assert curve[0] == 18
    # merge (a,b) freq 6, non-overlapping -> 18 - 6 = 12
    assert curve[1] == 12
    # merge (ab,ab) freq 3 but 'abab' has ONE non-overlapping occurrence
    # per word (cnt 3) -> 12 - 3 = 9
    assert curve[2] == 9


def test_bpe_pair_exhaustion_emits_fewer_rules(spark):
    """A corpus whose pairs run out before num_merges emits only the
    realizable rules (learn_bpe stop semantics), not an error."""
    docs = spark.createDataFrame([(1, "ab ab b")], ["doc_id", "text"])
    out = _rows(bpe_merges(docs, num_merges=3))
    # round 1 merges (a,b); afterwards every word is one symbol
    assert out == [(1, "a", "b", "ab", 2)]


def test_bpe_sep_bearing_tokens_dropped_not_corrupted(spark):
    """A corpus token containing the U+00A6 symbol delimiter is dropped
    from the vocabulary statistics (ADVICE r5): it cannot be represented
    in the ¦-wrapped encoding, and silently admitting it would corrupt
    the symbol stream identically in both engines while diverging from
    true BPE semantics.  The remaining tokens must learn exactly what
    they would have without the poisoned token present."""
    poisoned = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd"), (3, "x¦y ab¦")],
        ["doc_id", "text"],
    )
    clean = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], ["doc_id", "text"]
    )
    got = _rows(bpe_merges(poisoned, num_merges=2))
    want = _rows(bpe_merges(clean, num_merges=2))
    assert got == want
