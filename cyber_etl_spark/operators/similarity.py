"""Set-similarity join — SURVEY.md J7/M4 (alerts/cpe_product.ipynb:458-551).

The reference matches NER PRODUCT entities to CPE strings with a Python
double loop: whitespace-tokenize, prune candidates by token-count band
[|A|·t, |A|/t], keep pairs with Jaccard ≥ t.  That loop is O(n·m) on the
driver and caps out at thousands of rows.

Here the same semantics run as an inverted-index equi-join: only pairs
sharing ≥1 token are ever materialized, the size-band prune is a join
predicate, and the Jaccard is computed from distributed counts — scales to
arbitrary corpus sizes, shuffling on the token key (AQE splits hot
tokens).  An LSH variant (minhash bands, see operators.dedup) bounds the
candidate set further when even token-sharing pairs are too many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _token_table(df: DataFrame, id_col: str, text_col: str, side: str) -> DataFrame:
    """One row per (id, distinct token), carrying the RAW token count
    (duplicates included): the reference's size-band prune measures the
    token *list* while its Jaccard measures the token *set*
    (cpe_product.ipynb cell 12 tokenizes with return_set=False, cell 13
    prunes on those list lengths, the Jaccard measure de-dupes) — e.g.
    'linux linux kernel' has band length 3 but set size 2, which is
    exactly what keeps ('linux_linux_kernel', 'linux') out of the 770
    golden pairs."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.size(toks).alias(f"n{side}_raw"),
        F.explode(F.array_distinct(toks)).alias("token"),
    )


def token_jaccard_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    threshold: float = 0.5,
) -> DataFrame:
    """(left_id, right_id, jaccard) pairs with token-set Jaccard ≥ t.

    Semantics match the reference's whitespace-token Jaccard at t=0.5
    (producing data/cpe_product_edge.feather's 770 golden pairs on its own
    inputs, verified in tests/test_golden_fixtures.py): the size-band
    prune [n·t, n/t] uses raw token-list lengths, the Jaccard uses token
    sets — both applied as join-side predicates so out-of-band pairs
    never materialize.
    """
    lt = _token_table(left, left_id, left_text, "l")
    rt = _token_table(right, right_id, right_text, "r")
    lsize = lt.groupBy("l_id").agg(
        F.count(F.lit(1)).alias("nl"), F.first("nl_raw").alias("nl_raw")
    )
    rsize = rt.groupBy("r_id").agg(
        F.count(F.lit(1)).alias("nr"), F.first("nr_raw").alias("nr_raw")
    )
    common = (
        lt.drop("nl_raw")
        .join(rt.drop("nr_raw"), "token")
        .groupBy("l_id", "r_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(lsize, "l_id")
        .join(rsize, "r_id")
        # size-band prune (reference cell 13): raw |r| ∈ [raw |l|·t, raw |l|/t]
        .where(
            (F.col("nr_raw") >= F.col("nl_raw") * threshold)
            & (F.col("nr_raw") <= F.col("nl_raw") / threshold)
        )
        .select(
            "l_id",
            "r_id",
            (F.col("n_common") / (F.col("nl") + F.col("nr") - F.col("n_common"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def char_ngrams(col: F.Column, n: int = 3) -> F.Column:
    """Boundary-marked character n-gram set of a string: ``'us'`` →
    ``['^us$']`` (short strings fall back to the whole marked string),
    ``'centre'`` → ``['^ce','cen','ent','ntr','tre','re$']``.  Spaces are
    folded to ``_`` so cross-word grams stay informative."""
    marked = F.concat(F.lit("^"), F.regexp_replace(col, " ", "_"), F.lit("$"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(marked) - (n - 1), F.lit(1))),
        lambda i: F.substring(marked, i, n),
    )
    return F.array_distinct(grams)


def char_ngram_jaccard_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    threshold: float = 0.6,
    n: int = 3,
) -> DataFrame:
    """(l_id, r_id, jaccard) pairs with character-n-gram Jaccard ≥ t.

    The fuzzy companion to :func:`token_jaccard_join` for MORPHOLOGICAL
    variants whole-token Jaccard cannot see ('kimsuky'/'kimsukys',
    'centre'/'centres') — the deterministic stand-in for the learned
    string distances of the reference's `dedupe` ER
    (data_integration.ipynb cells 38-49).  Same inverted-index plan:
    explode grams, equi-join on the gram, count, Jaccard from distinct
    gram-set sizes.  Hot grams (common trigrams) are the skew source;
    AQE's skew join splits them, and at corpus scale callers should
    pre-block (e.g. per NER type) the way :func:`resolve_entities` does.
    """
    lt = left.select(
        F.col(left_id).alias("l_id"), F.explode(char_ngrams(F.col(left_text), n)).alias("gram")
    )
    rt = right.select(
        F.col(right_id).alias("r_id"), F.explode(char_ngrams(F.col(right_text), n)).alias("gram")
    )
    lsize = lt.groupBy("l_id").agg(F.count(F.lit(1)).alias("nl"))
    rsize = rt.groupBy("r_id").agg(F.count(F.lit(1)).alias("nr"))
    common = lt.join(rt, "gram").groupBy("l_id", "r_id").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return (
        common.join(lsize, "l_id")
        .join(rsize, "r_id")
        .select(
            "l_id",
            "r_id",
            (F.col("n_common") / (F.col("nl") + F.col("nr") - F.col("n_common"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int | None = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """All-pairs token-Jaccard >= ``threshold`` via PREFIX FILTERING —
    the ppjoin-family alternative to MinHash banding, and EXACT (no
    probabilistic misses): order each document's distinct tokens by
    global rarity (freq asc, token asc) and index only the first
    ``|x| - ceil(t*|x|) + 1`` tokens; two sets with Jaccard >= t MUST
    share a prefix token under any global order, so the candidate join
    touches only rare-token posting lists instead of every token.
    Verification is candidate-first (the LSH-verify discipline: every
    join that touches a posting list is keyed by a candidate id).

    Scale: posting-list join cost collapses from O(sum |posting|^2) on
    every token to the rare prefix tokens only — boilerplate tokens
    (the worst lists) are almost never in a prefix; per-doc sorting is
    an in-row array_sort, no global rank window.

    ``shingle_n``: build the sets from word n-gram shingles (the
    repo-wide dedup set definition — q22/q49 family) instead of raw
    token sets.  Raw token sets (``None``) are far less discriminative:
    template corpora collapse into giant same-vocabulary cliques whose
    PAIR OUTPUT itself is quadratic — no physical plan fixes an output
    explosion, so pick the set granularity to match the dedup intent.
    ``shingles_df``: a prebuilt (id, shingle) set table (the memoized
    repo-wide artifact) — passed by the registry so the shingling cost
    is shared with the LSH/Jaccard family instead of re-paid.

    Candidate pruning is full PPJoin (Xiao et al., WWW'08), with every
    bound computed in EXACT integer arithmetic (t as the rational
    tn/1e6 — the q172 lesson: a float ceil() one ulp high silently
    drops a legitimate pair, and losslessness is this operator's whole
    claim):

    - length filter: t·|x| <= |y| <= |x|/t, as 1e6·|y| >= tn·|x| both
      ways — out-of-band sizes can't reach Jaccard t;
    - positional filter: a shared prefix token at (0-based) positions
      (i, j) caps the overlap at 1 + min(|x|-i-1, |y|-j-1), which must
      reach alpha = ceil(t/(1+t)·(|x|+|y|)), the minimum overlap any
      Jaccard >= t pair needs.

    Measured at sf0.1 these two filters cut candidates 409k -> 125k on
    the template-heavy documents corpus.  Verification then intersects
    per-doc xxhash64 shingle-hash SETS per candidate pair (one
    array_intersect per pair, JVM hash-set intersect) instead of
    re-exploding the full posting table — the explode-join verify was
    |cand| x avg-set-size rows (25M at sf0.1); the hashed-set verify
    measured 2x faster warm (1.0s vs 2.0s) and 5x over the unfiltered
    original.  The 64-bit hash is internal only (never compared across
    engines); collisions are negligible below ~1e9 distinct shingles —
    for strict exactness at larger vocabularies swap ``_hexpr`` to the
    md5-128 form (measured 7x slower here).

    Grid budget: ceil via (tn*sz + m - 1) div m with tn <= 1e6 and sz = per-doc token count - the product fits int64 for any real document."""
    from ..functions.text import shingles, tokens

    t = float(threshold)
    tn = int(round(t * 1_000_000))
    m = 1_000_000
    if shingles_df is not None:
        tok = shingles_df.select("id", F.col("shingle").alias("token"))
    else:
        if shingle_n is None:
            sets = F.array_distinct(
                F.filter(F.split(text_col, " "), lambda x: x != "")
            )
        else:
            sets = F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))
        tok = docs.select(
            F.col(id_col).alias("id"), F.explode(sets).alias("token")
        )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    tokf = tok.join(freq, "token")
    per_doc = tokf.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("freq", "token"))).alias("ts"),
        F.count(F.lit(1)).alias("sz"),
    )
    # exact integer ceil(t*sz) = (tn*sz + m - 1) div m
    ceil_t_sz = ((F.lit(tn) * F.col("sz") + F.lit(m - 1)) / F.lit(m)).cast("long")
    plen = (F.col("sz") - ceil_t_sz + 1).cast("int")
    prefix = per_doc.select(
        "id",
        "sz",
        F.posexplode(
            F.transform(
                F.slice("ts", F.lit(1), plen), lambda s: s.getField("token")
            )
        ).alias("pos", "token"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    szsum = F.col("a.sz") + F.col("b.sz")
    # alpha = ceil(tn*(|x|+|y|) / (tn+m)), exact integer ceil
    alpha = ((F.lit(tn) * szsum + F.lit(tn + m - 1)) / F.lit(tn + m)).cast("long")
    ubound = 1 + F.least(
        F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1
    )
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.lit(m) * F.col("b.sz") >= F.lit(tn) * F.col("a.sz"))
            & (F.lit(m) * F.col("a.sz") >= F.lit(tn) * F.col("b.sz"))
            & (ubound >= alpha),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # candidate-first exact verify: per-doc hashed shingle sets, one
    # hash-set intersect per surviving candidate pair
    _hexpr = F.xxhash64("token")
    hset = tok.groupBy("id").agg(
        F.collect_set(_hexpr).alias("hs"), F.count(F.lit(1)).alias("sz")
    )
    return (
        cand.join(
            hset.select(
                F.col("id").alias("id_a"),
                F.col("hs").alias("hs_a"),
                F.col("sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            hset.select(
                F.col("id").alias("id_b"),
                F.col("hs").alias("hs_b"),
                F.col("sz").alias("sz_b"),
            ),
            "id_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("hs_a", "hs_b")))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= t)
    )


def symspell_lev1_pairs(df: DataFrame, col: str) -> DataFrame:
    """All DISTINCT-value pairs of ``df[col]`` within edit distance 1,
    via SymSpell deletion-neighborhood blocking (Garbe's symmetric
    delete algorithm) — and, for the k=1 case, a POSITION-QUALIFIED
    match test that eliminates the per-pair edit-distance DP entirely:

    each value emits (value, key, pos) rows where key is the value
    itself (pos 0) or its one-character deletion at position pos >= 1.
    For two distinct values sharing a key:

    - same deletion position (pos_a == pos_b >= 1): both are
      prefix+c+suffix with identical prefix/suffix -> they differ in at
      most that one character -> lev <= 1, ALWAYS;
    - identity key on one side (pos == 0): the other side deleted one
      character to reach it -> lev == 1, ALWAYS;
    - different deletion positions: lev may be 2 (e.g. 'abc'/'bca'
      share 'bc') — but every TRUE lev<=1 pair is already captured by
      one of the first two classes (a substitution at i matches at
      (i, i); an insert/delete matches the shorter's identity key), so
      dropping this class loses nothing.

    The predicate is therefore EXACT, the candidate join needs no
    verification DP (measured 3.1s of bounded levenshtein on 977k
    candidates at sf0.1 -> 0), and the brute-force oracle remains the
    losslessness gate.  Output: (name_a, name_b) with name_a < name_b.
    """
    v = df.where(F.col(col).isNotNull()).select(F.col(col).alias("_val")).distinct()
    # explode positions FIRST, then build each deletion key with plain
    # codegen'd substr/concat: a higher-order transform evaluates its
    # lambda interpreted per element (the shingles lesson, ~2x here),
    # and the struct-array + array_union allocation is pure overhead.
    # pos 0 = identity key; array_union never dropped anything (the
    # identity (k, 0) can't equal a deletion struct — lengths differ).
    keyed = v.select(
        "_val", F.explode(F.sequence(F.lit(0), F.length("_val"))).alias("pos")
    ).select(
        "_val",
        F.when(F.col("pos") == 0, F.col("_val"))
        .otherwise(
            F.concat(
                F.expr("substr(_val, 1, pos - 1)"),
                F.expr("substr(_val, pos + 1, length(_val))"),
            )
        )
        .alias("k"),
        "pos",
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a._val") < F.col("b._val"))
            & (
                (F.col("a.pos") == F.col("b.pos"))
                | (F.col("a.pos") == 0)
                | (F.col("b.pos") == 0)
            ),
        )
        .select(F.col("a._val").alias("name_a"), F.col("b._val").alias("name_b"))
        .distinct()
    )
