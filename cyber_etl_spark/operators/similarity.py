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
