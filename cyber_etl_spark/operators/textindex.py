"""Persisted full-text (BM25) index — the text-retrieval twin of the
IVF index lifecycle (operators/ann.save_ivf_index): build the inverted
structures once, persist them sorted for predicate-pruned reads, answer
keyword queries from the INDEX (touching only the query terms' posting
rows), never by re-scanning the corpus.

Index layout (three parquet tables under one root):

- ``postings/`` — (token, doc_id, tf), range-partitioned and sorted by
  token: a query's ``token IN (...)`` filter reaches the parquet scan
  (PushedFilters) and row-group min/max statistics skip everything but
  the query terms' runs — the on-disk analogue of posting-list seeks.
- ``doclens/`` — (doc_id, dl).
- ``stats/``  — one row: (n_docs, avgdl), avgdl by the exact
  decimal-sum/count discipline.

Scoring is Okapi BM25 (k1=1.2, b=0.75), the q67 formula — q67 computes
it from a corpus scan, this module from the index, and the q198 hash
gate proves the two paths agree.

Reference ancestry: the reference greps alert text imperatively
(alerts/cpe_product.ipynb keyword passes); an index is what that
becomes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def build_text_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, doclens, stats) from a document table — one tokenize
    pass feeds both structures; stats is a 1-row broadcastable frame."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(text_col, " "), lambda x: x != "")).alias("token"),
    ).localCheckpoint(eager=True)  # feeds postings, doclens AND stats:
    # without the pin the tokenize+explode re-runs per consumer (the
    # multi-consumer rule, CLAUDE.md / q192)
    postings = toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    doclens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    return postings, doclens, stats


def save_text_index(
    postings: DataFrame, doclens: DataFrame, stats: DataFrame, path: str
) -> None:
    """Persist the three structures; postings range-partitioned + sorted
    by token so term lookups prune at the row-group level."""
    (
        # pin before range-partitioning: repartitionByRange SAMPLES its
        # child for the range boundaries, so an unpinned postings
        # aggregation would execute twice (the q160 pin_input lesson)
        postings.localCheckpoint(eager=True)
        .repartitionByRange("token")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def load_text_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/doclens"),
        spark.read.parquet(f"{path}/stats"),
    )


def bm25_topk(
    postings: DataFrame,
    doclens: DataFrame,
    stats: DataFrame,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents by BM25 over ``terms``, computed from the
    index: the postings scan is filtered to the query terms (pushed to
    parquet when the index is loaded from disk), df comes from the
    pruned postings themselves, and only matching documents are ever
    scored.  Ranking sorts the 6-dp-ROUNDED score with a doc_id
    tie-break (a last-ulp ln() divergence between engines cannot flip
    an order the hash gate sees)."""
    # pin: hits feeds both the df/idf aggregate and the scoring join
    hits = postings.where(F.col("token").isin(list(terms))).localCheckpoint(
        eager=True
    )
    df_t = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
            "idf"
        ),
        "avgdl",
    )
    scored = (
        hits.join(F.broadcast(idf), "token")
        .join(doclens, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * F.col("tf")
                    * (K1 + 1)
                    / (
                        F.col("tf")
                        + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("bm25")
        )
    )
    # global top-k as TakeOrdered (never a global rank window — the
    # audited single-task class): per-partition heaps, k rows merged
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)
