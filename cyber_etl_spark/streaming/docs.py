"""Streaming document ingest — the per-crawl-batch dedup loop.

The batch operator (operators/dedup.minhash_lsh_pairs_incremental) dedupes
one new batch against the historical corpus; this module is its
Structured-Streaming twin: a *stream* of incoming documents is deduped
micro-batch by micro-batch against a static corpus whose shingle and
band-signature tables are built ONCE and pinned (localCheckpoint) — the
in-session analogue of the persisted signature table a production
deployment maintains between ingests.

``foreachBatch`` is the right harness here (vs a stream-static join
inside the streaming plan): the exact-verification step aggregates per
candidate pair, and foreachBatch lets each micro-batch run the full
batch operator — Spark's documented pattern for reusing batch-only logic
(aggregation-after-join) on a stream, with the checkpointed batch id for
idempotent sinks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    band_signatures,
    minhash_lsh_pairs_incremental,
    shingle_sets,
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-stream over a documents directory; schema sniffed from a
    batch read when files exist, else the canonical (doc_id, text)."""
    try:
        schema = spark.read.parquet(path).schema
    except Exception:
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        schema = StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        )
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )


def incremental_dedup_stream(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    sink: Callable[[DataFrame, int], None],
    threshold: float = 0.5,
    num_perm: int = 8,
    bands: int = 4,
):
    """Start an availableNow stream deduping ``new_docs`` (a streaming
    DataFrame of (doc_id, text, ...)) against the static ``corpus_docs``.

    ``sink(pairs_df, batch_id)`` receives each micro-batch's
    (id_new, id_corpus, jaccard) matches.  Returns the started query
    (caller awaits termination).

    Corpus shingles AND signatures are computed once, before the stream
    starts, and pinned — every micro-batch only shingles+signs its own
    (small) batch and runs the one cross-side band join.
    """
    sh_corpus = shingle_sets(corpus_docs)  # shingle_sets pins eagerly
    sig_corpus = band_signatures(sh_corpus, num_perm, bands).localCheckpoint(eager=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pairs = minhash_lsh_pairs_incremental(
            batch_df,
            corpus_docs,
            threshold=threshold,
            num_perm=num_perm,
            bands=bands,
            shingles_corpus=sh_corpus,
            signatures_corpus=sig_corpus,
        )
        sink(pairs, batch_id)

    return (
        new_docs.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
