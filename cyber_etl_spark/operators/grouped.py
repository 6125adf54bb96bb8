"""Grouped-map operators via applyInPandas.

The grouped-map form complements the engine's other Python surfaces
(scalar pandas UDFs for NER, mapInPandas for media, state API for
streams): each group arrives as ONE pandas DataFrame, the natural shape
for per-key model fitting / per-entity feature computation.

Scale contract: a group must fit in one executor's memory — use for
bounded groups (per-user, per-segment), never for whole-table keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

TREND_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("slope", DoubleType()),
        StructField("intercept", DoubleType()),
    ]
)


def fit_user_trends(events: DataFrame) -> DataFrame:
    """Per-user OLS of event value against time — (user_id, n, slope,
    intercept).  A stand-in for any per-entity model-fit stage in a
    training-data pipeline; the regression itself is numpy inside the
    Arrow batch."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        user = pdf["user_id"].iloc[0]
        pdf = pdf.sort_values("ts")
        # hours since the user's first event — deterministic, unit-scaled
        x = (pdf["ts"] - pdf["ts"].min()).dt.total_seconds().to_numpy() / 3600.0
        y = pdf["value"].to_numpy(dtype=np.float64)
        if len(pdf) >= 2 and float(np.ptp(x)) > 0:
            slope, intercept = np.polyfit(x, y, 1)
        else:
            slope, intercept = 0.0, float(y.mean())
        return pd.DataFrame(
            {
                "user_id": [user],
                "n_events": [len(pdf)],
                "slope": [float(slope)],
                "intercept": [float(intercept)],
            }
        )

    return (
        events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(fit, TREND_SCHEMA)
    )


PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("seq_id", LongType()),
        StructField("n_chunks", LongType()),
        StructField("total_tokens", LongType()),
    ]
)


def pack_sequences(chunks: DataFrame, max_tokens: int = 512) -> DataFrame:
    """Greedy sequence packing: fill fixed-size training sequences with
    consecutive chunks — the pack step after chunking (q56) in an LLM
    data pipeline.

    Packing is inherently sequential, so it is done *per document*
    (chunks in chunk_id order), which keeps the operator embarrassingly
    parallel and deterministic; cross-document packing would trade
    determinism for fill rate.  Input: (doc_id, chunk_id, chunk_tokens).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_id")
        doc = pdf["doc_id"].iloc[0]
        seqs: list[tuple[int, int]] = []  # (n_chunks, total_tokens)
        cur_n, cur_t = 0, 0
        for t in pdf["chunk_tokens"]:
            t = int(t)
            if cur_n > 0 and cur_t + t > max_tokens:
                seqs.append((cur_n, cur_t))
                cur_n, cur_t = 0, 0
            cur_n += 1
            cur_t += t
        if cur_n:
            seqs.append((cur_n, cur_t))
        return pd.DataFrame(
            {
                "doc_id": [doc] * len(seqs),
                "seq_id": range(len(seqs)),
                "n_chunks": [n for n, _ in seqs],
                "total_tokens": [t for _, t in seqs],
            }
        )

    return (
        chunks.select("doc_id", "chunk_id", "chunk_tokens")
        .groupBy("doc_id")
        .applyInPandas(pack, PACK_SCHEMA)
    )
