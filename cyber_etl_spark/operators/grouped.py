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
