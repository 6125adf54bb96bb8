"""Structured Streaming correctness: stream results must equal the batch
twin on the same input — the streaming analogue of the DuckDB oracle.
"""

from __future__ import annotations

import shutil

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def events_dir(sf_smoke, tmp_path_factory) -> str:
    """Streaming file sources read directories; stage the events file."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_smoke}/events.parquet", d / "part-0.parquet")
    return str(d)


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(list(sorted(pdf.columns))).reset_index(drop=True)[
        sorted(pdf.columns)
    ]


def test_hourly_rollup_stream_matches_batch(spark, sf_smoke, events_dir):
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.streaming import (
        hourly_rollup_stream,
        read_event_stream,
        run_stream_to_memory,
    )

    stream = read_event_stream(spark, events_dir)
    run_stream_to_memory(hourly_rollup_stream(stream), "hourly_mem", mode="complete")
    got = _sorted(spark.sql("SELECT * FROM hourly_mem").toPandas())
    want = _sorted(QUERIES["q14_hourly_rollup"].builder(spark, sf_smoke).toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_sessionize_stream_matches_batch(spark, sf_smoke, events_dir):
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        sessionize_stream,
    )

    stream = read_event_stream(spark, events_dir)
    run_stream_to_memory(sessionize_stream(stream), "sess_mem", mode="complete")
    got = _sorted(spark.sql("SELECT * FROM sess_mem").toPandas())
    want = _sorted(QUERIES["q32_session_stats"].builder(spark, sf_smoke).toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_stream_dedupe(spark, sf_smoke, events_dir):
    from cyber_etl_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        stream_dedupe,
    )

    stream = read_event_stream(spark, events_dir)
    run_stream_to_memory(stream_dedupe(stream), "dedupe_mem", mode="append")
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedupe_mem").collect()[0]
    assert got.n == got.d > 0
