"""SparkSession factory.

One engine entry point (SURVEY.md §7.1 phase 0): every test, bench run and
driver invocation goes through :func:`get_spark` so the scale-relevant knobs
live in exactly one place.

Design notes for the 100 TB target (tested on local[N]):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic broadcast conversion replace hand-tuned partition counts when the
  real cluster sees skewed keys.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster this is overridden (or simply left to AQE's coalescing with a
  high initial value).
- Arrow enabled so every pandas UDF / ``applyInPandas`` crosses the
  JVM↔Python boundary in columnar batches, never row-at-a-time pickling.
- Session timezone pinned to UTC so timestamp semantics are reproducible
  and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cores() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(app_name: str = "cyber-etl-spark", **extra_conf: str) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``extra_conf`` lets tests/bench override any config key
    (dots allowed via keyword splat of a dict).
    """
    cores = _local_cores()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cores}]"))
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def session_token(spark: SparkSession) -> str:
    """Session-lifetime cache key.

    Memoization caches (edge builds, shingle tables, backbones) must not
    key on ``id(spark)``: a garbage-collected session's address can be
    reused by a new session object whose executors no longer hold the old
    localCheckpoint blocks — a stale-alias hazard.  The application id is
    unique per SparkContext lifetime."""
    return spark.sparkContext.applicationId
