"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`cyber_etl_spark.plans` — the named-query registry
where every SURVEY.md §2 operator is exposed as a (DataFrame builder,
DuckDB oracle SQL) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cyber_etl_spark.plans import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: scan → filter → hash-agg pricing summary."""
    return QUERIES["q01_pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(QUERIES.items()) if q.oracle is not None}
