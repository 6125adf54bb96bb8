"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the join key.  Writing both tables bucketed by that key
(``bucketBy(N, key).sortBy(key)``) pre-co-locates matching rows: Spark's
planner drops the Exchange on both sides and sort-merge-joins bucket
files directly.  This module wraps the write/read discipline; the test
asserts the Exchange really disappears from the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with matching
    bucket counts neither side shuffles."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
