"""Hive-partitioned layout: directory pruning + dynamic overwrite.

Partition pruning is the first scale lever a 100 TB table relies on —
these tests pin that the layout writer produces it and that incremental
backfills don't clobber sibling partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_directories(spark, tmp_path):
    from cyber_etl_spark.sources.sinks import write_parquet

    df = spark.range(1000).select(
        F.col("id"),
        F.concat(F.lit("type_"), (F.col("id") % 4).cast("string")).alias("kind"),
    )
    path = str(tmp_path / "by_kind")
    write_parquet(df, path, partition_by=["kind"], compact=True)
    # one directory per kind
    dirs = sorted(d for d in os.listdir(path) if d.startswith("kind="))
    assert dirs == [f"kind=type_{i}" for i in range(4)]

    scan = spark.read.parquet(path).where(F.col("kind") == "type_2")
    plan = _plan(scan)
    # the predicate must land in PartitionFilters (directory pruning),
    # not as a post-scan row filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "type_2" in pf, plan[:1500]
    # and only type_2's files are touched
    files = scan.select(F.input_file_name().alias("f")).distinct().collect()
    assert files and all("kind=type_2" in r.f for r in files)
    assert scan.count() == 250


def test_compact_avoids_small_file_explosion(spark, tmp_path):
    from cyber_etl_spark.sources.sinks import write_parquet

    df = spark.range(0, 1000, 1, 8).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("kind")
    )

    def n_files(p):
        return sum(
            1
            for d in os.listdir(p)
            if d.startswith("kind=")
            for f in os.listdir(os.path.join(p, d))
            if f.endswith(".parquet")
        )

    sprawl = str(tmp_path / "sprawl")
    write_parquet(df, sprawl, partition_by=["kind"], compact=False)
    tight = str(tmp_path / "tight")
    write_parquet(df, tight, partition_by=["kind"], compact=True)
    # without compaction every input task leaks a sliver into every
    # directory (up to 8 x 4 files); with it, ~one file per directory
    assert n_files(sprawl) > n_files(tight)
    assert n_files(tight) <= 8  # at most one writing reducer per kind


def test_dynamic_overwrite_keeps_sibling_partitions(spark, tmp_path):
    from cyber_etl_spark.sources.sinks import write_parquet

    path = str(tmp_path / "inc")
    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, kind string"
    )
    write_parquet(base, path, partition_by=["kind"], compact=True)
    patch = spark.createDataFrame([(9, "b")], "id long, kind string")
    write_parquet(
        patch, path, partition_by=["kind"], compact=True, dynamic_overwrite=True
    )
    got = {(r.id, r.kind) for r in spark.read.parquet(path).collect()}
    # partition b replaced, partition a untouched
    assert got == {(1, "a"), (2, "a"), (9, "b")}
