"""S10 — glob/multi-file union scan (SURVEY §2.1): the reference unions
per-feed CSV globs; here the native parquet directory/glob reader is the
same operator and this pins it explicitly."""

from __future__ import annotations

import os


def test_multifile_directory_union(spark, tmp_path):
    from cyber_etl_spark.sources import read_table

    sf_dir = str(tmp_path)
    tdir = os.path.join(sf_dir, "events")  # nested-dir layout of read_table
    os.makedirs(tdir)
    a = spark.range(0, 7).selectExpr("id", "id * 2 AS v")
    b = spark.range(100, 105).selectExpr("id", "id * 2 AS v")
    a.coalesce(1).write.parquet(os.path.join(tdir, "part_a"))
    b.coalesce(1).write.parquet(os.path.join(tdir, "part_b"))
    # recursive lookup unions every fragment under the table directory
    got = spark.read.option("recursiveFileLookup", "true").parquet(tdir)
    assert got.count() == 12
    # explicit glob form over the same fragments
    globbed = spark.read.parquet(os.path.join(tdir, "part_*"))
    assert globbed.count() == 12
    assert {r.id for r in globbed.select("id").collect()} == set(range(0, 7)) | set(
        range(100, 105)
    )
    # read_table's nested-dir path reads multi-part tables (partitioned
    # layout: fragments directly in the table dir)
    c = spark.range(200, 203).selectExpr("id", "id * 2 AS v")
    tdir2 = os.path.join(sf_dir, "documents")
    a.coalesce(2).write.mode("overwrite").parquet(tdir2)
    c.coalesce(1).write.mode("append").parquet(tdir2)
    assert read_table(spark, sf_dir, "documents").count() == 10
