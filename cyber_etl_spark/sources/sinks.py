"""Sinks — SURVEY.md S11-S14.

The reference writes every node/edge table twice (CSV for Neo4j bulk
load + feather checkpoint; parse_cve_json_data.py:136-142) and pickles
intermediates.  Here: Parquet is the canonical checkpoint format
(pickle→parquet per SURVEY §1.4), CSV remains for interop, and the
"graph sink" is a vertices/edges table pair — there is no external graph
database to load.

Scale: writers keep the upstream partitioning (one file per partition,
written in parallel).  ``single_file=True`` coalesces to one partition
for small-artifact parity with the reference's one-CSV-per-table layout —
never use it on large tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compact: bool = False,
    dynamic_overwrite: bool = False,
) -> None:
    """Parquet write, optionally Hive-partitioned by ``partition_by``.

    Partition directories are the driver-side pruning lever at 100 TB:
    a predicate on a partition column never lists, opens or reads the
    other directories (``PartitionFilters`` in the scan, pinned by
    tests/test_partitioned.py).

    ``compact``: pre-shuffle rows by the partition columns so each
    directory gets one file per reducer that actually holds its key —
    without it every input task writes a sliver into every directory
    (the classic small-files explosion: tasks × partitions files).

    ``dynamic_overwrite``: only partitions present in ``df`` are
    replaced (per-writer ``partitionOverwriteMode=dynamic``, no session
    conf mutation); the default static overwrite drops ALL existing
    partitions first — the footgun for incremental backfills.
    """
    if compact and partition_by:
        df = df.repartition(*[df[c] for c in partition_by])
    w = df.write.mode(mode)
    if dynamic_overwrite:
        w = w.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_parquet_clustered(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    sort_cols: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized parquet write: range-partition rows across files
    on ``range_cols``, sort within each file on ``sort_cols`` (defaults
    to ``range_cols``).

    The 100 TB read-side lever: each output file covers a disjoint key
    range, so parquet footer min/max statistics let a downstream
    predicate on those columns skip whole files (and whole row-groups
    within a file, since rows are sorted).  This is the Spark-native
    equivalent of the clustered/Z-ordered table layouts lakehouse
    formats maintain — without requiring one.

    ``num_files``: target file count (defaults to the session shuffle
    width via ``repartitionByRange``'s default).  Range partitioning
    samples the key distribution, so skewed keys still land in
    balanced files — unlike hash ``partitionBy`` directories, which put
    one hot key in one file.
    """
    by = [df[c] for c in range_cols]
    out = (
        df.repartitionByRange(num_files, *by)
        if num_files is not None
        else df.repartitionByRange(*by)
    )
    out = out.sortWithinPartitions(*(sort_cols or range_cols))
    out.write.mode(mode).parquet(path)


def write_csv(
    df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark, path: str, schema=None) -> DataFrame:
    """S8 — header CSV scan; pass an explicit schema at scale (inference
    costs a full extra pass)."""
    r = spark.read.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (native, zstd via session codec) — the other columnar
    interop format big-data stacks exchange besides parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format of ML data tooling; one
    JSON object per row, written partition-parallel like every sink."""
    df.write.mode(mode).json(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """JSON-lines scan; pass a schema at scale (inference costs a pass)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_graph_tables(
    vertices: DataFrame, edges: DataFrame, base_path: str, fmt: str = "parquet"
) -> None:
    """S14 parity: persist the property graph as a vertices/edges table
    pair (the reference's Neo4j bulk-load CSVs become the graph itself)."""
    for name, df in (("vertices", vertices), ("edges", edges)):
        if fmt == "csv":
            write_csv(df, f"{base_path}/{name}")
        else:
            write_parquet(df, f"{base_path}/{name}")
