"""Z-order (Morton-curve) data layout — multi-column file pruning.

A linearly sorted table layout prunes scans on its leading column only;
interleaving the bits of two key columns (the Morton / Z-curve) gives a
single sort key whose file ranges are rectangles in (x, y) space, so
min/max pruning works on EITHER column — the lakehouse ``OPTIMIZE
ZORDER BY`` layout (Delta/Iceberg), expressed with plain Spark
primitives: compute z, ``repartitionByRange(z)``, sort-within-partition,
write parquet.

The z-value is spelled in ENGINE-PORTABLE integer arithmetic — no bit
operators, whose syntax differs between Spark SQL and the DuckDB
oracle: bit i of x is recovered as ``(x % 2^(i+1)) - (x % 2^i) =
bit_i(x) · 2^i``, so

    z = Σ_i [ (x % 2^(i+1) − x % 2^i) · 2^i        (bit → position 2i)
            + (y % 2^(i+1) − y % 2^i) · 2^(i+1) ]   (bit → position 2i+1)

pure ``%``/``*``/``+`` on non-negative bigints, identical in any SQL
engine and fully codegen'd in Spark.  16 bits per column → a 32-bit z
key; inputs must be pre-masked to [0, 2^bits) (``pmod`` upstream).

Scale: the z computation is a projection (no shuffle); the layout write
is one range shuffle — exactly what a sorted write costs.  Pruning at
100 TB happens twice: Spark skips parquet row groups via min/max stats,
and a file-per-range layout lets the driver skip whole files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """The interleave formula as a SQL string valid in BOTH Spark SQL
    and DuckDB — the single source shared by builders and oracles."""
    terms = []
    for i in range(bits):
        lo, hi = 1 << i, 1 << (i + 1)
        terms.append(f"(({x_sql}) % {hi} - ({x_sql}) % {lo}) * {1 << i}")
        terms.append(f"(({y_sql}) % {hi} - ({y_sql}) % {lo}) * {1 << (i + 1)}")
    return " + ".join(terms)


def z_value(x_sql: str, y_sql: str, bits: int = 16) -> Column:
    """Morton z-value column from two non-negative integer expressions."""
    return F.expr(z_value_sql(x_sql, y_sql, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    x_sql: str,
    y_sql: str,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of (x, y):
    range-partition by z into ``num_files`` files, sort within each, so
    every file covers one compact z range = one (x, y) rectangle."""
    (
        df.withColumn("_z", z_value(x_sql, y_sql, bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
