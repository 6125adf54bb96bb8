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


def hilbert_levels(bits: int = 8) -> list[tuple[str, str, str]]:
    """Per-level (x, y, d) update expressions for the Hilbert curve
    index of a 2^bits × 2^bits grid, in ENGINE-PORTABLE SQL (the
    z_value_sql discipline: %, *, +, -, CASE only — no bit operators,
    whose spelling differs between Spark SQL and DuckDB).

    The classic xy2d walk consumes one bit per level from high to low
    (s = 2^(bits-1) … 1): with rxs = x%(2s) − x%s ∈ {0, s} (the current
    x bit scaled by s) and rys likewise,

        d += s²·((3·rx) xor ry) = 3·s·rxs + s·rys − 2·rxs·rys
        if ry == 0:  reflect (about n−1) when rx == 1, then swap x/y

    Each level is a pure projection; the caller folds the levels into a
    selectExpr chain (Spark) or nested subqueries (oracle SQL) over
    columns named x, y, d.  Unlike the Z-curve this cannot be a single
    flat polynomial — the rotation makes each level's transform depend
    on the previous one — but bits levels of CASE arithmetic is still
    one codegen'd stage, no shuffle, no UDF."""
    n = 1 << bits
    levels = []
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rxs = f"(x % {2 * s} - x % {s})"
        rys = f"(y % {2 * s} - y % {s})"
        d_new = f"d + 3*{s}*{rxs} + {s}*{rys} - 2*{rxs}*{rys}"
        x_new = (
            f"CASE WHEN {rys} = 0 THEN"
            f" (CASE WHEN {rxs} = {s} THEN {n - 1} - y ELSE y END)"
            f" ELSE x END"
        )
        y_new = (
            f"CASE WHEN {rys} = 0 THEN"
            f" (CASE WHEN {rxs} = {s} THEN {n - 1} - x ELSE x END)"
            f" ELSE y END"
        )
        levels.append((x_new, y_new, d_new))
    return levels


def hilbert_value_sql(x_sql: str, y_sql: str, bits: int = 8) -> str:
    """The Hilbert index as ONE portable SQL scalar: nested
    single-row-preserving subselects folding :func:`hilbert_levels`
    over seed columns — valid as a subquery-free expression chain in
    any engine that allows SELECT-from-SELECT (both do).  Intended for
    oracle text; Spark builders use :func:`hilbert_value_cols` to stay
    on the DataFrame API."""
    inner = f"SELECT {x_sql} AS x, {y_sql} AS y, 0 AS d, *"
    sql = f"({inner} FROM __SRC__)"
    for x_new, y_new, d_new in hilbert_levels(bits):
        sql = (
            f"(SELECT {x_new} AS x, {y_new} AS y, {d_new} AS d,"
            f" * EXCLUDE (x, y, d) FROM {sql})"
        )
    return sql


def hilbert_value_cols(df, x_sql: str, y_sql: str, bits: int = 8, out: str = "h"):
    """``df`` + Hilbert index column ``out`` of (x_sql, y_sql), folding
    the level updates as a selectExpr chain (pure projections, one
    whole-stage-codegen span)."""
    cur = df.selectExpr(f"{x_sql} AS x", f"{y_sql} AS y", "0 AS d", "*")
    for x_new, y_new, d_new in hilbert_levels(bits):
        cur = cur.selectExpr(
            f"{x_new} AS _xn", f"{y_new} AS _yn", f"{d_new} AS _dn", "*"
        ).drop("x", "y", "d").withColumnsRenamed(
            {"_xn": "x", "_yn": "y", "_dn": "d"}
        )
    return cur.withColumnRenamed("d", out).drop("x", "y")
