"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): for every
registered query, run the DataFrame builder on Spark AND the oracle SQL on
DuckDB over the same parquet tables, then compare row count, schema (sorted
column names) and an order-insensitive canonicalized value comparison.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from .sources.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        # Driver-strict: NEVER collapse 123.0 to "123".  The driver's value
        # hash keeps the float/int distinction, so an oracle whose column
        # comes back float64 (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> pandas
        # float64) must FAIL here too, not drift through a laxer local gate
        # and burn a driver round (VERDICT r02 "What's wrong" #3).
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sort columns by name, stringify cells, sort rows — order-insensitive
    exact comparison form (same idea as the driver's value hash)."""
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in rec) for rec in df[cols].itertuples(index=False)]
    rows.sort()
    return rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(spark, sf_dir: str, name: str) -> CompareResult:
    """Run one registered query on both engines and diff canonically."""
    from .plans import QUERIES

    q = QUERIES[name]
    spark_pdf = q.builder(spark, sf_dir).toPandas()
    if q.oracle is None:
        ok = len(spark_pdf) >= 0
        return CompareResult(name, ok, f"rows-only check: {len(spark_pdf)} rows")

    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.sql(q.oracle).df()
    finally:
        con.close()

    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return CompareResult(
            name, False,
            f"schema mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}",
        )
    if len(spark_pdf) != len(duck_pdf):
        return CompareResult(
            name, False, f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
        )
    s_rows, d_rows = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if s_rows != d_rows:
        # set differences, not positional zip: after the first real diff a
        # positional pairing of two sorted lists is misaligned noise.
        from collections import Counter

        sc, dc = Counter(s_rows), Counter(d_rows)
        only_spark = list((sc - dc).elements())[:5]
        only_duck = list((dc - sc).elements())[:5]
        return CompareResult(
            name,
            False,
            f"value mismatch; spark-not-duck: {only_spark} duck-not-spark: {only_duck}",
        )
    return CompareResult(name, True, f"{len(s_rows)} rows match")
