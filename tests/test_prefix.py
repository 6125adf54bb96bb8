"""Distributed prefix-sum kernel (operators/prefix.py) — equivalence
with the built-in single-task windows on data small enough to run both,
across multiple range partitions so the offset arithmetic is exercised
for real (not the one-partition degenerate case)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cyber_etl_spark.operators.prefix import global_ranks, ntile_expr, running_total


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_running_total_matches_window(spark):
    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 37) % 101).alias("v"),
    )
    got = running_total(
        df, "v", ["k"], ["g"], out_col="rt", num_partitions=7
    )
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("rt", F.sum("v").over(w))
    assert _rows(got, "g", "k", "rt") == _rows(want, "g", "k", "rt")


def test_running_total_global_no_groups(spark):
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    got = running_total(df, "v", ["k"], out_col="rt", num_partitions=5)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("rt", F.sum("v").over(w))
    assert _rows(got, "k", "rt") == _rows(want, "k", "rt")


def test_global_ranks_match_builtin_distributions(spark):
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
        ((F.col("id") * 17) % 59).alias("v"),
    )
    got = global_ranks(
        df, order_cols=["v", "k"], group_cols=["g"], num_partitions=6
    ).select(
        "g",
        "k",
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise((F.col("rn") - 1) / (F.col("n") - 1))
        .alias("pr"),
        (F.col("rn") / F.col("n")).alias("cd"),
        ntile_expr(F.col("rn"), F.col("n"), 4).alias("q4"),
        ntile_expr(F.col("rn"), F.col("n"), 7).alias("q7"),
    )
    w = Window.partitionBy("g").orderBy("v", "k")
    want = df.select(
        "g",
        "k",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("q4"),
        F.ntile(7).over(w).alias("q7"),
    )
    assert _rows(got, "g", "k", "pr", "cd", "q4", "q7") == _rows(
        want, "g", "k", "pr", "cd", "q4", "q7"
    )


def test_ntile_edge_small_groups(spark):
    """n < k: ntile assigns bucket = row number (ANSI) — exercised per
    group size 1..6 against the built-in."""
    df = spark.createDataFrame(
        [(g, i) for g in range(1, 7) for i in range(g)], "g int, k int"
    )
    got = global_ranks(df, ["k"], ["g"], num_partitions=3).select(
        "g", "k", ntile_expr(F.col("rn"), F.col("n"), 4).alias("t")
    )
    w = Window.partitionBy("g").orderBy("k")
    want = df.select("g", "k", F.ntile(4).over(w).alias("t"))
    assert _rows(got, "g", "k", "t") == _rows(want, "g", "k", "t")


def test_kernel_plan_has_no_whole_group_window(spark):
    """The kernel's own plan must only window on (_pid, group) — the
    partition-local pass — and `_gp_`-aliased control columns, never the
    bare group key (that would be the single-task shape it replaces)."""
    import re

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
        F.lit(1).alias("v"),
    )
    plan = (
        running_total(df, "v", ["k"], ["g"], num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        cols = []
        for tok in m.group(1).split(", "):
            if " ASC" in tok or " DESC" in tok or tok.startswith(
                "specifiedwindowframe"
            ):
                break
            cols.append(re.sub(r"#\d+L?", "", tok).strip())
        assert any(c == "_pid" or c.startswith("_gp_") for c in cols), cols


def test_running_max_matches_window_inclusive_and_exclusive(spark):
    df = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
        ((F.col("id") * 53) % 97).alias("v"),
    )
    from cyber_etl_spark.operators.prefix import running_max

    for inclusive in (True, False):
        got = running_max(
            df, "v", ["k"], ["g"], out_col="rm",
            num_partitions=6, inclusive=inclusive,
        )
        end = Window.currentRow if inclusive else -1
        w = (
            Window.partitionBy("g")
            .orderBy("k")
            .rowsBetween(Window.unboundedPreceding, end)
        )
        want = df.withColumn("rm", F.max("v").over(w))
        assert _rows(got, "g", "k", "rm") == _rows(want, "g", "k", "rm"), inclusive


def test_null_group_keys_and_null_values_match_window(spark):
    """NULL group keys must survive (Window.partitionBy gives NULLs
    their own partition; a plain equi-join back would drop them —
    review r7) and NULL values must follow window-SUM semantics: the
    running total is NULL only while no non-null value has been seen."""
    rows = []
    for i in range(120):
        g = None if i % 3 == 0 else str(i % 2)
        v = None if i % 5 < 2 else i % 7
        rows.append((i, g, v))
    df = spark.createDataFrame(rows, "k long, g string, v long")

    def rowset(d, *cols):
        return {tuple(r) for r in d.select(*cols).collect()}

    got = running_total(df, "v", ["k"], ["g"], out_col="rt", num_partitions=5)
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("rt", F.sum("v").over(w))
    assert rowset(got, "g", "k", "rt") == rowset(want, "g", "k", "rt")
    assert got.count() == df.count()  # NULL-group rows not dropped
    # rank path too
    got_r = global_ranks(df, ["k"], ["g"], num_partitions=5)
    want_r = df.select(
        "g", "k", F.row_number().over(Window.partitionBy("g").orderBy("k")).alias("rn")
    )
    assert rowset(got_r, "g", "k", "rn") == rowset(want_r, "g", "k", "rn")


def test_running_total_exposes_group_total_from_control_table(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 5).alias("v"),
    )
    got = running_total(
        df, "v", ["k"], ["g"], out_col="rt", num_partitions=4, total_col="tot"
    )
    want = {
        r.g: r.t for r in df.groupBy("g").agg(F.sum("v").alias("t")).collect()
    }
    for r in got.select("g", "tot").distinct().collect():
        assert r.tot == want[r.g]


def test_running_totals_multi_spec_matches_window(spark):
    from cyber_etl_spark.operators.prefix import running_totals

    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 37) % 101).alias("v"),
        ((F.col("id") * 13) % 7).alias("w"),
    )
    got = running_totals(
        df, [("v", "rv"), ("w", "rw")], ["k"], ["g"], num_partitions=6
    )
    win = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("rv", F.sum("v").over(win)).withColumn(
        "rw", F.sum("w").over(win)
    )
    assert _rows(got, "g", "k", "rv", "rw") == _rows(want, "g", "k", "rv", "rw")


def test_running_totals_global_no_groups(spark):
    from cyber_etl_spark.operators.prefix import running_totals

    df = spark.range(150).select(
        F.col("id").alias("k"),
        (F.col("id") % 11).alias("v"),
        (F.col("id") % 5).alias("w"),
    )
    got = running_totals(df, [("v", "rv"), ("w", "rw")], ["k"], num_partitions=4)
    win = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("rv", F.sum("v").over(win)).withColumn(
        "rw", F.sum("w").over(win)
    )
    assert _rows(got, "k", "rv", "rw") == _rows(want, "k", "rv", "rw")
