"""Batch ETL maintenance operators: upsert-merge, SCD2 intervals, DQ audit.

The reference's pipeline is rebuild-the-world (every notebook rerun rewrites
every node/edge CSV, SURVEY.md §3.2); at 100 TB the engine needs the
incremental idioms instead:

- :func:`merge_upsert` — latest-wins key merge of a base snapshot and an
  update batch (the relational core of Delta/Iceberg MERGE INTO, expressed
  engine-neutrally as a full-outer coalesce).
- :func:`scd2_intervals` — change-capture to validity intervals (slowly
  changing dimension type 2) with lag/lead windows.
- :func:`dq_audit` — rule-table-driven data-quality counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Latest-wins merge: update rows replace base rows on ``key``, new
    keys are inserted, untouched base rows pass through; a
    ``merge_action`` column records what happened to each key.

    Full-outer hash join on the merge key — both sides shuffle once on
    the key, which is the same physical plan MERGE INTO compiles to when
    the update batch is too large to broadcast.  Column set is taken from
    ``base``; ``updates`` must carry the same columns.
    """
    cols = base.columns
    b, u = base.alias("b"), updates.alias("u")
    joined = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer")
    picked = [
        F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c) for c in cols
    ]
    action = (
        F.when(F.col(f"u.{key}").isNull(), F.lit("unchanged"))
        .when(F.col(f"b.{key}").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("merge_action")
    )
    return joined.select(*picked, action)


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an event stream into SCD type-2 validity intervals: one
    row per (key, attr-run) with ``valid_from`` / ``valid_to`` and an
    ``is_current`` flag (open interval).

    lag() flags change points, lead() closes each interval — two window
    passes over the same (key, ts) sort, so Spark plans a single sort +
    two window operators with no extra shuffle.  ``tiebreak`` must make
    the order total or interval boundaries are nondeterministic.
    """
    from pyspark.sql.window import Window

    order = [ts_col, tiebreak] if tiebreak else [ts_col]
    w = Window.partitionBy(key).orderBy(*order)
    changed = (
        df.withColumn("_prev", F.lag(attr).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .select(key, attr, F.col(ts_col).alias("valid_from"))
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return changed.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def dq_audit(rules: list[tuple[str, DataFrame]]) -> DataFrame:
    """Data-quality audit: each rule is (name, violating-rows frame);
    result is one (rule, n_violations) row per rule.

    Each rule aggregates independently (count-only, so every check is a
    scan + partial count — no row movement) and the tiny per-rule results
    union.  Anti-join rules (orphans) stay joins inside their frame.
    """
    counted = [
        df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )
        for name, df in rules
    ]
    out = counted[0]
    for c in counted[1:]:
        out = out.unionByName(c)
    return out
