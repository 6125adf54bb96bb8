"""Distributed exact quantiles by range-partitioned selection.

Spark's exact ``percentile(...)`` aggregate buffers EVERY value of a
group inside one aggregation buffer (OpenHashMap in a single task).
For a bounded group count at small scale that is fine; for a global
group at 100 TB it is an executor OOM, not a slowdown — the one
scale-killer-class hazard the r5 verdict flagged.  This kernel computes
the same interpolated quantiles with per-*partition* (never per-group)
memory, the same bound Spark's own sort machinery assumes:

1. **Range-partition** the (group, value) pairs with Spark's
   sampling-based range partitioner, so each group's values land in
   partitions in ascending value order, and pin the result
   (``localCheckpoint``) so both passes read the shuffle output once.
2. **Count pass** — one tiny ``groupBy(partition_id, group).count()``
   aggregate (|partitions| x |groups| rows) gives every partition its
   global rank offset within each group, and every group its total n.
   The global ranks a quantile needs are just ``floor/ceil(p*(n-1))``.
3. **Selection pass** — one ``mapInPandas`` over the pinned data: each
   task sorts only its own partition's values per group and emits the
   values sitting at needed global ranks (<= 2*|probs| rows per group
   across the whole cluster).  No task ever holds more than one
   partition of one column.
4. **Interpolate** with Spark's own ``Percentile`` formula
   ``(higher-pos)*lower_val + (pos-lower)*higher_val`` (identical IEEE
   double arithmetic to the built-in aggregate, so oracles that were
   hash-green against DuckDB's ``quantile_cont`` stay green).

The selected rows are bounded by |groups| * 2|probs|, so the final
assembly is a driver-side table build — the same "small boundary table"
pattern as q146's bin edges.  Groups whose values are all NULL are
omitted (callers in this repo only use non-null measure columns).

Replaces the in-memory ``percentile`` in q61/q112/q130/q146 and the
graph-backbone p95 threshold; ``tests/test_plans.py`` bans the exact
``percentile(`` aggregate from every registered query's plan so it
cannot creep back.
"""

from __future__ import annotations

import math
from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _interpolate(p: float, n: int, at: dict[int, float]) -> float | None:
    """Spark Percentile.getPercentile: rank = p*(n-1); linear between
    floor and ceil with (higher-pos)*lower + (pos-lower)*higher."""
    if n <= 0:
        return None
    pos = p * (n - 1)
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    if hi == lo:
        return at[lo]
    return (hi - pos) * at[lo] + (pos - lo) * at[hi]


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Mapping[str, float],
    group_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` per group.

    Returns a DataFrame with ``group_cols`` plus one DOUBLE column per
    ``probs`` alias — the distributed twin of
    ``groupBy(*group_cols).agg(percentile(value_col, p) for p in probs)``.
    Output is a small local-rows frame (|groups| rows): broadcast-join or
    crossJoin it back, exactly like any boundary table.
    """
    spark = df.sparkSession
    group_cols = list(group_cols)
    gfields = [df.schema[c] for c in group_cols]

    vals = df.select(
        *group_cols, F.col(value_col).cast("double").alias("_v")
    ).where(F.col("_v").isNotNull())
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        vals.repartitionByRange(num_partitions, *group_cols, "_v")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # Pass 1: (partition, group) counts -> per-group totals + offsets.
    counts = ranged.groupBy("_pid", *group_cols).count().collect()
    totals: dict[tuple, int] = {}
    for r in counts:
        g = tuple(r[c] for c in group_cols)
        totals[g] = totals.get(g, 0) + r["count"]
    offsets: dict[tuple, int] = {}  # (group..., pid) -> global rank offset
    run: dict[tuple, int] = {}
    for r in sorted(counts, key=lambda r: ([r[c] for c in group_cols], r["_pid"])):
        g = tuple(r[c] for c in group_cols)
        offsets[(g, r["_pid"])] = run.get(g, 0)
        run[g] = run.get(g, 0) + r["count"]

    needed: dict[tuple, list[int]] = {}  # group -> sorted needed global ranks
    for g, n in totals.items():
        ranks: set[int] = set()
        for p in probs.values():
            pos = p * (n - 1)
            ranks.add(int(math.floor(pos)))
            ranks.add(int(math.ceil(pos)))
        needed[g] = sorted(ranks)

    # Pass 2: per-partition selection of needed global ranks.
    out_schema = StructType(
        list(gfields)
        + [StructField("_rank", LongType()), StructField("_v", DoubleType())]
    )
    ngc = len(group_cols)

    def select_ranks(batches: Iterable["pd.DataFrame"]):  # noqa: F821
        import numpy as np
        import pandas as pd

        acc: dict[tuple, list] = {}
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            if ngc:
                for g, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                    gk = g if isinstance(g, tuple) else (g,)
                    acc.setdefault(gk, []).append(sub["_v"].to_numpy())
            else:
                acc.setdefault((), []).append(pdf["_v"].to_numpy())
        rows = []
        for gk, chunks in acc.items():
            off = offsets.get((gk, pid))
            if off is None:
                continue
            v = np.sort(np.concatenate(chunks))
            hi = off + len(v)
            for rank in needed.get(gk, ()):
                if off <= rank < hi:
                    rows.append(list(gk) + [rank, float(v[rank - off])])
        cols = group_cols + ["_rank", "_v"]
        yield pd.DataFrame(rows, columns=cols)

    selected = ranged.mapInPandas(select_ranks, schema=out_schema).collect()
    at: dict[tuple, dict[int, float]] = {}
    for r in selected:
        g = tuple(r[c] for c in group_cols)
        at.setdefault(g, {})[r["_rank"]] = r["_v"]

    res_schema = StructType(
        list(gfields) + [StructField(a, DoubleType()) for a in probs]
    )
    out_rows = []
    for g in sorted(totals, key=lambda t: tuple(map(str, t))):
        out_rows.append(
            list(g)
            + [_interpolate(p, totals[g], at.get(g, {})) for p in probs.values()]
        )
    return spark.createDataFrame(out_rows, schema=res_schema)
