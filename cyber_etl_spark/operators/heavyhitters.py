"""Exact φ-heavy hitters via mergeable Misra–Gries candidates + one
exact verification pass — the two-pass trick that finds every item with
frequency > φ·N WITHOUT a full-cardinality shuffle.

The naive plan (groupBy(item).count().where(cnt > φN)) shuffles one row
per DISTINCT item — at 100 TB that is the vocabulary itself (billions of
keys) moving across the wire to keep a handful of survivors.  Here:

- Pass 1 (candidates): each input partition folds its rows into a
  Misra–Gries summary of k = ceil(1/φ) counters (bounded memory,
  mapInPandas, vectorized per Arrow batch via value_counts + the
  mergeable-summaries trim of Agarwal et al., PODS'12).  The union of
  per-partition summaries is ≤ k·P candidate rows.
  Guarantee: an item absent from a partition's summary has local count
  ≤ n_p/(k+1); absent from EVERY summary ⇒ global count
  ≤ N/(k+1) < φ·N, so every true heavy hitter IS a candidate.
- Pass 2 (verify): exact counts for candidate items only (the candidate
  set is broadcast into the scan as a semi-join filter) and the exact
  integer threshold test cnt·phi_denom > N·phi_num.

The output is therefore EXACT and independent of partitioning — the
candidate superset varies with the input split, the final filter does
not — which is what lets a plain GROUP BY ... HAVING oracle hash-gate a
sketch-assisted physical plan.

Reference ancestry: the reference's value_counts() profiling
(data_integration.ipynb cells 16-20) is the single-node twin of this
operator's exact pass.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates(item_col: str, k: int):
    """mapInPandas kernel: per-partition Misra–Gries summary, emitted as
    one (item) row per surviving counter."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series | None = None
        for pdf in batches:
            vc = pdf[item_col].value_counts()  # vectorized batch pre-count
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > k:
                # mergeable-summary trim: subtract the (k+1)-th largest
                # count from everything, drop the non-positive tail
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        if counters is None or counters.empty:
            yield pd.DataFrame({item_col: pd.Series([], dtype=object)})
        else:
            yield pd.DataFrame({item_col: counters.index.to_numpy()})

    return fn


def frequent_items(
    df: DataFrame,
    item_col: str,
    phi_denom: int,
    phi_num: int = 1,
) -> DataFrame:
    """All items of ``df[item_col]`` with exact frequency
    > (phi_num/phi_denom)·N, as (item, cnt) with the EXACT count.

    φ is taken as an exact rational so the threshold test is pure
    integer arithmetic (cnt·phi_denom > N·phi_num) — no float boundary
    can disagree with a SQL oracle.  k = ceil(phi_denom/phi_num)
    counters per partition; if the column's distinct cardinality is
    below k the summaries degenerate to exact per-partition counts and
    the operator is lossless trivially.
    """
    if phi_num <= 0 or phi_denom <= 0:
        raise ValueError("phi must be a positive rational phi_num/phi_denom")
    k = math.ceil(phi_denom / phi_num)
    items = df.select(item_col)
    cand = (
        items.mapInPandas(_mg_candidates(item_col, k), schema=f"{item_col} string")
        .distinct()
    )
    total = items.agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        items.join(F.broadcast(cand), item_col)  # semi-join: candidates only
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(phi_denom) > F.col("_n_total") * F.lit(phi_num))
        .drop("_n_total")
    )
