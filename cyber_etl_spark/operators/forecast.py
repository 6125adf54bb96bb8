"""Bounded-series forecasting kernels — the q223 lesson applied to
sequential smoothers.

Exponential-smoothing recurrences are constant-sized state walked over
an AGGREGATED series (per-day grids bounded by the calendar, never the
corpus).  Expressing the walk as Spark recursion is the wrong physical
plan: each recursive step is a scheduled job, so a 2-year daily series
costs ~700 join rounds (measured 17 s at sf0.1 for Holt via Spark's
WITH RECURSIVE, vs 0.4 s for this kernel).  The right plan — identical
to operators/pca.power_iterate_table — keeps the corpus-scale work
(the daily aggregation) distributed and replays the recurrence in ONE
mapInPandas task over the coalesced grid.

Cross-engine exactness: the kernel iterates in plain Python floats with
the SAME expression tree the DuckDB recursive-CTE oracle evaluates;
with dyadic smoothing weights (alpha = beta = 1/2) every step is a
sequence of exactly-rounded IEEE operations, so both engines walk
bit-identical (level, trend) trajectories and no per-step snapping is
needed.  Values are returned UNROUNDED; callers apply Spark round()
(which matches DuckDB round() on identical doubles — the double-path
rule in plans/analytics2's module docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

# hard cap on the bounded-series contract: a per-day grid spans years,
# not millions — refuse rather than OOM the single task (the
# exact_quantiles / power_iterate_table guard lesson)
_MAX_SERIES_ROWS = 200_000


def holt_linear_forecast(
    daily: DataFrame,
    order_col: str = "day",
    value_col: str = "x",
    horizons: int = 7,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Holt's linear-trend smoothing over a BOUNDED ordered series →
    (horizon, n_days, level, trend, forecast), one row per horizon
    1..``horizons``; level/trend/forecast are unrounded doubles.

    Init: l_1 = x_1, b_1 = x_2 − x_1; recurrence for t ≥ 2:
    l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}),
    b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}.  Fewer than 2 rows → empty.
    """
    schema = (
        "horizon int, n_days bigint, level double, trend double,"
        " forecast double"
    )

    def kernel(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf) > _MAX_SERIES_ROWS:
            raise ValueError(
                f"holt_linear_forecast: {len(pdf)} rows exceed the "
                f"bounded-series contract ({_MAX_SERIES_ROWS}); this "
                "kernel is for aggregated (e.g. per-day) grids, never "
                "raw data"
            )
        if len(pdf) < 2:
            return
        pdf = pdf.sort_values(order_col, ignore_index=True)
        xs = [float(v) for v in pdf[value_col]]
        lvl = xs[0]
        trd = xs[1] - xs[0]
        for t in range(1, len(xs)):
            # the exact expression tree of the recursive-CTE oracle:
            # 0.5*x + 0.5*(l+b); b = 0.5*(l_new - l) + 0.5*b
            new_l = alpha * xs[t] + (1.0 - alpha) * (lvl + trd)
            trd = beta * (new_l - lvl) + (1.0 - beta) * trd
            lvl = new_l
        yield pd.DataFrame(
            {
                "horizon": list(range(1, horizons + 1)),
                "n_days": [len(xs)] * horizons,
                "level": [lvl] * horizons,
                "trend": [trd] * horizons,
                "forecast": [lvl + h * trd for h in range(1, horizons + 1)],
            }
        )

    return daily.select(order_col, value_col).coalesce(1).mapInPandas(
        kernel, schema
    )
