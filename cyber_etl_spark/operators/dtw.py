"""Dynamic time warping over many series pairs — batch-vectorized DP.

DTW is the elastic-alignment distance the fixed-lag families (q273 CCF,
q241 ACF) can't express: two series with the same shape but drifting
phase compare as close under DTW and far under any per-timestep metric.
The classic formulation is an O(n·m) per-pair dynamic program with an
in-row sequential dependency, which defeats row-wise vectorization; the
ANTI-DIAGONAL formulation makes every cell of diagonal k depend only on
diagonals k−1 and k−2, so one time loop of n+m−1 steps runs VECTORIZED
numpy over (pairs × diagonal) — the operators/walk.py group-axis rule
applied to a 2-D recurrence.  All arithmetic is exact int64 on integer
series, so a recursive-CTE oracle replays the identical DP cross-engine
(the same anti-diagonal recurrence, lists as diagonals).

Scale contract: P pairs of length-n series cost O(P·n²) work and
O(P·n) state per Arrow batch, embarrassingly parallel across batches;
the quadratic term is per-PAIR (bounded series length — calendar
months here), never corpus-sized.  A Sakoe–Chiba band (``band=w``)
cuts each diagonal to 2w+1 live cells for long series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_INF = 1 << 40  # sentinel: > any reachable path cost (n·max|Δ| ≲ 2^30
# here), small enough that ≤ n+m chained INFs stay far inside int64


def dtw_pairs(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    out: str = "dtw",
    band: int | None = None,
) -> DataFrame:
    """Append the integer DTW distance of two equal-indexed int series
    columns (``array<long>``) to every row.

    Cost is |a_i − b_j|; moves are the classic (i−1,j), (i,j−1),
    (i−1,j−1).  With ``band`` set, cells with |i−j| > band are
    unreachable (Sakoe–Chiba) — the result is then the banded DTW,
    which upper-bounds the unconstrained distance.  Rows where either
    series is empty get _INF (no alignment exists).
    """
    import numpy as np
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema)
    out_schema = f"{fields}, {out} long"

    def _solve(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        p, n = A.shape
        m = B.shape[1]
        if n == 0 or m == 0:
            return np.full(p, _INF, dtype=np.int64)
        # D_prev2 / D_prev / D_cur are (p, m) diagonals: column j
        # holds cell (i = k − j, j) of diagonal k, _INF where the
        # cell is outside the grid (or outside the band)
        j_idx = np.arange(m)
        prev2 = np.full((p, m), _INF, dtype=np.int64)
        prev = np.full((p, m), _INF, dtype=np.int64)
        prev[:, 0] = np.abs(A[:, 0] - B[:, 0])  # diagonal 0 = cell (0,0)
        for k in range(1, n + m - 1):
            i = k - j_idx  # the a-index of each cell on this diagonal
            valid = (i >= 0) & (i < n)
            if band is not None:
                valid &= np.abs(i - j_idx) <= band
            cost = np.abs(A[:, np.clip(i, 0, n - 1)] - B)
            # predecessors: same-j from k−1 = (i−1, j); j−1 from
            # k−1 = (i, j−1); j−1 from k−2 = (i−1, j−1)
            left_prev = np.full((p, m), _INF, dtype=np.int64)
            left_prev[:, 1:] = prev[:, :-1]
            left_prev2 = np.full((p, m), _INF, dtype=np.int64)
            left_prev2[:, 1:] = prev2[:, :-1]
            best = np.minimum(np.minimum(prev, left_prev), left_prev2)
            cur = np.where(valid, cost + np.minimum(best, _INF), _INF)
            prev2, prev = prev, cur
        return prev[:, m - 1]

    def _kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # rows of one batch may carry different series lengths:
            # vectorize per (len(a), len(b)) group (q403's shared-spine
            # input is one group — the general contract stays ragged-safe)
            res = np.empty(len(pdf), dtype=np.int64)
            lens = pd.DataFrame(
                {
                    "la": [len(x) for x in pdf[a_col]],
                    "lb": [len(x) for x in pdf[b_col]],
                }
            )
            for (_, _), idx in lens.groupby(["la", "lb"]).groups.items():
                pos = np.asarray(idx)
                A = np.stack(
                    [np.asarray(pdf[a_col].iloc[i], dtype=np.int64) for i in pos]
                )
                B = np.stack(
                    [np.asarray(pdf[b_col].iloc[i], dtype=np.int64) for i in pos]
                )
                res[pos] = _solve(A, B)
            pdf[out] = res
            yield pdf

    return pairs.mapInPandas(_kernel, schema=out_schema)
