"""DTW kernel: reference equivalence + band properties."""

from __future__ import annotations

import numpy as np


def _ref_dtw(a, b, band=None):
    INF = float("inf")
    n, m = len(a), len(b)
    D = np.full((n, m), INF)
    for i in range(n):
        for j in range(m):
            if band is not None and abs(i - j) > band:
                continue
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i, j] = c
                continue
            best = min(
                D[i - 1, j] if i > 0 else INF,
                D[i, j - 1] if j > 0 else INF,
                D[i - 1, j - 1] if i > 0 and j > 0 else INF,
            )
            D[i, j] = c + best
    return int(D[n - 1, m - 1])


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "pid long, a array<long>, b array<long>")


def test_dtw_matches_reference_on_random_series(spark):
    from cyber_etl_spark.operators.dtw import dtw_pairs

    rng = np.random.default_rng(7)
    rows = []
    for pid in range(20):
        n = int(rng.integers(1, 30))
        a = rng.integers(0, 50, size=n).tolist()
        b = rng.integers(0, 50, size=n).tolist()
        rows.append((pid, a, b))
    got = {
        r.pid: r.dtw
        for r in dtw_pairs(_pairs_df(spark, rows), "a", "b").collect()
    }
    for pid, a, b in rows:
        assert got[pid] == _ref_dtw(a, b), pid


def test_banded_dtw_upper_bounds_and_converges(spark):
    from cyber_etl_spark.operators.dtw import dtw_pairs

    rng = np.random.default_rng(11)
    rows = [
        (pid, rng.integers(0, 9, size=16).tolist(), rng.integers(0, 9, size=16).tolist())
        for pid in range(8)
    ]
    df = _pairs_df(spark, rows)
    full = {r.pid: r.dtw for r in dtw_pairs(df, "a", "b").collect()}
    b2 = {r.pid: r.dtw for r in dtw_pairs(df, "a", "b", band=2).collect()}
    wide = {r.pid: r.dtw for r in dtw_pairs(df, "a", "b", band=15).collect()}
    for pid, a, b in rows:
        assert b2[pid] >= full[pid]
        assert b2[pid] == _ref_dtw(a, b, band=2)
        assert wide[pid] == full[pid]  # band >= n-1 is unconstrained
