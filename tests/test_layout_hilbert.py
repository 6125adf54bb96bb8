"""Hilbert-curve layout — the properties the oracle CANNOT check.

q245's gate pins Spark == DuckDB on the generated arithmetic, but both
engines share that text, so a semantic error in the generator would
slide through.  These tests pin the generator against an INDEPENDENT
pure-Python implementation of the canonical xy2d walk, plus the two
defining curve properties (bijectivity; every consecutive index step
is a grid-adjacent cell — the locality guarantee the layout exists
for, and the property Z-order lacks).
"""

from __future__ import annotations


def _xy2d_reference(bits: int, x: int, y: int) -> int:
    """Canonical bitwise xy2d (independent of the SQL generator's
    %-arithmetic formulation)."""
    n = 1 << bits
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _eval_levels(bits: int, x: int, y: int) -> int:
    """Evaluate the generator's per-level update expressions in Python
    (same arithmetic the SQL runs)."""
    from cyber_etl_spark.operators.layout import hilbert_levels

    n = 1 << bits
    d = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rxs = x % (2 * s) - x % s
        rys = y % (2 * s) - y % s
        d = d + 3 * s * rxs + s * rys - 2 * rxs * rys
        if rys == 0:
            if rxs == s:
                x, y = (n - 1) - y, (n - 1) - x
            else:
                x, y = y, x
    # sanity: the module really generates bits levels
    assert len(hilbert_levels(bits)) == bits
    return d


def test_generator_matches_canonical_reference_exhaustively():
    bits = 4
    n = 1 << bits
    for x in range(n):
        for y in range(n):
            assert _eval_levels(bits, x, y) == _xy2d_reference(bits, x, y), (
                x,
                y,
            )


def test_bijective_and_unit_step_adjacent():
    bits = 4
    n = 1 << bits
    inv = {}
    for x in range(n):
        for y in range(n):
            d = _eval_levels(bits, x, y)
            assert 0 <= d < n * n
            assert d not in inv
            inv[d] = (x, y)
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_spark_chain_matches_reference_on_sample(spark):
    """The selectExpr chain (the actual q245 builder path) agrees with
    the canonical reference on a deterministic sample of coordinates."""
    from cyber_etl_spark.operators.layout import hilbert_value_cols

    pts = [(i * 37 % 256, i * 101 % 256) for i in range(64)]
    df = spark.createDataFrame(pts, ["a", "b"])
    out = {
        (r["a"], r["b"]): r["h"]
        for r in hilbert_value_cols(df, "a", "b", bits=8).collect()
    }
    for a, b in pts:
        assert out[(a, b)] == _xy2d_reference(8, a, b), (a, b)
