"""q247 isotonic calibration — the properties its oracle cannot check
(both engines share the minimax formula, so a wrong identity would
slide through the hash gate): the fit must be monotone non-decreasing
in the band order, and PAV preserves total mass (Σ n·iso = Σ k up to
the 1e-6 snap)."""

from __future__ import annotations


def test_isotonic_monotone_and_mass_preserving(spark, sf_smoke):
    from cyber_etl_spark.plans import QUERIES

    rows = (
        QUERIES["q247_isotonic_calibration"]
        .builder(spark, sf_smoke)
        .collect()
    )
    rows = sorted(rows, key=lambda r: r["band"])
    assert len(rows) >= 3
    for a, b in zip(rows, rows[1:]):
        assert a["iso_rate"] <= b["iso_rate"] + 1e-12, (a, b)
    # mass preservation: sum n*iso == sum k within the per-band 1e-6
    # snap (each band contributes at most n_b * 5e-7 of snap error)
    tot_k = sum(r["k"] for r in rows)
    tot_n = sum(r["n"] for r in rows)
    fitted = sum(r["n"] * r["iso_rate"] for r in rows)
    assert abs(fitted - tot_k) <= tot_n * 5e-7 + 1e-9, (fitted, tot_k)
    # the fit actually pools something on this data OR equals the raw
    # rates everywhere; either way every iso value sits inside the
    # observed rate range
    lo = min(r["rate"] for r in rows)
    hi = max(r["rate"] for r in rows)
    for r in rows:
        assert lo - 1e-9 <= r["iso_rate"] <= hi + 1e-9
