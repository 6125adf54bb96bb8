"""Full-registry differential run at sf0.01 — the driver's gate only
records the alphabetically-first 50 queries, so the repo proves the rest
itself (VERDICT r1 "What's missing" #2).

Slow (~10 min): opt in with SPARK_GRAFT_SF01=1.  scripts/verify_sf01.py
runs the same sweep standalone and writes CORRECTNESS_LOCAL.json.
"""

from __future__ import annotations

import os

import pytest

from cyber_etl_spark.plans import QUERIES
from cyber_etl_spark.testing import compare_query

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01") != "1",
    reason="sf0.01 full sweep is opt-in (SPARK_GRAFT_SF01=1)",
)


def test_all_queries_match_oracle_sf01(spark, sf_correct):
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(QUERIES)

    def run(name):
        try:
            res = compare_query(spark, sf_correct, name)
            return name, res.ok, res.detail
        except Exception as exc:  # record, don't abort the sweep
            return name, False, f"raised {type(exc).__name__}: {exc}"

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(run, names))
    failures = [f"{n}: {d}" for n, ok, d in results if not ok]
    assert not failures, (
        f"{len(failures)}/{len(names)} queries diverged at sf0.01:\n"
        + "\n".join(failures)
    )
