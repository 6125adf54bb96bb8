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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_sf01(spark, sf_correct, name):
    res = compare_query(spark, sf_correct, name)
    assert res.ok, f"{name}: {res.detail}"
