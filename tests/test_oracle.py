"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate so regressions surface locally
before a round ends.  Runs at sf0.001 (fast) for each query; the driver
re-runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from cyber_etl_spark.plans import QUERIES
from cyber_etl_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_smoke, name):
    res = compare_query(spark, sf_smoke, name)
    assert res.ok, f"{name}: {res.detail}"
