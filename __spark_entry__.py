"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`cyber_etl_spark.plans` — the named-query registry
where every SURVEY.md §2 operator is exposed as a (DataFrame builder,
DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cyber_etl_spark.plans import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: scan → filter → hash-agg pricing summary."""
    return QUERIES["q01_pricing_summary"].builder(spark, SMOKE_SF_DIR)


def _registry_order() -> list[str]:
    """Least-driver-verified queries first.

    The driver's correctness gate records ~50 queries per round in the
    order this dict yields them, so rotate: queries never (or least
    often) covered by a previous CORRECTNESS_r*.json go first, oracled
    before rows-only, alphabetical within a tier.  Over rounds every
    query cycles through the gate; scripts/verify_sf01.py keeps the
    full-registry record (CORRECTNESS_LOCAL.json) in the repo itself.
    """
    seen: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                for name, rec in json.load(fh).items():
                    # Count a record as verified only when it actually
                    # PASSED: err-free but rows/hash-mismatching queries
                    # must rotate to the FRONT of the gate window for
                    # re-verification, like erroring ones (ADVICE r02).
                    if (
                        isinstance(rec, dict)
                        and rec.get("err") is None
                        and rec.get("rows_match", True)
                        and rec.get("schema_match", True)
                        and rec.get("hash_match", True)
                    ):
                        seen[name] = seen.get(name, 0) + 1
        except (OSError, ValueError):
            continue
    # Oracle-less queries sort as the FIRST key component (r11 verdict
    # "What's wrong" #1): the driver's rows-only check can never produce
    # a pass, so without this they sit in the (0 passes, ...) tier
    # forever and permanently burn ~5 of the ~50 gate slots re-reporting
    # `no_oracle` on adjudicated-waiver queries.  With it, every oracled
    # query (including failures needing re-verification) fronts the
    # window; the waived rows-only set rotates behind the whole oracled
    # registry and is covered by its pytest behavior tests instead.
    return sorted(
        QUERIES, key=lambda n: (QUERIES[n].oracle is None, seen.get(n, 0), n)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].builder for name in _registry_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _registry_order()
        if QUERIES[name].oracle is not None
    }
