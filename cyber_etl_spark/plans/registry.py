"""Named-query registry.

Every capability claimed in SURVEY.md §2 is exposed as a named query: a
``(spark_builder, oracle_sql)`` pair.  The builder declares the plan with
the DataFrame API (so Catalyst optimizes it); the oracle is the equivalent
ANSI SQL that DuckDB runs on the same parquet tables.  The driver — and our
own ``tests/test_oracle.py`` — execute both sides and compare row count,
schema and an order-insensitive value hash.

Determinism rules (SURVEY.md §7.3 hard part 1):

- Money/double aggregates go through ``dsum``: cast to DECIMAL(18,6),
  sum exactly, cast the final scalar back to DOUBLE.  Exact decimal
  arithmetic is engine- and order-independent, so Spark and DuckDB produce
  bit-identical doubles regardless of partitioning/shuffle order.
- Ranking ties always carry a unique key as the final sort column.
- No query depends on output order (the comparator sorts), but every
  LIMIT/top-k is made deterministic via tie-breaks.

Laziness: builders normally only CONSTRUCT a plan — no jobs run until the
caller acts.  Exceptions are documented per query: kernel-based builders
(distributed quantile/prefix kernels, iterative graph loops) execute
bounded Spark jobs inside the builder (checkpoints, boundary-table
collects — see ``analytics4._collect_bounded_groups``), so plan-only
consumers (explain, plan audits) pay those jobs too.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a named query with its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(
            name=name, builder=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


# ---- shared deterministic-aggregate helpers (used by builders) ----------

def dsum_expr(col: str, alias: str) -> str:
    """Exact money sum: DECIMAL(18,6) accumulate → DOUBLE result.

    Identical SQL text works in Spark SQL and DuckDB, which is the point:
    both engines do exact fixed-point accumulation, so shuffle/scan order
    cannot perturb the value.
    """
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def davg_expr(col: str, alias: str) -> str:
    """Order-independent mean: exact decimal sum divided by count."""
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({col}) AS {alias}"
    )
