"""Executable gate for the integer-`div` overflow class (r9 verdict #3).

Three rounds in a row hit the same silent-wrap signature (q238 r8, q240
r8, q363 r9): an integer `div` / DECIMAL-quotient expression whose result
exceeds int64 WRAPS silently — and, measured on this Spark build, the
DECIMAL `div` path wraps EVEN UNDER ANSI MODE (`CAST(4e19 AS
DECIMAL(38,0)) div 1` returns garbage with ansi.enabled=true), so no
session conf can be the canary.  The written CLAUDE.md convention becomes
executable here in two layers:

1. RUNTIME: the shared half-away helpers (`analytics2._ha6`,
   `analytics6._sha6`) widen operands to DECIMAL(38,0) and raise_error
   when the quotient leaves the 6-dp int64 grid — tested below.
2. STATIC: every function whose source uses a raw `div` must state its
   grid/overflow budget in the docstring (why the product and quotient
   fit int64, or where ANSI raises loudly) — a new un-argued `div` site
   fails the suite.
"""

from __future__ import annotations

import ast
import glob
import os
import re

import pytest

_BUDGET_PAT = re.compile(
    r"grid|budget|int64|overflow|HUGEINT|DECIMAL\(38", re.IGNORECASE
)


def test_every_div_site_states_its_grid_budget():
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "cyber_etl_spark",
    )
    missing = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        with open(path) as fh:
            src = fh.read()
        if not re.search(r"\bdiv\b", src):
            continue
        lines = src.splitlines()
        for node in ast.walk(ast.parse(src)):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            seg = "\n".join(lines[node.lineno - 1 : node.end_lineno])
            if not re.search(r"\bdiv\b", seg):
                continue
            doc = ast.get_docstring(node) or ""
            if not _BUDGET_PAT.search(doc):
                missing.append(
                    (os.path.relpath(path, root), node.name, node.lineno)
                )
    assert not missing, (
        "functions using integer `div` without a grid-budget docstring "
        f"(see tests/test_div_budget.py module docstring): {missing}"
    )


@pytest.mark.parametrize("helper", ["ha6", "sha6"])
def test_half_away_helpers_raise_on_grid_overflow(spark, helper):
    """The q238/q363 wrap signature must be a HARD ERROR now: a quotient
    beyond the 6-dp int64 grid raises instead of publishing garbage."""
    from cyber_etl_spark.plans.analytics2 import _ha6
    from cyber_etl_spark.plans.analytics6 import _sha6

    fn = _ha6 if helper == "ha6" else _sha6
    sign = "" if helper == "ha6" else "-"
    bad = spark.sql(
        f"SELECT CAST({sign}4e19 AS DECIMAL(38,0)) AS n, CAST(1 AS BIGINT) AS d"
    )
    with pytest.raises(Exception, match="grid overflow"):
        bad.select(fn("n", "d").alias("x")).collect()


def test_half_away_helpers_widen_long_inputs(spark):
    """2·num·1e6 on a LONG input used to wrap (q215 lesson) — the helper
    now widens to DECIMAL(38,0) internally, so a 5e12/1e13 long rational
    publishes 0.5 instead of overflowing the multiply."""
    from cyber_etl_spark.plans.analytics2 import _ha6
    from cyber_etl_spark.plans.analytics6 import _sha6

    df = spark.sql(
        "SELECT CAST(5000000000000 AS BIGINT) AS n,"
        " CAST(10000000000000 AS BIGINT) AS d"
    )
    assert df.select(_ha6("n", "d").alias("x")).collect()[0].x == 0.5
    neg = spark.sql(
        "SELECT CAST(-5000000000000 AS BIGINT) AS n,"
        " CAST(10000000000000 AS BIGINT) AS d"
    )
    assert neg.select(_sha6("n", "d").alias("x")).collect()[0].x == -0.5


def test_decimal_div_wraps_even_under_ansi(spark):
    """Pin the Spark behavior that makes the runtime guard NECESSARY: if
    a future Spark version starts raising here, the guard (and this
    test) can be retired in favor of plain ANSI."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    row = spark.sql(
        "SELECT CAST(4e19 AS DECIMAL(38,0)) div 1 AS x"
    ).collect()[0]
    assert row.x != 40000000000000000000  # wrapped, not raised
