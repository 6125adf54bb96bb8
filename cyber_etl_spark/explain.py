"""Plan inspection CLI: print the formatted physical plan of any
registry query.

    python -m cyber_etl_spark.explain q01_pricing_summary [sf_dir]
    python -m cyber_etl_spark.explain --all [sf_dir]

The iterate-on-the-plan loop lives here: run a query's explain, check
PushedFilters / ReadSchema / join strategies / WholeStageCodegen spans,
adjust the builder, re-run.  tests/test_plans.py pins the properties
that must never regress.
"""

from __future__ import annotations

import sys


def main() -> None:
    from .plans import QUERIES
    from .session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("cyber-etl-spark-explain")

    names = sorted(QUERIES) if show_all else [args[0]]
    for name in names:
        print(f"\n{'=' * 78}\n{name}: {QUERIES[name].doc.splitlines()[0] if QUERIES[name].doc else ''}\n{'=' * 78}")
        QUERIES[name].builder(spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
