"""Run EVERY registered query against its DuckDB oracle at sf0.01 and
write a durable record (CORRECTNESS_LOCAL.json) — the repo's own proof
for the half of the registry the driver's 50-query gate never reaches
(VERDICT r1 "What's missing" #2).

Usage: python scripts/verify_sf01.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.session import get_spark
    from cyber_etl_spark.testing import compare_query

    spark = get_spark("verify-sf01")
    out: dict[str, dict] = {}
    failures = 0
    t0 = time.time()

    def run(name: str) -> tuple[str, dict]:
        t = time.time()
        try:
            res = compare_query(spark, SF_DIR, name)
            ok, detail = res.ok, res.detail
        except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
            ok, detail = False, f"exception: {e!r:.300}"
        return name, {
            "ok": ok,
            "oracled": QUERIES[name].oracle is not None,
            "detail": detail[:300],
            # NOTE: wall time under 6-way concurrency — good for spotting
            # relative outliers, not a solo benchmark (bench.py is that)
            "sec": round(time.time() - t, 2),
        }

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=6) as ex:
        for name, rec in ex.map(run, sorted(QUERIES)):
            out[name] = rec
            if not rec["ok"]:
                failures += 1
            print(
                f"{'PASS' if rec['ok'] else 'FAIL'} {name} "
                f"({rec['sec']}s) {rec['detail'][:120]}",
                flush=True,
            )

    record = {
        "sf_dir": SF_DIR,
        "n_queries": len(out),
        "n_pass": len(out) - failures,
        "n_fail": failures,
        "n_oracled": sum(1 for v in out.values() if v["oracled"]),
        "total_sec": round(time.time() - t0, 1),
        "queries": out,
    }
    with open("CORRECTNESS_LOCAL.json", "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"\n{record['n_pass']}/{record['n_queries']} pass "
          f"({record['n_oracled']} oracled) in {record['total_sec']}s "
          f"-> CORRECTNESS_LOCAL.json")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
