"""Generate QUERIES.md — the registry index (r9 verdict item 7).

365+ queries across 14 plan modules are past grep scale; this emits one
row per registered query (name → file:line → tags → oracle/rows-only →
driver-verified rounds) straight from the registry plus the committed
CORRECTNESS_r*.json artifacts.  Deterministic and Spark-free, so
tests/test_queries_md.py can regenerate it and diff against the committed
file as a staleness gate.  Refresh like BENCH_LOCAL:

    python scripts/gen_queries_md.py          # rewrites QUERIES.md
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def generate() -> str:
    from cyber_etl_spark.plans import QUERIES

    verified: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        try:
            with open(path) as fh:
                recs = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in recs.items():
            if (
                isinstance(rec, dict)
                and rec.get("err") is None
                and rec.get("rows_match", True)
                and rec.get("schema_match", True)
                and rec.get("hash_match", True)
            ):
                verified.setdefault(name, []).append(rnd)

    def sort_key(name: str):
        m = re.match(r"q(\d+)", name)
        return (int(m.group(1)) if m else 10**9, name)

    lines = [
        "# QUERIES.md — generated registry index",
        "",
        "Regenerate with `python scripts/gen_queries_md.py`; "
        "tests/test_queries_md.py fails if this file is stale.  "
        "`driver rounds` = rounds whose CORRECTNESS_r*.json recorded a "
        "fully green (rows+schema+hash) row; `local` = green only in "
        "CORRECTNESS_LOCAL.json / the pytest sf0.001 sweep so far.",
        "",
    ]
    n_oracled = sum(1 for q in QUERIES.values() if q.oracle is not None)
    lines.append(
        f"Registry: **{len(QUERIES)}** queries "
        f"({n_oracled} oracled, {len(QUERIES) - n_oracled} rows-only); "
        f"driver-green union **{sum(1 for n in QUERIES if n in verified)}"
        f"/{len(QUERIES)}**."
    )
    lines += [
        "",
        "| Query | Where | Tags | Oracle | Driver rounds |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(QUERIES, key=sort_key):
        q = QUERIES[name]
        fn = inspect.unwrap(q.builder)
        src = os.path.relpath(inspect.getsourcefile(fn), ROOT)
        line = inspect.getsourcelines(fn)[1]
        rounds = (
            ", ".join(f"r{r}" for r in sorted(set(verified[name])))
            if name in verified
            else "local"
        )
        # every rows-only query carries an adjudicated impossibility
        # waiver in COVERAGE.md (q88 template; r10 verdict item 4)
        oracle = (
            "sql"
            if q.oracle is not None
            else "rows-only ([waiver](COVERAGE.md))"
        )
        lines.append(
            f"| {name} | {src}:{line} | {', '.join(q.tags)} |"
            f" {oracle} | {rounds} |"
        )
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    out = os.path.join(ROOT, "QUERIES.md")
    with open(out, "w") as fh:
        fh.write(generate())
    print(f"wrote {out}")
