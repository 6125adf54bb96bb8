"""Shard the pytest suite across N processes (default 4) — each shard gets
its own JVM (8 Spark threads: 4 x 8 = the box's 32 cores), its own Spark
warehouse dir, and a static file assignment balanced by the r9 durations
profile.  The plain `python -m pytest tests/ -x -q` stays the canonical
gate; this is the fast dev loop (~4-5 min instead of ~10).

Usage: python scripts/partest.py [n_shards]
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# heaviest files first (r9 --durations profile); greedy longest-processing-
# time assignment balances shard wall time
_WEIGHTS = {
    "test_plans.py": 180,
    "test_oracle.py": 80,
    "test_streaming.py": 60,
    "test_pipeline.py": 40,
    "test_ann.py": 40,
    "test_properties.py": 40,
    "test_graph.py": 35,
    "test_analytics.py": 30,
    "test_scale_ops.py": 25,
    "test_golden_fixtures.py": 20,
    "test_integration.py": 15,
    "test_feeds.py": 15,
    "test_multimodal.py": 15,
}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    files.sort(key=lambda f: -_WEIGHTS.get(f, 5))
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0] * n
    for f in files:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += _WEIGHTS.get(f, 5)

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "8")
        env["SPARK_GRAFT_WAREHOUSE"] = f"/tmp/spark-graft-wh-{os.getpid()}-{i}"
        procs.append(
            (
                i,
                shard,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", "--no-header",
                     *[f"tests/{f}" for f in shard]],
                    cwd=REPO,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.DEVNULL,
                    text=True,
                ),
            )
        )
    rc = 0
    for i, shard, p in procs:
        out, _ = p.communicate()
        tail = [l for l in out.strip().splitlines() if l][-1:]
        print(f"shard {i} ({len(shard)} files) rc={p.returncode}: {tail[0] if tail else ''}")
        if p.returncode:
            rc = 1
            print(out[-4000:])
    print(f"total: {time.time() - t0:.1f}s")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
