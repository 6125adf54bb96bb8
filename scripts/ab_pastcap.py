"""Past-the-broadcast-cap A/B for the superstep loop family (r12 verdict
item #5): force `_BCAST_MAX_ROWS = 0` so every loop takes its SHUFFLE
path — the plan 100 TB actually runs — and compare seconds/jobs against
the default broadcast path at sf0.1.

The broadcast-path optimizations of r12/r13 (dropped distincts, scoped
AQE-off, merged-state pins) are all gated on the cap, so this run
verifies the past-cap plan still matches its r11 shape: no regression
means the at-scale path was not damaged by the under-cap refactors.

Interleaved min-of-3 per mode (the r6 A/B discipline).  Results are
printed and appended to plans/r13/pastcap_ab.json.

Usage: python scripts/ab_pastcap.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_UNDER_TEST = [
    "q27_dedup_clusters",        # connected_components
    "q30_communities",           # LPA
    "q129_sssp",                 # Bellman-Ford
    "q412_luby_mis",             # Luby MIS
    "q162_betweenness_sampled",  # Brandes sweeps
    "q70_bfs_hops",              # BFS
    "q28_pagerank",              # rank loop
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.session import get_spark
    from cyber_etl_spark.sources import load_all
    import cyber_etl_spark.graph.algorithms as alg

    names = [n for n in QUERIES_UNDER_TEST if n in QUERIES]
    spark = get_spark("ab-pastcap", **{"spark.ui.retainedJobs": "100000"})
    load_all(spark, sf_dir)["lineitem"].groupBy("l_returnflag").count().count()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    default_cap = alg._BCAST_MAX_ROWS
    for n in names:  # warm shared artifacts + codegen
        QUERIES[n].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    res: dict[tuple, tuple] = {}
    for rep in range(3):
        for mode, cap in (("bcast", default_cap), ("pastcap", 0)):
            alg._BCAST_MAX_ROWS = cap
            try:
                for n in names:
                    g = f"{mode}:{n}:{rep}"
                    sc.setJobGroup(g, g)
                    t0 = time.perf_counter()
                    QUERIES[n].builder(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    nj = len(tracker.getJobIdsForGroup(g))
                    k = (n, mode)
                    if k not in res or dt < res[k][0]:
                        res[k] = (dt, nj)
                    print(f"  rep{rep} {mode:8s} {n}: {dt:.3f}s jobs={nj}",
                          flush=True)
            finally:
                alg._BCAST_MAX_ROWS = default_cap

    out = {}
    for n in names:
        b, p = res[(n, "bcast")], res[(n, "pastcap")]
        out[n] = {"bcast_sec": round(b[0], 3), "bcast_jobs": b[1],
                  "pastcap_sec": round(p[0], 3), "pastcap_jobs": p[1]}
        print(f"{n:30s} bcast {b[0]:.2f}s/{b[1]}j   pastcap {p[0]:.2f}s/{p[1]}j")
    rec_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13", "pastcap_ab.json")
    os.makedirs(os.path.dirname(rec_path), exist_ok=True)
    with open(rec_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"record -> {rec_path}")


if __name__ == "__main__":
    main()
