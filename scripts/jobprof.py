"""Per-job profile of one registered query — names, durations, stages.

Runs the named query once warm (after an untimed pass) under a job group
and dumps every Spark job the pass launched via the UI REST API:
job name/description, duration, stage count — the attribution layer the
bench's bare job COUNT lacks (which jobs are broadcast builds vs
checkpoint pins vs the noop write).

Usage: python scripts/jobprof.py q141_hits [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cyber_etl_spark.plans import QUERIES
    from cyber_etl_spark.session import get_spark
    from cyber_etl_spark.sources import load_all

    spark = get_spark(
        "jobprof",
        **{"spark.ui.retainedJobs": "100000", "spark.ui.enabled": "true"},
    )
    load_all(spark, sf_dir)["lineitem"].groupBy("l_returnflag").count().count()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for n in names:
        QUERIES[n].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm

    base = sc.uiWebUrl
    app_id = sc.applicationId
    for n in names:
        group = f"prof:{n}"
        sc.setJobGroup(group, n)
        t0 = time.perf_counter()
        QUERIES[n].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        ids = set(tracker.getJobIdsForGroup(group))
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/jobs") as r:
            alljobs = json.load(r)
        rows = [j for j in alljobs if j["jobId"] in ids]
        rows.sort(key=lambda j: j["jobId"])
        print(f"\n=== {n}: {dt:.3f}s, {len(rows)} jobs ===")
        for j in rows:
            try:
                sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                sec = time.mktime(comp) - time.mktime(sub)
            except Exception:
                sec = -1.0
            name = j.get("name", "")[:110]
            stages = j.get("numTasks", 0)
            print(f"  [{j['jobId']:5d}] {sec:5.1f}s t={stages:3d} {name}")


if __name__ == "__main__":
    main()
