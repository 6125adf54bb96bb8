"""Solo A/B of the q48 weighted-pagerank loop (r5 verdict item 2).

Measures, min-of-3 in ONE process at sf0.1, the 10-superstep weighted PR
loop under three physical strategies for the per-superstep contribs
aggregation + rank join:

  a) current   — contribs groupBy at session shuffle width (32), rank
                 join wrapped in _nw(w) (plan-local coalesce)
  b) repart    — contribs repartition(w, "to") before the groupBy, so
                 the agg's exchange itself is w-wide AND keyed (the
                 join reuses it); no _nw
  c) nw_after  — _nw applied after the rank projection instead of
                 around the join (r4-style placement)
  d) ck2       — every-OTHER-superstep pinning on the broadcast path:
                 odd supersteps (and the last) localCheckpoint the rank
                 vector, even ones re-broadcast the one-level-deep
                 uncheckpointed chain — probes whether halving the
                 checkpoint jobs beats paying one nested re-broadcast
                 per gap

Usage: python scripts/ab_q48.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cyber_etl_spark.graph import algorithms as ga
from cyber_etl_spark.graph.builder import co_supply_edges_weighted
from cyber_etl_spark.session import get_spark


def loop(edges, mode: str, iterations: int = 10, damping: float = 0.85):
    """The pagerank() loop body with the variant knob; artifact builds
    (deg/eshare) go through the same _derived memo, so every variant
    times ONLY the superstep loop."""
    e = ga._derived(
        edges,
        ("wedges", "weight"),
        lambda: edges.select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        ).localCheckpoint(eager=True),
    )
    deg = ga._derived(
        edges,
        ("deg", "weight"),
        lambda: e.groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("deg"))
        .localCheckpoint(eager=True),
    )
    n = deg.count()
    deg = ga._derived(
        edges, ("deg-compact", "weight"), lambda: ga._compact(deg, n).localCheckpoint(eager=True)
    )
    m = ga._derived(edges, ("ecount", "weight"), lambda: e.count())
    eshare = ga._derived(
        edges,
        ("eshare", "weight", "pagerank"),
        lambda: ga._compact(
            e.join(deg, e.src == deg.id).select(
                "src", "dst", (F.col("w") / F.col("deg")).alias("share")
            ),
            m,
        ).localCheckpoint(eager=True),
    )
    ranks = deg.select("id", F.lit(1.0 / n).alias("rank"))
    base_col = F.lit((1.0 - damping) / n)
    w = ga._width(m)
    for _ in range(iterations):  # noqa: B007
        r = F.broadcast(ranks)
        contribs = eshare.join(r, eshare.src == r.id).select(
            F.col("dst").alias("to"), (F.col("rank") * F.col("share")).alias("c")
        )
        if mode == "repart":
            contribs = contribs.repartition(w, "to").groupBy("to").agg(F.sum("c").alias("mass"))
        else:
            contribs = contribs.groupBy("to").agg(F.sum("c").alias("mass"))
        joined = deg.join(contribs, deg.id == contribs["to"], "left")
        if mode == "current":
            joined = ga._nw(joined, w)
        ranks = joined.select(
            "id",
            (base_col + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))).alias("rank"),
        )
        if mode == "nw_after":
            ranks = ga._nw(ranks, w)
        if mode == "ck2":
            # broadcast path with every-OTHER-superstep pinning: one
            # nested re-broadcast per gap instead of a checkpoint job
            if _ % 2 == 1 or _ == iterations - 1:
                ranks = ga._compact(ranks, n).localCheckpoint(eager=True)
        else:
            ranks = ga._compact(ranks, n).localCheckpoint(eager=True)
    return ranks


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-q48")
    edges = co_supply_edges_weighted(spark, sf)
    # warm: build all memoized artifacts + JIT once, untimed
    loop(edges, "current", iterations=2).count()
    modes = ("current", "repart", "nw_after", "ck2")
    times: dict[str, list] = {m: [] for m in modes}
    for rep in range(4):  # round-robin: warm-up drift spreads evenly
        for mode in modes:
            t0 = time.monotonic()
            out = loop(edges, mode)
            cnt = out.count()
            times[mode].append(time.monotonic() - t0)
    for mode in modes:
        print(f"{mode:10s} min-of-4 = {min(times[mode]):.3f}s  (all: {['%.3f' % t for t in times[mode]]})", flush=True)
    print({m: round(min(t), 3) for m, t in times.items()})


if __name__ == "__main__":
    main()
