"""Distributed minimum spanning forest — Borůvka supersteps.

The spanning-tree family the engine lacked: given edges carrying a
STRICT total order (an int order key ``d`` with (d, src, dst) unique —
the caller encodes max-spanning as d = −w), compute the unique minimum
spanning forest.  Borůvka is the distributed-native MST algorithm:
every round, each component selects its minimum crossing edge (all such
edges are MSF edges by the cut property; uniqueness of the total order
makes the forest unique), the selected pointer graph is contracted by
pointer doubling, and the component count at least HALVES — so the
superstep count is log₂(V) regardless of data size, each round a pair
of joins plus small-table pointer jumps.

Scale contract: rounds run distributed until the component count drops
under ``tail_cap``; the remainder — per-component-pair minimum edges of
a ≤ tail_cap-node contracted graph, a summary whose size is bounded by
CONSTRUCTION — is finished with driver-side union-find under a
limit-capped collect with a contract error (the statcat bounded-
artifact serving rule: real engines finish tiny MST tails locally too).
At 100 TB only the round count grows (log V), never a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quantiles import _local_values_df


def _pin(df: DataFrame, w: int = 8, eager: bool = True) -> DataFrame:
    """Checkpoint a loop-state table, first collapsing its stage-terminal
    shuffle to ``w`` reduce tasks (the graph/algorithms._nw rule: pin
    jobs bypass AQE, so a 1000-row pointer table would otherwise run 32
    near-empty reduce tasks per superstep; when the exchange already has
    fewer partitions than ``w`` the coalesce is a no-op, so
    cluster-scale width is untouched).  Measured a wash at sf0.1 (the
    loop is job-floor-bound, ~7 jobs/round), kept for the reduce-task
    floor it removes on wider sessions.  ``eager=False`` when the caller
    immediately counts the result — the count is then the action that
    materializes the pin, one job instead of two (the bfs_distances r12
    pattern)."""
    return df.coalesce(w).localCheckpoint(eager=eager)


def _contract(
    edges: DataFrame, tail_cap: int, max_rounds: int
) -> tuple[DataFrame, list[DataFrame], list, dict]:
    """Run Borůvka rounds until ≤ tail_cap components remain, then
    union-find the contracted remainder on the driver.

    Returns ``(comp, selected, picked, parent)``: the node→component
    table after the distributed rounds, the per-round selected-edge
    frames, the (src, dst) edges the driver tail picked, and the final
    union-find parent map over tail component ids (callers compose
    these into a forest — :func:`boruvka_msf` — or a component labeling
    — :func:`boruvka_components`)."""
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    comp = _pin(nodes.select("n", F.col("n").alias("c")), eager=False)
    selected: list[DataFrame] = []
    rounds_done = 0
    # Upper bound on the number of components that still carry a CROSSING
    # edge.  The driver tail's C(tail_cap, 2) contract only involves such
    # components (rem keeps ca != cb rows only), so the loop may hand off
    # as soon as the ACTIVE count fits — inactive (finished) components
    # never reappear.  Tracking the bound this way replaces the former
    # per-round `comp.select("c").distinct().count()` (a full extra
    # shuffle job per superstep) with a near-free count of the pinned
    # per-component min-edge table, and skips the final round's whole
    # contraction (r12 optimization; forest/partition output is invariant
    # to WHEN the handoff happens — both paths compute the unique MSF).
    n_active_bound = comp.count()
    # crossing-edge table of the CURRENT comp, when one is already pinned
    # (mid-loop handoff) — the tail reuses it instead of re-running the
    # two comp joins
    cross: DataFrame | None = None

    for _ in range(max_rounds):
        if n_active_bound <= tail_cap:
            break
        ca = comp.select(F.col("n").alias("src"), F.col("c").alias("ca"))
        cb = comp.select(F.col("n").alias("dst"), F.col("c").alias("cb"))
        e2 = _pin(
            edges.join(ca, "src").join(cb, "dst").where(F.col("ca") != F.col("cb"))
        )
        st = F.struct("d", "src", "dst", "ca", "cb").alias("e")
        cand = e2.select(F.col("ca").alias("c"), st).unionAll(
            e2.select(F.col("cb").alias("c"), st)
        )
        mine = _pin(cand.groupBy("c").agg(F.min("e").alias("e")), eager=False)
        cross = e2
        n_active = mine.count()  # post-pin count: partition-size sum only
        if n_active <= tail_cap:
            # the remainder fits the tail contract NOW — the driver
            # union-find picks the exact same forest edges further
            # rounds would (Kruskal over per-pair min edges of the
            # contracted graph == remaining Borůvka rounds)
            break
        selected.append(mine.select("e.src", "e.dst").distinct())
        ptr = mine.select(
            "c",
            F.when(F.col("c") == F.col("e.ca"), F.col("e.cb"))
            .otherwise(F.col("e.ca"))
            .alias("p"),
        )
        # break the guaranteed 2-cycles (both endpoints of a mutually-
        # minimal edge point at each other) at the smaller label
        a, b = ptr.alias("a"), ptr.alias("b")
        cur = _pin(
            a.join(b, F.col("a.p") == F.col("b.c"), "left").select(
                F.col("a.c").alias("c"),
                F.when(
                    (F.col("b.p") == F.col("a.c")) & (F.col("a.c") < F.col("a.p")),
                    F.col("a.c"),
                )
                .otherwise(F.col("a.p"))
                .alias("p"),
            )
        )
        while True:
            x, y = cur.alias("x"), cur.alias("y")
            unstable = (
                x.join(y, F.col("x.p") == F.col("y.c"))
                .where(F.col("y.p") != F.col("x.p"))
                .count()
            )
            if unstable == 0:
                break
            cur = _pin(
                x.join(y, F.col("x.p") == F.col("y.c"), "left").select(
                    F.col("x.c").alias("c"),
                    F.coalesce(F.col("y.p"), F.col("x.p")).alias("p"),
                )
            )
        lbl = cur.select(F.col("c").alias("_old"), F.col("p").alias("_new"))
        comp = _pin(
            comp.join(lbl, comp.c == F.col("_old"), "left").select(
                "n", F.coalesce(F.col("_new"), F.col("c")).alias("c")
            )
        )
        cross = None  # comp changed — the pinned crossing table is stale
        # each active component merged with at least one other this
        # round, so the next round's active count is at most half
        n_active_bound = n_active // 2
        rounds_done += 1
        if rounds_done % 2 == 0:
            # each round chains ~4 pins that reference their predecessors
            # multiple times — sever the plan before the chain reaches
            # the ~10-level exponential-job-cost wall (_plan_barrier's
            # measured finding)
            from ..graph.algorithms import _plan_barrier

            comp = _plan_barrier(comp)
    else:
        raise RuntimeError(
            f"boruvka_msf: component count still above tail_cap={tail_cap} "
            f"after {max_rounds} rounds — raise max_rounds (components at "
            "least halve per round, so this indicates a logic error)"
        )

    # bounded tail: minimum edge per unordered component pair of the
    # ≤ tail_cap-node contracted graph, finished with driver union-find
    if cross is not None:
        crossing = cross
    else:
        ca = comp.select(F.col("n").alias("src"), F.col("c").alias("ca"))
        cb = comp.select(F.col("n").alias("dst"), F.col("c").alias("cb"))
        crossing = (
            edges.join(ca, "src").join(cb, "dst").where(F.col("ca") != F.col("cb"))
        )
    rem = (
        crossing
        .groupBy(
            F.least("ca", "cb").alias("pa"), F.greatest("ca", "cb").alias("pb")
        )
        .agg(F.min(F.struct("d", "src", "dst")).alias("e"))
        .select("pa", "pb", "e.d", "e.src", "e.dst")
    )
    cap = tail_cap * (tail_cap - 1) // 2
    rows = rem.limit(cap + 1).collect()
    if len(rows) > cap:
        raise RuntimeError(
            f"boruvka_msf: contracted tail exceeds its by-construction "
            f"bound of {cap} component pairs — tail_cap contract violated"
        )
    parent: dict[int, int] = {}

    def _find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    picked: list[tuple[int, int]] = []
    for r in sorted(rows, key=lambda r: (r.d, r.src, r.dst)):
        # connectivity lives at COMPONENT granularity — union the pair's
        # component ids, record the winning (src, dst) node edge
        rs, rd = _find(int(r.pa)), _find(int(r.pb))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
            picked.append((int(r.src), int(r.dst)))
    # resolve every tail component to its final root (path-compress all)
    for r in rows:
        _find(int(r.pa))
        _find(int(r.pb))
    roots = {c: _find(c) for c in list(parent)}
    return comp, selected, picked, roots


def boruvka_msf(
    edges: DataFrame, tail_cap: int = 128, max_rounds: int = 64
) -> DataFrame:
    """Minimum spanning forest of ``edges(src, dst, d)``.

    ``(d, src, dst)`` must be a strict total order (distinct rows with
    src < dst); the MSF is then unique, so the result is deterministic
    regardless of partitioning.  Returns the selected ``(src, dst)``
    pairs.

    Each superstep: (1) crossing edges under current labels, (2) per-
    component lexicographic-min edge via ``F.min`` on a
    (d, src, dst, ca, cb) struct — map-side combinable, (3) pointer
    graph contraction: 2-cycles broken at the smaller label, then
    pointer doubling until stable (checked per jump — chains of
    strictly-decreasing min-edge weights can be long in adversarial
    inputs, so the jump count is convergence-driven, not fixed).
    Superstep state (comp, pointer tables) is checkpointed every round
    — the force-broadcast/loop pin rule — with a full plan barrier
    every 2 rounds (the _plan_barrier exponential-chain finding).
    """
    spark = edges.sparkSession
    _, selected, picked, _ = _contract(edges, tail_cap, max_rounds)
    tail = _local_values_df(
        spark, [list(t) for t in sorted(picked)], "src long, dst long"
    )
    out = tail
    for s in selected:
        out = out.unionAll(s)
    return out


def boruvka_components(
    edges: DataFrame, tail_cap: int = 128, max_rounds: int = 64
) -> DataFrame:
    """Connected components via Borůvka contraction → (n, component).

    The structural alternative to min-label propagation for HIGH-
    DIAMETER graphs: label spreading needs O(diameter) supersteps (a
    spanning forest's diameter can be O(V) — q405's cut forest took 20+
    min-label rounds), while contraction HALVES the component count
    every round regardless of diameter, so the loop is log₂(V) rounds
    flat.  Edge order is irrelevant for connectivity — any strict total
    order drives the same partition of nodes — so the caller passes
    bare (src, dst) pairs and the edge itself serves as the order key.

    Component ids are opaque representatives (a contraction root is the
    smaller endpoint of its mutual min edge, not necessarily the
    component minimum) — consumers aggregate over them (sizes, counts);
    they must not interpret the id.  The ≤ tail_cap-component remainder
    is resolved by the same driver union-find as the forest, shipped
    back as a broadcast relabel map."""
    spark = edges.sparkSession
    e3 = edges.select("src", "dst", F.lit(0).cast("long").alias("d"))
    comp, _, _, roots = _contract(e3, tail_cap, max_rounds)
    if roots:
        rmap = _local_values_df(
            spark, [list(t) for t in sorted(roots.items())], "_old long, _root long"
        )
        comp = comp.join(
            F.broadcast(rmap), comp.c == F.col("_old"), "left"
        ).select("n", F.coalesce(F.col("_root"), F.col("c")).alias("component"))
    else:
        comp = comp.select("n", F.col("c").alias("component"))
    return comp.withColumnRenamed("n", "id")
