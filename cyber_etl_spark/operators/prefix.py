"""Distributed running totals and global ranks (two-pass range-partition
prefix sums).

``Window.partitionBy(low_cardinality_key).orderBy(...)`` with an
unbounded-preceding frame funnels EVERY row of a key through ONE window
task — the same single-buffer hazard class as the in-memory
``percentile`` aggregate the r5 verdict flagged (correct and fast at
sf0.1, a single-reducer sort-and-scan of a whole corpus at 100 TB).
Spark only pushes the rank cut map-side for top-k windows
(``WindowGroupLimit``); a full-output cumsum/rank window has no such
rescue.  This kernel computes the same running totals / global row
numbers with per-*partition* memory and parallelism ``num_partitions``
regardless of group cardinality:

1. **Range-partition** the rows by ``(*group_cols, *order_cols)`` with
   Spark's sampling range partitioner — each group's rows land across
   partitions in ascending order — and pin the result
   (``localCheckpoint``) so both passes read the shuffle output once.
2. **Partials** — one tiny ``groupBy(partition_id, *group_cols)``
   aggregate (|partitions| × |groups| rows).  A window cumsum over THIS
   control table (bounded, never the data) turns per-partition sums
   into exclusive prefix offsets, plus each group's grand total.
3. **Local pass** — broadcast-join the offsets back on
   ``(partition_id, *group_cols)`` and run the cumsum/row_number window
   partitioned by ``(partition_id, *group_cols)``: every window task
   holds at most one range-partition of one group, and
   ``offset + local value`` is the exact global result.

Everything stays JVM-side (no Python, no driver-side collect): the
offsets table is a broadcast boundary table exactly like a quantile or
bin-edge table.  Used by q160 (per-source token cumsum) and q63
(percent_rank / cume_dist / ntile from global row numbers);
``tests/test_plans.py`` bans full-output windows partitioned only by
low-cardinality keys from every registered plan so the hazard cannot
creep back.

``order_cols`` must be a total order within each group (append a unique
tiebreak column) — otherwise tied rows may split across partitions and
the local sort order is ambiguous.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ranged_partials(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    num_partitions: int | None,
    pin_input: bool = False,
    combine: str = "sum",
) -> tuple[DataFrame, DataFrame]:
    """Range-partition ``df`` and derive the (pid, group) offset table.

    ``partial_aggs`` is a list: ONE range shuffle and ONE control table
    serve any number of aligned prefix aggregates (single-aggregate
    kernels pass a 1-list).  Returns ``(ranged, offsets)`` where
    ``ranged`` carries a ``_pid`` column and ``offsets`` has one row
    per (``_pid``, group) with ``_off_i`` (exclusive prefix of the
    i-th aggregate over ascending pid within the group) and ``_tot_i``
    (the group's grand total of it).
    """
    spark = df.sparkSession
    group_cols = list(group_cols)
    partial_aggs = list(partial_aggs)
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # repartitionByRange SAMPLES its child to pick boundaries, so the
    # input projection executes twice (sampling pass + exchange).  For a
    # cheap scan that is fine; when the projection is expensive (e.g.
    # q160's full-text tokenize), pin_input materializes it once and
    # both passes read the checkpoint.
    if pin_input:
        df = df.localCheckpoint(eager=True)
    ranged = (
        df.repartitionByRange(num_partitions, *group_cols, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # control-table windows: |partitions| × |groups| rows, never the data.
    # The group columns are re-aliased with a `_gp_` prefix here so the
    # plan-audit test (tests/test_plans.py) can tell a bounded control
    # window from a full-data window over the same low-cardinality key —
    # and still fail if a query reverts to the naive single-task window.
    k = len(partial_aggs)
    partials = (
        ranged.groupBy("_pid", *group_cols)
        .agg(*[a.alias(f"_psum_{i}") for i, a in enumerate(partial_aggs)])
        .select(
            "_pid",
            *[F.col(c).alias(f"_gp_{c}") for c in group_cols],
            *[f"_psum_{i}" for i in range(k)],
        )
    )
    gp_cols = [f"_gp_{c}" for c in group_cols]
    if not gp_cols:
        # the GLOBAL case still runs its control window over the tiny
        # partials table — give it a constant `_gp_` partition column so
        # the plan audit can tell it from a real whole-table window
        partials = partials.withColumn("_gp__global", F.lit(0))
        wg = Window.partitionBy("_gp__global")
    else:
        wg = Window.partitionBy(*gp_cols)
    agg_fn = F.sum if combine == "sum" else F.max
    wexcl = wg.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # ordered by _pid (harmless under the unbounded frame) so the spec
    # keeps a `_pid` marker even when Catalyst folds the constant
    # `_gp__global` partition column away (global case) — the plan
    # audit identifies kernel windows by those markers
    wall = wg.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # _off stays RAW (NULL when no prior partition carries mass): each
    # caller applies its own identity — 0 for counts, NULL-propagating
    # sum semantics for running_total, greatest() for running_max.
    # Offset-side columns are re-aliased (_opid/_og_*) so the join back
    # onto `ranged` (its own ancestor) is unambiguous AND can use
    # null-safe equality on group keys — Window.partitionBy puts
    # NULL-keyed rows in their own partition, and a plain equi-join
    # would silently drop them (review r7 finding).
    offsets = partials.select(
        F.col("_pid").alias("_opid"),
        *[F.col(g).alias(f"_og_{c}") for g, c in zip(gp_cols, group_cols)],
        *[agg_fn(f"_psum_{i}").over(wexcl).alias(f"_off_{i}") for i in range(k)],
        *[agg_fn(f"_psum_{i}").over(wall).alias(f"_tot_{i}") for i in range(k)],
    )
    return ranged, offsets


def _join_offsets(
    ranged: DataFrame, offsets: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Broadcast-join the offset table back onto the ranged data,
    null-safe on the group keys; drops the offset-side key columns."""
    cond = F.col("_pid") == F.col("_opid")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_og_{c}"))
    return ranged.join(F.broadcast(offsets), cond).drop(
        "_opid", *[f"_og_{c}" for c in group_cols]
    )


def _local_window(group_cols: Sequence[str], order_cols: Sequence[str]):
    """The partition-local cumulative window every kernel shares."""
    return (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def running_total(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    out_col: str = "running_total",
    num_partitions: int | None = None,
    pin_input: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """``df`` + ``out_col`` = inclusive running sum of ``value_col`` over
    ``order_cols`` within each group — the distributed twin of
    ``SUM(v) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)``
    that never funnels a whole group through one task (NULL semantics
    included: the result is NULL only while no non-null value has been
    seen in the group, exactly like the window SUM).  ``pin_input``:
    materialize the input once when its projection is expensive (the
    range partitioner's sampling pass would otherwise recompute it).
    ``total_col``: also expose each group's grand total — it already
    sits in the control table, so asking for it is free (callers that
    need totals should NOT re-aggregate the data; review r7)."""
    group_cols = list(group_cols)
    ranged, offsets = _ranged_partials(
        df, group_cols, order_cols, [F.sum(value_col)], num_partitions,
        pin_input,
    )
    if total_col is None:
        offsets = offsets.drop("_tot_0")
    joined = _join_offsets(ranged, offsets, group_cols)
    local = F.sum(value_col).over(_local_window(group_cols, order_cols))
    run = F.when(
        local.isNull() & F.col("_off_0").isNull(), F.lit(None)
    ).otherwise(
        F.coalesce(local, F.lit(0)) + F.coalesce(F.col("_off_0"), F.lit(0))
    )
    out = joined.withColumn(out_col, run).drop("_pid", "_off_0")
    return out.withColumnRenamed("_tot_0", total_col) if total_col else out


def running_totals(
    df: DataFrame,
    specs: Sequence[tuple[str, str]],
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    num_partitions: int | None = None,
    pin_input: bool = False,
) -> DataFrame:
    """Several inclusive running sums in ONE range-partition pass.

    ``specs`` is a sequence of ``(value_col, out_col)`` pairs; the data
    is range-partitioned once and every prefix sum shares the same
    control table (one row per (pid, group) carrying all partial sums).
    This is the kernel for statistics that need two aligned prefixes of
    the SAME total order — e.g. average precision needs the running
    positive count AND the running row count (the global rank) at every
    row; two separate :func:`running_total` calls would pay the range
    shuffle and its sampling pass twice and could even disagree on
    partition boundaries.

    Value columns must be non-null numerics (the simple ``local + off``
    identity is used, not the NULL-propagating window-SUM emulation of
    :func:`running_total` — callers with NULL semantics needs should
    coalesce first)."""
    specs = list(specs)
    group_cols = list(group_cols)
    ranged, offsets = _ranged_partials(
        df, group_cols, order_cols, [F.sum(v) for v, _ in specs],
        num_partitions, pin_input,
    )
    offsets = offsets.drop(*[f"_tot_{i}" for i in range(len(specs))])
    joined = _join_offsets(ranged, offsets, group_cols)
    wl = _local_window(group_cols, order_cols)
    out = joined
    for i, (v, out_col) in enumerate(specs):
        out = out.withColumn(
            out_col,
            F.sum(v).over(wl) + F.coalesce(F.col(f"_off_{i}"), F.lit(0)),
        )
    return out.drop("_pid", *[f"_off_{i}" for i in range(len(specs))])


def global_ranks(
    df: DataFrame,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    rn_col: str = "rn",
    total_col: str = "n",
    num_partitions: int | None = None,
    pin_input: bool = False,
) -> DataFrame:
    """``df`` + global 1-based row number over ``order_cols`` within each
    group, plus the group size — the building block for every
    distributional window (percent_rank = (rn-1)/(n-1), cume_dist = rn/n
    under a total order, ntile from (rn, n) bucket arithmetic) without a
    per-group single-task sort.

    ``pin_input``: repartitionByRange SAMPLES its child to pick
    boundaries, so an expensive input plan (a join+aggregate, a
    tokenize) executes twice; pinning materializes it once (one
    blocking job — measure per case, the r10 rule)."""
    group_cols = list(group_cols)
    ranged, offsets = _ranged_partials(
        df, group_cols, order_cols, [F.count(F.lit(1))], num_partitions,
        pin_input=pin_input,
    )
    joined = _join_offsets(ranged, offsets, group_cols)
    wl = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    return (
        joined.withColumn(
            rn_col,
            F.row_number().over(wl) + F.coalesce(F.col("_off_0"), F.lit(0)),
        )
        .withColumnRenamed("_tot_0", total_col)
        .drop("_pid", "_off_0")
    )


def ntile_expr(rn: Column, n: Column, k: int) -> Column:
    """Spark/ANSI ``ntile(k)`` from a global row number and group size:
    the first ``n % k`` buckets hold ``n div k + 1`` rows, the rest
    ``n div k`` — identical bucketing to the built-in window function,
    computable row-local once (rn, n) are known.

    Grid budget: true integer `div` (call_function) on row counts —
    fits int64 to ~1e18 rows.  The earlier floor(n / k) form was double
    division, whose truncation flips at exact multiples past 2^53
    (~9e15 rows; measured: floor(9007199254740995/4) = ...249 vs exact
    ...248) — the q201 class, caught by the r10 review."""

    def idiv(a: Column, b: Column) -> Column:
        """Integer `div` (see the enclosing grid budget: row counts)."""
        return F.call_function("div", a, b)

    base = idiv(n, F.lit(k))
    rem = n % k
    big = base + 1
    # n < k ⇒ rem = n and big = 1, so rn <= rem*big always holds and the
    # otherwise-branch (div by base = 0) is never evaluated (lazy CASE)
    return (
        F.when(rn <= rem * big, idiv(rn - 1, big) + 1)
        .otherwise(rem + idiv(rn - 1 - rem * big, base) + 1)
        .cast("int")
    )


def running_max(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    out_col: str = "running_max",
    num_partitions: int | None = None,
    inclusive: bool = True,
    pin_input: bool = False,
) -> DataFrame:
    """``df`` + ``out_col`` = running MAX of ``value_col`` over
    ``order_cols`` within each group — same two-pass shape as
    :func:`running_total` with max as the (associative) combine.

    ``inclusive=False`` gives the EXCLUSIVE prefix max (all rows
    STRICTLY before the current one; NULL for each group's first row) —
    the building block of the sort-based 2-D skyline: after sorting by
    the first objective, a row is Pareto-optimal iff its second
    objective exceeds the exclusive prefix max."""
    group_cols = list(group_cols)
    ranged, offsets = _ranged_partials(
        df, group_cols, order_cols, [F.max(value_col)], num_partitions,
        pin_input, combine="max",
    )
    joined = _join_offsets(ranged, offsets.drop("_tot_0"), group_cols)
    end = Window.currentRow if inclusive else -1
    wl = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = F.max(value_col).over(wl)
    return joined.withColumn(out_col, F.greatest(local, F.col("_off_0"))).drop(
        "_pid", "_off_0"
    )
