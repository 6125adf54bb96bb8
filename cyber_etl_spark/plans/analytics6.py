"""Round-9 session-2 analytics family: time-weighted aggregation,
exact proportional allocation, cross-source distribution normalization
and experiment-design balance auditing — the operators a measurement /
experimentation platform runs next to the q266+ business suite and the
q292/q294 A/B family.

Cross-engine exactness follows the module rules established in
analytics2-5: integer sufficient statistics widened to
DECIMAL(38,0)/HUGEINT, half-away integer-division rounding (`_ha6`)
for exact rationals, micro-unit grids sized so every pre-sqrt double is
an exact integer below 2^53, and md5-digit determinism for every
pseudo-random draw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import read_table
from .analytics2 import _ha6_sql
from .analytics5 import _md5_mod, _md5_mod_sql
from .registry import query


@query(
    "q332_time_weighted_value",
    oracle=f"""
    WITH x AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS xu
      FROM events WHERE value IS NOT NULL
    ),
    w AS (
      SELECT event_type, xu, ts, event_id,
             lead(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS nts
      FROM x
    ),
    iv AS (
      SELECT event_type, xu, epoch_us(nts) - epoch_us(ts) AS dt
      FROM w WHERE nts IS NOT NULL
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n_intervals,
             SUM(CAST(dt AS HUGEINT)) AS den,
             SUM(CAST(xu AS HUGEINT) * dt) AS num,
             SUM(CAST(xu AS HUGEINT)) AS sxu
      FROM iv GROUP BY 1
    )
    SELECT event_type,
           CAST(n_intervals AS BIGINT) AS n_intervals,
           CAST(den // 1000000 AS BIGINT) AS held_seconds,
           {_ha6_sql("num", "den * 1000000")} AS twap,
           {_ha6_sql("sxu", "n_intervals * CAST(1000000 AS HUGEINT)")}
             AS start_mean
    FROM s ORDER BY event_type
    """,
    tags=("timeseries", "window", "twap"),
)
def q332_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per event type: each event's
    `value` is held until the user's NEXT event of the same type, so an
    event that stood for a week weighs 7×86400 times one that was
    replaced a second later — the correct average for state-like
    metrics (plan price, position size, device setting), where the
    row-weighted mean (published alongside as `start_mean`) over-counts
    churny users.

    Scale plan: the hold interval is one lead() over the HIGH-cardinality
    (user_id, event_type) key (never a per-type global order); the rest
    is a single map-side-combinable moment aggregate per type.
    Exactness: values snap to 1e-6-unit integers, durations are exact
    integer microseconds, so num = Σ value·dt and den = Σ dt are exact
    DECIMAL(38,0) sums and both published means are half-away integer
    rationals (`_ha6` idiom).  The DECIMAL(38,0) width bounds num at
    ~1e32 for this corpus; at 100 TB the duration grid should coarsen
    to seconds (num scales linearly with it)."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("xu"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    iv = (
        x.withColumn("nts", F.lead("ts").over(w))
        .where(F.col("nts").isNotNull())
        .select(
            "event_type",
            "xu",
            F.expr("unix_micros(nts) - unix_micros(ts)").alias("dt"),
        )
    )
    s = iv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("dt").cast("decimal(38,0)")).alias("den"),
        F.sum(F.expr("CAST(xu AS DECIMAL(38,0)) * dt")).alias("num"),
        F.sum(F.col("xu").cast("decimal(38,0)")).alias("sxu"),
    )
    return s.select(
        "event_type",
        F.col("n_intervals").cast("long").alias("n_intervals"),
        F.expr("CAST(den div 1000000 AS BIGINT)").alias("held_seconds"),
        F.expr(
            "CAST((2*num*1000000 + den*1000000) div (2*den*1000000)"
            " AS DOUBLE) / 1000000"
        ).alias("twap"),
        F.expr(
            "CAST((2*sxu*1000000 + n_intervals*CAST(1000000 AS DECIMAL(38,0)))"
            " div (2*n_intervals*CAST(1000000 AS DECIMAL(38,0))) AS DOUBLE)"
            " / 1000000"
        ).alias("start_mean"),
    ).orderBy("event_type")


@query(
    "q333_budget_allocation",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_nationkey AS nk, n.n_name AS nation,
             SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT)) AS rc
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    t AS (SELECT SUM(rc) AS total FROM rev),
    a AS (
      SELECT nk, nation, rc, total,
             (10000 * rc) // total AS base,
             10000 * rc - ((10000 * rc) // total) * total AS rem
      FROM rev, t
    ),
    lv AS (SELECT 10000 - SUM(base) AS leftover FROM a),
    rk AS (
      SELECT x.nk, x.nation, x.rc, x.total, x.base,
             (SELECT COUNT(*) FROM a y
              WHERE y.rem > x.rem OR (y.rem = x.rem AND y.nk < x.nk))
               AS ahead
      FROM a x
    )
    SELECT nation,
           {_ha6_sql("rc", "100")} AS revenue,
           {_ha6_sql("rc", "total")} AS share,
           CAST(base AS BIGINT) AS base_units,
           CAST(base + CASE WHEN ahead < leftover THEN 1 ELSE 0 END
                AS BIGINT) AS units
    FROM rk, lv ORDER BY nation
    """,
    tags=("allocation", "largest-remainder", "join"),
)
def q333_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) proportional allocation: split a
    10,000-unit budget across nations by revenue share — floor quotas
    first, then one extra unit to the largest fractional remainders
    until the budget is exact.  The integer-exact companion q317's
    Neyman allocator deliberately omitted: Σ units == 10000 ALWAYS
    (a floor-only allocation under-spends by up to |nations|−1 units).

    Scale plan: one fact-scan aggregate to nation cardinality (the
    customer and nation dims broadcast); everything downstream —
    remainder ranking included — runs on the BOUNDED 25-row nation
    table, where the rank is a broadcast self-join count (no window,
    no single-task sort).  Exactness: revenue accumulates as exact
    integer cents; quota/remainder are pure integer div/mod (remainder
    ties are exact-integer events broken by nation key, never float
    luck); published revenue and share are `_ha6` rationals."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            ).alias("rc")
        )
    )
    t = rev.agg(F.sum("rc").alias("total"))
    a = rev.crossJoin(F.broadcast(t)).select(
        "nk",
        "nation",
        "rc",
        "total",
        F.expr("(10000 * rc) div total").alias("base"),
        F.expr("10000 * rc - ((10000 * rc) div total) * total").alias("rem"),
    )
    # the allocation table is bounded by the nation vocabulary: pin it so
    # the leftover aggregate, the rank self-join (both sides) and the
    # final projection share one build
    a = a.localCheckpoint(eager=True)
    lv = a.agg((F.lit(10000) - F.sum("base")).alias("leftover"))
    y = a.select(
        F.col("nk").alias("y_nk"), F.col("rem").alias("y_rem")
    )
    rk = (
        a.join(
            F.broadcast(y),
            (F.col("y_rem") > F.col("rem"))
            | ((F.col("y_rem") == F.col("rem")) & (F.col("y_nk") < F.col("nk"))),
            "left",
        )
        .groupBy("nk", "nation", "rc", "total", "base")
        .agg(F.count("y_nk").alias("ahead"))
    )
    return (
        rk.crossJoin(F.broadcast(lv))
        .select(
            "nation",
            F.expr(
                "CAST((2*rc*1000000 + 100) div (2*100) AS DOUBLE) / 1000000"
            ).alias("revenue"),
            F.expr(
                "CAST((2*rc*1000000 + total) div (2*total) AS DOUBLE)"
                " / 1000000"
            ).alias("share"),
            F.col("base").cast("long").alias("base_units"),
            (
                F.col("base")
                + F.when(F.col("ahead") < F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("units"),
        )
        .orderBy("nation")
    )


@query(
    "q334_quantile_normalization",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
             ) AS r,
             COUNT(*) OVER (PARTITION BY source) AS ng
      FROM d
    ),
    g AS (
      SELECT n_chars AS gval,
             row_number() OVER (ORDER BY n_chars, doc_id) AS gr
      FROM d
    ),
    t AS (SELECT COUNT(*) AS n FROM d),
    k AS (
      SELECT source, n_chars,
             ((2*CAST(r AS HUGEINT) - 1) * n + 2*ng - 1) // (2*ng) AS k
      FROM r, t
    ),
    j AS (
      SELECT source, n_chars, gval FROM k JOIN g ON g.gr = k.k
    )
    SELECT source,
           COUNT(*) AS n_docs,
           {_ha6_sql("SUM(n_chars)", "COUNT(*)")} AS mean_raw,
           {_ha6_sql("SUM(gval)", "COUNT(*)")} AS mean_norm,
           MIN(gval) AS min_norm, MAX(gval) AS max_norm
    FROM j GROUP BY 1 ORDER BY source
    """,
    tags=("normalization", "quantile", "kernel"),
)
def q334_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization (the microarray / feature-
    preprocessing staple): replace each document's `n_chars` with the
    GLOBAL empirical quantile at its within-source fractional rank
    p = (2r−1)/(2n_g), so every source's normalized distribution is the
    same global one and per-source summary stats become comparable.
    The per-source mean_raw vs mean_norm gap quantifies how much of a
    source's apparent length difference is distributional.

    Scale plan: BOTH rank passes run on the distributed prefix kernel
    (`operators/prefix.global_ranks`) — within-source ranks grouped by
    the low-card source key and the global order in one ungrouped pass
    (never a single-task window, q63 discipline); the quantile lookup
    maps p to the integer global position k = ceil(p·N) and equi-joins
    it against the globally-ranked frame — an O(N) shuffle join, no
    range predicate, no per-group buffer.  Exactness: k is pure integer
    arithmetic (widened to DECIMAL(38,0): (2r−1)·N is n²-scale), the
    normalized value is an INTEGER pulled from the data, and both
    published means are `_ha6` rationals.  Laziness: kernel builders
    execute bounded checkpoint jobs at plan-build time.
    """
    from ..operators.prefix import global_ranks

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    d = d.localCheckpoint(eager=True)  # feeds both rank kernels + N agg
    r = global_ranks(
        d, order_cols=("n_chars", "doc_id"), group_cols=("source",),
        rn_col="r", total_col="ng",
    )
    g = global_ranks(
        d.select(F.col("n_chars").alias("gval"), "doc_id"),
        order_cols=("gval", "doc_id"),
        rn_col="gr", total_col="n_all",
    ).select("gval", "gr")
    t = d.agg(F.count(F.lit(1)).alias("n"))
    k = r.crossJoin(F.broadcast(t)).select(
        "source",
        "n_chars",
        F.expr(
            "((2*CAST(r AS DECIMAL(38,0)) - 1) * n + 2*ng - 1) div (2*ng)"
        ).alias("k"),
    )
    j = k.join(g, k.k == g.gr)
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST((2*SUM(n_chars)*1000000 + COUNT(*)) div (2*COUNT(*))"
                " AS DOUBLE) / 1000000"
            ).alias("mean_raw"),
            F.expr(
                "CAST((2*SUM(gval)*1000000 + COUNT(*)) div (2*COUNT(*))"
                " AS DOUBLE) / 1000000"
            ).alias("mean_norm"),
            F.min("gval").alias("min_norm"),
            F.max("gval").alias("max_norm"),
        )
        .orderBy("source")
    )


@query(
    "q335_covariate_balance",
    oracle=f"""
    WITH feat AS (
      SELECT c.c_custkey AS ck,
             {_md5_mod_sql("c.c_custkey", 2)} AS arm,
             COALESCE(o.n_orders, 0) * 1000000 AS f_orders,
             COALESCE(o.rev_kd, 0) AS f_rev,
             COALESCE(o.maxp_kd, 0) AS f_maxp
      FROM customer c LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) * 10
                 AS rev_kd,
               MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) * 10
                 AS maxp_kd
        FROM orders GROUP BY 1
      ) o ON c.c_custkey = o.o_custkey
    ),
    st AS (
      SELECT covariate, arm, COUNT(*) AS n,
             SUM(CAST(xu AS HUGEINT)) AS sx,
             SUM(CAST(xu AS HUGEINT) * xu) AS sxx
      FROM (
        SELECT arm, 'n_orders' AS covariate, f_orders AS xu FROM feat
        UNION ALL
        SELECT arm, 'revenue_k' AS covariate, f_rev AS xu FROM feat
        UNION ALL
        SELECT arm, 'max_price_k' AS covariate, f_maxp AS xu FROM feat
      ) GROUP BY 1, 2
    ),
    m AS (
      SELECT covariate, arm, n,
             (2*sx + n) // (2*n) AS mu,
             (2*(n*sxx - sx*sx) + (n*(n-1)*CAST(1000000 AS HUGEINT)))
               // (2*(n*(n-1)*CAST(1000000 AS HUGEINT))) AS vu6
      FROM st
    )
    SELECT t.covariate AS covariate,
           CAST(t.n AS BIGINT) AS n_treat, CAST(c.n AS BIGINT) AS n_ctrl,
           CAST(t.mu AS DOUBLE) / 1000000 AS mean_treat,
           CAST(c.mu AS DOUBLE) / 1000000 AS mean_ctrl,
           round((CAST(t.mu AS DOUBLE) - CAST(c.mu AS DOUBLE)) / 1000000
                 / sqrt(CAST(t.vu6 + c.vu6 AS DOUBLE) / 2000000), 6) AS smd
    FROM m t JOIN m c ON t.covariate = c.covariate
    WHERE t.arm = 1 AND c.arm = 0
    ORDER BY covariate
    """,
    tags=("experiment", "balance", "causal"),
)
def q335_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-balance audit for a randomized assignment (the table
    every experiment readout should lead with): customers get a
    deterministic md5 coin, and each pre-treatment covariate (order
    count, total revenue, max order price) is compared across arms by
    standardized mean difference SMD = (μ_t − μ_c)/√((σ²_t + σ²_c)/2) —
    |SMD| ≲ 0.1 is the conventional balance bar.  Complements q292
    (CUPED uses these covariates) and q294 (the readout itself).

    Scale plan: ONE orders aggregate to customer cardinality, a
    broadcast-joinable customer frame, then one map-side-combinable
    moment agg per (covariate, arm) — the 3-way covariate fan-out rides
    a union of projections of the SAME frame, and everything after the
    agg is a bounded 6-row table.  Exactness: covariates live on
    integer micro-unit grids sized so vu6 < 2^53 (revenue in THOUSANDS
    of dollars — a dollar grid would push n²-scale variance units past
    double exactness, the q238/q316 grid-budget rule); means are
    half-away integer micro-units; SMD is one divide by an IEEE sqrt of
    exact doubles, tie-impossible under round(,6) (irrational
    denominator, q317 discipline)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            * 10
        ).alias("rev_kd"),
        (
            F.max(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            * 10
        ).alias("maxp_kd"),
    )
    feat = (
        cust.join(per, cust.c_custkey == per.o_custkey, "left")
        .select(
            _md5_mod(F.col("c_custkey"), 2).alias("arm"),
            (F.coalesce("n_orders", F.lit(0)) * 1000000).alias("f_orders"),
            F.coalesce("rev_kd", F.lit(0)).alias("f_rev"),
            F.coalesce("maxp_kd", F.lit(0)).alias("f_maxp"),
        )
    )
    stacked = feat.select(
        "arm",
        F.expr(
            "stack(3, 'n_orders', f_orders, 'revenue_k', f_rev,"
            " 'max_price_k', f_maxp) AS (covariate, xu)"
        ),
    )
    st = stacked.groupBy("covariate", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xu").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.expr("CAST(xu AS DECIMAL(38,0)) * xu")).alias("sxx"),
    )
    m = st.select(
        "covariate",
        "arm",
        "n",
        F.expr("(2*sx + n) div (2*n)").alias("mu"),
        F.expr(
            "(2*(n*sxx - sx*sx) + (n*(n-1)*CAST(1000000 AS DECIMAL(38,0))))"
            " div (2*(n*(n-1)*CAST(1000000 AS DECIMAL(38,0))))"
        ).alias("vu6"),
    )
    tarm = m.where(F.col("arm") == 1).select(
        "covariate",
        F.col("n").alias("nt"),
        F.col("mu").alias("mut"),
        F.col("vu6").alias("vt"),
    )
    carm = m.where(F.col("arm") == 0).select(
        "covariate",
        F.col("n").alias("nc"),
        F.col("mu").alias("muc"),
        F.col("vu6").alias("vc"),
    )
    return (
        tarm.join(carm, "covariate")
        .select(
            "covariate",
            F.col("nt").cast("long").alias("n_treat"),
            F.col("nc").cast("long").alias("n_ctrl"),
            (F.col("mut").cast("double") / 1000000).alias("mean_treat"),
            (F.col("muc").cast("double") / 1000000).alias("mean_ctrl"),
            F.round(
                (F.col("mut").cast("double") - F.col("muc").cast("double"))
                / 1000000
                / F.sqrt((F.col("vt") + F.col("vc")).cast("double") / 2000000),
                6,
            ).alias("smd"),
        )
        .orderBy("covariate")
    )
