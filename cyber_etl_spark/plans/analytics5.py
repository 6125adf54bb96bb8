"""Round-9 analytics family: recommendation, evaluation-methodology and
inventory/anomaly operators a production pipeline runs next to the q266+
business suite — item-item collaborative filtering, group-k-fold leakage
audit, Brier/ECE calibration decomposition, Neyman sampling allocation,
ABC-XYZ inventory classification, trailing-window anomaly flags, near-dup
keep-best canonicalization, and a per-user feature correlation matrix.

Cross-engine exactness follows the module rules established in
analytics2-4: integer sufficient statistics with DECIMAL(38,0)/HUGEINT
widening, half-away integer-division rounding (`_ha6`) for exact
rationals, 12-dp DECIMAL snaps before any bounded multi-term double sum,
and md5-digit determinism for every pseudo-random draw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table
from .analytics2 import _ha6, _ha6_sql
from .registry import query


def _md5_mod(col, m: int):
    """Deterministic integer draw in [0, m): first 8 md5 hex digits of
    the stringified id, mod m — the integer sibling of
    textops._md5_fraction; oracle twin is
    CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8)) AS BIGINT) % m."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % m


def _md5_mod_sql(expr: str, m: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))"
        f" AS BIGINT) % {m}"
    )


@query(
    "q314_itemcf_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT pk, COUNT(*) AS cnt FROM items GROUP BY 1),
    tot AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
    co AS (
      SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS co
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, CAST(co AS BIGINT) AS co,
           round(co / sqrt(CAST(na.cnt * nb.cnt AS DOUBLE)), 6) AS cosine,
           {_ha6_sql("co * n_orders", "na.cnt * nb.cnt")} AS lift
    FROM co JOIN n na ON na.pk = part_a JOIN n nb ON nb.pk = part_b, tot
    ORDER BY co DESC, cosine DESC, part_a, part_b LIMIT 50
    """,
    tags=("recommender", "cooccurrence", "join"),
)
def q314_itemcf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (the classic co-occurrence
    recommender): for part pairs bought together in >= 2 orders, the
    co-count, cosine co/sqrt(na*nb) and lift co*N/(na*nb) over the
    order-basket bipartite graph; top-50 by (co, cosine, keys).

    Scale plan: baskets come from ONE distinct projection; the pair
    enumeration is an equi-join on the ORDER key, so per-key fan-out is
    bounded by basket size squared (~4 items/order here — never an
    item-keyed join, whose popular-item fan-out is the quadratic trap);
    the co table is min-support-pruned BEFORE the degree joins; top-50
    is a TakeOrdered.  Exactness: cosine is a 6-dp round of an
    irrational over exact integers (safe); lift is an exact integer
    rational through `_ha6`.  Rank ties break (cosine, part_a, part_b)
    — cosine doubles are identical cross-engine because their integer
    inputs are."""
    from .analytics import cached_order_baskets, cached_order_items

    # shared pinned base (the q192/q342 family builds the identical
    # distinct + sorted-basket tables — r12 shared-build memo)
    items = cached_order_items(spark, sf_dir)
    n = items.groupBy("pk").agg(F.count(F.lit(1)).alias("cnt"))
    tot = items.agg(F.count_distinct("ok").alias("n_orders"))
    # basket-local pair generation (the q192/q322/q342 r12 form): sort
    # each basket once, then posexplode + slice walks exactly the
    # part_a < part_b pairs in-stage — ONE exchange (groupBy ok) instead
    # of the self-join's shared exchange + two sorts; (ok, pk) is unique
    # after the distinct, so co counts are identical
    baskets = cached_order_baskets(spark, sf_dir)
    co = (
        baskets.select(F.posexplode("ps").alias("ia", "part_a"), "ps")
        .select(
            "part_a",
            F.explode(F.expr("slice(ps, ia + 2, size(ps))")).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .where(F.col("co") >= 2)
    )
    na = n.select(F.col("pk").alias("part_a"), F.col("cnt").alias("na"))
    nb = n.select(F.col("pk").alias("part_b"), F.col("cnt").alias("nb"))
    return (
        co.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            F.col("co").cast("long").alias("co"),
            F.round(
                F.col("co") / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
                6,
            ).alias("cosine"),
            _ha6("co * n_orders", "na * nb").alias("lift"),
        )
        .orderBy(
            F.col("co").desc(), F.col("cosine").desc(), "part_a", "part_b"
        )
        .limit(50)
    )


@query(
    "q315_group_kfold_leakage",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id,
             {_md5_mod_sql("user_id", 5)} AS fold_grp,
             {_md5_mod_sql("event_id", 5)} AS fold_naive
      FROM events
    ),
    spans AS (
      SELECT user_id, COUNT(DISTINCT fold_naive) AS nf FROM e GROUP BY 1
    ),
    grp AS (
      SELECT fold_grp AS fold, COUNT(*) AS grp_events,
             COUNT(DISTINCT user_id) AS grp_users
      FROM e GROUP BY 1
    ),
    naive AS (
      SELECT fold_naive AS fold, COUNT(*) AS naive_events,
             COUNT(DISTINCT e.user_id) AS naive_users,
             COUNT(DISTINCT CASE WHEN s.nf > 1 THEN e.user_id END)
               AS naive_leaky_users
      FROM e JOIN spans s ON s.user_id = e.user_id
      GROUP BY 1
    )
    SELECT CAST(g.fold AS INT) AS fold,
           CAST(grp_events AS BIGINT) AS grp_events,
           CAST(grp_users AS BIGINT) AS grp_users,
           CAST(naive_events AS BIGINT) AS naive_events,
           CAST(naive_users AS BIGINT) AS naive_users,
           CAST(naive_leaky_users AS BIGINT) AS naive_leaky_users
    FROM grp g JOIN naive n ON n.fold = g.fold
    ORDER BY fold
    """,
    tags=("ml-train", "split", "leakage"),
)
def q315_group_kfold_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP k-fold assignment + leakage audit: folds keyed on the GROUP
    (md5(user_id) % 5 — every user's events land in one fold, zero
    leakage by construction) contrasted with the naive iid split
    (md5(event_id) % 5), counting per naive fold the users whose events
    leak across folds — the cross-validation bug (correlated rows split
    iid) that inflates offline metrics.  Group folds' user counts are
    DISJOINT (sum = |users|); naive folds' user counts overlap.

    Scale plan: one projection computes both fold draws; the leak audit
    is a user-keyed distinct-count agg joined back user-keyed; per-fold
    rollups are bounded (5 rows).  Exactness: pure integer counts and
    md5 digits."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        _md5_mod(F.col("user_id"), 5).alias("fold_grp"),
        _md5_mod(F.col("event_id"), 5).alias("fold_naive"),
    )
    # feeds the span audit AND both fold rollups
    e = e.localCheckpoint(eager=True)
    spans = e.groupBy("user_id").agg(
        F.count_distinct("fold_naive").alias("nf")
    )
    grp = e.groupBy(F.col("fold_grp").alias("fold")).agg(
        F.count(F.lit(1)).alias("grp_events"),
        F.count_distinct("user_id").alias("grp_users"),
    )
    naive = (
        e.join(spans, "user_id")
        .groupBy(F.col("fold_naive").alias("fold"))
        .agg(
            F.count(F.lit(1)).alias("naive_events"),
            F.count_distinct("user_id").alias("naive_users"),
            F.count_distinct(
                F.when(F.col("nf") > 1, F.col("user_id"))
            ).alias("naive_leaky_users"),
        )
    )
    return (
        grp.join(naive, "fold")
        .select(
            F.col("fold").cast("int").alias("fold"),
            F.col("grp_events").cast("long").alias("grp_events"),
            F.col("grp_users").cast("long").alias("grp_users"),
            F.col("naive_events").cast("long").alias("naive_events"),
            F.col("naive_users").cast("long").alias("naive_users"),
            F.col("naive_leaky_users").cast("long").alias("naive_leaky_users"),
        )
        .orderBy("fold")
    )


@query(
    "q316_brier_decomposition",
    oracle="""
    WITH e AS (
      SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000000 AS u,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    b AS (
      SELECT u // 100000 AS bin, COUNT(*) AS n,
             SUM(CAST(u AS HUGEINT)) AS su,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(u AS HUGEINT) * u) AS su2,
             SUM(CAST(u AS HUGEINT) * y) AS suy
      FROM e GROUP BY 1
    ),
    snap AS (
      SELECT n, sy,
             (2*su + n) // (2*n) AS s_k,
             (2*sy*1000000 + n) // (2*n) AS y_k,
             su2, suy
      FROM b
    ),
    g AS (
      SELECT SUM(CAST(n AS HUGEINT)) AS nn, SUM(sy) AS tsy,
             SUM(su2) AS tsu2, SUM(suy) AS tsuy,
             SUM(CAST(n AS HUGEINT) * (s_k - y_k) * (s_k - y_k)) AS rel_num,
             SUM(CAST(n AS HUGEINT) * ABS(s_k - y_k)) AS ece_num
      FROM snap
    ),
    g2 AS (
      SELECT nn, tsy, tsu2, tsuy, rel_num, ece_num,
             (2*tsy*1000000 + nn) // (2*nn) AS ybar
      FROM g
    ),
    res AS (
      SELECT g2.nn, g2.tsy, g2.tsu2, g2.tsuy, g2.rel_num, g2.ece_num, g2.ybar,
             SUM(CAST(s.n AS HUGEINT) * (s.y_k - g2.ybar) * (s.y_k - g2.ybar))
               AS res_num
      FROM snap s, g2
      GROUP BY 1, 2, 3, 4, 5, 6, 7
    )
    SELECT CAST(nn AS BIGINT) AS n,
           CAST((2*(tsu2 - 2000000*tsuy + CAST(1000000 AS HUGEINT)*1000000*tsy)
                 *1000000 + nn*1000000000000)
                // (2*nn*1000000000000) AS DOUBLE) / 1000000 AS brier,
           CAST((2*rel_num*1000000 + nn*1000000000000)
                // (2*nn*1000000000000) AS DOUBLE) / 1000000 AS reliability,
           CAST((2*res_num*1000000 + nn*1000000000000)
                // (2*nn*1000000000000) AS DOUBLE) / 1000000 AS resolution,
           CAST((2*(tsy*(nn - tsy))*1000000 + nn*nn)
                // (2*nn*nn) AS DOUBLE) / 1000000 AS uncertainty,
           CAST((2*ece_num*1000000 + nn*1000000)
                // (2*nn*1000000) AS DOUBLE) / 1000000 AS ece
    FROM res
    """,
    tags=("ml-eval", "calibration", "brier"),
)
def q316_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier-score decomposition + expected calibration error for a
    deterministic probability score (md5 1e-6-unit draw per event)
    against the purchase outcome, over 10 equal-width bins: Murphy's
    reliability (score vs bin event rate), resolution (bin rate vs base
    rate) and uncertainty (base-rate variance), plus ECE — the
    calibration scorecard next to the decile-lift table (q190) and ROC
    AUC (q215).

    Scale plan: ONE projection + one 10-group agg carries every
    sufficient statistic (n, Σu, Σy, Σu², Σuy per bin); the
    decomposition runs on the bounded bin table.  Exactness: scores ARE
    exact 1e-6 integers; bin means snap half-away to integer 1e-6 units
    (pure integer division); every term (n_k·Δ², Brier's
    Σ(u − 1e6·y)², ȳ(1−ȳ)) is an exact integer in 1e-12 units with
    DECIMAL(38,0)/HUGEINT widening (the _ha6 overflow contract: 2·num·1e6
    is what overflows first), published as half-away 6-dp doubles."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.select(
        _md5_mod(F.col("event_id"), 1000000).alias("u"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = e.groupBy(F.expr("u div 100000").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("u") * F.col("u")).cast("decimal(38,0)")).alias("su2"),
        F.sum((F.col("u") * F.col("y")).cast("decimal(38,0)")).alias("suy"),
    )
    snap = b.select(
        "n",
        "sy",
        "su2",
        "suy",
        F.expr("(2*su + n) div (2*n)").cast("decimal(38,0)").alias("s_k"),
        F.expr("(2*sy*1000000 + n) div (2*n)")
        .cast("decimal(38,0)")
        .alias("y_k"),
    ).localCheckpoint(eager=True)  # bounded (10 rows); feeds two rollups
    g = snap.agg(
        F.sum(F.col("n").cast("decimal(38,0)")).alias("nn"),
        F.sum("sy").alias("tsy"),
        F.sum("su2").alias("tsu2"),
        F.sum("suy").alias("tsuy"),
        F.sum(
            F.expr("CAST(n AS DECIMAL(38,0)) * (s_k - y_k) * (s_k - y_k)")
        ).alias("rel_num"),
        F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * abs(s_k - y_k)")).alias(
            "ece_num"
        ),
    ).withColumn("ybar", F.expr("(2*tsy*1000000 + nn) div (2*nn)"))
    res = (
        snap.crossJoin(F.broadcast(g))
        .groupBy("nn", "tsy", "tsu2", "tsuy", "rel_num", "ece_num", "ybar")
        .agg(
            F.sum(
                F.expr(
                    "CAST(n AS DECIMAL(38,0)) * (y_k - ybar) * (y_k - ybar)"
                )
            ).alias("res_num")
        )
    )
    den12 = "CAST(nn AS DECIMAL(38,0)) * 1000000 * 1000000"
    return res.select(
        F.col("nn").cast("long").alias("n"),
        F.expr(
            "CAST((2*(tsu2 - 2000000*tsuy + CAST(1000000 AS DECIMAL(38,0))"
            f"*1000000*tsy)*1000000 + {den12}) div (2*({den12})) AS DOUBLE)"
            " / 1000000"
        ).alias("brier"),
        F.expr(
            f"CAST((2*rel_num*1000000 + {den12}) div (2*({den12}))"
            " AS DOUBLE) / 1000000"
        ).alias("reliability"),
        F.expr(
            f"CAST((2*res_num*1000000 + {den12}) div (2*({den12}))"
            " AS DOUBLE) / 1000000"
        ).alias("resolution"),
        F.expr(
            "CAST((2*(tsy*(nn - tsy))*1000000 + nn*nn) div (2*nn*nn)"
            " AS DOUBLE) / 1000000"
        ).alias("uncertainty"),
        F.expr(
            "CAST((2*ece_num*1000000 + nn*1000000) div (2*nn*1000000)"
            " AS DOUBLE) / 1000000"
        ).alias("ece"),
    )


@query(
    "q317_neyman_allocation",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS xu
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(xu) AS sx, SUM(xu * xu) AS sxx
      FROM x GROUP BY 1
    ),
    v AS (
      SELECT event_type, n,
             (2*(n*sxx - sx*sx) + (n*(n-1)*CAST(1000000 AS HUGEINT)))
               // (2*(n*(n-1)*CAST(1000000 AS HUGEINT))) AS vu6
      FROM s
    ),
    w AS (
      SELECT event_type, n, vu6,
             CAST(floor(n * sqrt(CAST(vu6 AS DOUBLE) / 1000000) * 1000000
                        + 0.5) AS HUGEINT) AS wu
      FROM v
    ),
    t AS (
      SELECT SUM(wu) AS tw, SUM(CAST(n AS HUGEINT)) AS tn FROM w
    )
    SELECT w.event_type AS stratum,
           CAST(w.n AS BIGINT) AS n_rows,
           round(sqrt(CAST(vu6 AS DOUBLE) / 1000000), 6) AS value_sd,
           CAST((2*wu*1000000 + tw) // (2*tw) AS DOUBLE) / 1000000
             AS neyman_share,
           CAST((wu * 10000) // tw AS BIGINT) AS neyman_alloc,
           CAST((CAST(w.n AS HUGEINT) * 10000) // tn AS BIGINT)
             AS proportional_alloc
    FROM w, t ORDER BY stratum
    """,
    tags=("sampling", "stratified", "survey"),
)
def q317_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: for a 10,000-row
    sample budget over the event-type strata, allocate n_h proportional
    to N_h·S_h (stratum size × value std) — the variance-minimizing
    design for estimating the mean `value`, side by side with the naive
    proportional allocation (high-variance strata earn more than their
    row share).  The sampling-methodology companion of the md5 mixture
    sampler (q151) and the PSI drift gate (q149).

    Scale plan: ONE map-side-combinable moment agg per stratum (micro-
    unit integers, never raw-double sums); everything downstream runs on
    the bounded stratum table.  Exactness: variance is an exact integer
    rational snapped half-away to 1e-6 units (vu6 ≤ value²·1e6 ≪ 2^53,
    so its double is exact and IEEE sqrt is identical cross-engine);
    weights w = N_h·S_h snap to 1e-6-unit integers via floor(x·1e6+0.5)
    (positive, so identical to both engines' round); shares and integer
    allocations are pure integer divisions of those units — the
    largest-remainder step is intentionally omitted (floor allocations
    + published exact shares), keeping every emitted digit
    tie-impossible."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("xu"),
    )
    s = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xu").alias("sx"),
        F.sum(F.expr("xu * xu")).alias("sxx"),
    )
    v = s.select(
        "event_type",
        "n",
        F.expr(
            "(2*(n*sxx - sx*sx) + (n*(n-1)*CAST(1000000 AS DECIMAL(38,0))))"
            " div (2*(n*(n-1)*CAST(1000000 AS DECIMAL(38,0))))"
        ).alias("vu6"),
    )
    w = v.select(
        "event_type",
        "n",
        "vu6",
        F.floor(
            F.col("n") * F.sqrt(F.col("vu6").cast("double") / 1000000) * 1000000
            + F.lit(0.5)
        )
        .cast("decimal(38,0)")
        .alias("wu"),
    )
    t = w.agg(
        F.sum("wu").alias("tw"),
        F.sum(F.col("n").cast("decimal(38,0)")).alias("tn"),
    )
    return (
        w.crossJoin(F.broadcast(t))
        .select(
            F.col("event_type").alias("stratum"),
            F.col("n").cast("long").alias("n_rows"),
            F.round(F.sqrt(F.col("vu6").cast("double") / 1000000), 6).alias(
                "value_sd"
            ),
            F.expr(
                "CAST((2*wu*1000000 + tw) div (2*tw) AS DOUBLE) / 1000000"
            ).alias("neyman_share"),
            F.expr("CAST((wu * 10000) div tw AS BIGINT)").alias("neyman_alloc"),
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * 10000) div tn AS BIGINT)"
            ).alias("proportional_alloc"),
        )
        .orderBy("stratum")
    )


@query(
    "q318_abc_xyz_matrix",
    oracle="""
    WITH li AS (
      SELECT l_partkey AS part,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000
                  AS HUGEINT) AS revu,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qu,
             date_trunc('week', l_shipdate) AS wk
      FROM lineitem
    ),
    pw AS (
      SELECT part, wk, SUM(CAST(qu AS HUGEINT)) AS q
      FROM li GROUP BY 1, 2
    ),
    nw AS (SELECT COUNT(DISTINCT wk) AS w FROM li),
    p AS (
      SELECT part, SUM(q) AS s, SUM(q*q) AS s2, COUNT(*) AS nz
      FROM pw GROUP BY 1
    ),
    pr AS (
      SELECT part, SUM(revu) AS rev FROM li GROUP BY 1
    ),
    ranked AS (
      SELECT pr.part, pr.rev,
             SUM(pr.rev) OVER (ORDER BY pr.rev DESC, pr.part
                               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(pr.rev) OVER () AS tot
      FROM pr
    ),
    cls AS (
      SELECT r.part, r.rev,
             CASE WHEN 5*r.cum <= 4*r.tot THEN 'A'
                  WHEN 20*r.cum <= 19*r.tot THEN 'B'
                  ELSE 'C' END AS abc,
             CASE WHEN 4*(w*p.s2 - p.s*p.s) < p.s*p.s THEN 'X'
                  WHEN (w*p.s2 - p.s*p.s) < p.s*p.s THEN 'Y'
                  ELSE 'Z' END AS xyz,
             r.tot
      FROM ranked r JOIN p ON p.part = r.part, nw
    )
    SELECT abc, xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST((2*SUM(rev)*1000000 + MAX(tot)) // (2*MAX(tot)) AS DOUBLE)
             / 1000000 AS revenue_share
    FROM cls GROUP BY 1, 2 ORDER BY abc, xyz
    """,
    tags=("inventory", "abc-xyz", "kernel"),
)
def q318_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification matrix: parts classed by
    cumulative revenue share (A <= 80%, B <= 95%, C — Pareto bands,
    inclusive-cum convention) crossed with weekly-demand variability
    (CV < 0.5 -> X, < 1 -> Y, else Z, over the GLOBAL week calendar with
    unsold weeks counting as zero demand) — the planning matrix behind
    safety-stock policy, composing the concentration family (q285) with
    the variability family (q264/q283).

    Scale plan: the revenue ranking + running total ride ONE prefix-
    kernel pass over the per-part aggregate (never a whole-table
    window); the CV needs NO part x week grid — zero weeks enter only
    through the global week count W, so per-part sufficient statistics
    (S, S2 over nonzero weeks) suffice: CV2 = (W*S2 - S2um)/S2um.
    Exactness: revenue in exact 1e-4-cent integers (price x discount is
    a 4-dp decimal product); band tests are integer cross-
    multiplications (5*cum <= 4*tot, 4*varnum < S2, never a float
    threshold); cell revenue share is an exact rational through the
    widened half-away division."""
    from ..operators.prefix import running_total

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000"
            " AS DECIMAL(38,0))"
        ).alias("revu"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qu"),
        F.date_trunc("week", "l_shipdate").alias("wk"),
    )
    # feeds the week count, the (part, week) demand and the revenue agg
    li = li.localCheckpoint(eager=True)
    pw = li.groupBy("part", "wk").agg(
        F.sum(F.col("qu").cast("decimal(38,0)")).alias("q")
    )
    nw = li.agg(F.count_distinct("wk").alias("w"))
    p = pw.groupBy("part").agg(
        F.sum("q").alias("s"), F.sum(F.expr("q*q")).alias("s2")
    )
    pr = li.groupBy("part").agg(F.sum("revu").alias("rev")).withColumn(
        "negr", -F.col("rev")
    )
    ranked = running_total(
        pr, "rev", order_cols=["negr", "part"], out_col="cum", total_col="tot"
    )
    cls = (
        ranked.join(p, "part")
        .crossJoin(F.broadcast(nw))
        .select(
            "rev",
            "tot",
            F.when(F.expr("5*cum <= 4*tot"), "A")
            .when(F.expr("20*cum <= 19*tot"), "B")
            .otherwise("C")
            .alias("abc"),
            F.when(F.expr("4*(w*s2 - s*s) < s*s"), "X")
            .when(F.expr("(w*s2 - s*s) < s*s"), "Y")
            .otherwise("Z")
            .alias("xyz"),
        )
    )
    return (
        cls.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.expr(
                "CAST((2*SUM(rev)*1000000 + MAX(tot)) div (2*MAX(tot))"
                " AS DOUBLE) / 1000000"
            ).alias("revenue_share"),
        )
        .orderBy("abc", "xyz")
    )


@query(
    "q319_trailing_anomaly",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    tr AS (
      SELECT a.event_type, a.day, a.cnt,
             COUNT(*) AS n,
             SUM(CAST(b.cnt AS HUGEINT)) AS s,
             SUM(CAST(b.cnt AS HUGEINT) * b.cnt) AS s2
      FROM d a JOIN d b
        ON b.event_type = a.event_type
       AND b.day >= a.day - 28 AND b.day <= a.day - 1
      GROUP BY 1, 2, 3
    ),
    z AS (
      SELECT event_type, day, cnt, n,
             (n*cnt - s) AS dev,
             (n*s2 - s*s) AS varnum
      FROM tr WHERE n >= 14
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, cnt,
           CAST(n AS BIGINT) AS n_trail,
           CASE WHEN varnum = 0 THEN NULL
                ELSE round(CASE WHEN dev < 0 THEN -1 ELSE 1 END
                     * sqrt(CAST(dev*dev AS DOUBLE) * (n-1)
                            / (CAST(n AS DOUBLE) * varnum)), 6) END AS z,
           (varnum > 0 AND dev*dev*(n-1) >= 9*n*varnum) AS is_anomaly
    FROM z
    ORDER BY event_type, day
    """,
    tags=("timeseries", "anomaly", "monitoring"),
)
def q319_trailing_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each (event type, day) count
    scored against its OWN trailing 28-day history (current day
    excluded) — z-score and a |z| >= 3 flag, requiring >= 14 history
    days — the operational monitoring view next to CUSUM change-points
    (q216) and daily peaks (q288): CUSUM finds level shifts after the
    fact, this flags single-day spikes as they land.

    Scale plan: the trailing join runs on the BOUNDED day grid
    (calendar x |types| rows — the q288/q213 class), 28-row fan-out per
    row; one aggregation recovers the trailing sufficient statistics.
    Exactness: the flag is a pure integer cross-multiplication
    (dev^2*(n-1) >= 9*n*varnum — never a float sigma threshold); z
    itself is the 6-dp round of a signed sqrt of exact-integer ratios
    (all < 2^53 here; at 1000x daily volumes the integer grid still
    holds ~1e15 — document-checked against the _ha6 overflow
    contract)."""
    from .analytics2 import _day_grid

    d = _day_grid(spark, sf_dir).select(
        "event_type", "day", F.col("cnt").cast("long").alias("cnt")
    )
    b = d.select(
        F.col("event_type").alias("bt"),
        F.col("day").alias("bday"),
        F.col("cnt").alias("bcnt"),
    )
    tr = (
        d.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bday") >= F.date_sub(F.col("day"), 28))
            & (F.col("bday") <= F.date_sub(F.col("day"), 1)),
        )
        .groupBy("event_type", "day", "cnt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("bcnt").cast("decimal(38,0)")).alias("s"),
            F.sum(F.expr("CAST(bcnt AS DECIMAL(38,0)) * bcnt")).alias("s2"),
        )
        .where(F.col("n") >= 14)
        .select(
            "event_type",
            "day",
            "cnt",
            "n",
            F.expr("n*cnt - s").alias("dev"),
            F.expr("n*s2 - s*s").alias("varnum"),
        )
    )
    return tr.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "cnt",
        F.col("n").cast("long").alias("n_trail"),
        F.when(F.col("varnum") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.when(F.col("dev") < 0, -1).otherwise(1)
                * F.sqrt(
                    F.expr("CAST(dev*dev AS DOUBLE) * (n-1)")
                    / F.expr("CAST(n AS DOUBLE) * varnum")
                ),
                6,
            )
        )
        .alias("z"),
        (
            (F.col("varnum") > 0)
            & (F.expr("dev*dev*(n-1) >= 9*n*varnum"))
        ).alias("is_anomaly"),
    ).orderBy("event_type", "day")


@query(
    "q320_dedup_keep_best",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks
      )
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    common AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM common c
      JOIN sizes sa ON sa.id = c.id_a JOIN sizes sb ON sb.id = c.id_b
      WHERE round(CAST(c.n_common AS DOUBLE)
                  / (sa.n + sb.n - c.n_common), 6) >= 0.5
    ),
    gedges AS (SELECT id_a AS u, id_b AS v FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM gedges
      UNION
      SELECT r.u, e.v FROM reach r JOIN gedges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    ),
    m AS (
      SELECT c.component, c.id, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.id
    )
    SELECT component,
           FIRST(id ORDER BY n_chars DESC, id ASC) AS kept_doc,
           MAX(n_chars) AS kept_n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM m GROUP BY component ORDER BY component
    """,
    tags=("dedup", "curation", "graph"),
)
def q320_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEEP-BEST near-duplicate canonicalization: within each Jaccard >=
    0.5 connected component, keep the doc with the MOST content
    (n_chars, tie -> smallest doc_id) and drop the rest — the
    production dedup policy (keep the best copy, not the arbitrary
    smallest-id one that q27/q214's keep-first convention selects).
    Output: per multi-member component, the kept doc and the drop
    count.

    Scale plan: pair table and components are the memoized corpus
    artifacts (cached_jaccard_pairs + the Pregel min-label loop); the
    canonical pick is one component-keyed max(struct) aggregate — never
    a per-component window.  Exactness: integer ids and char counts;
    the (quality desc, id asc) argmax is the q08 max_by discipline."""
    from ..graph.algorithms import connected_components
    from .textops import cached_jaccard_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = cached_jaccard_pairs(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(pairs)
    m = comp.withColumnRenamed("id", "doc_id").join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    return (
        m.groupBy("component")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("negq"),
                    F.col("doc_id").alias("id"),
                )
            ).alias("best"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .select(
            "component",
            F.col("best.id").alias("kept_doc"),
            (-F.col("best.negq")).alias("kept_n_chars"),
            "n_members",
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("component")
    )


def _q321_pairs() -> list[tuple[str, str]]:
    return [
        ("n_events", "active_days"),
        ("n_events", "value_usd"),
        ("n_events", "n_types"),
        ("active_days", "value_usd"),
        ("active_days", "n_types"),
        ("value_usd", "n_types"),
    ]


_Q321_FEATS = {
    "n_events": "f1",
    "active_days": "f2",
    "value_usd": "f3",
    "n_types": "f4",
}


def _q321_r_sql(a: str, b: str) -> str:
    """Pearson r from exact integer sufficient statistics — q273's exact
    form: num and both variance factors are exact integers (HUGEINT /
    DECIMAL(38,0)), converted once to DOUBLE each, one sqrt, one divide,
    6-dp round."""
    fa, fb = _Q321_FEATS[a], _Q321_FEATS[b]
    num = f"(n*s_{fa}{fb} - s_{fa}*s_{fb})"
    da = f"(n*s_{fa}{fa} - s_{fa}*s_{fa})"
    db = f"(n*s_{fb}{fb} - s_{fb}*s_{fb})"
    return (
        f"CASE WHEN {da} = 0 OR {db} = 0 THEN NULL ELSE "
        f"round(CAST({num} AS DOUBLE) / sqrt(CAST({da} AS DOUBLE)"
        f" * CAST({db} AS DOUBLE)), 6) END"
    )


@query(
    "q321_feature_correlation",
    oracle=(
        """
    WITH per AS (
      SELECT user_id,
             COUNT(*) AS f1,
             COUNT(DISTINCT CAST(ts AS DATE)) AS f2,
             SUM(CAST(floor(COALESCE(value, 0) * 100 + 0.5) AS BIGINT))
               // 100 AS f3,
             COUNT(DISTINCT event_type) AS f4
      FROM events GROUP BY 1
    ),
    s AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(f1 AS HUGEINT)) AS s_f1,
             SUM(CAST(f2 AS HUGEINT)) AS s_f2,
             SUM(CAST(f3 AS HUGEINT)) AS s_f3,
             SUM(CAST(f4 AS HUGEINT)) AS s_f4,
             SUM(CAST(f1 AS HUGEINT)*f1) AS s_f1f1,
             SUM(CAST(f2 AS HUGEINT)*f2) AS s_f2f2,
             SUM(CAST(f3 AS HUGEINT)*f3) AS s_f3f3,
             SUM(CAST(f4 AS HUGEINT)*f4) AS s_f4f4,
             SUM(CAST(f1 AS HUGEINT)*f2) AS s_f1f2,
             SUM(CAST(f1 AS HUGEINT)*f3) AS s_f1f3,
             SUM(CAST(f1 AS HUGEINT)*f4) AS s_f1f4,
             SUM(CAST(f2 AS HUGEINT)*f3) AS s_f2f3,
             SUM(CAST(f2 AS HUGEINT)*f4) AS s_f2f4,
             SUM(CAST(f3 AS HUGEINT)*f4) AS s_f3f4
      FROM per
    )
    """
        + "\nUNION ALL\n".join(
            f"SELECT '{a}' AS feature_a, '{b}' AS feature_b,"
            f" CAST(n AS BIGINT) AS n_users, {_q321_r_sql(a, b)} AS r FROM s"
            for a, b in _q321_pairs()
        )
        + "\nORDER BY feature_a, feature_b"
    ),
    tags=("ml-train", "profiling", "correlation"),
)
def q321_feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user FEATURE correlation matrix (all 6 pairs of n_events /
    active_days / value_usd / n_types) — the feature-vs-feature
    redundancy screen next to q309's feature-vs-target screening: a
    |r| ~ 1 pair means one feature is informationally free.

    Scale plan: ONE user-keyed agg builds the feature table; ONE 1-row
    agg carries all 14 sufficient statistics; the 6-pair fan-out runs on
    that bounded row.  Exactness: features are exact integers (value in
    whole dollars via integer cents division); every Pearson term is an
    exact HUGEINT/DECIMAL(38,0) integer converted ONCE to double
    (q273's discipline — exact below 2^53, which holds through sf0.1
    with ~2 orders of margin on the largest term n*S_f3f3; the 6-dp
    round of the irrational sqrt ratio is tie-safe)."""
    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("f1"),
        F.count_distinct(F.to_date("ts")).alias("f2"),
        F.expr(
            "SUM(CAST(floor(COALESCE(value, 0) * 100 + 0.5) AS BIGINT))"
            " div 100"
        ).alias("f3"),
        F.count_distinct("event_type").alias("f4"),
    )
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for i in range(1, 5):
        aggs.append(
            F.sum(F.col(f"f{i}").cast("decimal(38,0)")).alias(f"s_f{i}")
        )
    for i in range(1, 5):
        for j in range(i, 5):
            aggs.append(
                F.sum(
                    F.expr(f"CAST(f{i} AS DECIMAL(38,0)) * f{j}")
                ).alias(f"s_f{i}f{j}")
            )
    s = per.agg(*aggs).localCheckpoint(eager=True)  # 1 row; feeds 6 branches
    outs = []
    for a, b in _q321_pairs():
        outs.append(
            s.select(
                F.lit(a).alias("feature_a"),
                F.lit(b).alias("feature_b"),
                F.col("n").cast("long").alias("n_users"),
                F.expr(
                    _q321_r_sql(a, b)
                    .replace("HUGEINT", "DECIMAL(38,0)")
                ).alias("r"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("feature_a", "feature_b")


@query(
    "q322_itemcf_hitrate",
    oracle="""
    WITH ords AS (
      SELECT o_orderkey AS ok, o_custkey AS cust, o_orderdate AS dt
      FROM orders
    ),
    lastord AS (
      SELECT cust, FIRST(ok ORDER BY dt DESC, ok DESC) AS last_ok
      FROM ords GROUP BY cust
    ),
    items AS (
      SELECT DISTINCT l.l_orderkey AS ok, o.cust, l.l_partkey AS pk,
             (l.l_orderkey = lo.last_ok) AS is_last
      FROM lineitem l
      JOIN ords o ON o.ok = l.l_orderkey
      JOIN lastord lo ON lo.cust = o.cust
    ),
    train AS (SELECT ok, pk FROM items WHERE NOT is_last),
    co AS (
      SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS co
      FROM train a JOIN train b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    hist AS (
      SELECT DISTINCT cust, pk FROM items WHERE NOT is_last
    ),
    target AS (
      SELECT DISTINCT cust, pk FROM items WHERE is_last
    ),
    scores AS (
      SELECT h.cust, c.pb AS cand, SUM(c.co) AS score
      FROM hist h JOIN co c ON c.pa = h.pk
      LEFT JOIN hist h2 ON h2.cust = h.cust AND h2.pk = c.pb
      WHERE h2.pk IS NULL
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT cust, cand,
             ROW_NUMBER() OVER (PARTITION BY cust
                                ORDER BY score DESC, cand ASC) AS rnk
      FROM scores
    ),
    evalc AS (SELECT DISTINCT cust FROM ranked),
    firsthit AS (
      SELECT r.cust, MIN(r.rnk) AS r1
      FROM ranked r JOIN target t ON t.cust = r.cust AND t.pk = r.cand
      WHERE r.rnk <= 10
      GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM evalc) AS BIGINT) AS n_eval,
           CAST(COUNT(f.cust) AS BIGINT) AS n_hits,
           CAST((2*COUNT(f.cust)*1000000 + (SELECT COUNT(*) FROM evalc))
                // (2*(SELECT COUNT(*) FROM evalc)) AS DOUBLE) / 1000000
             AS hit_rate,
           CAST((2*SUM(COALESCE(2520 // f.r1, 0))*1000000
                 + 2520*(SELECT COUNT(*) FROM evalc))
                // (2*2520*(SELECT COUNT(*) FROM evalc)) AS DOUBLE) / 1000000
             AS mrr
    FROM evalc e LEFT JOIN firsthit f ON f.cust = e.cust
    """,
    tags=("recommender", "ml-eval", "ranking"),
)
def q322_itemcf_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-LAST-ORDER-OUT recommender evaluation: hold out each
    customer's last order, build the co-occurrence table from TRAINING
    orders only (computing it on the full data would leak the held-out
    basket into its own recommendations — the q148/q214 contamination
    discipline applied to recsys eval), score candidates by summed
    co-occurrence with the customer's history, exclude already-owned
    items, and report hit-rate@10 and MRR@10 against the held-out
    items.

    Scale plan: the pair table is the q314 order-keyed join (basket-
    bounded fan-out) min-support-pruned; candidate generation joins
    history -> co-partners item-keyed; the per-customer top-10 is a
    high-cardinality-key rank window (WindowGroupLimit pushes the cut
    map-side); the already-owned exclusion is one anti-join.
    Exactness: scores and ranks are integers; MRR credits are exact
    2520/r integers (lcm(1..10)), so hit-rate and MRR are exact
    rationals through the widened half-away division.

    Grid budget: 2520 div r1 with r1 <= 10; 2*nh*1e6 and 2*cr*1e6 <= 2*2520*ne*1e6 fit int64 below ~1.8e9 eval users - widen to DECIMAL(38,0) past that."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("dt"),
    )
    lastord = o.groupBy("cust").agg(
        F.max(F.struct("dt", "ok")).getField("ok").alias("last_ok")
    )
    from .analytics import cached_order_items

    # shared pinned (ok, pk) base (the q192/q314/q342 distinct) joined to
    # the per-order customer/holdout flags: o_orderkey and cust are unique
    # in their tables, so each distinct base row matches exactly one
    # (cust, is_last) pair and the former post-join distinct was a no-op —
    # identical row set, with the join probing |distinct| rows instead of
    # |lineitem| (r12 shared-build memo)
    items = (
        cached_order_items(spark, sf_dir)
        .join(o.select("ok", "cust"), "ok")
        .join(lastord, "cust")
        .select(
            "ok", "cust", "pk", (F.col("ok") == F.col("last_ok")).alias("is_last")
        )
        .localCheckpoint(eager=False)  # feeds train/co, hist, target — all
        # branches of the ONE output action, so the pin is LAZY: the RDD
        # materializes once inside that job (r13; two blocking jobs gone)
    )
    train = items.where(~F.col("is_last")).select("ok", "pk")
    # basket-local pair generation: (ok, pk) is unique after the items
    # distinct, so collect_list per order + double explode enumerates
    # exactly the ordered pairs the former train⋈train self-join
    # produced — with ONE exchange (groupBy ok) instead of two join
    # shuffles + sorts; the fan-out stays in-stage (basket-bounded)
    baskets = train.groupBy("ok").agg(F.collect_list("pk").alias("pks"))
    co = (
        baskets.select(F.explode("pks").alias("pa"), "pks")
        .select("pa", F.explode("pks").alias("pb"))
        .where(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
        .where(F.col("co") >= 2)
    )
    hist = items.where(~F.col("is_last")).select("cust", "pk").distinct()
    target = items.where(F.col("is_last")).select("cust", "pk").distinct()
    scores = (
        hist.join(co, hist.pk == co.pa)
        .select("cust", F.col("pb").alias("cand"), "co")
        .join(
            hist.select(F.col("cust").alias("cust"), F.col("pk").alias("cand")),
            ["cust", "cand"],
            "left_anti",
        )
        .groupBy("cust", "cand")
        .agg(F.sum("co").alias("score"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cust").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    ranked = scores.select(
        "cust", "cand", F.row_number().over(w).alias("rnk")
    ).where(F.col("rnk") <= 10)
    ranked = ranked.localCheckpoint(eager=False)  # feeds evalc AND firsthit
    # (both inside the one output action — lazy pin, see items above)
    evalc = ranked.select("cust").distinct()
    firsthit = (
        ranked.join(
            target.withColumnRenamed("pk", "cand"), ["cust", "cand"]
        )
        .groupBy("cust")
        .agg(F.min("rnk").alias("r1"))
    )
    j = evalc.join(firsthit, "cust", "left")
    return j.agg(
        F.count(F.lit(1)).alias("ne"),
        F.sum(F.when(F.col("r1").isNotNull(), 1).otherwise(0)).alias("nh"),
        F.sum(F.coalesce(F.expr("2520 div r1"), F.lit(0))).alias("cr"),
    ).select(
        F.col("ne").cast("long").alias("n_eval"),
        F.col("nh").cast("long").alias("n_hits"),
        F.expr(
            "CAST((2*nh*1000000 + ne) div (2*ne) AS DOUBLE) / 1000000"
        ).alias("hit_rate"),
        F.expr(
            "CAST((2*cr*1000000 + 2520*ne) div (2*2520*ne) AS DOUBLE)"
            " / 1000000"
        ).alias("mrr"),
    )


def _q323_oracle() -> str:
    from .textops import _KM_ASSIGN_TPL, _lloyd_ctes

    steps = _lloyd_ctes(8, 2, 64)
    steps.append(_KM_ASSIGN_TPL.format(name="afinal", cents="cents2"))
    return (
        "WITH "
        + ",\n".join(steps)
        + """,
    m AS (
      SELECT a.cell, e.label, COUNT(*) AS n_cl
      FROM afinal a JOIN embeddings e ON e.vec_id = a.id
      GROUP BY 1, 2
    ),
    nc AS (SELECT cell, SUM(n_cl) AS n_c FROM m GROUP BY 1),
    nl AS (SELECT label, SUM(n_cl) AS n_l FROM m GROUP BY 1),
    nn AS (SELECT SUM(n_cl) AS n FROM m),
    mi AS (
      SELECT SUM(CAST(round(m.n_cl * ln(CAST(n.n AS DOUBLE) * m.n_cl
                                        / (nc.n_c * nl.n_l)) / n.n, 12)
                      AS DECIMAL(20,12))) AS mi
      FROM m JOIN nc USING (cell) JOIN nl USING (label), nn n
    ),
    hc AS (
      SELECT SUM(CAST(round(-(nc.n_c * ln(CAST(nc.n_c AS DOUBLE) / n.n))
                            / n.n, 12) AS DECIMAL(20,12))) AS h
      FROM nc, nn n
    ),
    hl AS (
      SELECT SUM(CAST(round(-(nl.n_l * ln(CAST(nl.n_l AS DOUBLE) / n.n))
                            / n.n, 12) AS DECIMAL(20,12))) AS h
      FROM nl, nn n
    ),
    pur AS (
      SELECT SUM(mx) AS hits FROM (
        SELECT cell, MAX(n_cl) AS mx FROM m GROUP BY 1
      )
    )
    SELECT CAST(n.n AS BIGINT) AS n_vectors,
           CAST((SELECT COUNT(*) FROM nc) AS BIGINT) AS n_cells_used,
           CAST((2*pur.hits*1000000 + n.n) // (2*n.n) AS DOUBLE) / 1000000
             AS purity,
           round(CAST(mi.mi AS DOUBLE), 6) AS mutual_information,
           CASE WHEN hc.h = 0 OR hl.h = 0 THEN NULL
                ELSE round(CAST(mi.mi AS DOUBLE)
                           / sqrt(CAST(hc.h AS DOUBLE)
                                  * CAST(hl.h AS DOUBLE)), 6) END AS nmi
    FROM nn n, mi, hc, hl, pur
    """
    )


@query(
    "q323_cluster_label_agreement",
    oracle=_q323_oracle(),
    tags=("ml-eval", "clustering", "embedding"),
)
def q323_cluster_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING-QUALITY evaluation against ground-truth labels: the
    deterministic Lloyd k-means (8 cells, 2 iterations — q125's trainer)
    scored by PURITY (majority-label mass per cell) and NMI (mutual
    information over sqrt(H_cluster * H_label)) using the embeddings
    table's label column — the unsupervised-vs-truth scorecard next to
    the kNN classifier eval (q305).

    Scale plan: the Lloyd loop is the shared bounded-centroid kernel;
    agreement statistics are ONE (cell, label) agg (<= 8 x |labels|
    rows) and everything downstream is bounded.  Exactness: purity is
    an exact integer rational; each MI/entropy term is ln of an exact
    integer ratio snapped at 12 dp into DECIMAL(20,12) before the exact
    sum (the q244/q257 libm-ulp discipline); NMI is one divide + sqrt
    of exact decimals, 6-dp rounded (sqrt output — tie-impossible).

    Grid budget: hits <= n (corpus docs); 2*hits*1e6 fits int64 to ~4.6e12 docs."""
    from ..operators.ann import nearest_centroid_assign
    from .textops import cached_kmeans

    emb = read_table(spark, sf_dir, "embeddings")
    vecs, cents = cached_kmeans(spark, sf_dir, n_cells=8, iters=2)
    assign = nearest_centroid_assign(vecs, cents)
    m = (
        assign.withColumnRenamed("id", "vec_id")
        .join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cell", "label")
        .agg(F.count(F.lit(1)).alias("n_cl"))
        .localCheckpoint(eager=True)  # bounded; feeds 5 rollups
    )
    nc = m.groupBy("cell").agg(F.sum("n_cl").alias("n_c"))
    nl = m.groupBy("label").agg(F.sum("n_cl").alias("n_l"))
    nn = m.agg(F.sum("n_cl").alias("n"))
    mi = (
        m.join(nc, "cell")
        .join(F.broadcast(nl), "label")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(n_cl * ln(CAST(n AS DOUBLE) * n_cl"
                    " / (n_c * n_l)) / n, 12) AS DECIMAL(20,12))"
                )
            ).alias("mi")
        )
    )
    hc = nc.crossJoin(F.broadcast(nn)).agg(
        F.sum(
            F.expr(
                "CAST(round(-(n_c * ln(CAST(n_c AS DOUBLE) / n)) / n, 12)"
                " AS DECIMAL(20,12))"
            )
        ).alias("hc")
    )
    hl = nl.crossJoin(F.broadcast(nn)).agg(
        F.sum(
            F.expr(
                "CAST(round(-(n_l * ln(CAST(n_l AS DOUBLE) / n)) / n, 12)"
                " AS DECIMAL(20,12))"
            )
        ).alias("hl")
    )
    pur = m.groupBy("cell").agg(F.max("n_cl").alias("mx")).agg(
        F.sum("mx").alias("hits")
    )
    ncu = nc.agg(F.count(F.lit(1)).alias("n_cells_used"))
    return (
        nn.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(ncu))
        .select(
            F.col("n").cast("long").alias("n_vectors"),
            F.col("n_cells_used").cast("long").alias("n_cells_used"),
            F.expr(
                "CAST((2*hits*1000000 + n) div (2*n) AS DOUBLE) / 1000000"
            ).alias("purity"),
            F.round(F.col("mi").cast("double"), 6).alias("mutual_information"),
            F.when(
                (F.col("hc") == 0) | (F.col("hl") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.col("mi").cast("double")
                    / F.sqrt(
                        F.col("hc").cast("double") * F.col("hl").cast("double")
                    ),
                    6,
                )
            )
            .alias("nmi"),
        )
    )


@query(
    "q324_data_gap_audit",
    oracle="""
    WITH d AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events
    ),
    cal AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
    g AS (
      SELECT event_type, day,
             LAG(day) OVER (PARTITION BY event_type ORDER BY day) AS prev
      FROM d
    ),
    per AS (
      SELECT g.event_type,
             MIN(g.day) AS first_day, MAX(g.day) AS last_day,
             COUNT(*) AS present,
             MAX(CASE WHEN g.prev IS NULL THEN 0
                      ELSE datediff('day', g.prev, g.day) - 1 END)
               AS internal_gap
      FROM g GROUP BY 1
    )
    SELECT p.event_type,
           CAST(p.first_day AS VARCHAR) AS first_day,
           CAST(p.last_day AS VARCHAR) AS last_day,
           CAST(p.present AS BIGINT) AS days_present,
           CAST(datediff('day', c.d0, c.d1) + 1 AS BIGINT) AS days_expected,
           CAST(datediff('day', c.d0, c.d1) + 1 - p.present AS BIGINT)
             AS days_missing,
           CAST(GREATEST(p.internal_gap,
                         datediff('day', c.d0, p.first_day),
                         datediff('day', p.last_day, c.d1)) AS BIGINT)
             AS longest_gap
    FROM per p, cal c ORDER BY p.event_type
    """,
    tags=("data-quality", "monitoring", "calendar"),
)
def q324_data_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-GAP audit: per event type, coverage of the global event
    calendar — days present vs expected, and the LONGEST run of missing
    days (internal gaps-and-islands, plus leading/trailing gaps against
    the global span) — the freshness/completeness monitor next to the
    dq audit (q85) and partition-skew audit (q258): a pipeline that
    silently stopped emitting one type shows up as a trailing gap long
    before a volume z-score fires.

    Scale plan: everything runs on the bounded distinct (type, day)
    grid (calendar x |types| — the q288 AGG_INPUT_OK class); the lag
    window partitions the bounded grid only.  Exactness: pure integer
    day arithmetic; calendar days published as strings (the q154
    convention)."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.select("event_type", F.to_date("ts").alias("day")).distinct()
    d = d.localCheckpoint(eager=True)  # bounded grid; feeds cal AND per
    cal = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("day")
    g = d.select("event_type", "day", F.lag("day").over(w).alias("prev"))
    per = g.groupBy("event_type").agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("present"),
        F.max(
            F.when(F.col("prev").isNull(), 0).otherwise(
                F.datediff("day", "prev") - 1
            )
        ).alias("internal_gap"),
    )
    return (
        per.crossJoin(F.broadcast(cal))
        .select(
            "event_type",
            F.col("first_day").cast("string").alias("first_day"),
            F.col("last_day").cast("string").alias("last_day"),
            F.col("present").cast("long").alias("days_present"),
            (F.datediff("d1", "d0") + 1).cast("long").alias("days_expected"),
            (F.datediff("d1", "d0") + 1 - F.col("present"))
            .cast("long")
            .alias("days_missing"),
            F.greatest(
                F.col("internal_gap"),
                F.datediff("first_day", "d0"),
                F.datediff("d1", "last_day"),
            )
            .cast("long")
            .alias("longest_gap"),
        )
        .orderBy("event_type")
    )


@query(
    "q325_logrank_test",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS s_day
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS p_day
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    horizon AS (SELECT MAX(date_trunc('day', ts)) AS h FROM events),
    mid AS (
      SELECT CAST(MIN(s_day) AS DATE)
             + CAST(date_diff('day', MIN(s_day), MAX(s_day)) // 2 AS INT)
               AS dmid
      FROM su
    ),
    obs AS (
      SELECT CASE WHEN CAST(su.s_day AS DATE) <= m.dmid THEN 1 ELSE 0 END
               AS g1,
             COALESCE(CASE WHEN pu.p_day IS NOT NULL AND pu.p_day >= su.s_day
                           THEN date_diff('day', su.s_day, pu.p_day) END,
                      date_diff('day', su.s_day, h.h)) AS t,
             CASE WHEN pu.p_day IS NOT NULL AND pu.p_day >= su.s_day
                  THEN 1 ELSE 0 END AS died
      FROM su LEFT JOIN pu USING (user_id)
      CROSS JOIN horizon h CROSS JOIN mid m
    ),
    grid AS (
      SELECT t,
             SUM(died) AS d, COUNT(*) AS removed,
             SUM(CASE WHEN g1 = 1 THEN died ELSE 0 END) AS d1,
             SUM(g1) AS removed1
      FROM obs GROUP BY t
    ),
    risk AS (
      SELECT t, d, d1,
             (SELECT COUNT(*) FROM obs)
               - COALESCE(SUM(removed) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n,
             (SELECT SUM(g1) FROM obs)
               - COALESCE(SUM(removed1) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n1
      FROM grid
    ),
    terms AS (
      SELECT SUM(d1) AS o1,
             SUM(CAST(round(CAST(d AS DOUBLE) * n1 / n, 12)
                      AS DECIMAL(20,12))) AS e1,
             SUM(CASE WHEN n > 1 THEN
                   CAST(round(CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d)
                              / (CAST(n AS DOUBLE) * n * (n - 1)), 12)
                        AS DECIMAL(20,12))
                 ELSE CAST(0 AS DECIMAL(20,12)) END) AS v1
      FROM risk WHERE d > 0
    ),
    sizes AS (
      SELECT SUM(g1) AS n_g1, SUM(1 - g1) AS n_g2 FROM obs
    )
    SELECT CAST(s.n_g1 AS BIGINT) AS n_early_cohort,
           CAST(s.n_g2 AS BIGINT) AS n_late_cohort,
           CAST(t.o1 AS BIGINT) AS observed_early,
           round(CAST(t.e1 AS DOUBLE), 6) AS expected_early,
           CASE WHEN t.v1 = 0 THEN NULL
                ELSE round((CAST(t.o1 AS DOUBLE) - CAST(t.e1 AS DOUBLE))
                           * (CAST(t.o1 AS DOUBLE) - CAST(t.e1 AS DOUBLE))
                           / CAST(t.v1 AS DOUBLE), 6) END AS chi2
    FROM terms t, sizes s
    """,
    tags=("survival", "hypothesis-test", "ml-eval"),
)
def q325_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK test between the EARLY and LATE signup cohorts (first
    vs second half of the signup calendar): does time-to-first-purchase
    differ?  Completes the survival family — Kaplan-Meier (q210) and
    Nelson-Aalen (q268) describe one curve; the log-rank statistic
    Z^2 = (O1 - E1)^2 / V1 with hypergeometric per-day variance is THE
    two-curve comparison.

    Scale plan: q210's per-user reduction is the only corpus-scale
    work; risk sets come from cumulative windows over the bounded
    per-day grid (the q210 AGG_INPUT_OK class), now carried per group
    in the SAME pass.  Exactness: O1 is an integer; per-day E1/V1 are
    exact integer ratios snapped 12 dp into DECIMAL(20,12) before the
    exact sum (q268's discipline); the final chi-square is one
    divide + 6-dp round of exact-decimal inputs."""
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day).alias("s_day"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(day).alias("p_day"))
    )
    horizon = ev.agg(F.max(day).alias("h"))
    mid = su.agg(
        F.expr(
            "CAST(MIN(s_day) AS DATE)"
            " + CAST(datediff(MAX(s_day), MIN(s_day)) div 2 AS INT)"
        ).alias("dmid")
    )
    obs = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("s_day").cast("date") <= F.col("dmid"), 1)
            .otherwise(0)
            .alias("g1"),
            F.coalesce(
                F.when(
                    F.col("p_day").isNotNull()
                    & (F.col("p_day") >= F.col("s_day")),
                    F.datediff("p_day", "s_day"),
                ),
                F.datediff("h", "s_day"),
            ).alias("t"),
            F.when(
                F.col("p_day").isNotNull() & (F.col("p_day") >= F.col("s_day")),
                1,
            )
            .otherwise(0)
            .alias("died"),
        )
        .localCheckpoint(eager=True)  # feeds grid, totals, sizes
    )
    tot = obs.agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("g1").alias("n1_total")
    )
    grid = obs.groupBy("t").agg(
        F.sum("died").alias("d"),
        F.count(F.lit(1)).alias("removed"),
        F.sum(F.when(F.col("g1") == 1, F.col("died")).otherwise(0)).alias("d1"),
        F.sum("g1").alias("removed1"),
    )
    from pyspark.sql.window import Window

    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        grid.crossJoin(F.broadcast(tot))
        .withColumn(
            "n",
            F.col("n_total")
            - F.coalesce(F.sum("removed").over(wprev), F.lit(0)),
        )
        .withColumn(
            "n1",
            F.col("n1_total")
            - F.coalesce(F.sum("removed1").over(wprev), F.lit(0)),
        )
        .where(F.col("d") > 0)
    )
    terms = risk.agg(
        F.sum("d1").alias("o1"),
        F.sum(
            F.expr(
                "CAST(round(CAST(d AS DOUBLE) * n1 / n, 12)"
                " AS DECIMAL(20,12))"
            )
        ).alias("e1"),
        F.sum(
            F.expr(
                "CASE WHEN n > 1 THEN"
                " CAST(round(CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d)"
                " / (CAST(n AS DOUBLE) * n * (n - 1)), 12)"
                " AS DECIMAL(20,12))"
                " ELSE CAST(0 AS DECIMAL(20,12)) END"
            )
        ).alias("v1"),
    )
    sizes = obs.agg(
        F.sum("g1").alias("n_g1"), F.sum(1 - F.col("g1")).alias("n_g2")
    )
    return terms.crossJoin(F.broadcast(sizes)).select(
        F.col("n_g1").cast("long").alias("n_early_cohort"),
        F.col("n_g2").cast("long").alias("n_late_cohort"),
        F.col("o1").cast("long").alias("observed_early"),
        F.round(F.col("e1").cast("double"), 6).alias("expected_early"),
        F.when(F.col("v1") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("o1").cast("double") - F.col("e1").cast("double"))
                * (F.col("o1").cast("double") - F.col("e1").cast("double"))
                / F.col("v1").cast("double"),
                6,
            )
        )
        .alias("chi2"),
    )


@query(
    "q326_scd2_intervals",
    oracle=f"""
    WITH slice AS (
      SELECT DISTINCT user_id FROM events
      WHERE {_md5_mod_sql("user_id", 20)} = 0
    ),
    daily AS (
      SELECT e.user_id, CAST(e.ts AS DATE) AS day, e.event_type,
             COUNT(*) AS cnt
      FROM events e JOIN slice s ON s.user_id = e.user_id
      GROUP BY 1, 2, 3
    ),
    dom AS (
      SELECT user_id, day,
             FIRST(event_type ORDER BY cnt DESC, event_type ASC) AS attr
      FROM daily GROUP BY 1, 2
    ),
    runs AS (
      SELECT user_id, day, attr,
             CASE WHEN LAG(attr) OVER (PARTITION BY user_id ORDER BY day)
                       IS DISTINCT FROM attr THEN 1 ELSE 0 END AS chg
      FROM dom
    ),
    rid AS (
      SELECT user_id, day, attr,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM runs
    ),
    iv AS (
      SELECT user_id, run_id, FIRST(attr) AS attr,
             MIN(day) AS valid_from, MAX(day) AS last_seen
      FROM rid GROUP BY 1, 2
    )
    SELECT user_id, attr,
           CAST(valid_from AS VARCHAR) AS valid_from,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY valid_from)
                - INTERVAL 1 DAY AS DATE)::VARCHAR AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             IS NULL AS is_current
    FROM iv ORDER BY user_id, valid_from
    """,
    tags=("scd2", "dimension", "window"),
)
def q326_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLOWLY-CHANGING-DIMENSION (type 2) build: per user, the dominant
    daily event type collapsed into validity intervals — consecutive
    active days with the same dominant type form one dimension row with
    [valid_from, valid_to) semantics (valid_to = day before the next
    interval opens, NULL + is_current on the open row) — the
    dimensional-modeling workhorse next to the CDC upsert (q180).
    Audited on a deterministic 5% user slice (md5 % 20 = 0) so the
    dimension table stays reviewable at any scale.

    Scale plan: the dominant-type pick is a (user, day)-keyed
    max-struct agg (never a window); runs and interval chaining are
    high-cardinality USER-partitioned windows (bounded per-task state);
    gaps-and-islands via the change-flag running sum.  Exactness:
    integer day arithmetic, deterministic (count desc, type asc)
    dominance ties, calendar days as strings."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    sl = ev.where(_md5_mod(F.col("user_id"), 20) == 0)
    daily = sl.groupBy(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    dom = daily.groupBy("user_id", "day").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("neg"), F.col("event_type").alias("t"))
        )
        .getField("t")
        .alias("attr")
    )
    wu = Window.partitionBy("user_id").orderBy("day")
    runs = dom.select(
        "user_id",
        "day",
        "attr",
        F.when(
            ~F.lag("attr").over(wu).eqNullSafe(F.col("attr")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    rid = runs.withColumn(
        "run_id",
        F.sum("chg").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = rid.groupBy("user_id", "run_id").agg(
        F.first("attr").alias("attr"),
        F.min("day").alias("valid_from"),
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(wv)
    return iv.select(
        "user_id",
        "attr",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.date_sub(nxt, 1).cast("string").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from")


@query(
    "q327_collocations_llr",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    bg AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    nn AS (SELECT COUNT(*) AS n FROM bg),
    c12 AS (SELECT w1, w2, COUNT(*) AS a FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1),
    c2 AS (SELECT w2, COUNT(*) AS n2 FROM bg GROUP BY 1),
    cells AS (
      SELECT c.w1, c.w2, c.a,
             c1.n1 - c.a AS b, c2.n2 - c.a AS cc,
             n.n - c1.n1 - c2.n2 + c.a AS d,
             c1.n1, c2.n2, n.n
      FROM c12 c JOIN c1 USING (w1) JOIN c2 USING (w2), nn n
    ),
    g AS (
      SELECT w1, w2, a,
             CAST(round(2 * a * ln(CAST(a AS DOUBLE) * n
                                   / (CAST(n1 AS DOUBLE) * n2)), 12)
                  AS DECIMAL(20,12))
             + CASE WHEN b > 0 THEN
                 CAST(round(2 * b * ln(CAST(b AS DOUBLE) * n
                     / (CAST(n1 AS DOUBLE) * (n - n2))), 12)
                      AS DECIMAL(20,12)) ELSE 0 END
             + CASE WHEN cc > 0 THEN
                 CAST(round(2 * cc * ln(CAST(cc AS DOUBLE) * n
                     / (CAST(n - n1 AS DOUBLE) * n2)), 12)
                      AS DECIMAL(20,12)) ELSE 0 END
             + CASE WHEN d > 0 THEN
                 CAST(round(2 * d * ln(CAST(d AS DOUBLE) * n
                     / (CAST(n - n1 AS DOUBLE) * (n - n2))), 12)
                      AS DECIMAL(20,12)) ELSE 0 END AS g2
      FROM cells WHERE a >= 5
    )
    SELECT w1, w2, CAST(a AS BIGINT) AS n_cooccur,
           round(CAST(g2 AS DOUBLE), 6) AS llr
    FROM g
    ORDER BY llr DESC, w1, w2 LIMIT 20
    """,
    tags=("text", "collocation", "statistics"),
)
def q327_collocations_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLOCATION extraction by Dunning's log-likelihood ratio: the
    top-20 adjacent word bigrams whose co-occurrence is most surprising
    under independence (G^2 over the 2x2 contingency of each bigram vs
    its margins, min co-count 5) — the statistically-grounded sibling
    of the PMI pairs (q170): LLR stays calibrated for rare words where
    PMI explodes.

    Scale plan: bigrams come from one shifted-array zip per document
    (the shingles kernel at n=2 — no positional self-join); margins and
    cells are three keyed aggs over the bounded bigram vocabulary.
    Exactness: all counts integer; each of the 4 G^2 terms is
    k*ln(exact integer ratio) snapped 12 dp into DECIMAL(20,12) before
    the exact sum (q244/q323 discipline); ranking ties break on the
    bigram text."""
    from ..functions.text import shingles

    docs = read_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    bg = docs.select(
        F.explode(shingles(toks, n=2)).alias("bigram")
    ).select(
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
    )
    bg = bg.localCheckpoint(eager=True)  # feeds 4 aggregates
    nn = bg.agg(F.count(F.lit(1)).alias("n"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("a"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    c2 = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n2"))
    cells = (
        c12.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nn))
        .where(F.col("a") >= 5)
        .select(
            "w1",
            "w2",
            "a",
            (F.col("n1") - F.col("a")).alias("b"),
            (F.col("n2") - F.col("a")).alias("cc"),
            (F.col("n") - F.col("n1") - F.col("n2") + F.col("a")).alias("d"),
            "n1",
            "n2",
            "n",
        )
    )
    term = (
        "CAST(round(2 * a * ln(CAST(a AS DOUBLE) * n"
        " / (CAST(n1 AS DOUBLE) * n2)), 12) AS DECIMAL(20,12))"
        " + CASE WHEN b > 0 THEN"
        " CAST(round(2 * b * ln(CAST(b AS DOUBLE) * n"
        " / (CAST(n1 AS DOUBLE) * (n - n2))), 12) AS DECIMAL(20,12))"
        " ELSE 0 END"
        " + CASE WHEN cc > 0 THEN"
        " CAST(round(2 * cc * ln(CAST(cc AS DOUBLE) * n"
        " / (CAST(n - n1 AS DOUBLE) * n2)), 12) AS DECIMAL(20,12))"
        " ELSE 0 END"
        " + CASE WHEN d > 0 THEN"
        " CAST(round(2 * d * ln(CAST(d AS DOUBLE) * n"
        " / (CAST(n - n1 AS DOUBLE) * (n - n2))), 12) AS DECIMAL(20,12))"
        " ELSE 0 END"
    )
    return (
        cells.select(
            "w1",
            "w2",
            F.col("a").cast("long").alias("n_cooccur"),
            F.round(F.expr(term).cast("double"), 6).alias("llr"),
        )
        .orderBy(F.col("llr").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "q328_theil_sen_trend",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, cnt,
             date_diff('day', (SELECT MIN(day) FROM d), day) AS x
      FROM d
    ),
    slopes AS (
      SELECT CAST(round(CAST(b.cnt - a.cnt AS DOUBLE) / (b.x - a.x), 12)
                  AS DECIMAL(20,12)) AS s
      FROM idx a JOIN idx b ON b.x > a.x
    ),
    r AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn, COUNT(*) OVER () AS m
      FROM slopes
    )
    SELECT CAST(MAX(m) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CASE
               WHEN m % 2 = 1 AND rn = (m + 1) // 2 THEN s
               WHEN m % 2 = 0 AND rn IN (m // 2, m // 2 + 1) THEN s / 2
               ELSE 0 END) AS DOUBLE), 6) AS slope_per_day
    FROM r
    """,
    tags=("timeseries", "robust", "trend"),
)
def q328_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend of the daily event volume: the median of
    all pairwise slopes — the outlier-proof alternative to the OLS
    slope (one anomalous day moves OLS; it barely moves the pairwise
    median).  Companion to the Mann-Kendall test (q329) that shares the
    pairwise structure.

    Scale plan: the pairwise table is bounded by the CALENDAR squared
    (~days^2/2 rows — grid-bounded, never corpus-bounded), so the
    rank-median runs on a bounded frame (AGG_INPUT_OK class).
    Exactness: slopes are exact integer ratios snapped 12 dp into
    DECIMAL(20,12) BEFORE ranking, so the sort order and the median
    element are identical cross-engine by construction; even-count
    medians average two exact decimals."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    d = d.localCheckpoint(eager=True)  # bounded; feeds min-day AND the pairs
    m0 = d.agg(F.min("day").alias("day0"))
    idx = d.crossJoin(F.broadcast(m0)).select(
        F.datediff("day", "day0").alias("x"), "cnt"
    )
    a = idx.select(F.col("x").alias("xa"), F.col("cnt").alias("ca"))
    b = idx.select(F.col("x").alias("xb"), F.col("cnt").alias("cb"))
    slopes = (
        a.join(b, F.col("xb") > F.col("xa"))
        .select(
            F.expr(
                "CAST(round(CAST(cb - ca AS DOUBLE) / (xb - xa), 12)"
                " AS DECIMAL(20,12))"
            ).alias("s")
        )
    )
    w = Window.orderBy("s")
    r = slopes.select(
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    return r.agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.round(
            F.sum(
                F.when(
                    (F.col("m") % 2 == 1) & (F.col("rn") == (F.col("m") + 1) / 2),
                    F.col("s"),
                )
                .when(
                    (F.col("m") % 2 == 0)
                    & (
                        (F.col("rn") == F.col("m") / 2)
                        | (F.col("rn") == F.col("m") / 2 + 1)
                    ),
                    F.col("s") / 2,
                )
                .otherwise(F.lit(0).cast("decimal(20,12)"))
            ).cast("double"),
            6,
        ).alias("slope_per_day"),
    )


@query(
    "q329_mann_kendall",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN b.cnt > a.cnt THEN 1
                  WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
      FROM d a JOIN d b ON b.day > a.day
    ),
    s AS (SELECT SUM(sgn) AS s, COUNT(*) AS n_pairs FROM pairs),
    nn AS (SELECT COUNT(*) AS n FROM d),
    ties AS (
      SELECT COALESCE(SUM(CAST(tc AS HUGEINT) * (tc - 1) * (2*tc + 5)), 0)
               AS tie_term
      FROM (SELECT cnt, COUNT(*) AS tc FROM d GROUP BY 1 HAVING COUNT(*) > 1)
    )
    SELECT CAST(s.s AS BIGINT) AS s_statistic,
           CAST(s.n_pairs AS BIGINT) AS n_pairs,
           round((CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2*nn.n + 5)
                  - CAST(ties.tie_term AS DOUBLE)) / 18, 6) AS variance,
           CASE WHEN nn.n * (nn.n - 1) * (2*nn.n + 5) - ties.tie_term = 0
                THEN NULL
                ELSE round((CAST(s.s AS DOUBLE)
                            - CASE WHEN s.s > 0 THEN 1
                                   WHEN s.s < 0 THEN -1 ELSE 0 END)
                     / sqrt((CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2*nn.n + 5)
                             - CAST(ties.tie_term AS DOUBLE)) / 18), 6) END
             AS z
    FROM s, nn, ties
    """,
    tags=("timeseries", "hypothesis-test", "trend"),
)
def q329_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL monotone-trend test on the daily event volume: the
    S statistic (concordant minus discordant day pairs), its
    tie-corrected variance, and the continuity-corrected Z — the
    nonparametric is-there-a-trend gate that pairs with Theil-Sen's
    how-big (q328); distribution-free unlike the OLS t-test.

    Scale plan: pairwise sign counts run on the calendar-bounded day
    grid (days^2/2 rows); ties and variance are exact integers.
    Exactness: S and the tie term are pure integers; Z is one
    continuity-corrected divide + IEEE sqrt of an exact rational,
    6-dp rounded (irrational — tie-impossible)."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    d = d.localCheckpoint(eager=True)  # bounded; feeds pairs, n, ties
    a = d.select(F.col("day").alias("da"), F.col("cnt").alias("ca"))
    b = d.select(F.col("day").alias("db"), F.col("cnt").alias("cb"))
    s = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        d.groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("tc"))
        .where(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(tc AS DECIMAL(38,0)) * (tc - 1) * (2*tc + 5)"
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("tie_term")
        )
    )
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("s").cast("long").alias("s_statistic"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(
                (
                    F.expr("CAST(n AS DOUBLE) * (n - 1) * (2*n + 5)")
                    - F.col("tie_term").cast("double")
                )
                / 18,
                6,
            ).alias("variance"),
            F.when(
                F.expr("n * (n - 1) * (2*n + 5) - tie_term") == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    (
                        F.col("s").cast("double")
                        - F.when(F.col("s") > 0, 1)
                        .when(F.col("s") < 0, -1)
                        .otherwise(0)
                    )
                    / F.sqrt(
                        (
                            F.expr("CAST(n AS DOUBLE) * (n - 1) * (2*n + 5)")
                            - F.col("tie_term").cast("double")
                        )
                        / 18
                    ),
                    6,
                )
            )
            .alias("z"),
        )
    )


_FK_EDGES: tuple[tuple[str, str, str, str, str], ...] = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "q331_fk_integrity_audit",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{fk}' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(SUM(CASE WHEN {col} IS NOT NULL AND p.{pcol} IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
    FROM {tbl} c LEFT JOIN {ptbl} p ON p.{pcol} = c.{col}
    """
        for fk, tbl, col, ptbl, pcol in _FK_EDGES
    )
    + "\nORDER BY fk",
    tags=("data-quality", "referential-integrity", "join"),
)
def q331_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENTIAL-INTEGRITY audit of the star schema: for every
    foreign-key edge, the row count, distinct key count, NULL keys, and
    ORPHANS (keys with no parent row) — the constraint check a lakehouse
    owes since parquet enforces nothing; completes the data-quality
    family (q85 column dq, q272 functional dependencies, q324 calendar
    gaps).

    Scale plan (r13 stacked form): ALL edges ride one edge-tagged
    (tag, key) union — one groupBy(tag, key) exchange for every fact
    side together (same shuffled rows as the former six per-edge
    exchanges, six fewer AQE stages: 37 → ~10 jobs), one LEFT join
    against the stacked distinct parent-key table (186 k rows at sf0.1
    — broadcastable; all keys are native integers, the r9 stacking
    caveat), one tag rollup.  Per-key pre-aggregation keeps every
    statistic a plain sum and the parent join at |keys| rows; NULL keys
    ride as one group per tag.  Exactness: pure integer counts."""
    facts = []
    parents = []
    for i, (fk, tbl, col, ptbl, pcol) in enumerate(_FK_EDGES):
        facts.append(
            read_table(spark, sf_dir, tbl).select(
                F.lit(i).alias("__t"), F.col(col).cast("long").alias("__k")
            )
        )
        parents.append(
            read_table(spark, sf_dir, ptbl).select(
                F.lit(i).alias("__t"), F.col(pcol).cast("long").alias("__pk")
            )
        )
    fu = facts[0]
    for f in facts[1:]:
        fu = fu.unionByName(f)
    pu = parents[0]
    for p in parents[1:]:
        pu = pu.unionByName(p)
    per_key = fu.groupBy("__t", "__k").agg(F.count(F.lit(1)).alias("__n"))
    pk = F.broadcast(pu.distinct().withColumnRenamed("__t", "__pt"))
    j = per_key.join(
        pk, (per_key["__t"] == F.col("__pt")) & (per_key["__k"] == F.col("__pk")),
        "left",
    )
    fk_name = F.element_at(
        F.array(*[F.lit(e[0]) for e in _FK_EDGES]), F.col("__t") + 1
    )
    return (
        j.groupBy("__t")
        .agg(
            F.sum("__n").alias("n_rows"),
            F.count(F.when(F.col("__k").isNotNull(), 1)).alias("n_keys"),
            F.sum(
                F.when(F.col("__k").isNull(), F.col("__n")).otherwise(0)
            ).alias("n_null"),
            F.sum(
                F.when(
                    F.col("__k").isNotNull() & F.col("__pk").isNull(),
                    F.col("__n"),
                ).otherwise(0)
            ).alias("n_orphan"),
        )
        .select(
            fk_name.alias("fk"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_orphan").cast("long").alias("n_orphan"),
        )
        .orderBy("fk")
    )


@query(
    "q330_join_fanout_audit",
    oracle="""
    WITH l AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
    ),
    o AS (
      SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(l.k, o.k) AS k,
             COALESCE(l.c, 0) AS lc, COALESCE(o.c, 0) AS oc
      FROM l FULL OUTER JOIN o USING (k)
    )
    SELECT CAST(SUM(CASE WHEN lc > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_left_keys,
           CAST(SUM(CASE WHEN oc > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_right_keys,
           CAST(MAX(lc) AS BIGINT) AS max_left_rows_per_key,
           CAST(MAX(oc) AS BIGINT) AS max_right_rows_per_key,
           CAST(MAX(CAST(lc AS HUGEINT) * oc) AS BIGINT) AS max_key_fanout,
           CAST(SUM(CAST(lc AS HUGEINT) * oc) AS BIGINT) AS join_output_rows,
           CAST(SUM(CASE WHEN lc > 0 AND oc = 0 THEN lc ELSE 0 END)
                AS BIGINT) AS left_dangling_rows,
           CAST(SUM(CASE WHEN oc > 0 AND lc = 0 THEN oc ELSE 0 END)
                AS BIGINT) AS right_dangling_rows
    FROM j
    """,
    tags=("profiling", "join", "planning"),
)
def q330_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN FAN-OUT audit for lineitem x orders on the order key: per-
    side key multiplicities, the worst per-key fan-out product, the
    EXACT join output cardinality, and dangling rows on each side — the
    planning statistic behind skew-join decisions (q102's salting, AQE
    skew splits) computed as a first-class query: sizing a join from
    per-key count sketches is how an optimizer avoids a 10x-output
    surprise at 100 TB.

    Scale plan: one key-count agg PER SIDE (map-side combinable), one
    key-keyed full-outer join of the two COUNT tables (never the fact
    tables themselves — the audit's cost is O(keys), not O(rows)).
    Exactness: pure integer counts; products widened."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    l = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("lc")
    )
    r = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("oc")
    )
    j = l.join(r, "k", "full_outer").select(
        F.coalesce("lc", F.lit(0)).alias("lc"),
        F.coalesce("oc", F.lit(0)).alias("oc"),
    )
    return j.agg(
        F.sum(F.when(F.col("lc") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_left_keys"),
        F.sum(F.when(F.col("oc") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_right_keys"),
        F.max("lc").cast("long").alias("max_left_rows_per_key"),
        F.max("oc").cast("long").alias("max_right_rows_per_key"),
        F.max(F.expr("CAST(lc AS DECIMAL(38,0)) * oc"))
        .cast("long")
        .alias("max_key_fanout"),
        F.sum(F.expr("CAST(lc AS DECIMAL(38,0)) * oc"))
        .cast("long")
        .alias("join_output_rows"),
        F.sum(F.when((F.col("lc") > 0) & (F.col("oc") == 0), F.col("lc")).otherwise(0))
        .cast("long")
        .alias("left_dangling_rows"),
        F.sum(F.when((F.col("oc") > 0) & (F.col("lc") == 0), F.col("oc")).otherwise(0))
        .cast("long")
        .alias("right_dangling_rows"),
    )
