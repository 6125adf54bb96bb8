"""Round-7 analytics additions, continued (q215+): rank-statistics model
evaluation (ROC AUC), change-point detection (CUSUM), distribution-free
uncertainty (split conformal), marketing attribution (last touch),
forensic digit analysis (Benford), and categorical association
(chi-square / Cramer's V).

Family ancestry: the reference's workload is exploratory pandas
analytics over event/alert tables (value_counts, shift() comparisons,
notebook eval loops — e.g. data_integration.ipynb's ad-hoc model-eval
and distribution-profiling cells); these re-express the same analysis
patterns as declarative, shuffle-conscious Spark plans with exact
DuckDB twins.

Cross-engine float discipline (CLAUDE.md): every reported ratio whose
numerator/denominator are exact integers is rounded via pure integer
division — half-away(num/den, 6dp) = (2*num*1e6 + den) div (2*den) for
num >= 0 — because round(x, 6) of an exact rational can hit a .5e-6 tie
that Spark (BigDecimal half-up) and DuckDB (multiply-round) resolve
differently.  Ratios computed through IEEE doubles from identical
inputs (order statistics, log10, sqrt) are safe under plain round(,6):
both engines round the same binary value, and a binary double can never
sit exactly on a non-dyadic .5e-6 boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import read_table
from .registry import query


@query(
    "q215_roc_auc",
    oracle="""
    WITH s AS (
      SELECT value, COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
      FROM events GROUP BY 1
    ),
    c AS (SELECT n, np, SUM(n) OVER (ORDER BY value) AS cum_n FROM s),
    r AS (
      SELECT SUM(np * (2*cum_n - n + 1)) AS r2,
             SUM(np) AS n_pos, SUM(n - np) AS n_neg
      FROM c
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CAST((2*(r2 - n_pos*(n_pos+1))*1000000 + 2*n_pos*n_neg)
                // (4*n_pos*n_neg) AS DOUBLE) / 1000000 AS auc
    FROM r
    """,
    tags=("ml-eval", "rank", "prefix-kernel"),
)
def q215_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of ``value`` as a score for the purchase class, via the
    Mann-Whitney rank-sum identity with exact tie handling (average
    ranks): AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg).

    Scale plan: ranks are NEVER materialized per row.  Aggregate to the
    distinct-score table first (one shuffle), then a GLOBAL running
    count over score order via the distributed prefix kernel
    (operators/prefix.py) — per-partition memory, no single-task
    whole-table window, no sort of the raw data.  The average rank of a
    tied score group falls out of (cum_n, n) arithmetic: twice the rank
    sum stays integral (2*avg_rank = 2*cum_n - n + 1), so the whole
    statistic is an exact bigint rational until the final 6-dp rounding
    (integer half-away division; fits bigint through ~1e8 rows — the
    100 TB variant casts the two products to DECIMAL(38,0)/HUGEINT)."""
    from ..operators.prefix import running_total

    ev = read_table(spark, sf_dir, "events")
    s = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
    )
    c = running_total(s, "n", order_cols=["value"], out_col="cum_n")
    r = c.agg(
        F.sum(F.col("np") * (2 * F.col("cum_n") - F.col("n") + 1)).alias("r2"),
        F.sum("np").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).alias("n_neg"),
    )
    return r.select(
        "n_pos",
        "n_neg",
        (
            F.expr(
                "(2*(r2 - n_pos*(n_pos+1))*1000000 + 2*n_pos*n_neg)"
                " div (4*n_pos*n_neg)"
            ).cast("double")
            / 1_000_000
        ).alias("auc"),
    )


@query(
    "q221_average_precision",
    oracle="""
    WITH s AS (
      SELECT value, COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT np, SUM(n) OVER (ORDER BY value DESC) AS cum_n,
             SUM(np) OVER (ORDER BY value DESC) AS cum_p
      FROM s
    ),
    t AS (
      SELECT SUM((2*np*cum_p*1000000 + cum_n) // (2*cum_n)) AS total_units,
             SUM(np) AS n_pos, COUNT(*) AS n_blocks
      FROM c WHERE np > 0
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST((2*total_units + n_pos) // (2*n_pos) AS DOUBLE) / 1000000
             AS avg_precision
    FROM t
    """,
    tags=("ml-eval", "rank", "prefix-kernel"),
)
def q221_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the PR-curve summary) of ``value`` scoring the
    purchase class, with deterministic block tie handling: every positive
    in a tied-score block receives the precision at the END of its block
    (cum_p / cum_n inclusive of the whole block) — the conservative
    convention, independent of any within-tie ordering.

    Scale plan: q215's sibling, but AP needs TWO aligned prefixes of the
    same descending-score order (cumulative rows AND cumulative
    positives), so it uses the multi-spec prefix kernel
    (operators/prefix.running_totals): ONE range partitioning, one
    control table carrying both partial sums — two running_total calls
    would shuffle twice and could sample different range boundaries.
    Per-block term np*cum_p/cum_n is rounded to 6 dp by pure integer
    half-away division (exact bigint rational — a double .5e-6 tie here
    is not just possible but common, e.g. precision exactly 1/2), the
    integer micro-units are summed exactly, and the final mean over
    positives is one more integer division."""
    from ..operators.prefix import running_totals

    ev = read_table(spark, sf_dir, "events")
    s = (
        ev.groupBy("value")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np"),
        )
        .withColumn("negv", -F.col("value"))
    )
    c = running_totals(
        s, [("n", "cum_n"), ("np", "cum_p")], order_cols=["negv"]
    )
    t = c.where(F.col("np") > 0).agg(
        F.sum(
            F.expr("(2*np*cum_p*1000000 + cum_n) div (2*cum_n)")
        ).alias("total_units"),
        F.sum("np").alias("n_pos"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    return t.select(
        "n_pos",
        "n_blocks",
        (
            F.expr("(2*total_units + n_pos) div (2*n_pos)").cast("double")
            / 1_000_000
        ).alias("avg_precision"),
    )


@query(
    "q216_cusum_changepoint",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, COUNT(*) AS nd, SUM(cnt) AS tot FROM d GROUP BY 1),
    c AS (
      SELECT d.event_type, day, nd, tot,
             ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY day) AS ti,
             SUM(cnt) OVER (PARTITION BY d.event_type ORDER BY day) AS cum
      FROM d JOIN t USING (event_type)
    ),
    s AS (
      SELECT event_type, day, nd, ABS(nd*cum - ti*tot) AS anum FROM c
    ),
    r AS (
      SELECT event_type, day, nd, anum,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY anum DESC, day) AS rn
      FROM s
    )
    SELECT event_type, CAST(day AS VARCHAR) AS cp_day,
           CAST((2*anum*1000000 + nd) // (2*nd) AS DOUBLE) / 1000000 AS s_abs,
           CAST(nd AS BIGINT) AS n_days
    FROM r WHERE rn = 1
    """,
    tags=("timeseries", "changepoint", "agg-grid-window"),
)
def q216_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate per event type: the day t maximizing
    |S_t| where S_t = cumulative (count_i - mean) over the daily series
    — the classic mean-shift locator (Page's statistic at its argmax).

    The cumulative window runs over the per-DAY aggregate grid (rows
    bounded by calendar x 5 types — the q210/q213 exemption class), not
    the raw events.  Exact arithmetic: S_t * n_days = n_days*cum - t*tot
    is a pure integer, so the argmax and the tie-break (earliest day)
    are engine-independent; only the final report divides, via integer
    half-away rounding."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("cnt").alias("tot")
    )
    wday = Window.partitionBy("event_type").orderBy("day")
    c = (
        d.join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "day",
            "nd",
            "tot",
            F.row_number().over(wday).alias("ti"),
            F.sum("cnt").over(wday).alias("cum"),
        )
        .withColumn(
            "anum", F.abs(F.col("nd") * F.col("cum") - F.col("ti") * F.col("tot"))
        )
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("anum"), "day")
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            (
                F.expr("(2*anum*1000000 + nd) div (2*nd)").cast("double") / 1_000_000
            ).alias("s_abs"),
            F.col("nd").alias("n_days"),
        )
    )


def _lr_oracle() -> str:
    """Unrolled 3-step IRLS oracle.  Each level references only the
    PREVIOUS level's single CTE (betas are carried THROUGH the aggregate
    via MAX so no level is referenced twice — the q141 CTE-inlining
    blow-up rule)."""
    head = """
    WITH base AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
      FROM events
    ),
    stats AS (SELECT COUNT(*) AS n, SUM(q) AS sq, SUM(q*q) AS ssq FROM base),
    xb AS (
      SELECT y,
             (CAST(q AS DOUBLE)/100 - CAST(sq AS DOUBLE)/(100*n))
               / sqrt(CAST(ssq AS DOUBLE)/(10000*n)
                      - POW(CAST(sq AS DOUBLE)/(100*n), 2)) AS x
      FROM base, stats
    ),
    b0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1)
    """
    step = """
    , p{k} AS (
      SELECT y, x, 1 / (1 + exp(-(b0 + b1 * x))) AS p, b0, b1
      FROM xb, b{j}
    ),
    a{k} AS (
      SELECT
        CAST(SUM(CAST(round(p*(1-p), 10) AS DECIMAL(38,10))) AS DOUBLE) AS s0,
        CAST(SUM(CAST(round(p*(1-p)*x, 10) AS DECIMAL(38,10))) AS DOUBLE) AS s1,
        CAST(SUM(CAST(round(p*(1-p)*x*x, 10) AS DECIMAL(38,10))) AS DOUBLE) AS s2,
        CAST(SUM(CAST(round(y - p, 10) AS DECIMAL(38,10))) AS DOUBLE) AS g0,
        CAST(SUM(CAST(round((y - p)*x, 10) AS DECIMAL(38,10))) AS DOUBLE) AS g1,
        MAX(b0) AS b0, MAX(b1) AS b1
      FROM p{k}
    ),
    b{k} AS (
      SELECT round(b0 + (s2*g0 - s1*g1) / (s0*s2 - s1*s1), 6) AS b0,
             round(b1 + (s0*g1 - s1*g0) / (s0*s2 - s1*s1), 6) AS b1
      FROM a{k}
    )
    """
    tail = """
    SELECT n, b0, b1,
           CAST((2*n_correct*1000000 + n) // (2*n) AS DOUBLE) / 1000000
             AS accuracy
    FROM (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN (CASE WHEN b0 + b1*x >= 0 THEN 1 ELSE 0 END) = y
                      THEN 1 ELSE 0 END) AS n_correct,
             MAX(b0) AS b0, MAX(b1) AS b1
      FROM xb, b3
    )
    """
    return head + "".join(step.format(k=k, j=k - 1) for k in (1, 2, 3)) + tail


@query(
    "q222_logistic_irls",
    oracle=_lr_oracle(),
    tags=("ml-train", "iterative", "exact-decimal"),
)
def q222_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression by 3 unrolled IRLS/Newton steps:
    P(purchase | value) with a standardized feature, trained exactly the
    way a 100 TB job would — each step is ONE map-side-combinable
    aggregate over the corpus producing the 2x2 Hessian moments and the
    gradient, the 2-parameter state rides along as a broadcast 1-row
    table, and the Newton solve is closed-form.

    Cross-engine float discipline: the feature is standardized through
    EXACT integer cents moments (sum/sum-of-squares as bigint — ssq
    stays < 2^53 through sf1, so the double cast is exact; the variance
    is then pure double arithmetic on identical inputs).  Per-row IRLS
    terms go through exp() (1-ulp libm divergence possible) so each term
    is rounded to 10 dp and summed EXACTLY as DECIMAL(38,10) — a raw
    double sum over a shuffle would be partitioning-dependent; a 1e-10
    term flip shifts beta by ~1e-13, absorbed by the per-step 6-dp
    round.  Accuracy compares z = b0 + b1*x >= 0 from the ROUNDED betas
    and identical x doubles — engine-exact — and reports an
    integer-rounded ratio."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("q"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("ssq"),
    )
    mu = F.col("sq").cast("double") / (100 * F.col("n"))
    var = F.col("ssq").cast("double") / (10000 * F.col("n")) - mu * mu
    xb = (
        base.crossJoin(F.broadcast(stats))
        .select(
            "y",
            ((F.col("q").cast("double") / 100 - mu) / F.sqrt(var)).alias("x"),
            "n",
        )
        .localCheckpoint(eager=True)  # feeds 3 IRLS aggregates + the eval pass
    )

    def dsum10(c):
        return F.sum(F.round(c, 10).cast("decimal(38,10)")).cast("double")

    beta = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    for _ in range(3):
        p = F.lit(1.0) / (1 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
        w = p * (1 - p)
        a = xb.crossJoin(F.broadcast(beta)).agg(
            dsum10(w).alias("s0"),
            dsum10(w * F.col("x")).alias("s1"),
            dsum10(w * F.col("x") * F.col("x")).alias("s2"),
            dsum10(F.col("y") - p).alias("g0"),
            dsum10((F.col("y") - p) * F.col("x")).alias("g1"),
            F.max("b0").alias("b0"),
            F.max("b1").alias("b1"),
        )
        det = F.col("s0") * F.col("s2") - F.col("s1") * F.col("s1")
        beta = a.select(
            F.round(
                F.col("b0")
                + (F.col("s2") * F.col("g0") - F.col("s1") * F.col("g1")) / det,
                6,
            ).alias("b0"),
            F.round(
                F.col("b1")
                + (F.col("s0") * F.col("g1") - F.col("s1") * F.col("g0")) / det,
                6,
            ).alias("b1"),
        )
    pred_ok = (
        F.when(F.col("b0") + F.col("b1") * F.col("x") >= 0, 1).otherwise(0)
        == F.col("y")
    )
    return (
        xb.crossJoin(F.broadcast(beta))
        .agg(
            F.max("n").alias("n"),
            F.sum(F.when(pred_ok, 1).otherwise(0)).alias("n_correct"),
            F.max("b0").alias("b0"),
            F.max("b1").alias("b1"),
        )
        .select(
            "n",
            "b0",
            "b1",
            (
                F.expr("(2*n_correct*1000000 + n) div (2*n)").cast("double")
                / 1_000_000
            ).alias("accuracy"),
        )
    )


_MD5_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 5"
)


@query(
    "q217_conformal_interval",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             {_MD5_BUCKET} AS bucket
      FROM orders
    ),
    mu AS (
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS mu
      FROM b WHERE bucket <= 2 GROUP BY 1
    ),
    cal AS (
      SELECT b.o_orderpriority, ABS(o_totalprice - mu) AS absres, o_orderkey
      FROM b JOIN mu USING (o_orderpriority) WHERE bucket = 3
    ),
    ranked AS (
      SELECT o_orderpriority, absres,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY absres, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_cal
      FROM cal
    ),
    qh AS (
      SELECT o_orderpriority, n_cal,
             LEAST((9*(n_cal+1) + 9) // 10, n_cal) AS k, absres AS q_hat
      FROM ranked
      WHERE rn = LEAST((9*(n_cal+1) + 9) // 10, n_cal)
    ),
    test AS (
      SELECT b.o_orderpriority,
             CASE WHEN ABS(o_totalprice - mu) <= q_hat THEN 1 ELSE 0 END AS inside
      FROM b JOIN mu USING (o_orderpriority) JOIN qh USING (o_orderpriority)
      WHERE bucket = 4
    ),
    cov AS (
      SELECT o_orderpriority, COUNT(*) AS n_test, SUM(inside) AS n_in
      FROM test GROUP BY 1
    )
    SELECT q.o_orderpriority, CAST(n_cal AS BIGINT) AS n_cal,
           CAST(k AS BIGINT) AS k, round(q_hat, 6) AS q_hat,
           CAST(n_test AS BIGINT) AS n_test,
           CAST((2*n_in*1000000 + n_test) // (2*n_test) AS DOUBLE) / 1000000
             AS coverage
    FROM qh q JOIN cov USING (o_orderpriority)
    """,
    tags=("ml-eval", "conformal", "prefix-kernel", "quantile"),
)
def q217_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian split-conformal prediction intervals per order priority:
    md5-stable 60/20/20 train/calibration/test split, a per-group mean
    model on train, q_hat = the ceil(0.9*(n_cal+1))-th smallest absolute
    calibration residual (the distribution-free 90% bound), and the
    empirical test-set coverage of mu +/- q_hat.

    The order statistic comes from the distributed prefix kernel's
    grouped global ranks (operators/prefix.py) — no per-group
    single-task sort; k is computed by pure integer ceiling
    ((9*(n+1)+9) div 10), never ceil(0.9*(n+1)) in doubles, whose
    binary representation can straddle an exact integer.  The coverage
    comparison uses the UNROUNDED q_hat double (identical in both
    engines); only the report rounds."""
    from ..operators.prefix import global_ranks

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        (
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 5
        ).alias("bucket"),
    )
    mu = (
        o.where(F.col("bucket") <= 2)
        .groupBy("o_orderpriority")
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mu")
        )
    )
    cal = (
        o.where(F.col("bucket") == 3)
        .join(F.broadcast(mu), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.abs(F.col("o_totalprice") - F.col("mu")).alias("absres"),
            "o_orderkey",
        )
    )
    ranked = global_ranks(
        cal,
        order_cols=["absres", "o_orderkey"],
        group_cols=["o_orderpriority"],
        rn_col="rn",
        total_col="n_cal",
    )
    k = F.least(
        F.expr("(9*(n_cal+1) + 9) div 10"), F.col("n_cal")
    )
    qh = (
        ranked.withColumn("k", k)
        .where(F.col("rn") == F.col("k"))
        .select("o_orderpriority", "n_cal", "k", F.col("absres").alias("q_hat"))
    )
    test = (
        o.where(F.col("bucket") == 4)
        .join(F.broadcast(mu), "o_orderpriority")
        .join(F.broadcast(qh), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_cal",
            "k",
            "q_hat",
            F.when(
                F.abs(F.col("o_totalprice") - F.col("mu")) <= F.col("q_hat"), 1
            )
            .otherwise(0)
            .alias("inside"),
        )
    )
    return test.groupBy("o_orderpriority", "n_cal", "k", "q_hat").agg(
        F.count(F.lit(1)).alias("n_test"), F.sum("inside").alias("n_in")
    ).select(
        "o_orderpriority",
        "n_cal",
        "k",
        F.round("q_hat", 6).alias("q_hat"),
        "n_test",
        (
            F.expr("(2*n_in*1000000 + n_test) div (2*n_test)").cast("double")
            / 1_000_000
        ).alias("coverage"),
    )


@query(
    "q218_last_touch_attribution",
    oracle="""
    WITH marked AS (
      SELECT event_type, ts,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts
      FROM events
    ),
    attributed AS (
      SELECT CASE WHEN lt_type IS NOT NULL
                   AND lt_ts >= ts - INTERVAL 7 DAY THEN lt_type
                  ELSE 'direct' END AS channel
      FROM marked WHERE event_type = 'purchase'
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM attributed)
    SELECT channel, COUNT(*) AS n,
           CAST((2*COUNT(*)*1000000 + n_total) // (2*n_total) AS DOUBLE)
             / 1000000 AS share
    FROM attributed, tot GROUP BY channel, n_total
    """,
    tags=("window", "attribution", "funnel"),
)
def q218_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRIOR non-purchase event within a 7-day lookback, else
    'direct' — the standard marketing-attribution report the reference's
    event analysis implies (funnel/retention cousins: q98/q99/q156).

    One window pass partitioned by user_id (high-cardinality — per-task
    state is one user's history, bounded), ordered by (ts, event_id) for
    a total order; last(col, ignorenulls) over the strictly-prior frame
    gives both the channel and its timestamp in the same pass.  The
    lookback compares timestamps via interval arithmetic (identical in
    both engines); shares are integer-rounded rationals."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    np_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    np_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    marked = ev.select(
        "event_type",
        "ts",
        F.last(np_type, ignorenulls=True).over(w).alias("lt_type"),
        F.last(np_ts, ignorenulls=True).over(w).alias("lt_ts"),
    )
    attributed = marked.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("lt_type").isNotNull()
            & (F.col("lt_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
            F.col("lt_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel")
    )
    tot = attributed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        attributed.groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n",
            (
                F.expr("(2*n*1000000 + n_total) div (2*n_total)").cast("double")
                / 1_000_000
            ).alias("share"),
        )
    )


@query(
    "q219_benford_audit",
    oracle="""
    WITH digits AS (
      SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         AS VARCHAR), 1, 1) AS digit
      FROM orders
    ),
    counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n_total FROM digits)
    SELECT digit, n,
           CAST((2*n*1000000 + n_total) // (2*n_total) AS DOUBLE) / 1000000
             AS observed,
           round(log10(1 + 1 / CAST(digit AS DOUBLE)), 6) AS expected,
           round(ABS(CAST((2*n*1000000 + n_total) // (2*n_total) AS DOUBLE)
                     / 1000000
                     - round(log10(1 + 1 / CAST(digit AS DOUBLE)), 6)), 6) AS dev
    FROM counts, tot
    """,
    tags=("dq", "audit", "distribution"),
)
def q219_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts: observed vs
    expected log10(1 + 1/d) leading-digit shares — the classic forensic
    data-quality screen for fabricated or truncated monetary columns.

    The leading digit is extracted through exact integer cents
    (floor(x*100 + 0.5), the micro-grid snap) and string formatting of a
    BIGINT — identical in both engines, immune to float log10-of-the-
    value-itself edge cases.  Expected shares DO use log10, but only as
    report output: all nine constants sit >= 2e-8 away from a .5e-6
    rounding boundary, so a 1-ulp libm difference cannot flip the 6-dp
    round (verified digit by digit).  Observed shares are integer-
    rounded rationals.  One tiny groupBy — the scan aggregates to <= 9
    rows; at 100 TB this is a map-side-combined count, no other
    shuffle."""
    o = read_table(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .cast("string"),
            1,
            1,
        ).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = digits.agg(F.count(F.lit(1)).alias("n_total"))
    obs = F.expr("(2*n*1000000 + n_total) div (2*n_total)").cast(
        "double"
    ) / F.lit(1_000_000.0)
    exp = F.round(F.log10(1 + 1 / F.col("digit").cast("double")), 6)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            obs.alias("observed"),
            exp.alias("expected"),
            F.round(F.abs(obs - exp), 6).alias("dev"),
        )
    )


@query(
    "q220_chi_square_independence",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(date_part('dow', ts) + 1 AS BIGINT) AS dow
      FROM events
    ),
    cells AS (SELECT event_type, dow, COUNT(*) AS o FROM e GROUP BY 1, 2),
    rt AS (SELECT event_type, COUNT(*) AS r FROM e GROUP BY 1),
    ct AS (SELECT dow, COUNT(*) AS c FROM e GROUP BY 1),
    tt AS (SELECT COUNT(*) AS n FROM e),
    contrib AS (
      SELECT round(POW(CAST(o*n - r*c AS DOUBLE), 2)
                   / CAST(n*r*c AS DOUBLE), 6) AS cell,
             n, r, c
      FROM cells JOIN rt USING (event_type) JOIN ct USING (dow), tt
    ),
    agg AS (
      SELECT MAX(n) AS n,
             CAST(SUM(CAST(cell AS DECIMAL(18,6))) AS DOUBLE) AS chi2
      FROM contrib
    ),
    dims AS (
      SELECT (SELECT COUNT(*) FROM rt) AS nrows,
             (SELECT COUNT(*) FROM ct) AS ncols
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((nrows - 1) * (ncols - 1) AS BIGINT) AS dof, chi2,
           round(sqrt(chi2 / (n * LEAST(nrows - 1, ncols - 1))), 6) AS cramers_v
    FROM agg, dims
    """,
    tags=("stats", "association", "agg"),
)
def q220_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence for event_type x
    day-of-week, plus Cramer's V effect size — the categorical
    association screen behind every "is traffic mix shifting by
    weekday?" dashboard.

    Per-cell contribution is computed as (o*n - r*c)^2 / (n*r*c): the
    difference is EXACT bigint before the double cast, so both engines
    square and divide the same binary values; each of the <= 35 cell
    doubles is rounded to 6 dp, then summed EXACTLY as DECIMAL(18,6)
    (a float sum over an unordered shuffle would be
    partitioning-dependent).  Three map-side-combined aggregates over
    one scan (cells, row totals, column totals are all tiny) and
    broadcast joins — nothing here grows beyond the 5x7 grid."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    )
    pinned = ev.localCheckpoint(eager=True)  # feeds 4 aggregates
    cells = pinned.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    rt = pinned.groupBy("event_type").agg(F.count(F.lit(1)).alias("r"))
    ct = pinned.groupBy("dow").agg(F.count(F.lit(1)).alias("c"))
    tt = pinned.agg(F.count(F.lit(1)).alias("n"))
    contrib = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tt))
        .select(
            "n",
            "r",
            "c",
            F.round(
                F.pow(
                    (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast(
                        "double"
                    ),
                    2,
                )
                / (F.col("n") * F.col("r") * F.col("c")).cast("double"),
                6,
            ).alias("cell"),
        )
    )
    agg = contrib.agg(
        F.max("n").alias("n"),
        F.sum(F.col("cell").cast("decimal(18,6)")).cast("double").alias("chi2"),
    )
    dims = cells.agg(
        F.countDistinct("event_type").alias("nrows"),
        F.countDistinct("dow").alias("ncols"),
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        "n",
        ((F.col("nrows") - 1) * (F.col("ncols") - 1)).cast("long").alias("dof"),
        "chi2",
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("nrows") - 1, F.col("ncols") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )
