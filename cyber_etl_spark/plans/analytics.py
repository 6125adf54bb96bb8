"""Round-7 analytics additions: sketch-assisted exact heavy hitters,
robust (winsorized) statistics, a seasonal-naive forecast backtest,
SymSpell edit-distance self-join, and resource-allocation link
prediction.

Each is the scale-first physical strategy for an operation the
reference's workload implies but expresses imperatively (value_counts
profiling, notebook outlier trimming, pandas shift() comparisons,
manual fuzzy matching, GDS link prediction) — declared Spark-first and
hash-gated against a plain-SQL DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import query
from .textops import _SHINGLES_CTE, cached_shingles


@query(
    "q181_heavy_hitters",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    counts AS (SELECT shingle, COUNT(*) AS cnt FROM sh GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM sh)
    SELECT shingle, cnt FROM counts, tot WHERE cnt * 5000 > n
    """,
    tags=("agg", "heavy-hitters", "sketch", "curation"),
)
def q181_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE SHINGLES: every 3-word shingle whose document
    frequency exceeds phi*N (phi = 1/5000) — the φ-heavy-hitters cut a
    curation pipeline uses to spot template boilerplate before dedup.

    Physical plan is the two-pass Misra–Gries kernel
    (operators/heavyhitters.py): bounded per-partition candidate
    summaries (k = 5000 counters), then an exact count of the candidate
    set only — no full-vocabulary shuffle, which is what the oracle's
    plain GROUP BY would cost at 100 TB.  The exact verification pass
    makes the output independent of partitioning, so the sketch-assisted
    plan hash-matches the exhaustive SQL twin."""
    from ..operators.heavyhitters import frequent_items

    sh = cached_shingles(spark, sf_dir).select(F.col("shingle"))
    return frequent_items(sh, "shingle", phi_denom=5000)


@query(
    "q182_winsorized_mean",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             round(CAST(percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice)
                        AS DOUBLE), 6) AS lo,
             round(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice)
                        AS DOUBLE), 6) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag, b.lo, b.hi,
           CAST(SUM(CAST(LEAST(GREATEST(l.l_extendedprice, b.lo), b.hi)
                         AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS wmean,
           COUNT(CASE WHEN l.l_extendedprice < b.lo THEN 1 END) AS n_lo,
           COUNT(CASE WHEN l.l_extendedprice > b.hi THEN 1 END) AS n_hi
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY 1, 2, 3
    """,
    tags=("agg", "robust", "percentile"),
)
def q182_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED MEAN per return flag: clamp l_extendedprice into its
    per-group [p05, p95] band, then average — the robust-statistics twin
    of q130's MAD outlier cut (clamp instead of drop).  The bounds come
    from the distributed exact-quantile kernel (never the banned
    in-memory percentile aggregate) and are rounded to 6 dp BEFORE
    clamping in both engines, so a last-ulp interpolation difference
    cannot move a row across the clamp boundary; the clamped sum uses
    the dsum DECIMAL(18,6) discipline (bounds are 6-dp exact, raw prices
    2-dp exact, so the cast is exact on every input)."""
    from ..operators.quantiles import exact_quantiles

    li = read_table(spark, sf_dir, "lineitem")
    bounds = exact_quantiles(
        li, "l_extendedprice", {"lo": 0.05, "hi": 0.95}, ["l_returnflag"]
    ).select(
        "l_returnflag", F.round("lo", 6).alias("lo"), F.round("hi", 6).alias("hi")
    )
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            (
                F.sum(clamped.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))
            ).alias("wmean"),
            F.count(F.when(F.col("l_extendedprice") < F.col("lo"), 1)).alias("n_lo"),
            F.count(F.when(F.col("l_extendedprice") > F.col("hi"), 1)).alias("n_hi"),
        )
    )


@query(
    "q183_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           COUNT(*) AS n_days,
           CAST(SUM(ABS(a.cnt - f.cnt)) AS DOUBLE) / COUNT(*) AS mae,
           CAST(SUM(ABS(a.cnt - f.cnt)) AS DOUBLE) / SUM(a.cnt) AS wape
    FROM daily a
    JOIN daily f ON f.event_type = a.event_type AND f.d = a.d - INTERVAL 7 DAY
    GROUP BY 1
    """,
    tags=("timeseries", "forecast", "backtest"),
)
def q183_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-NAIVE FORECAST BACKTEST: predict each day's event count
    per type with the count 7 days earlier, score with MAE and WAPE
    (sum |actual-forecast| / sum actual).  The lag is an equi-join on
    (type, day-7) — NOT a lag() window over the 5-value event_type key,
    which would be the q63/q160 single-reducer class — so the plan
    shuffles on the composite key and scales with days x types.  Both
    metrics are ratios of exact integer sums: one IEEE division per
    group, bit-identical across engines (no intermediate float
    accumulation to drift)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a, f = daily.alias("a"), daily.alias("f")
    adiff = F.abs(F.col("a.cnt") - F.col("f.cnt"))
    return (
        a.join(
            f,
            (F.col("f.event_type") == F.col("a.event_type"))
            & (F.col("f.d") == F.col("a.d") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (F.sum(adiff).cast("double") / F.count(F.lit(1))).alias("mae"),
            (F.sum(adiff).cast("double") / F.sum(F.col("a.cnt"))).alias("wape"),
        )
    )


@query(
    "q184_symspell_pairs",
    oracle="""
    WITH v AS (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL)
    SELECT a.c_name AS name_a, b.c_name AS name_b
    FROM v a JOIN v b
      ON a.c_name < b.c_name
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
    tags=("string", "fuzzy", "dedup", "symspell"),
)
def q184_symspell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-PAIRS edit-distance <= 1 self-join over customer names via
    SYMSPELL deletion-neighborhood blocking: each name emits itself plus
    its |s| one-character-deletion variants as join keys; two strings
    within edit distance 1 MUST share a key (equal -> the full string;
    insert/delete -> the shorter IS a deletion of the longer;
    substitute -> both share the deletion at the substituted position),
    so the banded equi-join is lossless and the oracle's brute-force
    quadratic scan is the exactness gate.  Candidates are verified with
    the bounded-DP levenshtein (threshold arg -> O(k*n) per pair, the
    q87 discipline).  Complements q87's probe-vs-table shape with the
    self-join fuzzy-dedup shape: O(n * len) index rows instead of O(n^2)
    comparisons."""
    cust = read_table(spark, sf_dir, "customer")
    v = cust.where(F.col("c_name").isNotNull()).select("c_name").distinct()
    dels = F.transform(
        F.sequence(F.lit(1), F.length("c_name")),
        lambda i: F.concat(
            F.col("c_name").substr(F.lit(1), i - 1),
            F.col("c_name").substr(i + 1, F.length("c_name")),
        ),
    )
    keyed = v.select(
        "c_name", F.explode(F.array_union(F.array(F.col("c_name")), dels)).alias("k")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.c_name") < F.col("b.c_name")))
        .select(F.col("a.c_name").alias("name_a"), F.col("b.c_name").alias("name_b"))
        .distinct()
        .where(F.levenshtein("name_a", "name_b", 1) >= 0)
    )


def _pq_oracle(
    m: int = 4,
    n_cells: int = 16,
    iters: int = 1,
    k: int = 10,
    dim: int = 64,
    n_queries_below: int = 20,
) -> str:
    """Chained-CTE replay of operators.ann.pq_adc_knn: micro-grid
    quantization, per-subspace Lloyd (exact integer squared-L2 assign,
    integer-mean update, empty-cell carry-over), code table, per-query
    lookup table, integer ADC sum.  Nothing is rounded anywhere, so the
    hash gate checks the whole pipeline bit-for-bit."""
    subdim = dim // m
    dsq = (
        f"list_sum(list_transform(range(1, {subdim + 1}),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    assign_tpl = f"""{{name}} AS (
  SELECT id, sub, cell FROM (
    SELECT v.id, v.sub, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.id, v.sub
             ORDER BY {dsq.format(a='v.svm', b='c.cm')} ASC, c.cell ASC) AS rn
    FROM subs v JOIN {{cents}} c ON c.sub = v.sub
  ) WHERE rn = 1
)"""
    steps = [
        "base AS (SELECT vec_id AS id, list_transform(embedding::DOUBLE[],"
        " x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vm FROM embeddings)",
        f"subs AS (SELECT id, u.sub, vm[u.sub * {subdim} + 1 : u.sub * {subdim} + {subdim}]"
        f" AS svm FROM base CROSS JOIN (SELECT unnest(range(0, {m})) AS sub) u)",
        f"seeds AS (SELECT id FROM base ORDER BY id LIMIT {n_cells})",
        "cents0 AS (SELECT s.sub, s.id AS cell, s.svm AS cm"
        " FROM subs s JOIN seeds USING (id))",
    ]
    for i in range(iters):
        steps.append(assign_tpl.format(name=f"assign{i}", cents=f"cents{i}"))
        steps.append(
            f"""sums{i + 1} AS (
  SELECT a.sub, a.cell, u.pos,
         CAST(floor(SUM(v.svm[u.pos + 1]) / COUNT(*) + 0.5) AS BIGINT) AS cmicro
  FROM assign{i} a JOIN subs v ON v.id = a.id AND v.sub = a.sub
  CROSS JOIN (SELECT unnest(range(0, {subdim})) AS pos) u
  GROUP BY 1, 2, 3
)"""
        )
        steps.append(
            f"newc{i + 1} AS (SELECT sub, cell, list(cmicro ORDER BY pos) AS cm"
            f" FROM sums{i + 1} GROUP BY 1, 2)"
        )
        steps.append(
            f"""cents{i + 1} AS (
  SELECT c.sub, c.cell, COALESCE(n.cm, c.cm) AS cm
  FROM cents{i} c LEFT JOIN newc{i + 1} n USING (sub, cell)
)"""
        )
    steps.append(assign_tpl.format(name="codes", cents=f"cents{iters}"))
    steps.append(
        f"q AS (SELECT id AS query_id, sub, svm AS qvm FROM subs"
        f" WHERE id < {n_queries_below})"
    )
    steps.append(
        f"""lut AS (
  SELECT q.query_id, q.sub, c.cell,
         {dsq.format(a='q.qvm', b='c.cm')} AS d
  FROM q JOIN cents{iters} c ON c.sub = q.sub
)"""
    )
    steps.append(
        """adc AS (
  SELECT l.query_id, co.id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS adc
  FROM codes co JOIN lut l ON l.sub = co.sub AND l.cell = co.cell
  WHERE co.id <> l.query_id
  GROUP BY 1, 2
)"""
    )
    return (
        "WITH "
        + ",\n".join(steps)
        + f"""
SELECT query_id, neighbor_id, adc FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY adc ASC, neighbor_id ASC) AS rn
  FROM adc
) WHERE rn <= {k}"""
    )


@query(
    "q186_pq_adc_knn",
    oracle=_pq_oracle(),
    tags=("ann", "quantization", "pq", "embedding"),
)
def q186_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZATION kNN with asymmetric distance (Jégou et al.):
    4 sub-codebooks x 16 cells compress each 64-dim vector to 4 bytes;
    queries stay full precision; distance = sum of 4 table lookups.
    Completes the ANN quantization family (q133 is SCALAR int8 + ADC —
    8x; PQ is 64x with a trained codebook).  The whole pipeline runs on
    the exact 1e-6 integer grid — squared-L2 assignment, integer-mean
    Lloyd update, integer ADC sums — so the oracle's per-subspace Lloyd
    unroll hash-matches with no rounding convention at all.  At scale
    the ADC scan reads the 4-byte code table, never raw vectors."""
    from ..operators.ann import pq_adc_knn

    emb = read_table(spark, sf_dir, "embeddings")
    return pq_adc_knn(emb)


@query(
    "q185_ra_link_prediction",
    oracle="""
    WITH li2 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    ew AS (SELECT a.s AS src, b.s AS dst, COUNT(*) AS w
           FROM li2 a JOIN li2 b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
    qq AS (SELECT quantile_cont(w, 0.95) AS q99 FROM ew),
    se AS (SELECT src, dst FROM ew, qq WHERE w >= q99),
    sym AS (SELECT src, dst FROM se UNION SELECT dst, src FROM se),
    degs AS (SELECT src AS id, COUNT(*) AS n FROM sym GROUP BY 1),
    cand AS (
      SELECT x.src AS id_a, y.src AS id_b,
             COUNT(*) AS n_common,
             SUM(1000000000000 // dz.n) AS ra_micro
      FROM sym x
      JOIN sym y ON x.dst = y.dst AND x.src < y.src
      JOIN degs dz ON dz.id = x.dst
      GROUP BY 1, 2
    )
    SELECT c.id_a, c.id_b, c.n_common,
           CAST(c.ra_micro AS DOUBLE) / 1000000000000 AS ra_score
    FROM cand c
    LEFT JOIN se e ON e.src = c.id_a AND e.dst = c.id_b
    WHERE e.src IS NULL AND c.n_common >= 2
    """,
    tags=("graph", "link-prediction", "gds"),
)
def q185_ra_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESOURCE-ALLOCATION link prediction (Zhou et al. 2009, the
    Adamic–Adar family) on the P95 co-supply backbone: for NON-adjacent
    supplier pairs sharing >= 2 neighbors, score = sum over common
    neighbors z of 1/deg(z) — hub neighbors count less.  Candidates come
    from the shared-neighbor equi-join (q90's inverted-index economics),
    adjacency is removed with an anti-join on the oriented edge list,
    and the per-neighbor weight is the exact integer 1e12 div deg(z)
    summed exactly — no ln() (Adamic–Adar's weight), whose last-ulp
    libm differences across engines cannot be hash-gated."""
    from .graphops import _BACKBONE_CACHE, _sparse_upper_edges
    from ..session import session_token

    se = _sparse_upper_edges(spark, sf_dir)
    symkey = (session_token(spark), sf_dir, "sym")
    if symkey not in _BACKBONE_CACHE:
        _BACKBONE_CACHE[symkey] = se.unionByName(
            se.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpoint(eager=True)
    sym = _BACKBONE_CACHE[symkey]
    degs = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("n"))
    x, y = sym.alias("x"), sym.alias("y")
    dz = degs.alias("dz")
    # integer division: Spark `/` on longs is double division — use div
    cand = (
        x.join(y, (F.col("x.dst") == F.col("y.dst")) & (F.col("x.src") < F.col("y.src")))
        .join(F.broadcast(dz), F.col("dz.id") == F.col("x.dst"))
        .groupBy(F.col("x.src").alias("id_a"), F.col("y.src").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr("1000000000000 div n")).alias("_ra_micro"),
        )
    )
    return (
        cand.join(
            se,
            (F.col("src") == F.col("id_a")) & (F.col("dst") == F.col("id_b")),
            "left_anti",
        )
        .where(F.col("n_common") >= 2)
        .select(
            "id_a",
            "id_b",
            "n_common",
            (F.col("_ra_micro").cast("double") / F.lit(1_000_000_000_000)).alias(
                "ra_score"
            ),
        )
    )
