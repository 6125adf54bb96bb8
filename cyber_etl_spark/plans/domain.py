"""Oracle-gated domain graph workload — the reference's Cypher queries
(writeup pp.3-5, SURVEY.md §2.11 Q1-Q5/Q8) exercised end-to-end through
:mod:`..pipeline.graph_queries` at driver-gate scale.

The driver's synthetic catalog has no alert/CVE/actor tables, so the
domain tables are DERIVED deterministically from the TPC-H-ish tables —
the SAME derivation written twice, as DataFrame ops for the Spark side
and as CTEs in the DuckDB oracle:

  alert_nodes       := orders           (alert_id, date)
  alert_cve_edges   := lineitem         (alert_id, cve_id)   distinct
  cve_nodes         := part             (cve_id, score, attack_vector,
                                         published)  — arithmetic-derived
  cve_references    := part             (cve_id, tag := p_type, NULL ~1/7)
  mention_weights   := orders⋈customer⋈nation
                                        (alert_id, best_label := lower
                                         nation name, type, weight)
  github_lang_edges := part             (cve_id, language := p_brand)

Every derived value is integer/modular arithmetic or a join — no
engine-specific functions — so both engines compute bit-identical
inputs, and what the gate actually grades is the graph-query logic
itself (pipeline/graph_queries.py, previously pytest-only with
hand-sized fixtures; VERDICT r4 "Next round" item 4).

Scale: the derivations are single scans plus one distinct over
(orderkey, partkey) — a map-side-combining hash aggregation keyed by a
uniformly distributed compound key, linear at any SF.  The queries
themselves are the reference's chained equi-joins + aggregations; the
dimension sides (part-derived tables) are broadcastable at gate scale
and shuffle-join cleanly beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.graph_queries import (
    actor_attack_vectors,
    avg_cves_per_alert,
    incubation_days,
    language_popularity,
    tag_histogram,
)
from ..sources import read_table
from .registry import query

# ---------------------------------------------------------------------------
# Derived domain tables (Spark side) + the identical SQL CTE fragments
# ---------------------------------------------------------------------------


def _alert_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("alert_id"),
        F.col("o_orderdate").cast("date").alias("date"),
    )


_ALERT_NODES_SQL = """
alert_nodes AS (
  SELECT o_orderkey AS alert_id, CAST(o_orderdate AS DATE) AS "date"
  FROM orders)
"""


def _alert_cve_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("alert_id"), F.col("l_partkey").alias("cve_id")
        )
        .distinct()
    )


_ALERT_CVE_EDGES_SQL = """
alert_cve_edges AS (
  SELECT DISTINCT l_orderkey AS alert_id, l_partkey AS cve_id
  FROM lineitem)
"""


def _cve_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    return p.select(
        pk.alias("cve_id"),
        ((pk % 101).cast("double") / F.lit(10.0)).alias("score"),
        F.when(pk % 4 == 0, F.lit("NETWORK"))
        .when(pk % 4 == 1, F.lit("LOCAL"))
        .when(pk % 4 == 2, F.lit("ADJACENT_NETWORK"))
        .otherwise(F.lit(None).cast("string"))
        .alias("attack_vector"),
        # NVD-minute-precision string, parsed back by incubation_days with
        # to_timestamp(..., "yyyy-MM-dd'T'HH:mmX") — roundtrips the date
        F.concat(
            F.date_format(
                F.date_add(F.to_date(F.lit("2020-01-01")), (pk % 730).cast("int")),
                "yyyy-MM-dd",
            ),
            F.lit("T00:00Z"),
        ).alias("published"),
    )


# the oracle needs only the parsed publish DATE, so the CTE derives it
# directly (same calendar value the builder's string roundtrips to)
_CVE_NODES_SQL = """
cve_nodes AS (
  SELECT p_partkey AS cve_id,
         CAST(p_partkey % 101 AS DOUBLE) / 10.0 AS score,
         CASE WHEN p_partkey % 4 = 0 THEN 'NETWORK'
              WHEN p_partkey % 4 = 1 THEN 'LOCAL'
              WHEN p_partkey % 4 = 2 THEN 'ADJACENT_NETWORK'
              ELSE NULL END AS attack_vector,
         DATE '2020-01-01' + CAST(p_partkey % 730 AS INT) AS pub
  FROM part)
"""


def _cve_references(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("cve_id"),
        F.when(F.col("p_size") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("p_type"))
        .alias("tag"),
    )


_CVE_REFERENCES_SQL = """
cve_references AS (
  SELECT p_partkey AS cve_id,
         CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_type END AS tag
  FROM part)
"""


def _mention_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select(
            F.col("o_orderkey").alias("alert_id"),
            F.lower(F.col("n_name")).alias("best_label"),
            F.when(F.col("c_custkey") % 3 == 0, F.lit("ORG"))
            .when(F.col("c_custkey") % 3 == 1, F.lit("PERSON"))
            .otherwise(F.lit("GPE"))
            .alias("type"),
            (F.col("o_orderkey") % 5 + 1).alias("weight"),
        )
    )


_MENTION_WEIGHTS_SQL = """
mention_weights AS (
  SELECT o_orderkey AS alert_id,
         lower(n_name) AS best_label,
         CASE WHEN c_custkey % 3 = 0 THEN 'ORG'
              WHEN c_custkey % 3 = 1 THEN 'PERSON'
              ELSE 'GPE' END AS type,
         o_orderkey % 5 + 1 AS weight
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
"""


def _github_lang_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("cve_id"), F.col("p_brand").alias("language")
    )


_GITHUB_LANG_EDGES_SQL = """
github_lang_edges AS (
  SELECT p_partkey AS cve_id, p_brand AS language FROM part)
"""


# ---------------------------------------------------------------------------
# gq1 — tag histogram (Cypher: MATCH (c:CVEs)-[]-(t:Tags) ... ORDER BY desc)
# ---------------------------------------------------------------------------


@query(
    "q114_gq_tag_histogram",
    oracle=f"""
    WITH {_CVE_REFERENCES_SQL.strip()}
    SELECT tag, COUNT(DISTINCT cve_id) AS n_cves
    FROM cve_references
    WHERE tag IS NOT NULL
    GROUP BY tag
    ORDER BY n_cves DESC, tag ASC
    """,
    tags=("domain-graph", "Q1", "agg"),
)
def q114_gq_tag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gq1 end-to-end: how are vulnerabilities tagged?
    (data exploration writeup p.3; pipeline/graph_queries.tag_histogram)"""
    return tag_histogram(_cve_references(spark, sf_dir))


# ---------------------------------------------------------------------------
# gq2 — average CVEs referenced per alert
# ---------------------------------------------------------------------------


@query(
    "q115_gq_avg_cves_per_alert",
    oracle=f"""
    WITH {_ALERT_CVE_EDGES_SQL.strip()},
    per_alert AS (
      SELECT alert_id, COUNT(*) AS n FROM alert_cve_edges GROUP BY alert_id)
    SELECT CAST(AVG(CAST(n AS BIGINT)) AS DOUBLE) AS avg_cves_per_alert
    FROM per_alert
    """,
    tags=("domain-graph", "Q2", "agg"),
)
def q115_gq_avg_cves_per_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gq2 end-to-end: WITH COUNT(c) as CVEs, a RETURN avg(CVEs).
    Two-level aggregation; count sums stay exact in double far past any
    SF (integer-valued partials < 2^53), so AVG matches bit-for-bit."""
    return avg_cves_per_alert(_alert_cve_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# gq3 — publish→alert incubation days
# ---------------------------------------------------------------------------


@query(
    "q116_gq_incubation_days",
    oracle=f"""
    WITH {_ALERT_NODES_SQL.strip()},
    {_ALERT_CVE_EDGES_SQL.strip()},
    {_CVE_NODES_SQL.strip()}
    SELECT CAST(AVG(CAST(date_diff('day', pub, "date") AS BIGINT)) AS DOUBLE)
           AS avg_incubation_days
    FROM alert_cve_edges
    JOIN alert_nodes USING (alert_id)
    JOIN cve_nodes USING (cve_id)
    """,
    tags=("domain-graph", "Q3", "join", "agg", "F14"),
)
def q116_gq_incubation_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gq3 end-to-end: avg(duration.between(alert.date, cve.published)).
    The builder side parses the NVD-minute-precision published STRING
    (the reference's physical format) back to a timestamp; the oracle
    derives the same calendar date directly."""
    return incubation_days(
        _alert_nodes(spark, sf_dir),
        _alert_cve_edges(spark, sf_dir),
        _cve_nodes(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# gq4 — 3-hop actor → alert → CVE → attack-vector with label exclusions
# ---------------------------------------------------------------------------


@query(
    "q117_gq_actor_vectors",
    oracle=f"""
    WITH {_MENTION_WEIGHTS_SQL.strip()},
    {_ALERT_CVE_EDGES_SQL.strip()},
    {_CVE_NODES_SQL.strip()}
    SELECT best_label, attack_vector, COUNT(DISTINCT cve_id) AS n_cves
    FROM mention_weights
    JOIN alert_cve_edges USING (alert_id)
    JOIN cve_nodes USING (cve_id)
    WHERE type = 'GPE'
      AND NOT contains(best_label, 'nation_1')
      AND score >= 9.0
      AND attack_vector IS NOT NULL
    GROUP BY best_label, attack_vector
    ORDER BY n_cves DESC, best_label ASC, attack_vector ASC
    """,
    tags=("domain-graph", "Q4", "join", "multi-hop"),
)
def q117_gq_actor_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gq4 end-to-end: the writeup's GPE-actor 3-hop pattern with a
    NOT-contains label exclusion ('nation_1' here plays 'united' —
    it prunes 11 of the 25 synthetic nations) and the score >= 9.0
    severity filter.  90/10.0 == 9.0 exactly in IEEE double, so the
    boundary is engine-stable."""
    return actor_attack_vectors(
        _mention_weights(spark, sf_dir),
        _alert_cve_edges(spark, sf_dir),
        _cve_nodes(spark, sf_dir),
        actor_type="GPE",
        min_score=9.0,
        exclude_label_contains=("nation_1",),
    )


# ---------------------------------------------------------------------------
# gq8 — language popularity (3-hop variant: alert-referenced CVEs only)
# ---------------------------------------------------------------------------


@query(
    "q118_gq_language_popularity",
    oracle=f"""
    WITH {_GITHUB_LANG_EDGES_SQL.strip()},
    {_ALERT_CVE_EDGES_SQL.strip()}
    SELECT language, COUNT(DISTINCT cve_id) AS n_cves
    FROM github_lang_edges
    WHERE NOT contains(language, 'Brand#2')
      AND cve_id IN (SELECT cve_id FROM alert_cve_edges)
    GROUP BY language
    ORDER BY n_cves DESC, language ASC
    """,
    tags=("domain-graph", "Q8", "semi-join", "agg"),
)
def q118_gq_language_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gq8 end-to-end, the 5c variant: language counts over CVEs that are
    actually referenced by an alert (left-semi join), with the writeup's
    contains-exclusion filter ('Brand#2' here plays 'message')."""
    return language_popularity(
        _github_lang_edges(spark, sf_dir),
        alert_cve_edges=_alert_cve_edges(spark, sf_dir),
        exclude_contains="Brand#2",
    )


# ---------------------------------------------------------------------------
# gq5 — the positive-label-filter branch of the actor pattern
# ---------------------------------------------------------------------------


@query(
    "q121_gq_actor_vectors_positive",
    oracle=f"""
    WITH {_MENTION_WEIGHTS_SQL.strip()},
    {_ALERT_CVE_EDGES_SQL.strip()},
    {_CVE_NODES_SQL.strip()}
    SELECT best_label, attack_vector, COUNT(DISTINCT cve_id) AS n_cves
    FROM mention_weights
    JOIN alert_cve_edges USING (alert_id)
    JOIN cve_nodes USING (cve_id)
    WHERE type = 'GPE'
      AND NOT contains(best_label, 'nation_1')
      AND contains(best_label, 'nation_2')
      AND score >= 7.0
      AND attack_vector IS NOT NULL
    GROUP BY best_label, attack_vector
    ORDER BY n_cves DESC, best_label ASC, attack_vector ASC
    """,
    tags=("domain-graph", "Q5", "join", "multi-hop"),
)
def q121_gq_actor_vectors_positive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gq5 end-to-end: gq4's pattern plus the positive label filter
    ('nation_2' here plays 'russia' — NATION_2/20-24 survive) at a lower
    severity floor.  70/10.0 == 7.0 exactly in IEEE double."""
    return actor_attack_vectors(
        _mention_weights(spark, sf_dir),
        _alert_cve_edges(spark, sf_dir),
        _cve_nodes(spark, sf_dir),
        actor_type="GPE",
        min_score=7.0,
        exclude_label_contains=("nation_1",),
        label_contains="nation_2",
    )
