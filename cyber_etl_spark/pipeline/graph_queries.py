"""The reference's Cypher workload (writeup pp.3-5, SURVEY.md §2.11) as
engine queries over the domain graph tables.

The reference loads node/edge CSVs into Neo4j and queries with Cypher +
GDS; here the gold tables ARE the graph and every query is chained
equi-joins + aggregation in the same Spark job — no external graph
database.  Inputs are the tables the pipeline modules produce:

  alert_nodes(alert_id, date, ...)          cve_nodes(cve_id, score,
  alert_cve_edges(alert_id, cve_id)           attack_vector, published, ...)
  cve_references(cve_id, tag, ...)          mention_weights(alert_id,
  github_user_edges(cve_id, login)            best_label, type, weight)
  github_lang_edges(cve_id, language)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.algorithms import label_propagation, pagerank


def tag_histogram(cve_references: DataFrame) -> DataFrame:
    """Q1 — how are vulnerabilities tagged?
    ``MATCH (c:CVEs)-[]-(t:Tags) WITH COUNT(c) AS CVEs, t
      RETURN CVEs, t.tag ORDER BY CVEs desc``"""
    return (
        cve_references.where(F.col("tag").isNotNull())
        .groupBy("tag")
        .agg(F.countDistinct("cve_id").alias("n_cves"))
        .orderBy(F.desc("n_cves"), F.asc("tag"))
    )


def avg_cves_per_alert(alert_cve_edges: DataFrame) -> DataFrame:
    """Q2 — ``WITH COUNT(c) as CVEs, a RETURN avg(CVEs)``"""
    return (
        alert_cve_edges.groupBy("alert_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.avg("n").cast("double").alias("avg_cves_per_alert"))
    )


def incubation_days(
    alert_nodes: DataFrame, alert_cve_edges: DataFrame, cve_nodes: DataFrame
) -> DataFrame:
    """Q3 — publish→alert incubation:
    ``avg(duration.between(a.date, c.published))`` (the writeup reports
    ≈ 1 yr 4 mo on its corpus)."""
    joined = (
        alert_cve_edges.join(alert_nodes.select("alert_id", "date"), "alert_id")
        .join(
            cve_nodes.select(
                # NVD publishedDate has minute precision: '2020-02-11T22:15Z'
                "cve_id",
                F.to_timestamp("published", "yyyy-MM-dd'T'HH:mmX").alias("pub"),
            ),
            "cve_id",
        )
    )
    return joined.agg(
        F.avg(F.datediff(F.col("date"), F.col("pub"))).cast("double").alias(
            "avg_incubation_days"
        )
    )


def actor_attack_vectors(
    mention_weights: DataFrame,
    alert_cve_edges: DataFrame,
    cve_nodes: DataFrame,
    actor_type: str = "GPE",
    min_score: float = 9.0,
    exclude_label_contains: tuple[str, ...] = ("united",),
    label_contains: str | None = None,
) -> DataFrame:
    """Q4/Q5 — the 3-hop actor→alert→cve→attack-vector pattern:
    ``MATCH (ac:Actors)<-[:MENTIONED]-(at:Alerts)-[:REFERENCED]->(c:CVEs)
      -[:OPEN_TO]-(v:AttackVectors) WHERE ac.type=$type AND c.score >= $s``
    with the writeup's NOT-contains label exclusions; ``label_contains``
    adds Q5's positive filter (e.g. 'russia')."""
    actors = mention_weights.where(F.col("type") == actor_type)
    for frag in exclude_label_contains:
        actors = actors.where(~F.lower(F.col("best_label")).contains(frag))
    if label_contains is not None:
        actors = actors.where(F.lower(F.col("best_label")).contains(label_contains))
    hops = (
        actors.select("alert_id", "best_label")
        .join(alert_cve_edges, "alert_id")
        .join(
            cve_nodes.where(F.col("score") >= min_score).select(
                "cve_id", "attack_vector"
            ),
            "cve_id",
        )
        .where(F.col("attack_vector").isNotNull())
    )
    return (
        hops.groupBy("best_label", "attack_vector")
        .agg(F.countDistinct("cve_id").alias("n_cves"))
        .orderBy(F.desc("n_cves"), F.asc("best_label"), F.asc("attack_vector"))
    )


def _user_graph_edges(
    alert_cve_edges: DataFrame, github_user_edges: DataFrame
) -> DataFrame:
    """Undirected projection for centrality/community: alerts, CVEs and
    GitHub users as nodes (string-keyed), edges from REFERENCED and
    WRITTEN_BY — the graph the reference projects before gds calls."""
    e1 = alert_cve_edges.select(
        F.concat(F.lit("alert:"), F.col("alert_id")).alias("src"),
        F.concat(F.lit("cve:"), F.col("cve_id")).alias("dst"),
    )
    e2 = github_user_edges.select(
        F.concat(F.lit("cve:"), F.col("cve_id")).alias("src"),
        F.concat(F.lit("user:"), F.col("login")).alias("dst"),
    )
    return e1.unionByName(e2)


def contributor_centrality(
    alert_cve_edges: DataFrame, github_user_edges: DataFrame, top_k: int = 10
) -> DataFrame:
    """Q6 — ``gds.articleRank.stream`` over the projected graph, top
    GitHub users by rank.  Uses the exact ArticleRank recurrence
    (graph.algorithms.pagerank variant='articlerank'); string vertex ids
    are hashed to longs for the solver and mapped back."""
    edges = _user_graph_edges(alert_cve_edges, github_user_edges)
    ids = (
        edges.select(F.col("src").alias("name"))
        .union(edges.select("dst"))
        .distinct()
        .withColumn("nid", F.xxhash64("name"))
    )
    int_edges = (
        edges.join(ids.withColumnRenamed("name", "src"), "src")
        .withColumnRenamed("nid", "src_id")
        .join(ids.withColumnRenamed("name", "dst"), "dst")
        .withColumnRenamed("nid", "dst_id")
        .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
    )
    ranks = pagerank(int_edges, iterations=10, variant="articlerank")
    return (
        ranks.join(ids, ranks.id == ids.nid)
        .where(F.col("name").startswith("user:"))
        .select(
            F.regexp_replace("name", "^user:", "").alias("login"),
            F.round("rank", 6).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("login"))
        .limit(top_k)
    )


def community_histogram(
    alert_cve_edges: DataFrame, github_user_edges: DataFrame
) -> DataFrame:
    """Q7 — ``gds.louvain.write`` → community size histogram.  Label
    propagation is the deterministic community operator (SURVEY §7.3:
    assert structure, not GDS tie-breaking)."""
    edges = _user_graph_edges(alert_cve_edges, github_user_edges)
    ids = (
        edges.select(F.col("src").alias("name"))
        .union(edges.select("dst"))
        .distinct()
        .withColumn("nid", F.xxhash64("name"))
    )
    int_edges = (
        edges.join(ids.withColumnRenamed("name", "src"), "src")
        .withColumnRenamed("nid", "src_id")
        .join(ids.withColumnRenamed("name", "dst"), "dst")
        .withColumnRenamed("nid", "dst_id")
        .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
    )
    communities = label_propagation(int_edges, iterations=4)
    return (
        communities.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("community"))
    )


def language_popularity(
    github_lang_edges: DataFrame,
    alert_cve_edges: DataFrame | None = None,
    exclude_contains: str = "message",
) -> DataFrame:
    """Q8 — ``RETURN lan.language, COUNT(c) as nums ORDER BY nums DESC``.
    With ``alert_cve_edges`` given, counts only alert-referenced CVEs
    (the 3-hop variant 5c); without, the 1-hop variant 5a."""
    langs = github_lang_edges.where(~F.col("language").contains(exclude_contains))
    if alert_cve_edges is not None:
        langs = langs.join(
            alert_cve_edges.select("cve_id").distinct(), "cve_id", "left_semi"
        )
    return (
        langs.groupBy("language")
        .agg(F.countDistinct("cve_id").alias("n_cves"))
        .orderBy(F.desc("n_cves"), F.asc("language"))
    )
