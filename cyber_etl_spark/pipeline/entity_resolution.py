"""Entity resolution — SURVEY.md M2/M3 (data_integration.ipynb cells
38-49; alerts/parse_alert.ipynb cells 48-53).

The reference uses the `dedupe` library: active-learning logistic
regression + hierarchical clustering with per-type hand-tuned thresholds
(ORG 0.6, PERSON 0.79, GPE 0.55, PRODUCT 0.64).  That is stochastic and
driver-bound; per SURVEY §7.3 hard part 2 we define a *deterministic*
spec with the same pipeline shape:

    normalize → candidate pairs (token-Jaccard join, the blocking step) →
    threshold → connected components → cluster id = min member id →
    best label per cluster (per-group argmax) → mention weights

Every stage is a distributed DataFrame op; clustering is the same
connected-components operator the graph layer ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.strings import normalize_entity
from ..graph.algorithms import connected_components
from ..operators.similarity import token_jaccard_join

# deterministic stand-ins for the reference's per-type thresholds
DEFAULT_THRESHOLDS = {"ORG": 0.6, "PERSON": 0.75, "GPE": 0.55, "PRODUCT": 0.6}


def resolve_entities(
    mentions: DataFrame,
    id_col: str = "mention_id",
    label_col: str = "label",
    type_col: str = "type",
    thresholds: dict[str, float] | None = None,
    default_threshold: float = 0.6,
) -> DataFrame:
    """→ (mention_id, label, type, norm, cluster_id).

    ``cluster_id`` is the smallest mention id in the connected component
    of the similarity graph *within each NER type* (types never merge,
    matching the reference's per-type dedupe runs).
    """
    thresholds = thresholds or DEFAULT_THRESHOLDS
    norm = mentions.select(
        F.col(id_col).alias("mention_id"),
        F.col(label_col).alias("label"),
        F.col(type_col).alias("type"),
        normalize_entity(F.col(label_col)).alias("norm"),
    )

    # identical normal forms always merge (exact block), regardless of type
    # threshold; similarity pairs add the fuzzy edges per type.
    per_type = []
    for t, thr in thresholds.items():
        sub = norm.where(F.col("type") == t)
        pairs = token_jaccard_join(
            sub, sub, "mention_id", "norm", "mention_id", "norm", threshold=thr
        ).where(F.col("l_id") < F.col("r_id"))
        per_type.append(pairs.select("l_id", "r_id"))
    other = norm.join(
        F.broadcast(
            norm.sparkSession.createDataFrame(
                [(t,) for t in thresholds], ["type"]
            )
        ),
        "type",
        "left_anti",
    )
    pairs_other = token_jaccard_join(
        other, other, "mention_id", "norm", "mention_id", "norm", default_threshold
    ).where(F.col("l_id") < F.col("r_id"))
    per_type.append(pairs_other.select("l_id", "r_id"))

    edges = per_type[0]
    for p in per_type[1:]:
        edges = edges.unionByName(p)
    # guard: never merge across types (joins above are type-local already,
    # but keep the invariant explicit against future blocking changes)
    comp = connected_components(
        edges.select(F.col("l_id").alias("src"), F.col("r_id").alias("dst"))
    )
    return (
        norm.join(comp, norm.mention_id == comp.id, "left")
        .select(
            "mention_id",
            "label",
            "type",
            "norm",
            F.coalesce(F.col("component"), F.col("mention_id")).alias("cluster_id"),
        )
    )


def best_labels(resolved: DataFrame) -> DataFrame:
    """Most frequent raw label per cluster (ties → lexicographically
    smallest) — the reference's value_counts + idxmax "best label"
    (SURVEY A2/A3, data_integration.ipynb:2637 cell 48) as one window."""
    counts = resolved.groupBy("cluster_id", "label").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("cluster_id").orderBy(F.desc("freq"), F.asc("label"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cluster_id", F.col("label").alias("best_label"), "freq")
    )


def mention_weights(
    resolved: DataFrame, doc_col: str = "alert_id"
) -> DataFrame:
    """(doc, best_label, type, weight) — MENTIONED edge weights
    (data_integration.ipynb:2783 cell 49: groupby().size())."""
    labeled = resolved.join(best_labels(resolved).select("cluster_id", "best_label"), "cluster_id")
    return labeled.groupBy(doc_col, "best_label", "type").agg(
        F.count(F.lit(1)).alias("weight")
    )
