"""End-to-end NER → entity-resolution → weights composition — the
reference's stages 5-7 (NER, dedupe, best-label/weights) on Spark."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ner_stub_shape(spark):
    from cyber_etl_spark.functions.ner import extract_entities

    df = spark.createDataFrame(
        [
            ("a1", "Threat actors from Russia target Microsoft Corp and Windows Server."),
            ("a2", "Apache is fine. Mr. John Smith of Oracle Corp disagrees."),
            ("a3", "nothing here"),
        ],
        ["alert_id", "text"],
    )
    out = df.select("alert_id", extract_entities(F.col("text")).alias("ner"))
    rows = {r.alert_id: [(e.text, e.label) for e in r.ner] for r in out.collect()}
    assert ("Microsoft Corp", "ORG") in rows["a1"]
    assert ("Windows Server", "PRODUCT") in rows["a1"]
    assert ("russia", "GPE") in rows["a1"]
    assert ("John Smith", "PERSON") in rows["a2"]
    assert rows["a3"] == []


def test_ner_to_weights_pipeline(spark):
    """NER explode (R2) → resolution (M2) → best labels (A3) →
    MENTIONED weights (A1): full stage 5-7 chain."""
    from cyber_etl_spark.functions.ner import extract_entities
    from cyber_etl_spark.pipeline.entity_resolution import (
        mention_weights,
        resolve_entities,
    )
    from pyspark.sql.window import Window

    alerts = spark.createDataFrame(
        [
            ("a1", "Russia and Microsoft Corp. Also microsoft corp again."),
            ("a2", "Microsoft Corp ships Windows. Russia again."),
        ],
        ["alert_id", "text"],
    )
    mentions = (
        alerts.select(
            "alert_id", F.explode(extract_entities(F.col("text"))).alias("e")
        )
        .select("alert_id", F.col("e.text").alias("label"), F.col("e.label").alias("type"))
        .withColumn(
            "mention_id",
            F.row_number().over(Window.orderBy("alert_id", "label", "type")),
        )
    )
    resolved = resolve_entities(mentions).join(
        mentions.select("mention_id", "alert_id"), "mention_id"
    )
    weights = {
        (r.alert_id, r.best_label, r.type): r.weight
        for r in mention_weights(resolved).collect()
    }
    # both alerts' 'Microsoft Corp' mentions resolve to ONE cluster and
    # share the same best label
    org_keys = sorted(k for k in weights if k[2] == "ORG")
    assert org_keys == [("a1", "Microsoft Corp", "ORG"), ("a2", "Microsoft Corp", "ORG")]
    assert weights[org_keys[0]] == 1
    gpe = [k for k in weights if k[2] == "GPE"]
    assert {k[0] for k in gpe} == {"a1", "a2"}
