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


def test_spacy_branch_batching_with_fake_model():
    """Drive the real spaCy branch's batching logic (nlp.pipe batching,
    label filter, NORP->GPE fold, non-string guard) with a fake model —
    the model artifact itself is absent in this container (SURVEY §7.2)."""
    import pandas as pd

    from cyber_etl_spark.functions.ner import _spacy_ner_batch

    class _Ent:
        def __init__(self, text, label):
            self.text, self.label_ = text, label

    class _Doc:
        def __init__(self, ents):
            self.ents = ents

    class _FakeNlp:
        def __init__(self):
            self.pipe_calls = []

        def pipe(self, texts):
            self.pipe_calls.append(list(texts))
            for t in texts:
                ents = []
                if "russian" in t:
                    ents.append(_Ent("Russian", "NORP"))  # folds to GPE
                if "Microsoft" in t:
                    ents.append(_Ent("Microsoft", "ORG"))
                if "Tuesday" in t:
                    ents.append(_Ent("Tuesday", "DATE"))  # filtered out
                yield _Doc(ents)

    nlp = _FakeNlp()
    texts = pd.Series(["russian actors hit Microsoft on Tuesday", None, "plain"])
    out = _spacy_ner_batch(nlp, texts)
    # one pipe() call covering the whole batch, None mapped to ""
    assert nlp.pipe_calls == [["russian actors hit Microsoft on Tuesday", "", "plain"]]
    assert list(out.index) == list(texts.index)
    assert out.iloc[0] == [
        {"text": "Russian", "label": "GPE"},
        {"text": "Microsoft", "label": "ORG"},
    ]
    assert out.iloc[1] == [] and out.iloc[2] == []


def test_load_spacy_falls_back_across_models(monkeypatch):
    """_load_spacy tries en_core_web_trf then _sm and returns None when
    no model artifact resolves (the in-container reality)."""
    import sys
    import types

    from cyber_etl_spark.functions import ner as ner_mod

    tried = []
    fake = types.ModuleType("spacy")

    def _load(name, disable=()):
        tried.append(name)
        raise OSError("no model artifact")

    fake.load = _load
    monkeypatch.setitem(sys.modules, "spacy", fake)
    assert ner_mod._load_spacy() is None
    assert tried == ["en_core_web_trf", "en_core_web_sm"]
