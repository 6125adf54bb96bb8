"""Golden-fixture parity against the reference's SHIPPED artifacts
(SURVEY.md §5 test vectors; VERDICT r1 "What's missing" #3).

These tests read /root/reference/data/* directly (read-only) and check
that our operators reproduce the reference's own outputs on its own
inputs — closing the parity loop that synthesized look-alike fixtures
can't.

- cpe_product_edge.feather (770 golden rows, alerts/cpe_product.ipynb
  cell 14): the notebook's full input (all_parsed_cve_cpes.feather) is
  NOT shipped; cpe_node_data.feather carries the subset of cpes that
  made it into the graph.  Restricted to that shipped subset, the golden
  edge list has exactly 169 pairs — and token_jaccard_join must
  reproduce those 169 exactly (verified: the pure-pandas replay of the
  notebook loop on the same inputs matches gold with zero diff).
- enterprise-attack.csv (mitre_json_to_csv.py output): 4,025 physical
  lines but 594 CSV records (multi-line quoted descriptions) — the
  Spark multiLine CSV scan must parse the records, not the newlines,
  and the columns must match mitre_techniques' output contract.
"""

from __future__ import annotations

import os

import pytest

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference artifacts not present"
)


def _feather_df(spark, path: str, columns=None):
    import pyarrow.feather as feather

    pdf = feather.read_table(path).to_pandas()
    if columns is not None:
        pdf = pdf[columns]
    return spark.createDataFrame(pdf)


def test_cpe_product_edge_golden_pairs(spark):
    """token_jaccard_join on the reference's shipped inputs reproduces
    the golden cpe→product edge list exactly (restricted to shipped
    cpes), with the full artifact at its documented 770 rows."""
    import pyarrow.feather as feather

    gold_pdf = feather.read_table(f"{REF_DATA}/cpe_product_edge.feather").to_pandas()
    assert len(gold_pdf) == 770  # the documented golden row count

    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.similarity import token_jaccard_join

    cpes = (
        _feather_df(spark, f"{REF_DATA}/cpe_node_data.feather")
        .select("cpe")
        .where(F.col("cpe").isNotNull())
        .distinct()
        .withColumn("cpe2", F.regexp_replace("cpe", "_", " "))
    )
    products = (
        _feather_df(spark, f"{REF_DATA}/alert_ner_label_weights.feather")
        .where(F.col("type") == "PRODUCT")
        .select("best_label")
        .where(F.col("best_label").isNotNull())
        .distinct()
    )
    pairs = token_jaccard_join(
        cpes, products, "cpe", "cpe2", "best_label", "best_label", threshold=0.5
    )
    got = {(r.l_id, r.r_id) for r in pairs.select("l_id", "r_id").collect()}

    shipped_cpes = {r.cpe for r in cpes.select("cpe").collect()}
    gold = {
        (c, b)
        for c, b in zip(gold_pdf["cpe"], gold_pdf["best_label"])
        if c in shipped_cpes
    }
    assert len(gold) == 169  # golden pairs whose cpe survives in the shipped subset
    assert got == gold


def test_enterprise_attack_csv_golden(spark):
    """The Spark multiLine CSV scan parses the reference's shipped
    techniques artifact into its true 594 records with the
    mitre_techniques output contract (columns, T#### ids, no
    revoked/deprecated leftovers marked by empty ids)."""
    df = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(f"{REF_DATA}/enterprise-attack.csv")
    )
    rows = df.collect()
    assert len(rows) == 594  # records, not the 4,024 physical newlines

    assert df.columns == [
        "name",
        "id",
        "url",
        "platforms",
        "kill chain phases",
        "description",
        "data sources",
        "detection",
    ]

    import re

    ids = [r["id"] for r in rows]
    assert all(re.fullmatch(r"T\d{4}(\.\d{3})?", i) for i in ids)
    assert len(set(ids)) == len(ids)  # technique ids are unique
    # spot-check a stable fact: every technique has a name and a url
    assert all(r["name"] and r["url"] and r["url"].startswith("https://") for r in rows)


def test_alert_cve_edge_feather_csv_agree(spark):
    """The reference ships the alert→CVE edge list twice (feather + csv);
    both scans must land on the same edge set — cross-validates the S7
    feather→parquet path against the S8 CSV path."""
    from pyspark.sql import functions as F

    fe = _feather_df(spark, f"{REF_DATA}/alert_cve_edge.feather")
    cs = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(f"{REF_DATA}/alert_cve_edge.csv")
    )
    common = [c for c in fe.columns if c in cs.columns]
    assert common
    fset = {tuple(r) for r in fe.select(*[F.col(c).cast("string") for c in common]).collect()}
    cset = {tuple(r) for r in cs.select(*common).collect()}
    assert fset == cset


def test_entity_resolution_labeled_pairs_golden(spark):
    """ER match quality against the reference's own labeled test vectors
    (data/ner_training_{PERSON,GPE,ORG,PRODUCT}.json, reference
    README.md:19 — the active-learning pair labels its dedupe run was
    trained on; SURVEY §5/§7.5 commit to using them as ER test vectors).

    Floors are the measured quality of the deterministic spec (token
    Jaccard + char-3-gram Jaccard + stem block → connected components)
    with a small margin; the pipeline is fully deterministic, so a drop
    below a floor means the resolver changed behavior, not noise.
    Measured at r5: recall PERSON .231 GPE .661 ORG .573 PRODUCT .296;
    separation PERSON 1.0 GPE .867 ORG .957 PRODUCT 1.0.  (The labeled
    matches include morphological and subset variants a symmetric
    string metric can only partially capture — the reference's learned
    dedupe model is the upper bound here, not 1.0.)
    """
    import json

    from cyber_etl_spark.pipeline.entity_resolution import resolve_entities

    recall_floor = {"PERSON": 0.20, "GPE": 0.60, "ORG": 0.55, "PRODUCT": 0.25}
    sep_floor = {"PERSON": 0.95, "GPE": 0.85, "ORG": 0.90, "PRODUCT": 0.95}

    mentions, labeled = [], {}
    for ti, t in enumerate(["PERSON", "GPE", "ORG", "PRODUCT"]):
        with open(f"{REF_DATA}/ner_training_{t}.json") as fh:
            d = json.load(fh)
        seen = {}
        for kind in ("match", "distinct"):
            for tup in d[kind]:
                a, b = tup["__value__"]
                for m in (a, b):
                    key = (t, m["Id"])
                    if key not in seen:
                        seen[key] = ti * 100000 + m["Id"]
                        mentions.append((seen[key], m["label"], t))
                labeled.setdefault((t, kind), []).append(
                    (seen[(t, a["Id"])], seen[(t, b["Id"])])
                )

    df = spark.createDataFrame(mentions, ["mention_id", "label", "type"])
    res = resolve_entities(df).toPandas()
    cl = dict(zip(res["mention_id"], res["cluster_id"]))

    for t in ["PERSON", "GPE", "ORG", "PRODUCT"]:
        match, distinct = labeled[(t, "match")], labeled[(t, "distinct")]
        recall = sum(cl[a] == cl[b] for a, b in match) / len(match)
        sep = sum(cl[a] != cl[b] for a, b in distinct) / len(distinct)
        assert recall >= recall_floor[t], f"{t} labeled-match recall {recall:.3f}"
        assert sep >= sep_floor[t], f"{t} labeled-distinct separation {sep:.3f}"
