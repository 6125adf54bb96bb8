"""End-to-end domain integration: bronze fixtures → pipeline stages →
gold tables → the Cypher-derived workload — the reference's entire
data_integration.ipynb run-all path in one Spark job graph.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.window import Window

NVD = {
    "CVE_Items": [
        {
            "cve": {
                "CVE_data_meta": {"ID": f"CVE-2022-000{i}"},
                "references": {
                    "reference_data": [
                        {
                            "url": f"https://github.com/org/repo{i}",
                            "name": "gh",
                            "refsource": "MISC",
                            "tags": ["Patch"] if i % 2 == 0 else ["Exploit", "Patch"],
                        }
                    ]
                },
                "description": {
                    "description_data": [{"lang": "en", "value": f"Bug {i}."}]
                },
            },
            "impact": {
                "baseMetricV3": {
                    "cvssV3": {"baseScore": 5.0 + i, "attackVector": "NETWORK"},
                    "exploitabilityScore": 2.0,
                    "impactScore": 3.0,
                }
            },
            "publishedDate": f"2022-0{i + 1}-01T10:00Z",
            "configurations": {
                "nodes": [
                    {
                        "cpe_match": [
                            {
                                "vulnerable": True,
                                "cpe23Uri": f"cpe:2.3:a:vendor{i}:product{i}:1.0",
                            }
                        ]
                    }
                ]
            },
        }
        for i in range(4)
    ]
}

ALERTS = [
    (
        "/a1",
        "AA22-001A",
        "Russia-linked activity",
        "Original release date: June 1, 2022",
        "Summary Microsoft Corp products hit by CVE-2022-0001 and CVE-2022-0002. Russia suspected. [T1059]",
    ),
    (
        "/a2",
        "AA22-002B",
        "Follow-up",
        "Original release date: July 1, 2022",
        "microsoft corp again: CVE-2022-0002, also CVE-2022-0003. China mentioned.",
    ),
]


def test_full_domain_pipeline(spark, tmp_path):
    from cyber_etl_spark.functions.ner import extract_entities
    from cyber_etl_spark.pipeline.alerts import alert_cve_edges, alert_nodes
    from cyber_etl_spark.pipeline.entity_resolution import (
        mention_weights,
        resolve_entities,
    )
    from cyber_etl_spark.pipeline.graph_queries import (
        actor_attack_vectors,
        avg_cves_per_alert,
        incubation_days,
        tag_histogram,
    )
    from cyber_etl_spark.pipeline.nvd import (
        cpe_nodes,
        cve_nodes,
        cve_references,
        filter_relevant_cves,
        read_feed,
    )

    # bronze
    feed = tmp_path / "nvd.json"
    feed.write_text(json.dumps(NVD))
    items = read_feed(spark, str(feed))
    alerts_raw = spark.createDataFrame(
        ALERTS, ["link", "alert_id", "title", "date", "text"]
    )

    # silver/gold
    cves = cve_nodes(items)
    refs = cve_references(items)
    cpes = cpe_nodes(items)
    anodes = alert_nodes(alerts_raw)
    acve = alert_cve_edges(alerts_raw)
    gh_cves = refs.where(F.col("url").contains("github")).select("cve_id").distinct()
    kept = filter_relevant_cves(cves, acve.select("cve_id"), gh_cves.limit(0))
    assert sorted(r.cve_id for r in kept.collect()) == [
        "CVE-2022-0001",
        "CVE-2022-0002",
        "CVE-2022-0003",
    ]
    assert cpes.count() == 4

    # NER → ER → weights
    mentions = (
        alerts_raw.select("alert_id", F.explode(extract_entities(F.col("text"))).alias("e"))
        .select("alert_id", F.col("e.text").alias("label"), F.col("e.label").alias("type"))
        .withColumn(
            "mention_id", F.row_number().over(Window.orderBy("alert_id", "label", "type"))
        )
    )
    resolved = resolve_entities(mentions).join(
        mentions.select("mention_id", "alert_id"), "mention_id"
    )
    weights = mention_weights(resolved)

    # the Cypher workload on the produced graph
    tags = {r.tag: r.n_cves for r in tag_histogram(refs).collect()}
    assert tags == {"Patch": 4, "Exploit": 2}
    avg = avg_cves_per_alert(acve).collect()[0].avg_cves_per_alert
    assert abs(avg - 2.0) < 1e-9
    inc = incubation_days(anodes, acve, kept).collect()[0].avg_incubation_days
    assert inc > 0  # alerts postdate publication
    actors = actor_attack_vectors(
        weights, acve, kept, actor_type="GPE", min_score=6.0
    ).collect()
    got = {(r.best_label, r.attack_vector): r.n_cves for r in actors}
    # russia via A1 → CVE-0002 (score 7) [CVE-0001 score 6 ≥ 6 too]
    assert got[("russia", "NETWORK")] == 2
    assert ("china", "NETWORK") in got
