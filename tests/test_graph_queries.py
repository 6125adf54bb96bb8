"""The reference's 8-query Cypher workload on a synthesized domain graph.

Fixture graph: 3 alerts, 5 CVEs, 3 actors, 4 GitHub users, 3 languages —
small enough to verify results by hand, shaped like the reference's
(writeup pp.2-3 schema).
"""

from __future__ import annotations

import datetime

import pytest


@pytest.fixture(scope="module")
def graph_tables(spark):
    alert_nodes = spark.createDataFrame(
        [
            ("A1", datetime.date(2022, 1, 1)),
            ("A2", datetime.date(2022, 6, 1)),
            ("A3", datetime.date(2022, 6, 15)),
        ],
        "alert_id string, date date",
    )
    alert_cve = spark.createDataFrame(
        [
            ("A1", "CVE-1"),
            ("A1", "CVE-2"),
            ("A2", "CVE-2"),
            ("A2", "CVE-3"),
            ("A3", "CVE-4"),
        ],
        "alert_id string, cve_id string",
    )
    cve_nodes = spark.createDataFrame(
        [
            ("CVE-1", 9.8, "NETWORK", "2021-01-01T00:00Z"),
            ("CVE-2", 10.0, "NETWORK", "2021-06-01T00:00Z"),
            ("CVE-3", 5.0, "LOCAL", "2022-05-01T00:00Z"),
            ("CVE-4", 9.9, "LOCAL", "2022-01-15T00:00Z"),
            ("CVE-5", 7.0, None, "2020-01-01T00:00Z"),
        ],
        "cve_id string, score double, attack_vector string, published string",
    )
    cve_refs = spark.createDataFrame(
        [
            ("CVE-1", "Patch"),
            ("CVE-1", "Exploit"),
            ("CVE-2", "Patch"),
            ("CVE-3", "Patch"),
            ("CVE-4", None),
        ],
        "cve_id string, tag string",
    )
    mention_weights = spark.createDataFrame(
        [
            ("A1", "russia", "GPE", 3),
            ("A2", "russia", "GPE", 1),
            ("A2", "united states", "GPE", 2),
            ("A3", "china", "GPE", 1),
            ("A1", "Microsoft", "ORG", 5),
        ],
        "alert_id string, best_label string, type string, weight long",
    )
    gh_users = spark.createDataFrame(
        [
            ("CVE-1", "alice"),
            ("CVE-2", "alice"),
            ("CVE-2", "bob"),
            ("CVE-3", "carol"),
            ("CVE-5", "dave"),
        ],
        "cve_id string, login string",
    )
    gh_langs = spark.createDataFrame(
        [
            ("CVE-1", "Python"),
            ("CVE-2", "Python"),
            ("CVE-2", "C"),
            ("CVE-3", "Go"),
            ("CVE-5", "Python"),
            ("CVE-4", "message"),
        ],
        "cve_id string, language string",
    )
    return {
        "alert_nodes": alert_nodes,
        "alert_cve": alert_cve,
        "cve_nodes": cve_nodes,
        "cve_refs": cve_refs,
        "mention_weights": mention_weights,
        "gh_users": gh_users,
        "gh_langs": gh_langs,
    }


def test_q1_tag_histogram(graph_tables):
    from cyber_etl_spark.pipeline.graph_queries import tag_histogram

    rows = [(r.tag, r.n_cves) for r in tag_histogram(graph_tables["cve_refs"]).collect()]
    assert rows == [("Patch", 3), ("Exploit", 1)]  # null tag excluded


def test_q2_avg_cves_per_alert(graph_tables):
    from cyber_etl_spark.pipeline.graph_queries import avg_cves_per_alert

    row = avg_cves_per_alert(graph_tables["alert_cve"]).collect()[0]
    assert abs(row.avg_cves_per_alert - 5 / 3) < 1e-9


def test_q3_incubation(graph_tables):
    from cyber_etl_spark.pipeline.graph_queries import incubation_days

    row = incubation_days(
        graph_tables["alert_nodes"], graph_tables["alert_cve"], graph_tables["cve_nodes"]
    ).collect()[0]
    # hand-computed day gaps: A1-CVE1 365, A1-CVE2 214, A2-CVE2 365,
    # A2-CVE3 31, A3-CVE4 151  → mean 225.2
    assert abs(row.avg_incubation_days - 225.2) < 0.01


def test_q4_q5_actor_attack_vectors(graph_tables):
    from cyber_etl_spark.pipeline.graph_queries import actor_attack_vectors

    out = actor_attack_vectors(
        graph_tables["mention_weights"],
        graph_tables["alert_cve"],
        graph_tables["cve_nodes"],
        min_score=9.0,
    ).collect()
    # 'united states' excluded by the writeup's NOT-contains filter;
    # russia hits CVE-1/2 (NETWORK) via A1+A2; china hits CVE-4 (LOCAL)
    got = {(r.best_label, r.attack_vector): r.n_cves for r in out}
    assert got == {("russia", "NETWORK"): 2, ("china", "LOCAL"): 1}

    q5 = actor_attack_vectors(
        graph_tables["mention_weights"],
        graph_tables["alert_cve"],
        graph_tables["cve_nodes"],
        min_score=9.0,
        label_contains="russia",
    ).collect()
    assert {(r.best_label, r.attack_vector) for r in q5} == {("russia", "NETWORK")}


def test_q6_contributor_centrality(graph_tables):
    from cyber_etl_spark.pipeline.graph_queries import contributor_centrality

    out = contributor_centrality(
        graph_tables["alert_cve"], graph_tables["gh_users"], top_k=3
    ).collect()
    logins = [r.login for r in out]
    # alice contributes to the two most-referenced CVEs → highest rank
    assert logins[0] == "alice"
    assert set(logins) <= {"alice", "bob", "carol", "dave"}
    assert all(out[i].rank >= out[i + 1].rank for i in range(len(out) - 1))


def test_q7_community_histogram(graph_tables):
    from cyber_etl_spark.pipeline.graph_queries import community_histogram

    out = community_histogram(graph_tables["alert_cve"], graph_tables["gh_users"]).collect()
    total = sum(r.n_members for r in out)
    # nodes: 3 alerts + 5 cves(4 connected + CVE-5) + 4 users = 12
    assert total == 12
    # LPA on this bipartite star graph fragments deterministically; the
    # structural assertions are: a dominant community exists and the
    # isolated CVE-5/dave pair never merges into it
    assert out[0].n_members >= 3
    assert len(out) >= 2


def test_q8_language_popularity(graph_tables):
    from cyber_etl_spark.pipeline.graph_queries import language_popularity

    one_hop = [
        (r.language, r.n_cves)
        for r in language_popularity(graph_tables["gh_langs"]).collect()
    ]
    assert one_hop == [("Python", 3), ("C", 1), ("Go", 1)]  # 'message' excluded

    three_hop = [
        (r.language, r.n_cves)
        for r in language_popularity(
            graph_tables["gh_langs"], graph_tables["alert_cve"]
        ).collect()
    ]
    # only alert-referenced CVEs: CVE-5 (Python) drops out
    assert three_hop == [("Python", 2), ("C", 1), ("Go", 1)]
