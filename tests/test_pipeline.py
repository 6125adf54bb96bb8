"""Domain-pipeline parity tests on synthesized bronze fixtures.

Fixtures deliberately include the edge cases FIXTURES.md §4 calls out:
missing CVSSv3 blocks, vulnerable:false cpe matches, short cpe URIs,
multi-language descriptions, '[bot]'-vs-character-class logins, revoked
STIX objects, dirty alert dates.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# NVD CVE feed
# ---------------------------------------------------------------------------

NVD_DOC = {
    "CVE_Items": [
        {
            "cve": {
                "CVE_data_meta": {"ID": "CVE-2020-0001"},
                "references": {
                    "reference_data": [
                        {
                            "url": "https://github.com/foo/bar",
                            "name": "gh",
                            "refsource": "MISC",
                            "tags": ["Third Party Advisory", "Patch"],
                        },
                        {
                            "url": "https://example.com/x",
                            "name": "ex",
                            "refsource": "MISC",
                            "tags": [],
                        },
                    ]
                },
                "description": {
                    "description_data": [
                        {"lang": "en", "value": "A bad bug."},
                        {"lang": "es", "value": "Un error malo."},
                    ]
                },
            },
            "impact": {
                "baseMetricV3": {
                    "cvssV3": {"baseScore": 9.8, "attackVector": "NETWORK"},
                    "exploitabilityScore": 3.9,
                    "impactScore": 5.9,
                }
            },
            "publishedDate": "2020-02-11T22:15Z",
            "configurations": {
                "nodes": [
                    {
                        "cpe_match": [
                            {
                                "vulnerable": True,
                                "cpe23Uri": "cpe:2.3:o:zephyrproject:zephyr:1.0",
                            },
                            {
                                "vulnerable": False,
                                "cpe23Uri": "cpe:2.3:a:notvuln:prod:2.0",
                            },
                            {"vulnerable": True, "cpe23Uri": "cpe:short"},
                        ]
                    }
                ]
            },
        },
        {
            "cve": {
                "CVE_data_meta": {"ID": "CVE-2021-9999"},
                "references": {"reference_data": []},
                "description": {
                    "description_data": [{"lang": "en", "value": "No cvss v3 here."}]
                },
            },
            "impact": {},
            "publishedDate": "2021-01-01T00:00Z",
            "configurations": {"nodes": []},
        },
    ]
}


@pytest.fixture(scope="module")
def nvd_items(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("nvd") / "feed.json"
    p.write_text(json.dumps(NVD_DOC))
    from cyber_etl_spark.pipeline.nvd import read_feed

    return read_feed(spark, str(p))


def test_cve_nodes(nvd_items):
    from cyber_etl_spark.pipeline.nvd import cve_nodes

    rows = {r.cve_id: r for r in cve_nodes(nvd_items).collect()}
    assert rows["CVE-2020-0001"].score == 9.8
    assert rows["CVE-2020-0001"].attack_vector == "NETWORK"
    assert rows["CVE-2020-0001"].description == "A bad bug. -|- Un error malo."
    assert rows["CVE-2021-9999"].score is None  # missing CVSSv3 → nulls
    assert rows["CVE-2021-9999"].exploitability is None


def test_cve_references_explode(nvd_items):
    from cyber_etl_spark.pipeline.nvd import cve_references

    refs = cve_references(nvd_items).collect()
    tags = sorted(r.tag for r in refs if r.cve_id == "CVE-2020-0001" and r.tag)
    assert tags == ["Patch", "Third Party Advisory"]
    # empty tags array → one null-tag row survives (explode_outer semantics)
    assert any(r.url == "https://example.com/x" and r.tag is None for r in refs)
    # CVE with no references yields a single all-null reference row
    assert any(r.cve_id == "CVE-2021-9999" and r.url is None for r in refs)


def test_cpe_nodes_vulnerable_filter(nvd_items):
    from cyber_etl_spark.pipeline.nvd import cpe_nodes

    rows = cpe_nodes(nvd_items).collect()
    # vulnerable:false dropped; <5-segment URI dropped (fix of §2.12.5)
    assert [(r.cpe, r.cve_id) for r in rows] == [("zephyrproject_zephyr", "CVE-2020-0001")]


def test_filter_relevant_cves(spark, nvd_items):
    from cyber_etl_spark.pipeline.nvd import cve_nodes, filter_relevant_cves

    cves = cve_nodes(nvd_items)
    alert_refs = spark.createDataFrame([("CVE-2021-9999",)], ["cve_id"])
    gh_refs = spark.createDataFrame([], "cve_id string")
    kept = filter_relevant_cves(cves, alert_refs, gh_refs).collect()
    assert [r.cve_id for r in kept] == ["CVE-2021-9999"]


# ---------------------------------------------------------------------------
# Alerts
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def alerts_raw(spark):
    rows = [
        (
            "/a1",
            "AA20-001A",
            "Bad Things",
            "Original release date: November 17, 2022 | Last revised: December 1, 2022",
            "Summary CVE-2020-0001 and CVE-2020-0001 again, also [T1059] and T1027.002 plus v1.2.3.",
        ),
        (
            "/a2",
            "AA21-002B",
            "More Things",
            "Original release date: January 5, 2021",
            "No cves here, just DISCLAIMER: legal text.",
        ),
    ]
    return spark.createDataFrame(rows, ["link", "alert_id", "title", "date", "text"])


def test_alert_nodes_date_cleanup(alerts_raw):
    from cyber_etl_spark.pipeline.alerts import alert_nodes

    rows = {r.alert_id: r for r in alert_nodes(alerts_raw).collect()}
    assert str(rows["AA20-001A"].date) == "2022-11-17"
    assert str(rows["AA21-002B"].date) == "2021-01-05"
    assert rows["AA20-001A"].full_path == "https://www.cisa.gov/a1"


def test_alert_cve_edges_dedup(alerts_raw):
    from cyber_etl_spark.pipeline.alerts import alert_cve_edges

    rows = alert_cve_edges(alerts_raw).collect()
    # duplicate mention collapses; alert without CVEs yields no row
    assert [(r.alert_id, r.cve_id) for r in rows] == [("AA20-001A", "CVE-2020-0001")]


def test_alert_ttp_edges_enrichment(spark, alerts_raw):
    from cyber_etl_spark.pipeline.alerts import alert_ttp_edges

    mitre = spark.createDataFrame(
        [("T1059", "Command and Scripting Interpreter", "https://attack.mitre.org/T1059")],
        ["id", "name", "url"],
    )
    rows = alert_ttp_edges(alerts_raw, mitre).collect()
    # T1027.002 has no MITRE row → dropped by deliberate inner join (J1)
    assert len(rows) == 1
    assert rows[0].ttp_id == "T1059"
    assert rows[0].name == "Command and Scripting Interpreter"


# ---------------------------------------------------------------------------
# MITRE STIX
# ---------------------------------------------------------------------------

STIX_DOC = {
    "spec_version": "2.0",
    "objects": [
        {
            "type": "attack-pattern",
            "id": "attack-pattern--1",
            "name": "Phishing",
            "revoked": False,
            "external_references": [
                {"source_name": "mitre-attack", "external_id": "T1566", "url": "https://attack.mitre.org/T1566"},
                {"source_name": "other", "external_id": "X1", "url": "https://x"},
            ],
            "x_mitre_platforms": ["Windows", "Linux"],
            "kill_chain_phases": [
                {"kill_chain_name": "mitre-attack", "phase_name": "initial-access"}
            ],
            "x_mitre_data_sources": ["Email Gateway"],
            "description": "Adversaries send **phishing** messages, see [docs](https://x).",
            "x_mitre_detection": "Monitor `smtp` logs.",
        },
        {
            "type": "attack-pattern",
            "id": "attack-pattern--2",
            "name": "Old Technique",
            "revoked": True,
            "external_references": [
                {"source_name": "mitre-attack", "external_id": "T9999", "url": "u"}
            ],
            "description": "gone",
        },
        {"type": "x-mitre-tactic", "id": "tac--1", "name": "TA0001"},
    ],
}


def test_mitre_techniques(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("stix") / "bundle.json"
    p.write_text(json.dumps(STIX_DOC))
    from cyber_etl_spark.pipeline.mitre import mitre_techniques, read_bundle

    rows = mitre_techniques(read_bundle(spark, str(p))).collect()
    assert len(rows) == 1  # revoked + non-attack-pattern dropped
    r = rows[0]
    assert r.id == "T1566"
    assert r.platforms == "Windows, Linux"
    assert r["kill chain phases"] == "initial-access"
    assert r.description == "Adversaries send phishing messages, see docs."
    assert r.detection == "Monitor smtp logs."


# ---------------------------------------------------------------------------
# GitHub
# ---------------------------------------------------------------------------

def test_github_language_edges(spark):
    from cyber_etl_spark.pipeline.github import github_language_edges

    rows_in = [
        (0, "u1", "success", {"Python": 123.0, "C": 45.0, "message": 1.0}),
        (1, "u2", "failed", {"Go": 1.0}),
        (2, "u3", "success", {"Rust": None}),
    ]
    df = spark.createDataFrame(
        rows_in, "original_index long, url string, status string, languages map<string,double>"
    )
    out = {(r.url, r.language): r.ratio for r in github_language_edges(df).collect()}
    assert out == {("u1", "Python"): 123.0, ("u1", "C"): 45.0}


def test_github_user_edges_bot_filter(spark):
    from cyber_etl_spark.pipeline.github import github_user_edges

    rows_in = [
        (0, "u1", "success", {"login": "octocat", "contributions": 5}),
        (0, "u1", "success", {"login": "dependabot[bot]", "contributions": 9}),
        # would be dropped by the reference's '[bot]' character-class bug:
        (0, "u1", "success", {"login": "bob", "contributions": 1}),
        (1, "u2", "failed", {"login": None, "contributions": None}),
    ]
    df = spark.createDataFrame(
        rows_in,
        "original_index long, url string, status string, "
        "contributors struct<login:string, contributions:long>",
    )
    logins = sorted(r.login for r in github_user_edges(df).collect())
    assert logins == ["bob", "octocat"]


# ---------------------------------------------------------------------------
# Similarity join + entity resolution
# ---------------------------------------------------------------------------

def test_token_jaccard_join_matches_reference_semantics(spark):
    from cyber_etl_spark.operators.similarity import token_jaccard_join

    products = spark.createDataFrame(
        [(1, "windows server"), (2, "apache http server"), (3, "zephyr")],
        ["pid", "name"],
    )
    cpes = spark.createDataFrame(
        [(10, "microsoft windows server"), (11, "apache server"), (12, "linux kernel")],
        ["cid", "cpe"],
    )
    got = {
        (r.l_id, r.r_id): round(r.jaccard, 3)
        for r in token_jaccard_join(products, cpes, "pid", "name", "cid", "cpe", 0.5).collect()
    }
    # windows server ∩ microsoft windows server = 2/3; apache http server ∩
    # apache server = 2/3; zephyr matches nothing
    assert got == {(1, 10): 0.667, (2, 11): 0.667}


def test_entity_resolution_clusters_and_best_labels(spark):
    from cyber_etl_spark.pipeline.entity_resolution import (
        best_labels,
        resolve_entities,
    )

    mentions = spark.createDataFrame(
        [
            (1, "Microsoft Corp", "ORG"),
            (2, "Microsoft", "ORG"),
            (3, "microsoft corp.", "ORG"),
            (4, "Apache Foundation", "ORG"),
            (5, "Microsoft", "PRODUCT"),  # same text, different type: no merge
        ],
        ["mention_id", "label", "type"],
    )
    resolved = resolve_entities(mentions)
    clusters = {r.mention_id: r.cluster_id for r in resolved.collect()}
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[4] != clusters[1]
    assert clusters[5] != clusters[1]
    best = {r.cluster_id: r.best_label for r in best_labels(resolved).collect()}
    # 'Microsoft Corp'/'microsoft corp.'/'Microsoft': 'Microsoft' wins ties
    # alphabetically at freq 1 each... freq: Microsoft appears once in ORG
    assert best[1] in {"Microsoft", "Microsoft Corp"}


def test_entity_resolution_folds_accents(spark):
    """F11 unidecode parity: accented and plain spellings must cluster —
    the blocking key is the ASCII-folded normalized form."""
    from cyber_etl_spark.pipeline.entity_resolution import resolve_entities

    mentions = spark.createDataFrame(
        [
            (1, "Société Générale", "ORG"),
            (2, "Societe Generale", "ORG"),
            (3, "SOCIÉTÉ GÉNÉRALE", "ORG"),
            (4, "Škoda Auto", "ORG"),
            (5, "Skoda Auto", "ORG"),
            (6, "Nestlé", "ORG"),
        ],
        ["mention_id", "label", "type"],
    )
    clusters = {r.mention_id: r.cluster_id for r in resolve_entities(mentions).collect()}
    assert clusters[1] == clusters[2] == clusters[3]
    assert clusters[4] == clusters[5]
    assert clusters[6] not in {clusters[1], clusters[4]}


def test_ascii_fold_expansions(spark):
    from pyspark.sql import functions as F

    from cyber_etl_spark.functions.strings import ascii_fold

    df = spark.createDataFrame(
        [("straße",), ("cæsar",), ("œuvre",), ("søren",), ("łódź",)], ["s"]
    )
    got = [r.f for r in df.select(ascii_fold(F.col("s")).alias("f")).collect()]
    assert got == ["strasse", "caesar", "oeuvre", "soren", "lodz"]
