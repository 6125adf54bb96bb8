"""NVD CVE feed parsing — SURVEY.md S2 (parse_cve_json_data.py:31-116).

The reference walks each year's JSON document with jsonpath_ng queries in
a Python loop; here the whole feed is one ``spark.read.json`` (gzip
transparent, multiLine) and every JSONPath becomes nested-field access +
``explode`` — Catalyst prunes unused branches of the struct at the scan.

At 100 TB the year files land in a bronze directory and this module runs
unchanged: one distributed scan, no driver-side JSON handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import cpe_vendor_product, join_multilang


def read_feed(spark, path: str) -> DataFrame:
    """Bronze: one row per CVE item.  Explicit multiLine read (each year
    file is a single JSON document — SURVEY §7.3 hard part 4)."""
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(F.explode("CVE_Items").alias("item"))


def cve_nodes(items: DataFrame) -> DataFrame:
    """cve_id, score, exploitability, impact, attack_vector, published,
    description — parse_cve_json_data.py:68-102.  CVEs without a
    baseMetricV3 block yield nulls (FIXTURES.md §4)."""
    return items.select(
        F.col("item.cve.CVE_data_meta.ID").alias("cve_id"),
        F.col("item.impact.baseMetricV3.cvssV3.baseScore").cast("double").alias("score"),
        F.col("item.impact.baseMetricV3.exploitabilityScore")
        .cast("double")
        .alias("exploitability"),
        F.col("item.impact.baseMetricV3.impactScore").cast("double").alias("impact"),
        F.col("item.impact.baseMetricV3.cvssV3.attackVector").alias("attack_vector"),
        F.col("item.publishedDate").alias("published"),
        join_multilang(F.col("item.cve.description.description_data.value")).alias(
            "description"
        ),
    )


def cve_references(items: DataFrame) -> DataFrame:
    """One row per (cve, reference, tag): explode references then tags
    (parse_cve_json_data.py:121-126).  ``explode_outer`` + tag explode
    keeps references that have no tags as a single null-tag row."""
    refs = items.select(
        F.col("item.cve.CVE_data_meta.ID").alias("cve_id"),
        F.explode_outer("item.cve.references.reference_data").alias("ref"),
    )
    return refs.select(
        "cve_id",
        F.col("ref.url").alias("url"),
        F.col("ref.name").alias("name"),
        F.col("ref.refsource").alias("refsource"),
        F.explode_outer("ref.tags").alias("tag"),
    )


def cpe_nodes(items: DataFrame) -> DataFrame:
    """(cpe vendor_product, cve_id) — explode configuration nodes →
    cpe_match, keep only ``vulnerable == true`` (the JSONPath filter
    ``cpe_match[?(@.vulnerable==true)]`` at parse_cve_json_data.py:44-46
    becomes a post-explode Catalyst filter).

    Reference bug §2.12.5: <5-segment cpe23Uri produced '' rows in the
    shipped artifact; we drop them (documented fix-forward).
    """
    matches = items.select(
        F.col("item.cve.CVE_data_meta.ID").alias("cve_id"),
        F.explode_outer("item.configurations.nodes").alias("node"),
    ).select("cve_id", F.explode_outer("node.cpe_match").alias("m"))
    return (
        matches.where(F.col("m.vulnerable") == True)  # noqa: E712
        .select(cpe_vendor_product(F.col("m.cpe23Uri")).alias("cpe"), "cve_id")
        .where(F.col("cpe").isNotNull() & (F.col("cpe") != ""))
        .distinct()
    )


def filter_relevant_cves(
    cves: DataFrame, alert_cve_ids: DataFrame, github_ref_cves: DataFrame
) -> DataFrame:
    """Keep CVEs referenced by alerts OR having GitHub references — the
    reference's boolean-mask-of-isin filter (data_integration.ipynb:
    1483-1508, SURVEY P2/J5) expressed as a semi-join against the union
    of both key sets (one shuffle, or broadcast when the key sets are
    small)."""
    keys = (
        alert_cve_ids.select("cve_id")
        .unionByName(github_ref_cves.select("cve_id"))
        .distinct()
    )
    return cves.join(keys, "cve_id", "left_semi")
