"""CISA alert processing — SURVEY.md stages 2-3 (data_integration.ipynb
cells 10-18).

Bronze input is the scraped alerts table (link, alert_id, title, date,
text) — FIXTURES.md §1.2; scraping itself is driver-side ingest outside
the engine boundary.  Everything here is column expressions: regex
extraction, date cleanup, explode to edge tables, broadcast enrichment
join against MITRE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import clean_alert_date, extract_cve_ids, extract_ttp_ids


def alert_nodes(alerts_raw: DataFrame) -> DataFrame:
    """alert_id, full_path, title, date — cells 15-16: URL concat (F7),
    dirty-date cleanup (F13), projection + dedup."""
    return (
        alerts_raw.select(
            "alert_id",
            F.concat(F.lit("https://www.cisa.gov"), F.col("link")).alias("full_path"),
            "title",
            clean_alert_date(F.col("date")).alias("date"),
        )
        .dropDuplicates(["alert_id"])
    )


def alert_cve_edges(alerts_raw: DataFrame) -> DataFrame:
    """(alert_id, cve_id) — regex-extract CVE ids (F1) and explode (R1).

    Fix-forward of reference bug SURVEY §2.12.1: the shipped
    data/alert_cve_edge.feather exploded the *TTP* column and renamed it
    cve_id (data_integration.ipynb:837 cell 17); we explode the CVE list,
    matching the older-but-correct alerts/parse_alert.ipynb:7118.
    ``explode`` (inner) + distinct reproduces explode→dropna→dedupe.
    """
    return (
        alerts_raw.select(
            "alert_id", F.explode(extract_cve_ids(F.col("text"))).alias("cve_id")
        )
        .distinct()
    )


def alert_ttp_edges(alerts_raw: DataFrame, mitre: DataFrame) -> DataFrame:
    """(alert_id, ttp_id, + technique metadata) — extract T#### ids (F2),
    explode, inner-join MITRE enrichment (J1; the reference comments 'Ok
    losing any TTPs without the data' at data_integration.ipynb:965 —
    deliberate inner semantics, kept).  MITRE is ~4K rows → broadcast."""
    edges = alerts_raw.select(
        "alert_id", F.explode(extract_ttp_ids(F.col("text"))).alias("ttp_id")
    ).distinct()
    return edges.join(F.broadcast(mitre), edges.ttp_id == mitre.id, "inner").drop("id")
