"""MITRE ATT&CK STIX bundle → techniques table — SURVEY.md S6
(mitre_json_to_csv.py:14-193).

The reference loops over bundle objects in Python; here the bundle is a
single ``spark.read.json`` multiLine document: explode objects, filter
attack-patterns that aren't revoked/deprecated, flatten external
references and kill-chain phases with array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import minimd


def read_bundle(spark, path: str) -> DataFrame:
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(F.explode("objects").alias("o"))


def _opt(objects: DataFrame, field: str, default):
    """STIX objects are schemaless-ish: optional fields (revoked,
    x_mitre_deprecated, detection...) may be absent from the inferred
    schema entirely — fall back to a literal default."""
    struct_fields = dict(
        (f.name, f) for f in objects.schema["o"].dataType.fields  # type: ignore[union-attr]
    )
    if field in struct_fields:
        return F.coalesce(F.col(f"o.{field}"), F.lit(default))
    return F.lit(default)


def mitre_techniques(objects: DataFrame) -> DataFrame:
    """name, id (T####), url, platforms, kill chain phases, description,
    data sources, detection — mitre_json_to_csv.py:105-193.

    - revoked / x_mitre_deprecated dropped (lines 33-35)
    - technique id + url come from the 'mitre-attack' external reference
    - list columns are comma-joined strings to match the CSV artifact
      (data/enterprise-attack.csv)
    - descriptions pass through the mini-markdown normalizer (F15)
    """
    ap = objects.where(
        (F.col("o.type") == "attack-pattern")
        & ~_opt(objects, "revoked", False)
        & ~_opt(objects, "x_mitre_deprecated", False)
    )
    mitre_ref = F.filter(
        F.col("o.external_references"), lambda r: r["source_name"] == F.lit("mitre-attack")
    )[0]
    return ap.select(
        F.col("o.name").alias("name"),
        mitre_ref["external_id"].alias("id"),
        mitre_ref["url"].alias("url"),
        F.array_join(F.col("o.x_mitre_platforms"), ", ").alias("platforms"),
        F.array_join(
            F.transform(F.col("o.kill_chain_phases"), lambda p: p["phase_name"]), ", "
        ).alias("kill chain phases"),
        minimd(F.col("o.description")).alias("description"),
        F.array_join(F.col("o.x_mitre_data_sources"), ", ").alias("data sources"),
        minimd(_opt(objects, "x_mitre_detection", "")).alias("detection"),
    ).where(F.col("id").isNotNull() & (F.col("id") != ""))
