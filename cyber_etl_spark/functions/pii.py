"""PII detection and redaction — training-data curation operators.

A 100 TB text pipeline redacts personally identifying strings before
anything ships to training (beyond-reference capability, same tier as
dedup/quality in COVERAGE.md).  Patterns are deliberately conservative
regex (no lookaround, no backreferences) so the SAME pattern text runs
identically under Java regex (Spark), RE2 (DuckDB oracle) and Python
``re`` — engine-portable semantics are the whole point, since the
correctness gate diffs the redacted strings byte-for-byte.

Everything is built-in ``pyspark.sql.functions`` expressions
(regexp_replace / regexp_extract_all) — JVM-side, codegen'd, no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# replacement order matters for overlapping classes (an email's domain
# must not be half-eaten by a later pattern): emails first, then dotted
# quads, then dashed phone groups.  Oracles must replicate this order.
REDACTION_ORDER: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ip", IPV4_RE, "[IP]"),
    ("phone", PHONE_RE, "[PHONE]"),
)


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its class token, in REDACTION_ORDER."""
    out = col
    for _, pattern, token in REDACTION_ORDER:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-class match counts over the RAW text (pre-redaction), as int
    columns keyed ``n_<class>`` — the audit metric a curation run logs."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast(
            "int"
        )
        for name, pattern, _ in REDACTION_ORDER
    }
