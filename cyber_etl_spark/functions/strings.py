"""Domain string/regex functions — SURVEY.md §2.9 F1–F16.

Every function is a Column→Column expression over built-in
``pyspark.sql.functions`` (JVM-side, codegen-friendly).  The reference
implemented these as pandas ``str.`` chains and row-wise ``.apply``
lambdas; citations note the original cell.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — CVE id extraction (data_integration.ipynb:376-457 cells 10/12)
CVE_PATTERN = r"(CVE-\d{4}-\d+)"
# F2 — TTP technique-id extraction, group 2 (cells 11-12)
TTP_PATTERN = r"(\[|\s)(T\d{4})\.?\d*(\]|\s)"


def extract_cve_ids(col: Column) -> Column:
    """All CVE ids in a text column, de-duplicated and sorted (the
    reference wraps findall in set() then sorted() — cells 10/12)."""
    return F.array_sort(F.array_distinct(F.regexp_extract_all(col, F.lit(CVE_PATTERN), 1)))


def extract_ttp_ids(col: Column) -> Column:
    """All ATT&CK technique ids (T####), group-2 select, dedup + sort."""
    return F.array_sort(F.array_distinct(F.regexp_extract_all(col, F.lit(TTP_PATTERN), 2)))


def strip_boilerplate(col: Column) -> Column:
    """F3 — remove alert boilerplate: leading 'Summary', DISCLAIMER/
    INFORMATION-REQUESTED tails (data_integration.ipynb:1554 cell 27)."""
    out = F.regexp_replace(col, r"^\s*Summary", "")
    out = F.regexp_replace(out, r"DISCLAIMER[\s\S]*", "")
    out = F.regexp_replace(out, r"INFORMATION REQUESTED[\s\S]*", "")
    return out


def truncate_versions(col: Column) -> Column:
    """F4 — collapse version numbers to major: 'v1.2.3' → 'v1'
    ((v?[0-9]{1,2})\\.[0-9]... → $1, cell 27)."""
    return F.regexp_replace(
        col, r"(v?[0-9]{1,2})\.[0-9]{1,2}\.?[0-9]*\.?[0-9]*", r"$1"
    )


def strip_non_printable(col: Column) -> Column:
    """F5 — keep only printable ASCII + whitespace (cell 27
    replace_non_printable)."""
    return F.regexp_replace(col, r"[^\x20-\x7E\t\n\r]", "")


def collapse_spaces(col: Column) -> Column:
    """F3 — multiple whitespace → single space, trimmed (cell 27)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _build_fold_table() -> tuple[str, str]:
    """Latin accent→ASCII translate table, generated from Unicode NFD
    decompositions at import time (stdlib only): every Latin-1 Supplement /
    Latin Extended-A/B codepoint whose canonical decomposition is one ASCII
    base letter plus combining marks maps to that base letter."""
    import unicodedata

    src, dst = [], []
    for cp in range(0xC0, 0x250):
        ch = chr(cp)
        base = "".join(
            c
            for c in unicodedata.normalize("NFD", ch)
            if not unicodedata.combining(c)
        )
        if base != ch and len(base) == 1 and ord(base) < 128:
            src.append(ch)
            dst.append(base)
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _build_fold_table()
# Letters with no single-ASCII NFD decomposition (expansions / standalone
# letters unidecode also folds).  Lowercase only: callers fold after lower().
_FOLD_MULTI = (("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("ø", "o"),
               ("đ", "d"), ("ð", "d"), ("þ", "th"), ("ł", "l"),
               ("ħ", "h"), ("ı", "i"), ("ŋ", "n"), ("ĸ", "k"))


def ascii_fold(col: Column) -> Column:
    """F11 fidelity — transliterate accented Latin letters to ASCII, the
    `unidecode` step of the reference's ER preprocess
    (alerts/parse_alert.ipynb:7474 cell 45): 'Société' → 'Societe', so
    accented and plain spellings of one entity land in the same ER block."""
    out = F.translate(col, _FOLD_SRC, _FOLD_DST)
    for frm, to in _FOLD_MULTI:
        out = F.replace(out, F.lit(frm), F.lit(to))
    return out


def normalize_entity(col: Column) -> Column:
    """F11 + F3 — entity-resolution normalization: lowercase, ASCII-fold
    accents (unidecode equivalent), strip corp suffixes and
    parentheticals, collapse whitespace
    (data_integration.ipynb:1948 cell 35; alerts/parse_alert.ipynb:7474)."""
    out = ascii_fold(F.lower(col))
    out = F.regexp_replace(out, r"\s?corp\.?$|\s?inc\.?$|\s?ltd\.?$", "")
    out = F.regexp_replace(out, r"\s\(.*?\)", " ")
    out = F.regexp_replace(out, r"[^\w\s]", " ")
    return collapse_spaces(out)


def clean_alert_date(col: Column) -> Column:
    """F13 — 'Original release date: November 17, 2022 | Last revised...'
    → DateType (data_integration.ipynb:650 cell 15)."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(col, r"Original release date:\s*", ""), r"\s*\|.*", ""
        )
    )
    return F.to_date(cleaned, "MMMM d, yyyy")


def cpe_vendor_product(col: Column) -> Column:
    """F9 — 'cpe:2.3:o:vendor:product:...' → 'vendor_product'
    (parse_cve_json_data.py:105-108: ':'-split, segments 3:5, '_'-join).
    URIs with <5 segments yield '' in the reference (SURVEY §2.12.5);
    we return NULL instead and let callers filter — documented divergence.
    """
    parts = F.split(col, ":")
    return F.when(
        F.size(parts) >= 5,
        F.concat_ws("_", F.element_at(parts, 4), F.element_at(parts, 5)),
    ).otherwise(F.lit(None).cast("string"))


def url_path(col: Column) -> Column:
    """F10 — path component of a URL (urlsplit().path, cell 54)."""
    return F.parse_url(col, F.lit("PATH"))


def zero_pad(col: Column, width: int = 5) -> Column:
    """F12 — zfill (cell 57 file numbering)."""
    return F.lpad(col.cast("string"), width, "0")


def join_multilang(col: Column) -> Column:
    """F8 — join multi-language description values with ' -|- '
    (parse_cve_json_data.py:100-102)."""
    return F.array_join(col, " -|- ")


def minimd(col: Column) -> Column:
    """F15 — mini-markdown normalization of MITRE descriptions
    (mitre_json_to_csv.py:62-101): strip code ticks, bold/italic
    markers, rewrite [text](url) links to text, drop headers."""
    out = F.regexp_replace(col, r"```[\s\S]*?```", "")
    out = F.regexp_replace(out, r"`([^`]*)`", r"$1")
    out = F.regexp_replace(out, r"\*\*([^*]*)\*\*", r"$1")
    out = F.regexp_replace(out, r"\*([^*]*)\*", r"$1")
    out = F.regexp_replace(out, r"\[([^\]]*)\]\([^)]*\)", r"$1")
    out = F.regexp_replace(out, r"(?m)^#+\s*", "")
    return collapse_spaces(out)
