"""NER extraction as an Arrow-batched pandas UDF — SURVEY.md M1
(data_integration.ipynb:1643-1653 cells 28-29).

The reference loads ``spacy en_core_web_trf`` and loops documents on the
driver.  Here NER is a Series→Series pandas UDF in the
iterator-of-batches form, so the model loads ONCE PER EXECUTOR (not per
row, not per batch) and inference crosses the JVM boundary in Arrow
batches — the standard pattern for model UDFs at cluster scale.

spaCy isn't in this container, so the default engine is a deterministic
regex-gazetteer stub producing the same output shape
(array<struct<text,label>> with labels ORG/PRODUCT/GPE/PERSON — the
label set the reference keeps, folding NORP→GPE per SURVEY P7).
Swapping in spaCy is the marked inner function only.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

NER_SCHEMA = ArrayType(
    StructType([StructField("text", StringType()), StructField("label", StringType())])
)

try:  # pragma: no cover - not present in this container
    import spacy  # noqa: F401

    _HAS_SPACY = True
except ImportError:
    _HAS_SPACY = False

# deterministic gazetteers for the stub engine
_GPE = (
    "russia", "china", "iran", "north korea", "united states", "ukraine",
    "germany", "france",
)
_ORG_SUFFIX = re.compile(r"\b([A-Z][A-Za-z0-9&-]*(?:\s+[A-Z][A-Za-z0-9&-]*)*)\s+(?:Corp|Inc|Ltd|Foundation|Group)\b")
_PRODUCT = re.compile(r"\b(Windows(?:\s+Server)?|Linux|Exchange|Outlook|Chrome|Firefox|Apache|OpenSSL)\b")
_PERSON = re.compile(r"\bMr\.\s+([A-Z][a-z]+(?:\s[A-Z][a-z]+)?)|\bMs\.\s+([A-Z][a-z]+(?:\s[A-Z][a-z]+)?)")


def _stub_ner(text: str) -> list[dict]:
    ents: list[dict] = []
    for m in _ORG_SUFFIX.finditer(text):
        ents.append({"text": m.group(0), "label": "ORG"})
    for m in _PRODUCT.finditer(text):
        ents.append({"text": m.group(1), "label": "PRODUCT"})
    low = text.lower()
    for g in _GPE:
        if g in low:
            ents.append({"text": g, "label": "GPE"})
    for m in _PERSON.finditer(text):
        ents.append({"text": m.group(1) or m.group(2), "label": "PERSON"})
    return ents


@pandas_udf(NER_SCHEMA)
def ner_entities(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """array<struct<text,label>> per document.

    Iterator form: heavyweight model init happens here, once per executor
    python worker, before the batch loop.
    """
    if _HAS_SPACY:  # pragma: no cover
        # nlp = spacy.load("en_core_web_trf"); keep = {ORG, PRODUCT, GPE,
        # PERSON, NORP}; NORP folds to GPE downstream (SURVEY P7).
        raise NotImplementedError("spaCy path requires the model artifact")
    for s in batches:
        yield s.map(_stub_ner)


def extract_entities(text_col: Column) -> Column:
    return ner_entities(text_col)
