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


# labels the reference keeps (data_integration.ipynb cell 29); NORP folds
# to GPE per SURVEY P7
_KEEP_LABELS = {"ORG", "PRODUCT", "GPE", "PERSON", "NORP"}
_SPACY_MODELS = ("en_core_web_trf", "en_core_web_sm")


def _load_spacy():  # pragma: no cover - model artifact not in container
    import spacy

    for name in _SPACY_MODELS:
        try:
            return spacy.load(name, disable=["parser", "lemmatizer"])
        except OSError:
            continue
    return None


def _spacy_ner_batch(nlp, texts: pd.Series) -> pd.Series:  # pragma: no cover
    """Batch inference via nlp.pipe (the documented fast path); label
    filter + NORP→GPE fold applied model-side so the output contract is
    identical to the stub engine's."""
    docs = nlp.pipe([t if isinstance(t, str) else "" for t in texts])
    out = []
    for doc in docs:
        out.append(
            [
                {
                    "text": e.text,
                    "label": "GPE" if e.label_ == "NORP" else e.label_,
                }
                for e in doc.ents
                if e.label_ in _KEEP_LABELS
            ]
        )
    return pd.Series(out, index=texts.index)


@pandas_udf(NER_SCHEMA)
def ner_entities(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """array<struct<text,label>> per document.

    Iterator form: heavyweight model init happens here, once per executor
    python worker, before the batch loop.  With spaCy installed and a
    model artifact available the real pipeline runs (load-once-per-worker,
    nlp.pipe batching, label filter, NORP→GPE fold); otherwise the
    deterministic gazetteer stub keeps the same output contract.
    """
    nlp = _load_spacy() if _HAS_SPACY else None  # pragma: no cover
    for s in batches:
        if nlp is not None:  # pragma: no cover
            yield _spacy_ner_batch(nlp, s)
        else:
            yield s.map(_stub_ner)


def extract_entities(text_col: Column) -> Column:
    return ner_entities(text_col)
