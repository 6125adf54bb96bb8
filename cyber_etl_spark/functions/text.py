"""Text-analysis column expressions — JVM-side, no Python UDFs.

The large-scale training-data-pipeline functions (token counting, quality
scoring, language ID, fingerprinting, shingling) are pure column
expressions built from ``pyspark.sql.functions`` higher-order array
functions, so they run inside whole-stage codegen and never cross into
Python.  The reference's equivalents were row-at-a-time pandas
(`.apply`, `str.` methods — SURVEY.md §2.9 F1-F16, §2.10 M6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic English stopword list (reference consumes
# data/stopwords.txt at data_integration.ipynb:1948 cell 35; we keep an
# inline deterministic subset so tests don't need the artifact).
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "be", "this", "that", "are", "was", "from",
)


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings removed (array<string>)."""
    return F.filter(F.split(col, " "), lambda x: x != F.lit(""))


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array (array<string>).

    Built with sequence+transform+slice so shingling happens JVM-side;
    short documents (< n tokens) yield an empty array.  This is the
    shingle→set step of MinHash/Jaccard dedup (the reference tokenizes
    with py_stringmatching QgramTokenizer, alerts/cpe_product.ipynb:458).
    """
    # zip the token array with its n-1 shifted copies, then concat each
    # struct: n slices per DOCUMENT instead of one slice+copy per shingle
    # position (the naive sequence+slice form is interpreted per element
    # and ~8× slower at corpus scale).
    parts = [toks] + [F.slice(toks, i + 1, F.size(toks)) for i in range(1, n)]
    z = F.slice(
        F.arrays_zip(*parts), 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))
    )
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (double, 0 for empty docs)."""
    stops = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.when(
        F.length(col) > 0, F.length(stripped) / F.length(col)
    ).otherwise(F.lit(0.0))


def gzip_ratio_udf():
    """Arrow-batched compression-ratio UDF: zlib(level 6) bytes / raw
    bytes per string (NULL for empty/NULL input) — the redundancy
    signal of q308.  Deterministic: zlib output depends only on the
    input bytes and level, never on batching (pinned by
    tests/test_round8_ops.py's repartition-invariance check)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ratio(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, 6)) / len(b)

        return texts.map(one)

    _ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_ratio, DoubleType())
