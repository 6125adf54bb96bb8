"""Vector column expressions for embedding workloads.

Dot products / norms / cosine over ``array<float>`` embedding columns as
``zip_with`` + ``aggregate`` expressions — sequential left-folds, so the
result is bit-deterministic (same order every run, no shuffle-order
dependence), JVM-side, and whole-stage-codegen friendly.  A vectorized
pandas UDF alternative exists for very wide vectors, but for d≈64-1024 the
codegen expression wins by avoiding Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) = dot/(|a|·|b|); inputs should already be double arrays."""
    return dot(a, b) / (norm(a) * norm(b))
