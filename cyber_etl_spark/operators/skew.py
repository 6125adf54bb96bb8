"""Skew mitigation operators.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these utilities cover the two patterns AQE cannot rewrite:

- :func:`salted_aggregate` — two-phase aggregation for hot GROUP BY keys
  (a single celebrity key otherwise lands on one reducer).  Decomposable
  aggregates only (sum/count here — min/max compose the same way).
- :func:`salted_broadcast_left` / :func:`salted_join` — replicate the
  small side across N salt values and scatter the fact side, so one hot
  join key spreads over N reducers.

Salts are derived from deterministic hashes, never rand(): results must
be reproducible run-to-run (SURVEY.md §7.3 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """groupBy(keys) with sums+count, executed as salted partial → final.

    Phase 1 groups by (keys, salt) — the hot key's rows split across
    ``salt_buckets`` reducers; phase 2 re-aggregates the tiny partial
    table by the real keys.
    """
    src = F.col(salt_source) if salt_source else F.concat_ws("", *df.columns)
    salted = df.withColumn("_salt", F.pmod(F.hash(src), F.lit(salt_buckets)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(c).alias(f"_sum_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_cnt").alias("count"),
        *[F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact[key]`` is heavily skewed: dim rows are
    replicated ``salt_buckets``× (explode), fact rows get a deterministic
    salt, and the join key becomes (key, salt).  Output columns = fact ⋈
    dim minus the helper columns.

    Only inner/left are valid: right/full would multiply unmatched dim
    rows by the replication factor."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    dim_rep = dim.withColumn("_salt", F.explode(salts))
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.hash(F.concat_ws("", *fact.columns)), F.lit(salt_buckets))
    )
    joined = fact_salted.join(dim_rep, [key, "_salt"], how)
    return joined.drop("_salt")
