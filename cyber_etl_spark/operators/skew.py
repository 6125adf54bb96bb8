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
be reproducible run-to-run (SURVEY.md §7.3 determinism rule).  Note the
salt value never reaches the RESULT — sums reassociate across buckets and
the dim side is replicated across every salt — so the salt source only
controls row *placement*.  Hashing the visible columns alone would leave
rows that are duplicated across every selected column in one bucket (zero
spreading exactly in the degenerate-skew case); callers should pass a
unique key column (``salt_source``/``disambiguator``) when one exists, and
otherwise the operators mix in ``monotonically_increasing_id()`` — safe
here precisely because placement, not output, depends on it.
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

    ``salt_source``: a unique-ish column (e.g. the fact's primary key) —
    the best spreader, and the path to prefer at scale.  Without one, the
    salt hashes all columns PLUS a per-row id so fully-duplicate rows
    still spread — but ``monotonically_increasing_id`` is
    Catalyst-NONdeterministic: if the input were recomputed differently
    on a stage retry after a fetch failure, rows could re-salt mid-job
    (the SPARK-23207 lost/duplicated-rows hazard).  The fallback
    therefore pins the input with a ``localCheckpoint`` first, making the
    id a function of fixed block placement.  That materialization is the
    price of not having a key column; callers with any stable unique-ish
    column should pass it as ``salt_source`` instead.
    """
    if salt_source:
        salt = F.pmod(F.hash(F.col(salt_source)), F.lit(salt_buckets))
    else:
        # pin partition placement so the per-row id is retry-deterministic
        df = df.localCheckpoint(eager=True)
        salt = F.pmod(
            F.hash(F.concat_ws("", *df.columns), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        )
    salted = df.withColumn("_salt", salt)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(c).alias(f"_sum_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_cnt").alias("count"),
        *[F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def chunked_pair_expand(
    df: DataFrame, set_col: str, chunk: int = 4096, max_size: int | None = None
) -> DataFrame:
    """All unordered pairs ``src < dst`` from each row's ascending-sorted
    array, with degree-skew protection for the expansion itself.

    The naive posexplode+slice expansion generates k²/2 pairs for a
    k-element set INSIDE ONE TASK — the 100 TB failure mode for
    co-occurrence graph builds (one celebrity key OOMs its task).  Here
    rows whose set exceeds ``chunk`` elements are decomposed into
    (ci ≤ cj) chunk-pair rows, scattered across the cluster by a
    repartition, and each task expands at most ``chunk²`` pairs:

    - intra-chunk (ci == cj): the usual i<j slice expansion;
    - cross-chunk (ci < cj): a full explode×explode product — valid
      because the array is sorted, so every element of chunk ci is
      strictly less than every element of chunk cj.

    The scatter shuffle moves O(k·C²) bytes per heavy row (C = k/chunk
    chunks, each chunk-pair row carries its two slices) — negligible next
    to the k²/2 output rows it unblocks, and only ever paid for heavy
    rows; sets ≤ ``chunk`` take the original single-task path, and the
    two branches share the upstream shuffle via exchange reuse.  Output
    is one (src, dst) row per pair occurrence; callers aggregate.

    ``max_size``: the caller's observed maximum set size (one cheap
    aggregate when the input is already materialized).  When it proves no
    row exceeds ``chunk``, the plan is just the single light-path
    generator — no empty heavy-path branches, no scatter exchange, no
    three-way union — an AQE-style runtime choice: pay the skew machinery
    only when the data actually has a heavy key.
    """
    ss = F.col(set_col)
    all_light = max_size is not None and max_size <= chunk
    light = (
        (df if all_light else df.filter(F.size(ss) <= chunk))
        .select(F.posexplode(ss).alias("i", "src"), ss.alias("_ss"))
        .select(
            "src",
            F.explode(F.slice("_ss", F.col("i") + 2, F.size("_ss"))).alias("dst"),
        )
    )
    if all_light:
        return light
    nc = F.ceil(F.size(ss) / F.lit(chunk)).cast("int")
    hp = (
        df.filter(F.size(ss) > chunk)
        .select(ss.alias("_ss"), nc.alias("_nc"))
        .withColumn("_ci", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .withColumn("_cj", F.explode(F.sequence(F.col("_ci"), F.col("_nc") - 1)))
        # deterministic scatter: a hot row's C²/2 chunk-pairs spread over
        # the cluster instead of staying in the producing task
        .repartition(F.col("_ci"), F.col("_cj"), F.xxhash64(F.col("_ss")))
        .select(
            F.slice("_ss", F.col("_ci") * chunk + 1, chunk).alias("_a"),
            F.slice("_ss", F.col("_cj") * chunk + 1, chunk).alias("_b"),
            (F.col("_ci") == F.col("_cj")).alias("_intra"),
        )
    )
    intra = (
        hp.filter("_intra")
        .select(F.posexplode("_a").alias("i", "src"), "_a")
        .select(
            "src",
            F.explode(F.slice("_a", F.col("i") + 2, F.size("_a"))).alias("dst"),
        )
    )
    cross = (
        hp.filter(~F.col("_intra"))
        .select(F.explode("_a").alias("src"), "_b")
        .select("src", F.explode("_b").alias("dst"))
    )
    return light.unionByName(intra).unionByName(cross)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    disambiguator: str | None = None,
) -> DataFrame:
    """Equi-join where ``fact[key]`` is heavily skewed: dim rows are
    replicated ``salt_buckets``× (explode), fact rows get a deterministic
    salt, and the join key becomes (key, salt).  Output columns = fact ⋈
    dim minus the helper columns.

    ``disambiguator``: a unique fact column (e.g. o_orderkey) hashed for
    the salt; without one, all columns plus a per-row id are hashed so
    duplicate fact rows still spread (see module note).

    Only inner/left are valid: right/full would multiply unmatched dim
    rows by the replication factor."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    dim_rep = dim.withColumn("_salt", F.explode(salts))
    if disambiguator:
        salt = F.pmod(F.hash(F.col(disambiguator)), F.lit(salt_buckets))
    else:
        salt = F.pmod(
            F.hash(F.concat_ws("", *fact.columns), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        )
    fact_salted = fact.withColumn("_salt", salt)
    joined = fact_salted.join(dim_rep, [key, "_salt"], how)
    return joined.drop("_salt")
