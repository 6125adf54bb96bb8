"""Count-min sketch: mergeable point-frequency estimation.

Completes the sketch family next to HLL (q173), KLL-style quantiles
(q88), Misra-Gries heavy hitters (q181), Bloom (q122) and
MinHash/SimHash (dedup): CMS answers "how often did THIS item occur"
from O(depth * width) memory with the published one-sided guarantee
est >= true and P[est > true + (e/width)*N] <= exp(-depth) per query.

Scale design: the sketch is built by per-Arrow-batch [depth x width]
int64 accumulation inside ``mapInPandas`` — each batch emits at most
depth*width nonzero cells no matter how many rows it folded, and the
cells merge downstream with one exact integer ``groupBy(r, b).sum``.
Integer sums commute, so the sketch is independent of partitioning and
batch slicing, and sketches built on different days/files/streams merge
by the same addition (the mergeability that makes CMS useful at 100 TB:
build per partition of the corpus, OR the artifacts together later).

Hashing is md5 (repo convention — never Spark's murmur ``hash``) over
``"{r}:{item}"``: the first 8 hex chars as an unsigned 32-bit integer
mod width.  That is EXACTLY ``conv(substr(md5(concat(r, ':', item)),
1, 8), 16, 10) % width`` in both Spark SQL and DuckDB, so the sketch a
SQL engine builds by direct GROUP BY over bucket ids is bit-identical
to the kernel's — the equality q224's hash gate proves.

Reference ancestry: the notebooks' value_counts() frequency profiling
(data_integration.ipynb cells 16-20), re-expressed as the
bounded-memory streaming-friendly estimator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_py(r: int, item: str, width: int) -> int:
    """Python twin of the SQL bucket expression (md5 first-8-hex)."""
    return int(hashlib.md5(f"{r}:{item}".encode()).hexdigest()[:8], 16) % width


def bucket_col(r: int, item: F.Column, width: int) -> F.Column:
    """Spark column twin of :func:`bucket_py`."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), item)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cms_sketch(
    df: DataFrame, item_col: str, width: int = 128, depth: int = 3
) -> DataFrame:
    """Build the sketch: rows ``(r, b, c)`` — exact count of items whose
    r-th hash lands in bucket b.  At most depth*width rows total."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            # hash each DISTINCT item once per batch, add its exact count
            for item, c in pdf[item_col].value_counts().items():
                for r in range(depth):
                    acc[r, bucket_py(r, item, width)] += int(c)
        r_idx, b_idx = np.nonzero(acc)
        yield pd.DataFrame(
            {"r": r_idx.astype(np.int64), "b": b_idx.astype(np.int64),
             "c": acc[r_idx, b_idx]}
        )

    return (
        df.select(F.col(item_col).cast("string").alias(item_col))
        .mapInPandas(kernel, "r long, b long, c long")
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 128,
    depth: int = 3,
) -> DataFrame:
    """Point estimates for ``items[item_col]``: min over the depth rows
    of the item's bucket counts (0 for never-seen items).  The sketch is
    <= depth*width rows — always the broadcast side."""
    probes = items.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        bucket_col(r, F.col(item_col), width).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(item_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        probes.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
