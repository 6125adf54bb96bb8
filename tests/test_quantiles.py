"""Distributed exact-quantile kernel (operators/quantiles.py).

The kernel must be bit-identical to Spark's in-memory ``percentile``
aggregate (whose interpolation formula it replicates) while holding only
one *partition* of values per task — the property that lets the exact
quantile family (q61/q112/q130/q146) survive a global group at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cyber_etl_spark.operators.quantiles import exact_quantiles
from cyber_etl_spark.sources import read_table


def _spark_ref(df, col, probs, groups):
    aggs = [F.expr(f"percentile({col}, {p})").alias(a) for a, p in probs.items()]
    if groups:
        return {
            tuple(r[g] for g in groups): tuple(r[a] for a in probs)
            for r in df.groupBy(*groups).agg(*aggs).collect()
        }
    return {(): tuple(df.agg(*aggs).collect()[0][a] for a in probs)}


def _kernel(df, col, probs, groups, **kw):
    return {
        tuple(r[g] for g in groups): tuple(r[a] for a in probs)
        for r in exact_quantiles(df, col, probs, groups, **kw).collect()
    }


def test_grouped_matches_builtin_percentile_bitwise(spark, sf_smoke):
    events = read_table(spark, sf_smoke, "events")
    probs = {"p10": 0.1, "p25": 0.25, "p50": 0.5, "p75": 0.75, "p99": 0.99}
    assert _kernel(events, "value", probs, ["event_type"]) == _spark_ref(
        events, "value", probs, ["event_type"]
    )


def test_global_group_matches_builtin(spark, sf_smoke):
    orders = read_table(spark, sf_smoke, "orders")
    probs = {"med": 0.5, "p90": 0.9}
    assert _kernel(orders, "o_totalprice", probs, []) == _spark_ref(
        orders, "o_totalprice", probs, []
    )


def test_integer_column_and_multi_group(spark, sf_smoke):
    docs = read_table(spark, sf_smoke, "documents")
    probs = {"med": 0.5}
    assert _kernel(docs, "n_chars", probs, ["source", "lang"]) == _spark_ref(
        docs, "n_chars", probs, ["source", "lang"]
    )


def test_tiny_groups_and_nulls(spark):
    rows = [
        ("a", 1.0),
        ("a", None),
        ("b", 5.0),
        ("b", 7.0),
        ("c", None),  # all-null group: omitted (documented behavior)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = _kernel(df, "v", {"med": 0.5, "p75": 0.75}, ["g"], num_partitions=4)
    assert got == {("a",): (1.0, 1.0), ("b",): (6.0, 6.5)}


def test_single_partition_width_still_exact(spark, sf_smoke):
    """num_partitions=1 degenerates to a single sorted run — still the
    same interpolation; the width knob only changes placement."""
    events = read_table(spark, sf_smoke, "events").limit(500)
    probs = {"p33": 0.33}
    assert _kernel(events, "value", probs, ["event_type"], num_partitions=1) == (
        _spark_ref(events, "value", probs, ["event_type"])
    )


def test_selection_emits_bounded_rows(spark, sf_smoke):
    """The selection pass ships <= 2*|probs| rows per group to the
    driver regardless of data size — the scale contract."""
    events = read_table(spark, sf_smoke, "events")
    qs = exact_quantiles(events, "value", {"a": 0.25, "b": 0.75}, ["event_type"])
    n_groups = events.select("event_type").distinct().count()
    assert qs.count() == n_groups
    assert len(qs.columns) == 3
