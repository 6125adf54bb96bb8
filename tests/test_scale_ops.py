"""Skew-salting equivalence and bucketed-join plan tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_aggregate_matches_plain(spark, sf_smoke):
    from cyber_etl_spark.operators.skew import salted_aggregate
    from cyber_etl_spark.sources import read_table

    orders = read_table(spark, sf_smoke, "orders")
    plain = {
        (r.o_orderstatus,): (r["count"], round(r.sum_total, 2))
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("o_totalprice").alias("sum_total"))
        .collect()
    }
    salted = {
        (r.o_orderstatus,): (r["count"], round(r.sum_o_totalprice, 2))
        for r in salted_aggregate(
            orders, ["o_orderstatus"], ["o_totalprice"], salt_buckets=8
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_smoke):
    from cyber_etl_spark.operators.skew import salted_join
    from cyber_etl_spark.sources import read_table

    orders = read_table(spark, sf_smoke, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = read_table(spark, sf_smoke, "customer")
    plain = orders.join(customer, "c_custkey").count()
    salted = salted_join(orders, customer, "c_custkey", salt_buckets=8).count()
    assert plain == salted > 0


def test_bucketed_join_has_no_exchange(spark, sf_smoke, tmp_path):
    from cyber_etl_spark.sources import read_table
    from cyber_etl_spark.sources.bucketing import bucketed_join, write_bucketed

    orders = read_table(spark, sf_smoke, "orders")
    lineitem = read_table(spark, sf_smoke, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 4)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", 4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
