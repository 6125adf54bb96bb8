"""Sink roundtrips and the threshold-sweep utility."""

from __future__ import annotations


def test_threshold_sweep_monotone(spark, sf_smoke):
    from cyber_etl_spark.operators.dedup import threshold_sweep
    from cyber_etl_spark.sources import read_table

    docs = read_table(spark, sf_smoke, "documents")
    sweep = threshold_sweep(docs, [0.2, 0.5, 0.9])
    counts = [c for _, c in sweep]
    assert counts == sorted(counts, reverse=True)  # higher t → fewer docs
    assert counts[0] > 0


def test_sink_roundtrips(spark, sf_smoke, tmp_path):
    from cyber_etl_spark.sources import read_table
    from cyber_etl_spark.sources.sinks import read_csv, write_csv, write_parquet

    nation = read_table(spark, sf_smoke, "nation")
    write_parquet(nation, str(tmp_path / "nation_pq"))
    back = spark.read.parquet(str(tmp_path / "nation_pq"))
    assert back.count() == nation.count()
    assert back.schema == nation.schema

    write_csv(nation, str(tmp_path / "nation_csv"), single_file=True)
    back_csv = read_csv(spark, str(tmp_path / "nation_csv"))
    assert back_csv.count() == nation.count()
    assert [f.name for f in back_csv.schema.fields] == [
        f.name for f in nation.schema.fields
    ]
