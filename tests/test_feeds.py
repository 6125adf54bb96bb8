"""S1/S4 feed connectors: full fetch→parse→DataFrame path over file://
fixtures (urllib treats file:// and https:// uniformly, so the exact
production code path runs with zero network)."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

RSS_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0"><channel>
  <title>Alerts</title>
  <item>
    <title>AA22-011A: Russian State-Sponsored Cyber Threats</title>
    <link>https://www.cisa.gov/uscert/ncas/alerts/aa22-011a</link>
    <description>Overview of threats to US critical infrastructure.</description>
    <pubDate>Tue, 11 Jan 2022 12:00:00 +0000</pubDate>
    <guid>aa22-011a</guid>
  </item>
  <item>
    <title>AA22-040A: Ransomware Trends</title>
    <link>https://www.cisa.gov/uscert/ncas/alerts/aa22-040a</link>
    <description>2021 trends show increased globalized threat.</description>
    <pubDate>Wed, 09 Feb 2022 12:00:00 +0000</pubDate>
    <guid>aa22-040a</guid>
  </item>
</channel></rss>
"""


@pytest.fixture()
def feeds_registered(spark):
    from cyber_etl_spark.sources.feeds import register_feeds

    register_feeds(spark)
    return spark


def test_rss_source_parses_items(feeds_registered, tmp_path):
    spark = feeds_registered
    p = tmp_path / "alerts.xml"
    p.write_text(RSS_DOC)
    df = spark.read.format("rss").option("urls", p.as_uri()).load()
    rows = sorted(df.collect(), key=lambda r: r.guid)
    assert [r.guid for r in rows] == ["aa22-011a", "aa22-040a"]
    assert rows[0].title.startswith("AA22-011A")
    assert rows[0].link.endswith("aa22-011a")
    assert rows[0].feed_url == p.as_uri()


def test_http_json_source_gzip_and_plain(feeds_registered, tmp_path):
    spark = feeds_registered
    feed = {
        "CVE_data_type": "CVE",
        "CVE_Items": [
            {"cve": {"CVE_data_meta": {"ID": "CVE-2021-0001"}}, "impact": {}},
            {"cve": {"CVE_data_meta": {"ID": "CVE-2021-0002"}}, "impact": {}},
        ],
    }
    plain = tmp_path / "nvd_a.json"
    plain.write_text(json.dumps(feed))
    gz = tmp_path / "nvd_b.json.gz"
    gz.write_bytes(gzip.compress(json.dumps(feed).encode()))

    df = (
        spark.read.format("http_json")
        .option("urls", f"{plain.as_uri()},{gz.as_uri()}")
        .load()
    )
    # 2 URLs x 2 items; gzip transparently decompressed
    assert df.count() == 4
    ids = (
        df.select(
            F.get_json_object("item_json", "$.cve.CVE_data_meta.ID").alias("id")
        )
        .distinct()
        .collect()
    )
    assert sorted(r.id for r in ids) == ["CVE-2021-0001", "CVE-2021-0002"]


def test_http_json_partitions_per_url(feeds_registered, tmp_path):
    spark = feeds_registered
    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.json"
        p.write_text(json.dumps({"CVE_Items": [{"n": i}]}))
        paths.append(p.as_uri())
    df = spark.read.format("http_json").option("urls", ",".join(paths)).load()
    assert df.rdd.getNumPartitions() == 3  # one InputPartition per URL


def test_http_json_stream_tails_feed_incrementally(feeds_registered, tmp_path):
    """Streaming twin of S1: offset-tracked feed polling emits only NEW
    items per micro-batch; a second run on the same checkpoint picks up
    exactly the appended suffix."""
    import json

    spark = feeds_registered
    feed = tmp_path / "feed.json"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_feed(n):
        feed.write_text(
            json.dumps({"CVE_Items": [{"cve_id": f"CVE-{i}"} for i in range(n)]})
        )

    def drain():
        q = (
            spark.readStream.format("http_json")
            .option("urls", feed.as_uri())
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_feed(3)
    drain()
    ids = {
        json.loads(r.item_json)["cve_id"] for r in spark.read.parquet(out).collect()
    }
    assert ids == {"CVE-0", "CVE-1", "CVE-2"}

    write_feed(5)  # feed grows by two items
    drain()
    rows = spark.read.parquet(out).collect()
    ids = sorted(json.loads(r.item_json)["cve_id"] for r in rows)
    # no duplicates of the first three, exactly the two new items added
    assert ids == [f"CVE-{i}" for i in range(5)]


def test_http_json_stream_tolerates_feed_shrink(feeds_registered, tmp_path):
    """A feed that shrinks below the stored offset emits nothing (no
    replay of already-emitted items) until it grows past it again."""
    import json

    spark = feeds_registered
    feed = tmp_path / "shrink.json"
    ckpt = str(tmp_path / "ckpt_s")
    out = str(tmp_path / "out_s")

    def write_feed(n):
        feed.write_text(
            json.dumps({"CVE_Items": [{"cve_id": f"CVE-{i}"} for i in range(n)]})
        )

    def drain():
        q = (
            spark.readStream.format("http_json")
            .option("urls", feed.as_uri())
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_feed(4)
    drain()
    write_feed(2)  # shrink below offset
    drain()
    assert spark.read.parquet(out).count() == 4  # nothing replayed
