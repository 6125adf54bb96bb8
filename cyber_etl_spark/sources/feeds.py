"""Custom Python DataSources for feed ingest — SURVEY.md S1 (HTTP JSON
ingest, get_nvd_data.py:16-63) and S4 (RSS alert feed, exploratory cell
in alerts/parse_alert.ipynb).

The reference pulls NVD gzip-JSON feeds and the CISA RSS alert feed on
the driver with requests/feedparser.  The Spark-idiomatic shape is a
custom DataSource: every feed URL (or file) is an ``InputPartition``, so
fetches fan out across executors, failed fetches retry per-partition,
and the result is an ordinary DataFrame.

Both connectors are transport-real: URLs resolve through
``urllib.request`` which handles ``file://`` URIs identically to
``https://`` — tests exercise the full fetch→parse→rows path against
local fixtures with zero network, and the same code fetches live feeds
on a connected cluster.  Parsing is stdlib-only (gzip/json/xml.etree):
no feedparser/requests dependency.

Scale notes: one partition per feed bounds executor memory at one
document; a thousand feeds fan out a thousand tasks.  Per-URL isolation
means a single dead mirror fails one task, not the job.
"""

from __future__ import annotations

import gzip
import io
import json
import urllib.request
import xml.etree.ElementTree as ET

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


_DEFAULT_TIMEOUT_SEC = 30.0
_DEFAULT_MAX_BYTES = 256 * 1024 * 1024


def _fetch(
    url: str,
    timeout: float = _DEFAULT_TIMEOUT_SEC,
    max_bytes: int = _DEFAULT_MAX_BYTES,
) -> bytes:
    """Bounded fetch: Spark has no default running-task timeout, so a hung
    endpoint would otherwise pin its executor task forever — the timeout
    (and a size cap against pathological bodies) keeps the per-URL fault
    isolation the module docstring promises."""
    with urllib.request.urlopen(  # noqa: S310 - file:// in tests
        url, timeout=timeout
    ) as resp:
        data = resp.read(max_bytes + 1)
    if len(data) > max_bytes:
        raise ValueError(f"feed body exceeds max_bytes={max_bytes}: {url}")
    if data[:2] == b"\x1f\x8b":  # gzip magic — NVD feeds ship gzipped
        # bounded DEcompression too: the cap on the compressed body alone
        # would let a small gzip bomb defeat the guard (ADVICE r03)
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read(max_bytes + 1)
        if len(data) > max_bytes:
            raise ValueError(
                f"feed body decompresses past max_bytes={max_bytes}: {url}"
            )
    return data


def _fetch_opts(options) -> tuple[float, int]:
    # clamp both options to positive values: timeout=0 would mean a
    # NON-blocking socket (instant errors), max_bytes=0 would reject
    # every body; non-numeric values fall back to the defaults instead
    # of killing DataSource init
    try:
        timeout = float(options.get("timeout") or _DEFAULT_TIMEOUT_SEC)
    except (TypeError, ValueError):
        timeout = _DEFAULT_TIMEOUT_SEC
    if timeout <= 0:
        timeout = _DEFAULT_TIMEOUT_SEC
    try:
        max_bytes = int(options.get("max_bytes") or _DEFAULT_MAX_BYTES)
    except (TypeError, ValueError):
        max_bytes = _DEFAULT_MAX_BYTES
    if max_bytes <= 0:
        max_bytes = _DEFAULT_MAX_BYTES
    return (timeout, max_bytes)


class HttpJsonDataSource(DataSource):
    """``spark.read.format("http_json").option("urls", "u1,u2")``.

    Each URL must resolve to a JSON document; ``item_path`` (default
    ``CVE_Items``) names the top-level array to explode into rows of
    (url, item_json).  Downstream parsing stays declarative:
    ``from_json``/``variant`` over the raw item string (S2 machinery).
    """

    @classmethod
    def name(cls) -> str:
        return "http_json"

    def schema(self) -> str:
        return "url STRING, item_json STRING"

    def reader(self, schema) -> "HttpJsonReader":
        return HttpJsonReader(self.options)

    def simpleStreamReader(self, schema) -> "HttpJsonStreamReader":
        return HttpJsonStreamReader(self.options)


class HttpJsonStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("http_json")`` — incremental feed tail.

    The reference re-downloads whole NVD feeds and diffs on the driver;
    the streaming shape is an offset-tracked poll: the offset stores how
    many items of each feed have already been emitted, every micro-batch
    re-fetches and emits ONLY the suffix, and checkpoint replay re-reads
    the exact same slice (``readBetweenOffsets``) — exactly-once on top
    of a plain HTTP endpoint, no custom bookkeeping table.

    Feeds are assumed append-only (the NVD ``modified`` feed shape): a
    feed that SHRINKS below a stored offset yields nothing until it
    grows past it again, rather than replaying items already emitted.
    Low-volume control-plane ingest by design (items flow through the
    driver in this API): the firehose path stays the batch DataSource +
    foreachBatch pipelines.
    """

    def __init__(self, options):
        self.urls = [u for u in (options.get("urls") or "").split(",") if u]
        self.item_path = options.get("item_path", "CVE_Items")
        self.timeout, self.max_bytes = _fetch_opts(options)

    def initialOffset(self) -> dict:
        return {u: 0 for u in self.urls}

    def _items(self, url: str) -> list:
        doc = json.loads(_fetch(url, self.timeout, self.max_bytes))
        return doc.get(self.item_path, []) if isinstance(doc, dict) else doc

    def read(self, start: dict):
        rows, end = [], {}
        for u in self.urls:
            items = self._items(u)
            pos = int(start.get(u, 0))
            rows.extend((u, json.dumps(it, sort_keys=True)) for it in items[pos:])
            end[u] = max(pos, len(items))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for u in self.urls:
            items = self._items(u)
            rows.extend(
                (u, json.dumps(it, sort_keys=True))
                for it in items[int(start.get(u, 0)) : int(end.get(u, 0))]
            )
        return iter(rows)


class HttpJsonReader(DataSourceReader):
    def __init__(self, options):
        self.urls = [u for u in (options.get("urls") or "").split(",") if u]
        self.item_path = options.get("item_path", "CVE_Items")
        self.timeout, self.max_bytes = _fetch_opts(options)

    def partitions(self):
        return [InputPartition(u) for u in self.urls]

    def read(self, partition: InputPartition):
        url = partition.value
        doc = json.loads(_fetch(url, self.timeout, self.max_bytes))
        items = doc.get(self.item_path, []) if isinstance(doc, dict) else doc
        for item in items:
            yield (url, json.dumps(item, sort_keys=True))


def _text(el, tag: str) -> str | None:
    child = el.find(tag)
    return child.text if child is not None else None


class RssDataSource(DataSource):
    """``spark.read.format("rss").option("urls", "u1,u2")`` — one row per
    ``<item>`` with the fields the reference's exploratory feed pull
    used (title/link/description/pubDate/guid)."""

    @classmethod
    def name(cls) -> str:
        return "rss"

    def schema(self) -> str:
        return (
            "feed_url STRING, title STRING, link STRING, "
            "description STRING, pub_date STRING, guid STRING"
        )

    def reader(self, schema) -> "RssReader":
        return RssReader(self.options)


class RssReader(DataSourceReader):
    def __init__(self, options):
        self.urls = [u for u in (options.get("urls") or "").split(",") if u]
        self.timeout, self.max_bytes = _fetch_opts(options)

    def partitions(self):
        return [InputPartition(u) for u in self.urls]

    def read(self, partition: InputPartition):
        url = partition.value
        root = ET.fromstring(
            _fetch(url, self.timeout, self.max_bytes).decode(
                "utf-8", errors="replace"
            )
        )
        # RSS 2.0: rss/channel/item; be lenient about a missing channel level
        for item in root.iter("item"):
            yield (
                url,
                _text(item, "title"),
                _text(item, "link"),
                _text(item, "description"),
                _text(item, "pubDate"),
                _text(item, "guid"),
            )


def register_feeds(spark) -> None:
    """Idempotently register both feed connectors on a session."""
    spark.dataSource.register(HttpJsonDataSource)
    spark.dataSource.register(RssDataSource)
