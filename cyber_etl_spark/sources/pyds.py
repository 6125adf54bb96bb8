"""Custom Python DataSource: paginated-API connector (Spark 4 DataSource API).

The reference ingests GitHub REST pages with hand-rolled pagination,
rate-limit backoff and file rotation (gitlinks/gitapi.py:25-186, SURVEY.md
S5).  In Spark the idiomatic shape is a *custom data source*: each API
page is an ``InputPartition``, so pages are fetched in parallel by
executors, restarts re-read only failed pages, and the result is an
ordinary DataFrame that joins/aggregates like any table.

This implementation generates a deterministic md5-derived payload instead
of real HTTP (the container has no network, and tests need bit-stable
rows) — the partition/reader plumbing is exactly what a live connector
would use; swap ``_page_rows`` for a requests.get + token-bucket to go
live.  Scale notes: one partition per page keeps memory bounded at any
page count; a 1000-executor cluster fans out 1000 pages at a time.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api").option("pages", N)`` connector."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "page INT, item_id BIGINT, login STRING, contributions BIGINT"

    def reader(self, schema) -> "PagedApiReader":
        return PagedApiReader(self.options)


def _page_rows(page: int, page_size: int):
    """Deterministic stand-in for one GET /contributors?page=N response."""
    for i in range(page_size):
        item = page * page_size + i
        h = hashlib.md5(str(item).encode()).hexdigest()
        yield (page, item, "user_" + h[:8], int(h[8:12], 16))


class PagedApiReader(DataSourceReader):
    def __init__(self, options):
        self.pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 100))

    def partitions(self):
        # one InputPartition per API page → pages fetch in parallel and
        # retry independently
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition: InputPartition):
        yield from _page_rows(partition.value, self.page_size)


def register(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(PagedApiDataSource)
