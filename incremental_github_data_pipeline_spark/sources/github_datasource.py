"""Spark 4 Python DataSource for the GitHub REST ingestion (S1-S3) —
``spark.read.format("github_rest")`` instead of driver-side loops.

This is the fully Spark-native ingestion tier: each repo (for per-repo
endpoints) or page (for the repos listing) becomes an ``InputPartition``,
so executors fetch concurrently and the result is an ordinary DataFrame
landing straight into the raw zone. Pagination semantics match the
reference (``per_page``/``max_pages`` caps, stop on empty page —
/root/reference/extract.py:19-21,62-63) via sources.rest.paginate.

Options:
- ``endpoint``   "repos" | "issues" | "branches"   (required)
- ``owner``      org/user name                      (required)
- ``repos``      comma-separated repo names         (required for per-repo endpoints)
- ``per_page`` / ``max_pages``                      (reference defaults)
- ``fetch_fn``   "module.path:callable" returning a FetchFn — injectable
                 transport for tests/offline use; executors import it by
                 name (plain callables can't ride through string options).
                 Default: live HTTP with $GITHUB_TOKEN.

Rows are ``(repo_name, value)`` with ``value`` = one JSON object per
record — the raw-zone contract (S4): schema-on-read happens downstream
through the explicit raw schemas (pipelines.github), exactly as with
file-landed JSON.
"""

from __future__ import annotations

import importlib
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from incremental_github_data_pipeline_spark.sources.rest import (
    DEFAULT_MAX_PAGES,
    DEFAULT_PER_PAGE,
    GITHUB_API,
    _default_fetch,
    paginate,
)

SCHEMA = "repo_name string, value string"


def _resolve_fetch(options: dict):
    spec = options.get("fetch_fn")
    if not spec:
        return _default_fetch(os.environ.get("GITHUB_TOKEN"))
    mod_name, _, attr = spec.partition(":")
    factory = getattr(importlib.import_module(mod_name), attr)
    return factory()


class GithubRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.endpoint = options["endpoint"]
        self.owner = options["owner"]
        self.per_page = int(options.get("per_page", DEFAULT_PER_PAGE))
        self.max_pages = int(options.get("max_pages", DEFAULT_MAX_PAGES))

    def partitions(self):
        if self.endpoint == "repos":
            # page-per-partition; empty pages simply yield no rows (the
            # sequential stop condition degrades to per-page emptiness)
            return [InputPartition(("page", p)) for p in range(1, self.max_pages + 1)]
        repos = [r for r in self.options.get("repos", "").split(",") if r]
        if not repos:
            raise ValueError(f"endpoint {self.endpoint!r} requires options.repos")
        return [InputPartition(("repo", r)) for r in repos]

    def read(self, partition):
        fetch = _resolve_fetch(self.options)
        kind, val = partition.value
        if kind == "page":
            url = f"{GITHUB_API}/users/{self.owner}/repos"
            batch = fetch(url, {"per_page": self.per_page, "page": val})
            for rec in batch or []:
                yield (None, json.dumps(rec))
        else:
            url = f"{GITHUB_API}/repos/{self.owner}/{val}/{self.endpoint}"
            for rec in paginate(fetch, url, self.per_page, self.max_pages):
                rec["repo_name"] = val  # source-side lineage (extract.py:108-110)
                yield (val, json.dumps(rec))


class GithubRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming tier of the github_rest source: the offset is the next
    repos page to fetch, each micro-batch advances it by up to
    ``pages_per_batch`` pages, and a short or empty page ends the
    listing for that poll (the reference's stop condition,
    extract.py:62-63, as an offset that simply stops advancing until
    new data appears). ``readBetweenOffsets`` re-fetches the same page
    range deterministically, which is what makes micro-batch retries
    exactly-once. The Simple reader API runs driver-side (right for a
    rate-limited REST poll); backfills at scale use the
    partition-parallel batch reader above.

    Per-repo endpoints (issues/branches) stay on the batch reader: their
    fan-out axis is the repo list, not a monotone page cursor.
    """

    def __init__(self, options: dict):
        self.options = options
        self.owner = options["owner"]
        self.per_page = int(options.get("per_page", DEFAULT_PER_PAGE))
        self.pages_per_batch = int(options.get("pages_per_batch", 1))

    def initialOffset(self) -> dict:
        return {"page": 1}

    def _fetch_pages(self, start_page: int, max_pages: int):
        fetch = _resolve_fetch(self.options)
        rows, page = [], start_page
        while page < start_page + max_pages:
            batch = fetch(
                f"{GITHUB_API}/users/{self.owner}/repos",
                {"per_page": self.per_page, "page": page},
            )
            if not batch:
                break
            rows.extend((None, json.dumps(rec)) for rec in batch)
            page += 1
            if len(batch) < self.per_page:
                break  # short page: end of the current listing
        return rows, page

    def read(self, start: dict):
        rows, next_page = self._fetch_pages(
            int(start["page"]), self.pages_per_batch
        )
        return iter(rows), {"page": next_page}

    def readBetweenOffsets(self, start: dict, end: dict):
        n = int(end["page"]) - int(start["page"])
        if n <= 0:
            return iter([])
        rows, _ = self._fetch_pages(int(start["page"]), n)
        return iter(rows)


class GithubRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "github_rest"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> GithubRestReader:
        return GithubRestReader(self.options)

    def simpleStreamReader(self, schema) -> GithubRestStreamReader:
        return GithubRestStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GithubRestDataSource)
