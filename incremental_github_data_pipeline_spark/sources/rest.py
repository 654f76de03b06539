"""GitHub REST ingestion (S1-S3, S9 — /root/reference/extract.py, auth.py).

Ingestion is inherently driver/edge-side work: the reference fetches
pages sequentially per repo (extract.py:48-63) — at 300 repos × 3 pages
that's ~900 sequential HTTP round-trips. Here the per-repo fan-out
(embarrassingly parallel, SURVEY.md §3.1) is distributed: repo names are
parallelized across executors and each partition fetches its repos'
pages, returning JSON strings that land in the raw zone. Everything
downstream is ordinary DataFrame code.

Network access is gated: no live calls in tests (the container has no
network and no token); ``fetch_fn`` is injectable so tests exercise the
pagination/fan-out/stop logic against a fake.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# One page of results: (url, params) -> list of JSON-able dicts.
FetchFn = Callable[[str, dict], list]

GITHUB_API = "https://api.github.com"
DEFAULT_PER_PAGE = 100
DEFAULT_MAX_PAGES = 3  # extract.py:19-20 resource guard


def _default_fetch(token: str | None) -> FetchFn:
    def fetch(url: str, params: dict) -> list:
        import urllib.parse
        import urllib.request

        q = urllib.parse.urlencode(params)
        req = urllib.request.Request(f"{url}?{q}")
        req.add_header("Accept", "application/vnd.github+json")
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        with urllib.request.urlopen(req, timeout=30) as resp:
            if resp.status < 200 or resp.status >= 300:
                raise RuntimeError(f"GitHub API {resp.status} for {url}")
            return json.loads(resp.read().decode("utf-8"))

    return fetch


def auth_preflight(token: str | None, fetch_fn: FetchFn | None = None) -> dict:
    """S9 (auth.py:24-39): missing token / non-2xx → raise."""
    if not token and fetch_fn is None:
        raise ValueError("GITHUB_TOKEN is not set")
    fetch = fetch_fn or _default_fetch(token)
    user = fetch(f"{GITHUB_API}/user", {})
    if isinstance(user, list):  # fake fetchers return lists
        user = user[0] if user else {}
    return user


def paginate(
    fetch: FetchFn,
    url: str,
    per_page: int = DEFAULT_PER_PAGE,
    max_pages: int = DEFAULT_MAX_PAGES,
) -> list:
    """S1 pagination: pages 1..max_pages, stop on empty page (P5,
    extract.py:62-63)."""
    out: list = []
    for page in range(1, max_pages + 1):
        batch = fetch(url, {"per_page": per_page, "page": page})
        if not batch:
            break
        out.extend(batch)
    return out


def fetch_repos(
    fetch: FetchFn,
    owner: str,
    per_page: int = DEFAULT_PER_PAGE,
    max_pages: int = DEFAULT_MAX_PAGES,
) -> tuple[list, list[str]]:
    """S1 + P4: all repos (unfiltered — extract.py:81 writes everything),
    plus the fan-out list filtered to public ∧ ¬archived ∧ ¬fork
    (extract.py:67-69). The asymmetry is reference behavior, preserved
    deliberately (SURVEY.md §4.4 item 4).
    """
    repos = paginate(fetch, f"{GITHUB_API}/users/{owner}/repos", per_page, max_pages)
    fan_out = [
        r["name"]
        for r in repos
        if r.get("visibility") != "private"
        and not r.get("archived")
        and not r.get("fork")
    ]
    return repos, fan_out


def fetch_per_repo(
    spark: SparkSession,
    fetch: FetchFn,
    owner: str,
    repo_names: list[str],
    endpoint: str,
    per_page: int = DEFAULT_PER_PAGE,
    max_pages: int = DEFAULT_MAX_PAGES,
) -> list:
    """S2/S3 distributed fan-out: issues or branches for every repo, each
    record tagged with ``repo_name`` (source-side lineage,
    extract.py:108-110, :148-150).

    The reference loops repos sequentially on one thread; here each
    executor partition handles a slice of repos concurrently. Results
    return as plain dicts (small at per-repo page caps); the final
    ``collect`` accumulates every record on the driver, which is fine
    at the reference's 300-page cap but NOT the scale tier. For large
    fan-outs use ``sources.github_datasource`` instead (the Python
    DataSource with page-per-partition planning): records stay on
    executors as a DataFrame and land straight to storage without ever
    transiting the driver.
    """
    if not repo_names:
        return []
    sc = spark.sparkContext
    n_slices = min(len(repo_names), sc.defaultParallelism)

    def fetch_one(repo: str) -> list:
        records = paginate(
            fetch, f"{GITHUB_API}/repos/{owner}/{repo}/{endpoint}", per_page, max_pages
        )
        for r in records:
            r["repo_name"] = repo
        return records

    return (
        sc.parallelize(repo_names, n_slices)
        .flatMap(fetch_one)
        .collect()
    )


def land_raw(spark: SparkSession, records: list, path: str) -> DataFrame:
    """S4: land fetched records as a raw JSON snapshot readable by the
    transform layer. Records are written as JSON-lines (splittable)."""
    df = spark.createDataFrame(
        spark.sparkContext.parallelize([json.dumps(r) for r in records]), "string"
    ).toDF("value")
    df.write.mode("overwrite").text(path)
    return df
