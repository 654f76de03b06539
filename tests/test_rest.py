"""sources.rest — S1-S3/S9 ingestion logic against an injected fake
fetcher (no network in this environment; the transport is the only
thing not exercised)."""

from __future__ import annotations

import pytest

from incremental_github_data_pipeline_spark.sources.rest import (
    auth_preflight,
    fetch_per_repo,
    fetch_repos,
    paginate,
)


def make_fake(pages_by_url):
    calls = []

    def fetch(url, params):
        calls.append((url, dict(params)))
        pages = pages_by_url.get(url, [])
        page = params.get("page", 1)
        return pages[page - 1] if page <= len(pages) else []

    fetch.calls = calls
    return fetch


def test_paginate_stops_on_empty_page():
    fake = make_fake({"u": [[1, 2], [3], []]})
    assert paginate(fake, "u", per_page=2, max_pages=5) == [1, 2, 3]
    # stopped at the empty page 3, never asked for page 4 (P5)
    assert [p["page"] for _, p in fake.calls] == [1, 2, 3]


def test_paginate_respects_max_pages():
    fake = make_fake({"u": [[1], [2], [3], [4]]})
    assert paginate(fake, "u", max_pages=3) == [1, 2, 3]


def test_fetch_repos_filtered_fanout_unfiltered_payload():
    """extract.py:67-69 vs :81 — ALL repos land, only public ∧ ¬archived
    ∧ ¬fork fan out (reference behavior, preserved deliberately)."""
    repos = [
        {"name": "a", "visibility": "public", "archived": False, "fork": False},
        {"name": "b", "visibility": "private", "archived": False, "fork": False},
        {"name": "c", "visibility": "public", "archived": True, "fork": False},
        {"name": "d", "visibility": "public", "archived": False, "fork": True},
    ]
    fake = make_fake({"https://api.github.com/users/o/repos": [repos]})
    all_repos, fan_out = fetch_repos(fake, "o")
    assert len(all_repos) == 4
    assert fan_out == ["a"]


def test_fetch_per_repo_tags_lineage(spark):
    url = "https://api.github.com/repos/o/{}/branches"
    fake = make_fake(
        {url.format("r1"): [[{"name": "main"}]], url.format("r2"): [[{"name": "dev"}]]}
    )
    got = fetch_per_repo(spark, fake, "o", ["r1", "r2"], "branches")
    assert sorted((r["repo_name"], r["name"]) for r in got) == [
        ("r1", "main"),
        ("r2", "dev"),
    ]


def test_auth_preflight_requires_token():
    with pytest.raises(ValueError, match="GITHUB_TOKEN"):
        auth_preflight(None)


def test_land_raw_round_trips_records(spark, tmp_path):
    import json

    from incremental_github_data_pipeline_spark.sources.rest import land_raw

    recs = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    path = str(tmp_path / "raw_land")
    land_raw(spark, recs, path)
    back = [
        json.loads(r["value"])
        for r in spark.read.text(path).collect()
    ]
    assert sorted(back, key=lambda d: d["id"]) == recs
