"""Deterministic offline transport for the github_rest DataSource —
importable BY NAME on executors (``fetch_fn`` option), since Python
callables can't ride through string options. Serves a synthetic org:
3 pages of repos (last one short), 2 branches per repo, 1 issue per
repo. No network anywhere."""

from __future__ import annotations

N_FULL_PAGE = 4  # repos per full page (small, so tests stay readable)


def make_fetch():
    def fetch(url: str, params: dict) -> list:
        page = params.get("page", 1)
        if url.endswith("/repos"):
            if page > 3:
                return []
            n = N_FULL_PAGE if page < 3 else 2  # short final page
            base = (page - 1) * N_FULL_PAGE
            return [
                {
                    "id": base + i,
                    "name": f"repo{base + i}",
                    "full_name": f"org/repo{base + i}",
                    "visibility": "public",
                    "archived": False,
                    "fork": False,
                    "owner": {"id": 1, "login": "org"},
                }
                for i in range(n)
            ]
        repo = url.rsplit("/", 2)[-2]
        if url.endswith("/branches"):
            if page > 1:
                return []
            return [
                {"name": "main", "protected": True, "commit": {"sha": "aa", "url": "u"}},
                {"name": "dev", "protected": False, "commit": {"sha": "bb", "url": "u"}},
            ]
        if url.endswith("/issues"):
            if page > 1:
                return []
            return [{"id": hash(repo) % 10**6, "number": 1, "title": f"issue of {repo}"}]
        return []

    return fetch
