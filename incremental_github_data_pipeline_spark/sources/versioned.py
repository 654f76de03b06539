"""Manifest-based versioned tables: multi-version snapshots with time
travel, atomic commits, and vacuum — the Delta-style upgrade of the
reference's one-generation rotation (`extract.py:23-34` keeps exactly
one backup; SURVEY.md §1.1 maps rotation to "table versions").

Layout under a table root::

    data/<uuid>.parquet/      one immutable parquet directory per commit
    _manifests/00000001.json  {"version", "files", "n_rows", "ts", "mode"}
    _latest                   text file holding the committed version number

A commit writes its data directory first, then its manifest, then
atomically renames a temp ``_latest`` pointer over the old one — readers
referencing any already-committed version are never disturbed, and a
crash mid-commit leaves the previous version intact (the half-written
data dir is orphaned and swept by :func:`vacuum`). This is the
single-writer design (like the reference's rename dance); multi-writer
coordination would need a log store, out of scope.

Every read goes through the manifest's explicit file list — never a
directory glob — so concurrent vacuum of OLD versions cannot break a
pinned-time-travel reader of a retained version.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = ["commit_version", "read_version", "history", "vacuum"]


def _manifest_dir(root: Path) -> Path:
    return root / "_manifests"


def _latest_path(root: Path) -> Path:
    return root / "_latest"


def latest_version(root: str | Path) -> int | None:
    p = _latest_path(Path(root))
    if not p.exists():
        return None
    return int(p.read_text().strip())


def _load_manifest(root: Path, version: int) -> dict:
    mp = _manifest_dir(root) / f"{version:08d}.json"
    if not mp.exists():
        raise FileNotFoundError(
            f"version {version} not found (vacuumed or never committed)"
        )
    return json.loads(mp.read_text())


def commit_version(
    df: DataFrame, root: str | Path, mode: str = "overwrite"
) -> int:
    """Commit ``df`` as the next table version and return its number.

    ``mode="overwrite"`` makes the new version's content exactly ``df``;
    ``mode="append"`` makes it the previous version's files PLUS the new
    data directory — append never rewrites old data, it only adds a
    manifest entry referencing the prior files (constant metadata cost,
    zero data movement — the property that makes incremental loads cheap
    at 100 TB).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be 'overwrite' or 'append'")
    root = Path(root)
    (root / "data").mkdir(parents=True, exist_ok=True)
    _manifest_dir(root).mkdir(parents=True, exist_ok=True)
    prev = latest_version(root)
    new_version = 1 if prev is None else prev + 1

    data_dir = root / "data" / f"{uuid.uuid4().hex}.parquet"
    df.write.mode("errorifexists").parquet(str(data_dir))
    n_rows = df.sparkSession.read.parquet(str(data_dir)).count()

    files = [str(data_dir)]
    if mode == "append" and prev is not None:
        prev_manifest = _load_manifest(root, prev)
        files = prev_manifest["files"] + files
        n_rows += prev_manifest["n_rows"]

    manifest = {
        "version": new_version,
        "files": files,
        "n_rows": n_rows,
        "ts": time.time(),
        "mode": mode,
    }
    mp = _manifest_dir(root) / f"{new_version:08d}.json"
    tmp = mp.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, mp)  # manifest visible atomically

    ltmp = _latest_path(root).with_suffix(".tmp")
    ltmp.write_text(str(new_version))
    os.replace(ltmp, _latest_path(root))  # commit point
    return new_version


def read_version(
    spark: SparkSession, root: str | Path, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: latest). Time travel =
    passing an older retained version; reads resolve through the
    manifest's explicit file list, never a glob."""
    root = Path(root)
    if version is None:
        version = latest_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed version under {root}")
    manifest = _load_manifest(root, version)
    return spark.read.parquet(*manifest["files"])


def history(root: str | Path) -> list[dict]:
    """All retained manifests, oldest first."""
    root = Path(root)
    out = []
    if _manifest_dir(root).exists():
        for mp in sorted(_manifest_dir(root).glob("[0-9]*.json")):
            out.append(json.loads(mp.read_text()))
    return out


def vacuum(root: str | Path, keep: int = 2) -> dict:
    """Drop all but the newest ``keep`` versions: delete their
    manifests, then delete data directories no retained manifest
    references (orphans from crashed commits are swept too). Returns
    ``{"dropped_versions": [...], "deleted_dirs": n}``."""
    import shutil

    if keep < 1:
        raise ValueError("keep must be >= 1")
    root = Path(root)
    manifests = history(root)
    drop = manifests[:-keep] if len(manifests) > keep else []
    for m in drop:
        (_manifest_dir(root) / f"{m['version']:08d}.json").unlink()
    retained_files = {
        f for m in history(root) for f in m["files"]
    }
    deleted = 0
    for d in (root / "data").iterdir() if (root / "data").exists() else []:
        if str(d) not in retained_files:
            shutil.rmtree(d)
            deleted += 1
    return {
        "dropped_versions": [m["version"] for m in drop],
        "deleted_dirs": deleted,
    }
