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

__all__ = [
    "CommitConflict",
    "commit_version",
    "read_version",
    "history",
    "vacuum",
    "merge_version",
    "commit_changelog",
    "diff_versions",
]


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


def _file_stats(
    spark: SparkSession, data_dir: Path, stats_cols: list[str]
) -> dict:
    """Per-file min/max for the given columns (one aggregate job over
    the freshly written directory only). Values must be JSON-scalar
    (numeric/string) — the same restriction Iceberg places on its
    lower/upper bounds."""
    from pyspark.sql import functions as F

    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    rows = (
        spark.read.parquet(str(data_dir))
        .groupBy(F.input_file_name().alias("_f"))
        .agg(*aggs)
        .collect()
    )
    out = {}
    for r in rows:
        out[r["_f"]] = {
            c: [r[f"_min_{c}"], r[f"_max_{c}"]] for c in stats_cols
        }
    return out


class CommitConflict(RuntimeError):
    """Another writer committed since the expected version was read."""


def commit_version(
    df: DataFrame,
    root: str | Path,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    expected_version: int | None = None,
) -> int:
    """Commit ``df`` as the next table version and return its number.

    ``mode="overwrite"`` makes the new version's content exactly ``df``;
    ``mode="append"`` makes it the previous version's files PLUS the new
    data directory — append never rewrites old data, it only adds a
    manifest entry referencing the prior files (constant metadata cost,
    zero data movement — the property that makes incremental loads cheap
    at 100 TB).

    ``stats_cols`` records per-FILE min/max bounds for those columns in
    the manifest (numeric/string only) — the Iceberg-style metadata
    that lets :func:`read_version` skip whole files against a range
    predicate without opening them. Appends merge prior stats, so
    skipping works across the full file list.

    ``expected_version`` enables optimistic concurrency: pass the
    version you read before computing ``df`` and the commit refuses
    (``CommitConflict``) if another writer has advanced the table in
    the meantime — read-modify-write sequences like
    :func:`merge_version` stay lost-update-free without any lock. Use
    ``expected_version=None`` for blind appends, ``0`` to require an
    empty table.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be 'overwrite' or 'append'")
    root = Path(root)
    (root / "data").mkdir(parents=True, exist_ok=True)
    _manifest_dir(root).mkdir(parents=True, exist_ok=True)
    prev = latest_version(root)
    if expected_version is not None and (prev or 0) != expected_version:
        raise CommitConflict(
            f"expected version {expected_version}, table is at {prev}"
        )
    new_version = 1 if prev is None else prev + 1

    data_dir = root / "data" / f"{uuid.uuid4().hex}.parquet"
    df.write.mode("errorifexists").parquet(str(data_dir))
    spark = df.sparkSession
    n_rows = spark.read.parquet(str(data_dir)).count()
    stats = (
        _file_stats(spark, data_dir, stats_cols) if stats_cols else {}
    )

    files = [str(data_dir)]
    if mode == "append" and prev is not None:
        prev_manifest = _load_manifest(root, prev)
        files = prev_manifest["files"] + files
        n_rows += prev_manifest["n_rows"]
        stats = {**prev_manifest.get("stats", {}), **stats}

    manifest = {
        "version": new_version,
        "files": files,
        "n_rows": n_rows,
        "ts": time.time(),
        "mode": mode,
        "stats": stats,
        "schema": df.schema.jsonValue(),
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
    spark: SparkSession,
    root: str | Path,
    version: int | None = None,
    skip: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Read the table at ``version`` (default: latest). Time travel =
    passing an older retained version; reads resolve through the
    manifest's explicit file list, never a glob.

    ``skip=(col, lo, hi)`` prunes the file list against the manifest's
    per-file bounds BEFORE any file opens (file-level skipping above
    parquet's own row-group pruning): a file survives only if
    ``[min, max]`` overlaps ``[lo, hi]`` (None = unbounded; files
    without recorded stats are conservatively kept). The predicate
    itself is also applied, so results are exact either way.
    """
    from pyspark.sql import functions as F

    root = Path(root)
    if version is None:
        version = latest_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed version under {root}")
    manifest = _load_manifest(root, version)
    files = manifest["files"]
    if skip is not None:
        col, lo, hi = skip
        stats = manifest.get("stats", {})

        def survives(f: str) -> bool:
            # stats keys are per-PART-file URIs under the data dir;
            # strip the scheme before matching the manifest path
            bounds = [
                b[col]
                for p, b in stats.items()
                if p.removeprefix("file://").startswith(f) and col in b
            ]
            if not bounds:
                return True  # no stats recorded → cannot skip
            fmin = min(b[0] for b in bounds)
            fmax = max(b[1] for b in bounds)
            return (lo is None or fmax >= lo) and (hi is None or fmin <= hi)

        files = [f for f in files if survives(f)]
        if not files:
            return (
                spark.read.parquet(*manifest["files"]).filter(F.lit(False))
            )
        df = _read_files(spark, manifest, files)
        c = F.col(col)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
        return df
    return _read_files(spark, manifest, files)


def _read_files(spark: SparkSession, manifest: dict, files: list) -> DataFrame:
    """Read a manifest's files with schema-evolution support: appends
    may have widened the schema, so multi-file reads merge schemas and
    project to the manifest's recorded (latest) schema — rows from
    pre-evolution files surface the new columns as NULL."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    reader = spark.read.option("mergeSchema", "true")
    df = reader.parquet(*files)
    recorded = manifest.get("schema")
    if recorded:
        want = StructType.fromJson(recorded)
        cols = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in want.fields
        ]
        df = df.select(*cols)
    return df


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


def merge_version(
    df: DataFrame,
    root: str | Path,
    key_cols: list[str],
    order_col: str | None = None,
) -> int:
    """Keyed upsert as a new table version: latest snapshot + batch →
    keep-last per key (batch wins; ``order_col`` breaks within-batch
    ties, else arrival order) → commit. Deterministic keys make replay
    produce an identical version (the reference's idempotence story on
    top of time travel).

    Copy-on-write at TABLE granularity — every merge rewrites the
    snapshot, which is the honest trade at this implementation size;
    file-level COW (rewrite only touched files, as Delta/Iceberg do) is
    the production refinement and would slot in at the manifest layer.
    For append-heavy loads prefer ``commit_version(mode="append")``.
    """
    from incremental_github_data_pipeline_spark.operators import core as ops

    root = Path(root)
    if latest_version(root) is None:
        merged = (
            ops.dedupe_keep_last(df, key_cols, order_by=order_col)
            if order_col
            else ops.dedupe_keep_last(ops.with_input_seq(df), key_cols)
        )
        return commit_version(merged.select(*df.columns), root)
    spark = df.sparkSession
    base = read_version(spark, root)
    from pyspark.sql import functions as F

    combined = base.withColumn("_src", F.lit(0)).unionByName(
        df.withColumn("_src", F.lit(1))
    )
    order = [F.col("_src")] + ([F.col(order_col)] if order_col else [])
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[c.desc() for c in order])
    merged = (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*base.columns)
    )
    return commit_version(merged, root)


def commit_changelog(
    changes: DataFrame,
    root: str | Path,
    key_cols: list[str],
    order_col: str,
    op_col: str = "op",
) -> int:
    """Apply an insert/update/delete changelog to the latest version
    and commit the folded result as a new version — CDC into the
    versioned table, with every pre-image retained for time travel
    (the audit property a mutable warehouse table cannot give you).
    Reuses ``streaming.apply_changelog`` fold semantics; same
    table-granularity copy-on-write note as :func:`merge_version`."""
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        apply_changelog,
    )

    root = Path(root)
    spark = changes.sparkSession
    data_cols = [c for c in changes.columns if c not in (op_col, order_col)]
    if latest_version(root) is None:
        base = spark.createDataFrame(
            [], changes.select(*data_cols).schema
        )
    else:
        base = read_version(spark, root)
    folded = apply_changelog(base, changes, key_cols, order_col, op_col)
    return commit_version(folded.select(*data_cols), root)


def diff_versions(
    spark: SparkSession,
    root: str | Path,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level diff between two retained versions: one row per
    changed key with status ``added`` / ``removed`` / ``changed``
    (``unchanged`` keys are dropped — the diff is output-sensitive).
    Comparison hashes all non-key columns with a 128-bit xxhash pair,
    so wide rows diff without shuffling their payloads twice.

    The pipeline-regression primitive: "what did this run change?" is
    one full-outer join on the keys between two manifests — no stored
    changelog needed, because versions are immutable.
    """
    from pyspark.sql import functions as F

    old = read_version(spark, root, v_old)
    new = read_version(spark, root, v_new)
    non_keys = [c for c in old.columns if c not in key_cols]

    def keyed(df: DataFrame, side: str) -> DataFrame:
        fp = (
            F.struct(
                F.xxhash64(*[F.col(c) for c in non_keys], F.lit(1)),
                F.xxhash64(*[F.col(c) for c in non_keys], F.lit(2)),
            )
            if non_keys
            else F.lit(None)
        )
        return df.select(
            *key_cols, fp.alias(f"_fp_{side}"), F.lit(True).alias(f"_in_{side}")
        )

    j = keyed(old, "old").join(keyed(new, "new"), key_cols, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )
