"""Schema'd readers with the reference's structural validation semantics.

S5 (/root/reference/transform.py:57-79): exists / non-empty / parses /
top-level is a list → FileNotFoundError / ValueError / TypeError. We keep
those exact exception types as the pre-flight contract, then hand the scan
to Spark with an *explicit schema* — never inference in production paths
(SURVEY.md §1.4): explicit schemas are what let parquet/JSON scans prune
columns and push filters at 100 TB.

S6 (pd.json_normalize) needs no operator at all: nested structs are read
natively and flattened by struct-field selection in the projection.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def validate_json_array_file(path: str | Path, audit=None) -> None:
    """S5 structural validation, same exception contract as the reference.

    Cheap driver-side pre-flight: existence/size checks are O(1); the
    "parses as a JSON array" check reads only the first non-whitespace
    byte rather than json.load-ing the (potentially huge) file — full
    parse errors surface as `_corrupt_record`s in the Spark scan.

    ``audit`` (an :class:`~..sources.writers.AuditLog`) receives the
    reference's exact line texts before the exception is raised
    (_validate_raw_file, transform.py:61,65,76): the audit line uses the
    bare file name (``'{file}.json does not exist!'``) while the
    exception keeps the full path for debuggability.
    """
    p = Path(path)

    def _fail(exc: Exception, line: str):
        if audit is not None:
            audit.log(line)
        raise exc

    if not p.exists():
        _fail(FileNotFoundError(f"{p} does not exist!"), f"{p.name} does not exist!")
    if os.path.getsize(p) == 0:
        _fail(ValueError(f"{p} is empty!"), f"{p.name} is empty!")
    with open(p, "rb") as f:
        head = f.read(4096).lstrip()
    if not head:
        _fail(ValueError(f"{p} is blank!"), f"{p.name} is empty!")
    if not head.startswith(b"["):
        _fail(
            TypeError(f"Incorrect top-level type in {p} (expected JSON array)"),
            f"Incorrect top-level type in {p.name}",
        )


def read_json_array(
    spark: SparkSession,
    path: str | Path,
    schema: StructType,
    validate: bool = True,
    audit=None,
) -> DataFrame:
    """Read a JSON array-of-objects file (the reference's raw-zone format,
    extract.py:23-34) with an explicit schema.

    ``multiLine`` is required for array files; for the high-throughput
    path prefer JSON-lines landed data (splittable, parallel scan) —
    multiLine JSON is one task per file, acceptable only for small raw
    drops like the reference's (~2 MB).
    """
    if validate:
        validate_json_array_file(path, audit=audit)
    return (
        spark.read.schema(schema)
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .json(str(path))
    )


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated test table (TESTDATA.md).

    ``events.ts`` has been written two different ways across testdata
    generations: TIMESTAMP(NANOS) (scans as long under ``nanosAsLong``,
    floor-divided to micros — same truncation DuckDB applies) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (scans as TIMESTAMP_NTZ
    under Spark 4's NTZ inference). Both are normalized to a session-tz
    TIMESTAMP: with the session pinned to UTC the NTZ wall-clock maps
    1:1 onto the UTC instant, matching how the (tz-naive) DuckDB oracle
    reads the same file.
    """
    # Defensive session pinning: the driver may hand us a session not
    # built by session.get_spark. Both confs are runtime-settable.
    # UTC: timestamp literals/rendering must match the (tz-naive UTC)
    # oracle; a local-tz session would shift date-boundary filters.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # without this a TIMESTAMP(NANOS) column is unreadable
        # ([PARQUET_TYPE_ILLEGAL]); harmless for micros files
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # session tz is UTC (pinned above) so this cast reinterprets
            # the naive wall-clock as the same UTC instant, restoring the
            # TIMESTAMP(LTZ) type the whole operator surface (unix_micros,
            # watermarks, window()) expects
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Alias kept for query-surface readability."""
    return read_parquet_table(spark, sf_dir, name)
