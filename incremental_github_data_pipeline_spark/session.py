"""SparkSession factory.

Defaults chosen for correctness parity with the reference pipeline
(UTC session timezone — /root/reference/transform.py:186-192 parses all
timestamps with utc=True) and for scale (AQE on, skew-join handling on,
Arrow for any pandas interchange).

At 100 TB these same settings hold: AQE re-plans shuffle partition counts
at runtime, so ``spark.sql.shuffle.partitions`` here is only the upper
bound for local runs; on a real cluster it should be ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Parity: the reference parses every timestamp as UTC.
    "spark.sql.session.timeZone": "UTC",
    # Scale: adaptive execution re-plans partition counts / skew at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables in this workload are tiny (owners=1, repos=300,
    # users≈1.6k — BASELINE.md); let Spark auto-broadcast up to 32 MB.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # Arrow for pandas_udf / toPandas interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Read timestamps written by other engines consistently.
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    # Parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams) is
    # unreadable by Spark natively; surface it as long and convert in
    # the reader (readers.read_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Bucketed tables (writers.write_bucketed) register in the session
    # catalog; keep their files out of the repo working dir.
    "spark.sql.warehouse.dir": "/tmp/spark_graft_warehouse",
    # Long-lived sessions that run many queries back-to-back (the bench
    # suite, the correctness sweep) accumulate shuffle files whose
    # cleanup waits on driver GC of the Python-side plan references; the
    # default 30min periodic GC lets tens of GB pile up and skews
    # late-suite timings. A tight interval keeps steady-state disk/page
    # cache flat; per-query cost is a no-op when nothing is collectable.
    "spark.cleaner.periodicGC.interval": "45s",
}


def get_spark(
    app_name: str = "incremental-github-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default *).
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster pass an explicit value or rely on AQE coalescing.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    # In local mode the driver JVM IS the executor; the 1g default heap
    # can't hold a 32 MB-threshold broadcast build side at larger SFs.
    # Only effective at JVM launch — a no-op on getOrCreate of a live
    # session (e.g. the driver harness's own session).
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        conf["spark.sql.shuffle.partitions"] = cpus if cpus and cpus.isdigit() else "32"
    else:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
