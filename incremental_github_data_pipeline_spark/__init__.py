"""PySpark-native analytics engine with the capabilities of
piter-a/Incremental-GitHub-Data-Pipeline (see SURVEY.md).

Architecture: declarative DataFrame programs optimized by Catalyst; no
hand-scheduled execution. Modules:

- ``session``    SparkSession factory (UTC, AQE, sane local defaults)
- ``keys``       deterministic UUIDv5 surrogate keys as native expressions
- ``sources``    schema'd readers, rotating writers, REST ingestion, audit sink
- ``operators``  the operator surface of SURVEY.md §2 (core + [EXT])
- ``functions``  scalar function library (F1-F10)
- ``plans``      declarative expectations (DDL constraint checks)
- ``streaming``  incremental/streaming upgrade of the batch pipeline
- ``pipelines``  the GitHub ELT pipeline re-expressed Spark-first
"""

__version__ = "0.1.0"
