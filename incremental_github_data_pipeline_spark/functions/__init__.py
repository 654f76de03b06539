"""Scalar function library (SURVEY.md §2.7, F1-F10).

All native column expressions — zero Python UDFs — so every function
stays inside whole-stage codegen.
"""

from incremental_github_data_pipeline_spark.functions.scalar import (  # noqa: F401
    audit_timestamp,
    hex_string_ok,
    in_set,
    non_negative,
    timestamp_ordered,
)
