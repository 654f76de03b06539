"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (core + [EXT]) registers a
named query here, optionally with a DuckDB oracle-SQL twin. The driver
runs Spark query and oracle side-by-side at sf0.01 and compares row
count + schema + order-insensitive value hash — so every query aliases
each computed column identically in both dialects and pins any
floating-point aggregation through exact decimal arithmetic (sum in
DECIMAL, cast the final value to DOUBLE) to make values bit-reproducible
across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration)."""
    from incremental_github_data_pipeline_spark.queries import (  # noqa: F401
        ext_multimodal,
        ext_similarity,
        ext_temporal,
        ext_text,
        relational,
        tpch,
        tpch_advanced,
    )

    return REGISTRY
