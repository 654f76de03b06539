"""Fast construction of small driver-local DataFrames (fixture tables,
model-sized dimension frames, audit rows).

Why this exists (r15 optimization, guide §4 "the Python boundary"):
``spark.createDataFrame(list_of_tuples, schema)`` ships the rows as a
*pickled Python RDD* — every subsequent action re-runs a Python worker
stage just to deserialize the rows and verify the schema row-by-row.
Measured on the bench host, a 16-row media fixture built that way costs
~1.2 s of pure overhead PER ACTION (the r15 A/B: list path 7.9 s vs
pandas-Arrow path 0.7 s under identical load, ~10x). Routing the same
rows through a pandas DataFrame lets the Arrow path
(``spark.sql.execution.arrow.pyspark.enabled``, on in session.py)
convert ONCE at creation into JVM-resident Arrow batches — actions on
the resulting frame never touch a Python worker again.

Semantics are identical: same rows, same schema, same nullability
checks at the Arrow cast. Any conversion failure (exotic value shapes
the Arrow path rejects) falls back to the classic ``createDataFrame``
so behaviour can never regress, only speed. Datetime-typed columns are
deliberately routed to the fallback: the Arrow and pickle paths apply
timezone localization differently for naive datetimes, and no fixture
lane needs the fast path for them.

r16 (ADVICE r15): the DDL string parses through the public
``StructType.fromDDL`` (4.0+) instead of the private
``_parse_datatype_string``, and Spark's own silent
``arrow.pyspark.fallback`` (a THIRD conversion path — non-Arrow pandas
pickling with a per-call UserWarning) is disabled around the Arrow
attempt, so exactly the two documented paths exist: Arrow fast path,
or this module's classic-tuple fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["local_rows_df"]

_FALLBACK_CONF = "spark.sql.execution.arrow.pyspark.fallback.enabled"


def _schema_of(spark: SparkSession, schema) -> StructType | None:
    if isinstance(schema, StructType):
        return schema
    if isinstance(schema, str):
        try:
            parsed = StructType.fromDDL(schema)
            return parsed if isinstance(parsed, StructType) else None
        except Exception:
            # not a parseable struct DDL (single-type strings land
            # here) — let the classic builder interpret it
            return None
    return None


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for list-of-tuples rows,
    routed through pandas so the Arrow fast path applies. ``schema``
    may be a DDL string or a StructType; falls back to the classic
    builder whenever the fast path cannot apply bit-identically."""
    struct = _schema_of(spark, schema)
    rows = list(rows)
    if struct is not None and rows:
        try:
            if any(
                t.typeName() in ("timestamp", "timestamp_ntz", "date")
                for f in struct.fields
                for t in [f.dataType]
            ):
                raise ValueError("datetime column: use classic path")
            import pandas as pd

            pdf = pd.DataFrame(
                [tuple(r) for r in rows],
                columns=struct.names,
                dtype=object,
            )
            # pin Spark's own arrow fallback OFF for this call so a
            # conversion failure lands in OUR fallback below (two
            # documented paths), not in a silent pickled-pandas path
            prev = spark.conf.get(_FALLBACK_CONF, None)
            spark.conf.set(_FALLBACK_CONF, "false")
            try:
                return spark.createDataFrame(pdf, struct)
            finally:
                if prev is None:
                    spark.conf.unset(_FALLBACK_CONF)
                else:
                    spark.conf.set(_FALLBACK_CONF, prev)
        except Exception:
            # deliberate broad catch: ANY Arrow-path failure must fall
            # back to the classic (always-correct) builder — the fast
            # path is an optimization, never a semantics change
            pass
    return spark.createDataFrame(rows, schema)
