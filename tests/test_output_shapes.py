"""Registry-wide output-shape lint (VERDICT r3 task 4).

The driver's correctness canonicalizer is a pandas pipeline: Spark
results via ``toPandas()``, DuckDB oracle results via ``.df()``, rows
sorted with ``sort_values`` and value-hashed dtype-sensitively. Two
whole classes of r3 certification failures were output-SHAPE bugs, not
logic bugs:

- ``q_approx_profile`` ERR: an ``array<double>`` column crashes
  ``sort_values`` ("unhashable type: 'list'");
- ``q_sessionize`` / ``q_doc_pack_sequences`` hash mismatch: an uncast
  DuckDB HUGEINT (window SUM, ``//`` chains) lands in pandas as
  float64 against Spark's int64.

This lint pins the whole registry against both classes without running
the queries: the Spark side is checked at the analyzed-schema level
(no job), the oracle side through DuckDB's ``DESCRIBE`` (no scan), and
the two are required to agree column-by-column at dtype-family
granularity.

A third, VALUE-level hazard this schema lint cannot see (caught by
``scripts/check_correctness.py`` instead, r4 ``q_media_phash_dups``):
a NULLABLE BOOLEAN output column — Spark's None and DuckDB's NaN land
in the same object-dtype pandas column but compare/hash differently.
Query authors: ``COALESCE`` every boolean output to a concrete value.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_family(t: str) -> str:
    t = t.upper()
    if t in _DUCK_INT:
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "HUGEINT":
        # pandas renders HUGEINT as float64 → guaranteed driver hash
        # divergence vs Spark's int64. Cast to BIGINT in the oracle.
        return "HAZARD:hugeint"
    if t.startswith("DECIMAL"):
        # DuckDB DECIMAL → float64, Spark Decimal → object(Decimal):
        # both sides must cast to DOUBLE (or BIGINT) before comparing.
        return "HAZARD:decimal"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "datetime"
    if t == "VARCHAR":
        return "str"
    if t == "BLOB":
        return "binary"
    return f"other:{t}"


def _spark_family(dt: DataType) -> str:
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return "int"
    if isinstance(dt, (FloatType, DoubleType)):
        return "float"
    if isinstance(dt, BooleanType):
        return "bool"
    if isinstance(dt, DecimalType):
        return "HAZARD:decimal"
    if isinstance(dt, (DateType, TimestampType, TimestampNTZType)):
        return "datetime"
    if isinstance(dt, StringType):
        return "str"
    if isinstance(dt, BinaryType):
        return "binary"
    if isinstance(dt, (ArrayType, MapType, StructType)):
        # unhashable cell values crash the driver's sort_values canon
        return "HAZARD:nested"
    return f"other:{dt.simpleString()}"


@pytest.fixture(scope="module")
def registry():
    from incremental_github_data_pipeline_spark.queries import load_all

    return load_all()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_no_nested_or_hazard_columns_in_any_query(spark, registry):
    """Every registered query's analyzed output schema must be flat
    scalars of driver-safe families — arrays/maps/structs/decimals
    never reach the compared output."""
    bad = []
    for name, spec in registry.items():
        df = spec.fn(spark, SF)
        for f in df.schema.fields:
            fam = _spark_family(f.dataType)
            if fam.startswith(("HAZARD:", "other:")):
                bad.append((name, f.name, f.dataType.simpleString(), fam))
    assert not bad, f"driver-hazard output columns: {bad}"


def test_oracle_dtypes_match_spark_families(spark, registry, duck):
    """For every oracle-backed query, the DuckDB result schema
    (via DESCRIBE — no scan) must agree with the Spark schema column
    by column at dtype-family granularity, with no HUGEINT/DECIMAL
    leaking into the compared frame."""
    problems = []
    for name, spec in registry.items():
        if spec.oracle is None:
            continue
        s_fields = {
            f.name: _spark_family(f.dataType)
            for f in spec.fn(spark, SF).schema.fields
        }
        try:
            desc = duck.sql(f"DESCRIBE {spec.oracle}").fetchall()
        except Exception as ex:  # pragma: no cover - lint diagnostics
            problems.append((name, "describe-failed", str(ex)[:120]))
            continue
        d_fields = {r[0]: _duck_family(r[1]) for r in desc}
        if set(s_fields) != set(d_fields):
            problems.append(
                (name, "columns", sorted(s_fields), sorted(d_fields))
            )
            continue
        for col, sfam in s_fields.items():
            dfam = d_fields[col]
            if sfam != dfam or dfam.startswith("HAZARD:"):
                problems.append((name, col, sfam, dfam))
    assert not problems, f"spark/oracle dtype-family mismatches: {problems}"
