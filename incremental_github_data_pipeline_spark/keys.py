"""Deterministic UUIDv5 surrogate keys as native Spark expressions.

The reference derives every surrogate key as ``uuid.uuid5(namespace, key)``
(/root/reference/utils/guid_gen.py:9-10) applied row-wise with
``df.apply(axis=1)`` — a per-row Python call. Here the same RFC 4122 §4.3
algorithm (SHA-1 over ``namespace.bytes + name.encode('utf-8')`` with the
version/variant bits forced) is built from codegen-friendly built-ins
(``sha1``/``conv``/``hex``/``substring``), so key generation stays inside
whole-stage codegen with zero Python serialization boundary — the single
most important hot-path decision at 100 TB (SURVEY.md §4.1, §7.3).

A vectorized pandas-UDF twin (`uuid5_udf`) exists purely as a correctness
oracle for tests.

Namespace constants mirror /root/reference/utils/guid_gen.py:3-7.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

NAMESPACE_OWNER = uuid.uuid5(uuid.NAMESPACE_DNS, "github.owner")
NAMESPACE_REPO = uuid.uuid5(uuid.NAMESPACE_DNS, "github.repo")
NAMESPACE_ISSUE = uuid.uuid5(uuid.NAMESPACE_DNS, "github.issue")
NAMESPACE_BRANCH = uuid.uuid5(uuid.NAMESPACE_DNS, "github.branch")
NAMESPACE_USER = uuid.uuid5(uuid.NAMESPACE_DNS, "github.user")


def uuid5(namespace: uuid.UUID, name: Column) -> Column:
    """RFC 4122 UUIDv5 of ``name`` (string column) under ``namespace``.

    Bit-exact with ``uuid.uuid5``: SHA-1(namespace.bytes || utf8(name)),
    first 16 bytes, version nibble := 5, variant bits := 10. NULL name
    yields NULL (matching the reference's conditional key-gen for nullable
    assignee_login, transform.py:282-288).
    """
    h = F.sha1(F.concat(F.lit(namespace.bytes), F.encode(name, "UTF-8")))
    # Byte 8 (hex chars 17-18) carries the variant: (b & 0x3F) | 0x80.
    variant_byte = (
        F.conv(F.substring(h, 17, 2), 16, 10)
        .cast("int")
        .bitwiseAND(F.lit(0x3F))
        .bitwiseOR(F.lit(0x80))
    )
    variant_hex = F.lpad(F.lower(F.hex(variant_byte)), 2, "0")
    formatted = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        # Version nibble (hex char 13) is forced to '5'.
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(variant_hex, F.substring(h, 19, 2)),
        F.substring(h, 21, 12),
    )
    # concat_ws would turn an all-NULL input into '' — force NULL through.
    return F.when(name.isNull(), F.lit(None).cast("string")).otherwise(formatted)


def business_key(*parts: Column, sep: str = "|") -> Column:
    """Composite business key ``f"{a}|{b}"`` (transform.py:150,269,386).

    Inputs are null-rejected upstream (P3) in the reference; we still NULL
    the whole key if any part is NULL rather than silently skipping parts
    (``concat`` null semantics, not ``concat_ws``), which is the safe
    interpretation — a half-key must never collide with a whole key.
    """
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out.cast("string"), F.lit(sep), p.cast("string"))
    return out


def uuid5_udf(namespace: uuid.UUID):
    """Factory for a vectorized uuid5 pandas UDF under ``namespace``.

    Test oracle only — production paths use :func:`uuid5` (native exprs).
    Requires an active SparkSession (pandas_udf resolves its return type
    against the session), hence a factory rather than a module-level UDF.
    """

    @pandas_udf(StringType())
    def _udf(name: pd.Series) -> pd.Series:
        return name.map(
            lambda v: str(uuid.uuid5(namespace, v)) if pd.notna(v) else None
        )

    return _udf
