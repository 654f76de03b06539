"""Scalar functions F1-F10 (SURVEY.md §2.7).

F1 (business-key concat) lives in keys.business_key; F2 (array join) in
operators.core.collapse_array/-struct_array; F3 (uuid5) in keys.uuid5;
F4 (timestamp parse) in operators.core.parse_timestamps_utc. The
validation predicates F7-F10 (the SQL DDL CHECK constraints,
/root/reference/migrations/001_core_schema.sql:104-119,155-162,187-190)
live here and feed plans.expectations.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE per
    row and reference it many times inside ``body``.

    Why this exists: higher-order functions (transform/aggregate/filter)
    are evaluated interpreted (no whole-stage codegen), and Catalyst's
    CollapseProject inlines intermediate Project aliases back into every
    use site — so an expensive subexpression (tokenize + shingle a
    document) that appears N times in one expression tree is *computed*
    N times per row. Wrapping the value as the element of a 1-element
    array and binding it as a HOF lambda variable forces single
    evaluation: lambda variables are bound once, references are free.
    """
    return F.get(F.transform(F.array(value), body), 0)


def audit_timestamp() -> Column:
    """F5 — ``strftime('%Y-%m-%d %H:%M:%S')`` log timestamps
    (extract.py:37 etc.)."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")


def hex_string_ok(col: Column | str) -> Column:
    """F7 — commit_sha hex check (001_core_schema.sql:187-190:
    ``NOT LIKE '%[^0-9a-fA-F]%'``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^[0-9a-fA-F]*$")


def in_set(col: Column | str, allowed: Iterable[str]) -> Column:
    """F8 — set membership (visibility CHECK, 001_core_schema.sql:104-105)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(list(allowed))


def non_negative(*cols: Column | str) -> Column:
    """F9 — non-negative counts (001_core_schema.sql:106-111)."""
    out = None
    for col in cols:
        c = F.col(col) if isinstance(col, str) else col
        clause = c >= 0
        out = clause if out is None else out & clause
    return out


def timestamp_ordered(later: Column | str, earlier: Column | str) -> Column:
    """F10 — ordering CHECK, NULL-tolerant the way SQL CHECK is (a NULL
    comparand passes): ``later IS NULL OR earlier IS NULL OR later >=
    earlier`` (001_core_schema.sql:112-119, :155-162)."""
    lt = F.col(later) if isinstance(later, str) else later
    er = F.col(earlier) if isinstance(earlier, str) else earlier
    return lt.isNull() | er.isNull() | (lt >= er)
