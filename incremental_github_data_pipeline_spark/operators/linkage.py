"""Record linkage / entity resolution: blocked candidate generation +
Fellegi–Sunter field-agreement scoring.

No counterpart in the reference (`/root/reference` has no linkage
surface); [EXT] per SURVEY.md §2.10 — the cross-source entity
resolution a training-data pipeline runs when the same author/user/
publisher arrives from multiple crawls under slightly different
attributes. Companion to the similarity dedup family in
``operators/dedup.py``: that family matches CONTENT, this one matches
ENTITIES by structured fields.

Method (Fellegi & Sunter 1969, public literature): each field
comparison contributes an AGREEMENT weight log(m/u) when it agrees and
a DISAGREEMENT weight log((1−m)/(1−u)) when it doesn't, where m/u are
the match/unmatch agreement probabilities; the pair's score is the sum
and two thresholds split match / possible / non-match. This module
keeps the certified lane exact: weights are CALLER-SUPPLIED INTEGERS
(scaled logs — derive them off-line however you like, e.g. with
:func:`fs_weights`), so the score is pure integer arithmetic any
engine replays bit-for-bit; only the optional weight-derivation helper
touches floats.

Scale shape (100 TB): the blocking equi-join is the whole story — it
turns the |L|×|R| cross product into Σ_b |L_b|·|R_b| per block key,
the classic quadratic→linear reduction, and it is an ordinary shuffle
join Catalyst plans like any other (broadcast when one side's blocks
are small). Field comparators are codegen'd CASE expressions on the
joined rows — no UDF, no driver. A hot block key (one nation, one
zip) is ordinary join skew: salt it or let AQE split it, same playbook
as every other key.
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["FieldComparator", "blocked_linkage", "fs_weights"]


@dataclass
class FieldComparator:
    """One field comparison: ``mode`` decides agreement —

    - ``"exact"``: equality (null-safe: two NULLs agree, NULL vs
      value disagrees),
    - ``"prefix:<n>"``: first n characters equal,
    - ``"suffix:<n>"``: last n characters equal,
    - ``"abs_diff:<d>"``: numeric |l − r| ≤ d,
    - ``"levenshtein:<k>"``: edit distance ≤ k (built-in
      ``levenshtein`` — JVM-side, still no UDF).

    ``agree``/``disagree`` are the scaled-integer Fellegi–Sunter
    weights this field contributes (disagreement weights are normally
    negative)."""

    name: str
    left_col: str
    right_col: str
    agree: int
    disagree: int
    mode: str = "exact"

    def agrees(self, left: Column, right: Column) -> Column:
        if self.mode == "exact":
            return left.eqNullSafe(right)
        kind, _, arg = self.mode.partition(":")
        if kind == "prefix":
            n = int(arg)
            return F.substring(left, 1, n).eqNullSafe(
                F.substring(right, 1, n)
            )
        if kind == "suffix":
            n = int(arg)
            return F.substring(left, -n, n).eqNullSafe(
                F.substring(right, -n, n)
            )
        if kind == "abs_diff":
            return F.abs(left - right) <= int(arg)
        if kind == "levenshtein":
            return F.levenshtein(left, right) <= int(arg)
        raise ValueError(f"unknown comparator mode {self.mode!r}")


def fs_weights(m: float, u: float, scale: int = 1000) -> tuple[int, int]:
    """Derive scaled-integer (agree, disagree) weights from
    match/unmatch agreement probabilities: round(scale·log2(m/u)) and
    round(scale·log2((1−m)/(1−u))). Float math lives HERE, off the
    certified lane — the returned integers are what
    :func:`blocked_linkage` sums exactly."""
    if not (0.0 < u < m < 1.0):
        raise ValueError("need 0 < u < m < 1")
    return (
        int(round(scale * math.log2(m / u))),
        int(round(scale * math.log2((1.0 - m) / (1.0 - u)))),
    )


def blocked_linkage(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    comparators: Sequence[FieldComparator],
    upper: int,
    lower: int,
    left_id: str = "left_id",
    right_id: str = "right_id",
) -> DataFrame:
    """Blocked Fellegi–Sunter linkage: equi-join ``left`` × ``right``
    on ``block_cols`` (candidates exist only within a block — the
    quadratic→linear reduction blocking exists for), then each
    comparator adds its integer agree/disagree weight and the summed
    score classifies: ``score ≥ upper`` → ``'match'``, ``score ≤
    lower`` → ``'non_match'``, else ``'possible'`` (the clerical-review
    band of the original model).

    Returns ``(left_id, right_id, <name>_agree per field …, score,
    verdict)`` — all integer/boolean lanes, bit-reproducible in any
    engine. Both inputs must carry their id column named ``left_id``/
    ``right_id`` already; block columns must exist on both sides.

    Rows with a NULL block key are DROPPED before the join (standard
    blocking practice, and what a plain SQL ``=`` join does): the r10
    version used a null-safe equality, which silently pooled every
    NULL-keyed row from both sides into ONE all-NULL block — a hidden
    cross product and the worst possible skew key at scale. A record
    whose block key is unknown has no block; route such rows through a
    second pass with a different blocking scheme instead."""
    if upper < lower:
        raise ValueError("upper threshold below lower")
    lf = left
    rf = right
    for b in block_cols:
        lf = lf.filter(F.col(b).isNotNull())
        rf = rf.filter(F.col(b).isNotNull())
    lf = lf.alias("_l")
    rf = rf.alias("_r")
    cond = None
    for b in block_cols:
        term = F.col(f"_l.{b}") == F.col(f"_r.{b}")
        cond = term if cond is None else cond & term
    pairs = lf.join(rf, cond)
    cols = [F.col(f"_l.{left_id}").alias(left_id),
            F.col(f"_r.{right_id}").alias(right_id)]
    score = F.lit(0).cast("long")
    for c in comparators:
        # NULL comparison results (a NULL operand under prefix/
        # abs_diff/levenshtein) count as DISAGREEMENT, pinned here so
        # the flag column and the score always agree; exact mode is
        # null-safe by its own definition
        agrees = F.coalesce(
            c.agrees(F.col(f"_l.{c.left_col}"), F.col(f"_r.{c.right_col}")),
            F.lit(False),
        )
        cols.append(agrees.cast("long").alias(f"{c.name}_agree"))
        score = score + F.when(agrees, F.lit(c.agree)).otherwise(
            F.lit(c.disagree)
        )
    out = pairs.select(*cols, score.alias("score"))
    return out.withColumn(
        "verdict",
        F.when(F.col("score") >= upper, F.lit("match"))
        .when(F.col("score") <= lower, F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )
