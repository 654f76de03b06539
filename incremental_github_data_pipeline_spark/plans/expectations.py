"""Declarative data-quality expectations (SURVEY.md §4.3).

The reference's warehouse DDL (/root/reference/migrations/
001_core_schema.sql:45-191) encodes the data contract as PK/UNIQUE/FK/
CHECK constraints that SQL Server enforces at load time. Spark enforces
none of these, so the contract becomes *expectations*: named boolean
expressions evaluated before a write, violations counted into an audit
frame (the reference's audit-log style, transform.py:301-308) and
optionally dropped.

Scale design:
- All row-level checks (CHECK / NOT NULL) for a table evaluate in ONE
  aggregate pass over the data — no per-check jobs.
- UNIQUE checks ride the same pass as ``count(*) − count(distinct key)``
  (null keys are ignored by count-distinct; the pipeline's keys are
  null-filtered upstream, matching the DDL's NOT NULL PKs).
- FK checks are broadcast left-anti joins against the (small) dimension
  — one job per FK, the dimension side broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.functions.scalar import (
    hex_string_ok,
    in_set,
    non_negative,
    timestamp_ordered,
)


@dataclass(frozen=True)
class Check:
    """Row-level expectation: rows where ``predicate`` is false (or null)
    violate. CHECK / NOT NULL constraints map here."""

    name: str
    predicate: Column


@dataclass(frozen=True)
class Unique:
    """Key-level expectation: violations = count(*) − count(distinct key)
    over non-null keys (extra copies beyond the first)."""

    name: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class ForeignKey:
    """Referential expectation: rows (with non-null local key) whose key
    has no match in ``ref`` violate. NULL local keys pass, matching SQL
    FK semantics for nullable columns (e.g. issues.assignee_id)."""

    name: str
    cols: tuple[str, ...]
    ref: DataFrame
    ref_cols: tuple[str, ...]


Expectation = Check | Unique | ForeignKey


def not_null(name: str, *cols: str) -> Check:
    pred = None
    for c in cols:
        clause = F.col(c).isNotNull()
        pred = clause if pred is None else pred & clause
    return Check(name, pred)


def evaluate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations → audit frame
    ``(expectation string, violations long)``.

    Checks and Uniques fold into a single aggregate job; each FK adds
    one broadcast anti-join job. Returns a DataFrame (lazy), one row per
    expectation, ordered by expectation name.
    """
    spark = df.sparkSession
    aggs: list[Column] = []
    for e in expectations:
        if isinstance(e, Check):
            # violation when predicate is FALSE or NULL. SQL CHECK passes
            # on unknown, so the predicates in functions.scalar are
            # written null-tolerant (timestamp_ordered returns TRUE for
            # null comparands); a predicate that evaluates to null here
            # is a contract bug and counting it as a violation surfaces
            # it instead of hiding it.
            aggs.append(
                F.coalesce(
                    F.sum(F.when(~F.coalesce(e.predicate, F.lit(False)), 1)), F.lit(0)
                ).alias(e.name)
            )
        elif isinstance(e, Unique):
            nonnull = None
            for c in e.cols:
                clause = F.col(c).isNotNull()
                nonnull = clause if nonnull is None else nonnull & clause
            # null-keyed rows are excluded from BOTH sides (a struct with
            # null fields is still a non-null struct, so the when-guard
            # must wrap the count_distinct input too)
            key = F.when(nonnull, F.struct(*[F.col(c) for c in e.cols]))
            aggs.append((F.count(key) - F.count_distinct(key)).alias(e.name))
    audits: list[DataFrame] = []
    if aggs:
        row_audit = df.agg(*aggs).select(
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(a) for a in _agg_names(expectations)]),
                    F.array(*[F.col(a).cast("long") for a in _agg_names(expectations)]),
                )
            ).alias("expectation", "violations")
        )
        audits.append(row_audit)
    for e in expectations:
        if isinstance(e, ForeignKey):
            local = df.select(
                *[F.col(c).alias(rc) for c, rc in zip(e.cols, e.ref_cols)]
            ).na.drop()
            orphans = local.join(
                F.broadcast(e.ref.select(*e.ref_cols).distinct()),
                list(e.ref_cols),
                "left_anti",
            )
            audits.append(
                orphans.agg(F.count(F.lit(1)).alias("violations")).select(
                    F.lit(e.name).alias("expectation"), F.col("violations")
                )
            )
    if not audits:
        return spark.createDataFrame([], "expectation string, violations long")
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out.orderBy("expectation")


def _agg_names(expectations: list[Expectation]) -> list[str]:
    return [e.name for e in expectations if isinstance(e, (Check, Unique))]


def enforce(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Drop violating rows (Checks and FKs; Uniques are reported only —
    dedup policy belongs to the dedupe operators, SURVEY.md §2.4) and
    return ``(clean_df, audit_df)``.

    Mirrors the reference's J3 FK-enforcement (transform.py:301-308):
    count orphans for the audit log, then drop — applied uniformly, which
    fixes the reference's branches-path gap (SURVEY.md §4.4 defect 3).
    """
    audit = evaluate(df, expectations)
    clean = df
    for e in expectations:
        if isinstance(e, Check):
            clean = clean.filter(F.coalesce(e.predicate, F.lit(False)))
        elif isinstance(e, ForeignKey):
            # rename the ref key to the local name so the semi-join is
            # an unambiguous named-column join
            ref = F.broadcast(
                e.ref.select(
                    *[F.col(rc).alias(c) for rc, c in zip(e.ref_cols, e.cols)]
                ).distinct()
            )
            null_local = None
            for c in e.cols:
                clause = F.col(c).isNull()
                null_local = clause if null_local is None else null_local | clause
            matched = clean.join(ref, list(e.cols), "left_semi")
            nulls = clean.filter(null_local)
            clean = matched.unionByName(nulls)
    return clean, audit


# ---------------------------------------------------------------------------
# The concrete contract from the reference DDL
# (/root/reference/migrations/001_core_schema.sql)
# ---------------------------------------------------------------------------


def owners_expectations() -> list[Expectation]:
    """001_core_schema.sql:45-51."""
    return [
        not_null("owners_pk_not_null", "owner_id"),
        not_null("owners_login_not_null", "owner_login"),
        Unique("owners_pk_unique", ("owner_id",)),
        Unique("owners_login_unique", ("owner_login",)),
    ]


def users_expectations() -> list[Expectation]:
    """001_core_schema.sql:62-68."""
    return [
        not_null("users_pk_not_null", "user_id"),
        not_null("users_login_not_null", "user_login"),
        Unique("users_pk_unique", ("user_id",)),
        Unique("users_login_unique", ("user_login",)),
    ]


def repos_expectations(owners: DataFrame) -> list[Expectation]:
    """001_core_schema.sql:79-120."""
    return [
        not_null("repos_pk_not_null", "repo_id"),
        not_null("repos_required_not_null", "repo_name", "full_name", "owner_id", "visibility", "created_at"),
        Unique("repos_pk_unique", ("repo_id",)),
        Unique("repos_full_name_unique", ("full_name",)),
        Check("repos_visibility_in_set", in_set("visibility", ["public", "private", "internal"])),
        Check(
            "repos_non_negative_counts",
            non_negative("stargazers_count", "forks_count", "watchers_count", "open_issues_count"),
        ),
        Check("repos_updated_after_created", timestamp_ordered("updated_at", "created_at")),
        Check("repos_pushed_after_created", timestamp_ordered("pushed_at", "created_at")),
        ForeignKey("repos_owner_fk", ("owner_id",), owners, ("owner_id",)),
    ]


def issues_expectations(users: DataFrame, repos: DataFrame) -> list[Expectation]:
    """001_core_schema.sql:132-163."""
    return [
        not_null("issues_pk_not_null", "issue_id"),
        not_null("issues_required_not_null", "number", "author_id", "title", "repo_id", "created_at"),
        Unique("issues_pk_unique", ("issue_id",)),
        Check("issues_updated_after_created", timestamp_ordered("updated_at", "created_at")),
        Check("issues_closed_after_created", timestamp_ordered("closed_at", "created_at")),
        ForeignKey("issues_author_fk", ("author_id",), users, ("user_id",)),
        ForeignKey("issues_assignee_fk", ("assignee_id",), users, ("user_id",)),
        ForeignKey("issues_repo_fk", ("repo_id",), repos, ("repo_id",)),
    ]


def branches_expectations(repos: DataFrame) -> list[Expectation]:
    """001_core_schema.sql:175-191."""
    return [
        not_null("branches_pk_not_null", "branch_id"),
        not_null("branches_name_not_null", "branch_name"),
        not_null("branches_repo_not_null", "repo_id"),
        Unique("branches_pk_unique", ("branch_id",)),
        Unique("branches_repo_branch_unique", ("repo_id", "branch_name")),
        Check(
            "branches_commit_sha_hex",
            F.col("commit_sha").isNull() | hex_string_ok("commit_sha"),
        ),
        ForeignKey("branches_repo_fk", ("repo_id",), repos, ("repo_id",)),
    ]


def quarantine(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`enforce`, but violating rows are ROUTED, not dropped:
    returns ``(clean, quarantined)`` where quarantined rows carry a
    ``_violations`` array naming every failed Check / ForeignKey — the
    triage table a production pipeline lands next to the warehouse so
    bad records can be inspected and replayed after a fix (the
    reference only counts-and-drops, transform.py:301-308; Uniques
    remain report-only, dedup policy belongs to §2.4 operators).

    One pass over the data: every violation flag is a column expression
    (FK membership via broadcast left join adding a marker column), the
    split is two pushed-down filters on the same flagged frame. The
    clean side carries the original schema; clean ∪ quarantined ≡ input.
    """
    flagged = df
    flags: list[tuple[str, Column]] = []
    for i, e in enumerate(expectations):
        if isinstance(e, Check):
            flags.append((e.name, ~F.coalesce(e.predicate, F.lit(False))))
        elif isinstance(e, ForeignKey):
            marker = f"_fk_ok_{i}"
            ref = F.broadcast(
                e.ref.select(
                    *[F.col(rc).alias(c) for rc, c in zip(e.ref_cols, e.cols)]
                )
                .distinct()
                .withColumn(marker, F.lit(1))
            )
            flagged = flagged.join(ref, list(e.cols), "left")
            null_local = None
            for c in e.cols:
                clause = F.col(c).isNull()
                null_local = (
                    clause if null_local is None else null_local | clause
                )
            flags.append(
                (e.name, F.col(marker).isNull() & ~null_local)
            )
    markers = [f"_fk_ok_{i}" for i, e in enumerate(expectations)
               if isinstance(e, ForeignKey)]
    flagged = flagged.withColumn(
        "_violations",
        F.array_compact(
            F.array(
                *[
                    F.when(cond, F.lit(name)).otherwise(F.lit(None))
                    for name, cond in flags
                ]
            )
        ),
    ).drop(*markers)
    # the FK joins move join keys to the front — restore the input order
    clean = flagged.filter(F.size("_violations") == 0).select(*df.columns)
    bad = flagged.filter(F.size("_violations") > 0).select(
        *df.columns, "_violations"
    )
    return clean, bad
