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


# Certification rotation: the driver's per-round correctness snapshot
# records the FIRST ~50 registry entries in registration order, so this
# list is re-derived every round (VERDICT r3 confirmed the mechanics).
# Rounds 4 and 5 were perfect 50/50, and every query ever registered
# (161/161) now has at least one green driver row. Round-6 priorities
# (VERDICT r5 task 2 + round-start audit of CORRECTNESS_r01..r05):
#   (a) queries NEW in round 6 — first driver rows;
#   (b) queries whose code/oracle changed in round 6 (incl. the advisor
#       fixes in commit 1efa087: weighted-sample weight guard, skew
#       DECIMAL ratios, pooled-recall remainder block, BPE oracle
#       early-stop) — re-certify post-change;
#   (c) the 31 queries whose newest green row dates to the r2 snapshot
#       (testdata regenerates every round — these are the stalest);
#   (d) fill to 50 with the oldest r3-vintage rows (TPC-H pillars).
# The remaining 42-minus-11 r3-vintage rows queue for round 7.
_CERTIFY_FIRST = [
    # -- (a) new in round 6: first driver rows --
    "q_stream_join_attribution",
    "q_bpe_tokenize",
    "q_media_png_interlaced_stats",
    "q_media_png16_stats",
    "q_media_jpeg_progressive_stats",
    "q_media_jpeg420_stats",
    # -- (b) code/oracle changed in round 6 --
    "q_doc_weighted_sample",
    "q_skew_report",
    "q_ann_recall",
    "q_bpe_merges",
    "q_bpe_vocab",
    # -- (c) newest green row is r2-vintage (31) --
    "q_anti_join",
    "q_asof_join",
    "q_cube",
    "q_distinct_agg",
    "q_doc_decontaminate",
    "q_doc_incremental_dedup",
    "q_doc_lang_dist",
    "q_doc_overlap_pairs",
    "q_doc_pii_audit",
    "q_doc_quality",
    "q_doc_repetition",
    "q_doc_sample_stratified",
    "q_doc_split",
    "q_doc_token_stats",
    "q_doc_top_terms",
    "q_doc_vocab",
    "q_embedding_norm_stats",
    "q_embedding_topk",
    "q_embedding_topk_arrow",
    "q_except",
    "q_fk_resolve_orphans",
    "q_intersect",
    "q_interval_overlap",
    "q_lang_id",
    "q_range_join_count",
    "q_rollup",
    "q_scalar_string",
    "q_semi_join",
    "q_top20_scan",
    "q_verified_near_dups",
    "q_window_running_total",
    # -- (d) oldest r3-vintage rows: TPC-H pillars (fill to 50) --
    "q02_best_supplier",
    "q04_order_priority",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_parts",
]
# Round-7 rotation queue: check CORRECTNESS_r06.json at round start and
# front-load (1) any non-green r6 rows, (2) round-6 registrations that
# missed the r6 cut, (3) queries whose code changes in round 7, then the
# remaining r3-vintage greens (q12, q13, q14, q15..q22, q_case_when, q_date_parts,
# q_dedup_clusters, q_doc_chunks, q_doc_curation_funnel, q_doc_dsir,
# q_doc_exact_dedup, q_doc_lm_score, q_doc_mix_sources,
# q_doc_remove_spans, q_embedding_quantized_topk, q_events_funnel,
# q_events_hourly, q_events_new_users, q_expectations_audit,
# q_grouping_sets, q_incremental_rollup, q_json_extract,
# q_pivot_event_types, q_quantiles, q_salted_agg, q_string_agg,
# q_validation_checks) and then r4-vintage rows.


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration), then reorder
    the registry so this round's certification targets register first
    (see ``_CERTIFY_FIRST``)."""
    from incremental_github_data_pipeline_spark.queries import (  # noqa: F401
        ext_curation,
        ext_graph,
        ext_multimodal,
        ext_similarity,
        ext_temporal,
        ext_text,
        ext_timeseries,
        relational,
        tpch,
        tpch_advanced,
    )

    ordered = {
        name: REGISTRY[name] for name in _CERTIFY_FIRST if name in REGISTRY
    }
    ordered.update(REGISTRY)  # remaining entries keep their import order
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
