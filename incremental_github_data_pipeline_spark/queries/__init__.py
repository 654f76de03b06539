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
# list is re-derived every round (VERDICT r3 confirmed the mechanics;
# r8-r12 proved the rotation discipline works — keep it a standing edit).
# Round-13 priorities (VERDICT r12 task 1, exactly as queued there):
#   (0) q_doc_scripts — the single never-driver-certified registry
#       query (late-r12 registration), queued first;
#   (a) 40 of the 50 r8-vintage refreshes (newest driver green = r8):
#       TPC-H Q12-Q22 plus the relational/event/text/stream lanes,
#       operator code untouched since r8 — lowest risk first per the
#       verdict. The remaining 10 r8-vintage rows (heavy media /
#       tokenizer / embedding-similarity lanes: q_ann_recall,
#       q_embedding_pq_topk, q_embedding_quantized_topk,
#       q_hybrid_rrf_topk, q_media_jpeg12_stats,
#       q_media_png_lowdepth_stats, q_media_vad_segments,
#       q_media_video_motion, q_unigram_pieces, q_unigram_tokenize)
#       queue FIRST for r14 so nothing's newest green predates r9
#       after r14 — the two-round rotation the verdict prescribes;
#   (b) genuinely-new r13 operators certify in the round that built
#       them, plus changed-lane recerts (q_url_canonical gained the
#       percent-encoding normalization layer; q_crawl_curation gained
#       robots-gate + tracker-strip stages and salted URL dedup;
#       q_media_tiff_stats now also cycles a Group 3 2-D (MR) fixture;
#       q_media_webp_stats/q_media_gif_stats gained animated/multi-
#       frame fixtures; q_privacy_dp_counts hash lane widened through
#       DECIMAL(38,0) per ADVICE r12).
# The r13 window is exactly 50: 1 + 40 backlog + 9 new/changed rows.
# Queries registered after this window fills queue FIRST in r14,
# alongside the 10 deferred r8-vintage rows listed above:
# q_dedup_keep_best, q_doc_cdc_chunks and q_doc_cdc_dedup (late-r13 —
# sweep-green, benched, tested, never driver-seen).
_CERTIFY_FIRST = [
    # -- (0) the one never-certified registry query --
    "q_doc_scripts",
    # -- (a) r8-vintage refreshes: TPC-H Q12-Q22 --
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    # -- (a) r8-vintage refreshes: relational/event/text/stream lanes --
    "q_allocate_cents",
    "q_case_when",
    "q_cdc_apply",
    "q_corr_qty_price",
    "q_date_parts",
    "q_dedup_clusters",
    "q_doc_bm25_topk",
    "q_doc_chunks",
    "q_doc_cluster_split",
    "q_doc_curation_funnel",
    "q_doc_dsir",
    "q_doc_exact_dedup",
    "q_doc_lm_score",
    "q_doc_mix_sources",
    "q_doc_remove_spans",
    "q_events_funnel",
    "q_events_hourly",
    "q_events_new_users",
    "q_expectations_audit",
    "q_grouping_sets",
    "q_incremental_rollup",
    "q_json_extract",
    "q_pivot_event_types",
    "q_quantiles",
    "q_salted_agg",
    "q_stream_session_attribution",
    "q_string_agg",
    "q_ts_cusum",
    "q_validation_checks",
    # -- (b) new in round 13 + changed-lane recerts --
    "q_doc_lang_trigram",
    "q_url_canonical",
    "q_crawl_curation",
    "q_media_tiff_stats",
    "q_media_webp_stats",
    "q_media_gif_stats",
    "q_privacy_dp_counts",
    "q_doc_lang_dist",
    "q_url_strip_tracking",
]


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration), then reorder
    the registry so this round's certification targets register first
    (see ``_CERTIFY_FIRST``)."""
    from incremental_github_data_pipeline_spark.queries import (  # noqa: F401
        ext_curation,
        ext_graph,
        ext_linkage,
        ext_multimodal,
        ext_privacy,
        ext_quality,
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
