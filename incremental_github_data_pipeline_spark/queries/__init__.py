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
# r8/r9 proved the rotation discipline works — keep it a standing edit).
# Round-10 priorities (VERDICT r9 task 1, exactly as queued there):
#   (0) the five queries registered after the r9 window filled — green
#       in every local sweep but never seen by a driver correctness
#       row (q_ts_seasonal_anomaly certifies WITH the r10 plan fix, so
#       its first driver row records the checkpointed 0-fact-scan
#       plan);
#   (a) the 39 queries whose newest driver green is still the r5
#       snapshot — the last pre-r7 vintage anywhere in the registry.
#   (0b/0c) the two queries NEW in round 10 (JPEG-in-TIFF,
#       dangling-mass PageRank) and the two media lanes whose r10
#       encoder mix changed (FLAC grew LPC/decorrelated fixtures).
# 50 rows (the window cap); after this round no query's newest driver
# green predates r7. Registered after the window filled (sweep-verified
# 206/206 this round, queue for their first driver rows in r11):
# q_ts_holt_linear, q_ts_forecast_seasonal, q_graph_ppr,
# q_graph_pagerank_weighted, q_hll_sliding, q_ts_winsorize,
# q_linkage_best_match, q_schema_drift, q_volume_gate.
_CERTIFY_FIRST = [
    # -- (0) first driver rows (registered post-r9-window) --
    "q_ts_seasonal_anomaly",
    "q_media_legacy_stats",
    "q_retrieval_metrics",
    "q_media_transcode_stats",
    "q_privacy_generalize",
    # -- (0b) new in round 10 --
    "q_media_tiff_jpeg_stats",
    "q_graph_pagerank_dangling",
    "q_media_quarantine",
    "q_linkage_blocked",
    # -- (0c) r10 behavior-adjacent refreshes: the FLAC lane grew
    #    LPC + stereo decorrelation and the TIFF lane's docs/scope
    #    changed — their driver rows should record the new encoder mix
    "q_media_flac_stats",
    "q_media_tiff_stats",
    # -- (a) newest green row is r5-vintage (39) --
    "q03_shipping_priority",
    "q05_region_volume",
    "q_approx_profile",
    "q_chi_square_cells",
    "q_conversion_window",
    "q_doc_boilerplate_lines",
    "q_doc_bpe_tokens",
    "q_doc_cap_per_source",
    "q_doc_contained",
    "q_doc_inverted_index",
    "q_doc_negatives",
    "q_doc_pack_sequences",
    "q_embedding_gram",
    "q_equidepth_buckets",
    "q_graph_triangles",
    "q_group_agg",
    "q_group_mode",
    "q_media_curation_funnel",
    "q_media_features",
    "q_media_frame_plan",
    "q_media_frame_samples",
    "q_media_gif_stats",
    "q_media_metadata_profile",
    "q_media_phash_dups",
    "q_media_png_palette_stats",
    "q_media_qoi_stats",
    "q_minhash_near_dups",
    "q_rolling_time_window",
    "q_semantic_dedup",
    "q_sequence_pattern",
    "q_sessionize",
    "q_source_report",
    "q_text_gzip_ingest",
    "q_ts_anomaly_mad",
    "q_ts_ewma",
    "q_union_conform",
    "q_url_domain_stats",
    "q_variant_agg",
    "q_window_topk_per_group",
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
