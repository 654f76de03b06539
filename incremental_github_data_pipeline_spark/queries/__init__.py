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
# r8 proved the rotation discipline works — keep it a standing edit).
# Round-9 priorities, derived from CORRECTNESS_r01..r08 newest-green
# ages at round start (VERDICT r8 task 2):
#   (a) all 34 queries whose newest green row dates to the r4 snapshot
#       (testdata regenerates every round — these are the stalest);
#   (b) the five headline perf queries (r5-vintage) — the queries the
#       bench leans on should also be the freshest-certified;
#   (c) fill to 50 with the oldest r5-vintage rows (alphabetical).
# After this round no query's newest driver green predates r5; the
# Also queueing for round 10: q_ts_seasonal_anomaly and
# q_media_legacy_stats, q_retrieval_metrics, q_media_transcode_stats and
# q_privacy_generalize (added after the
# window filled — sweep-verified this round, needs its first driver
# row next round).
# r5-vintage rows queueing for round 10: q03_shipping_priority,
# q05_region_volume, q_approx_profile,
# q_chi_square_cells, q_conversion_window, q_doc_boilerplate_lines,
# q_doc_bpe_tokens, q_doc_cap_per_source, q_doc_contained,
# q_doc_inverted_index, q_doc_negatives, q_doc_pack_sequences,
# q_embedding_gram, q_equidepth_buckets, q_graph_triangles,
# q_group_agg, q_group_mode, q_media_curation_funnel, q_media_features,
# q_media_frame_plan, q_media_frame_samples, q_media_gif_stats,
# q_media_metadata_profile, q_media_phash_dups,
# q_media_png_palette_stats, q_media_qoi_stats, q_minhash_near_dups,
# q_rolling_time_window, q_semantic_dedup, q_sequence_pattern,
# q_sessionize, q_source_report, q_text_gzip_ingest, q_ts_anomaly_mad,
# q_ts_ewma, q_union_conform, q_url_domain_stats (+ q_variant_agg,
# q_window_topk_per_group).
_CERTIFY_FIRST = [
    # -- (0) new in round 9 (first driver rows) + the one r9 schema
    #    change (q_media_decode_stats grew the stereo/8-bit WAV lanes) --
    "q_graph_kcore",
    "q_ts_seasonal",
    "q_ts_theil_sen",
    "q_privacy_kanon",
    "q_privacy_suppress",
    "q_hll_registers",
    "q_wordpiece_merges",
    "q_wordpiece_vocab",
    "q_media_decode_stats",
    "q_media_flac_stats",
    "q_media_tiff_stats",
    # -- (a) newest green row is r4-vintage (34) --
    "q_doc_bloom_prefilter",
    "q_doc_cm_counts",
    "q_doc_fingerprint",
    "q_doc_fuzzy_pairs",
    "q_doc_normalize",
    "q_doc_paragraph_dedup",
    "q_doc_tfidf_top",
    "q_embedding_ivf_topk",
    "q_embedding_near_dups",
    "q_embedding_quantized_pool",
    "q_events_props_map",
    "q_events_sliding",
    "q_incremental_join",
    "q_media_adpcm_stats",
    "q_media_g711_stats",
    "q_media_jpeg_stats",
    "q_media_png_stats",
    "q_ngram_jaccard_dedup",
    "q_price_histogram",
    "q_recursive_hierarchy",
    "q_retention_cohorts",
    "q_scd2_asof",
    "q_scd2_history",
    "q_simhash_near_dups",
    "q_sketch_profile",
    "q_ts_moving_avg",
    "q_ts_resample_ffill",
    "q_ts_time_weighted",
    "q_ts_zscore_outliers",
    "q_unpivot_measures",
    "q_user_streaks",
    "q_vocab_overlap",
    "q_vocab_overlap_sketch",
    "q_window_analytics",
    # -- (b) headline perf queries (r5-vintage) --
    "q01_pricing_summary",
    "q_dedup_keep_last",
    "q_doc_allpairs_join",
    "q_graph_pagerank",
    "q_doc_minhash_join",
]


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration), then reorder
    the registry so this round's certification targets register first
    (see ``_CERTIFY_FIRST``)."""
    from incremental_github_data_pipeline_spark.queries import (  # noqa: F401
        ext_curation,
        ext_graph,
        ext_multimodal,
        ext_privacy,
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
