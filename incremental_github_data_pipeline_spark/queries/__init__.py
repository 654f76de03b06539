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
# r8-r10 proved the rotation discipline works — keep it a standing edit).
# Round-11 priorities (VERDICT r10 task 1, exactly as queued there):
#   (0) the nine queries registered after the r10 window filled —
#       sweep-green 206/206 but never seen by a driver correctness row;
#       their first rows land this round (the 16-scan q_doc_contained /
#       q_doc_allpairs fixes landed BEFORE this queue runs, so any
#       recertification records the repaired plans).
#   (a) 33 of the 49 queries whose newest driver green is the r7
#       snapshot — the oldest vintage left in the archive.
# 50 rows (the window cap): 9 + 5 first-appearances (the r11-built
# q_media_webp_stats, q_privacy_tcloseness, q_graph_label_prop,
# q_media_resample_stats, q_ts_acf — new operators certify in the
# round that built them) + 3 r11 changed-mix media refreshes + 33
# r7-vintage. Deferred to r12 (16 lowest-risk r7-vintage rows —
# relational set/agg/window/scan ops and simple text/embedding/sample
# aggregates, operator code untouched since r7): q_anti_join, q_cube,
# q_distinct_agg, q_doc_sample_stratified, q_doc_top_terms,
# q_doc_vocab, q_embedding_norm_stats, q_except, q_intersect,
# q_interval_overlap, q_range_join_count, q_rollup, q_scalar_string,
# q_semi_join, q_top20_scan, q_window_running_total. Registered after
# the window filled (sweep-green + benched; queue FIRST in r12):
# q_embedding_matryoshka, q_media_augment_stats, q_skew_advisory,
# q_media_avi_stats, q_media_ico_stats, q_doc_html_strip,
# q_url_canonical, q_warc_ingest, q_warc_html_extract,
# q_kmv_distinct, q_kmv_jaccard, q_graph_hits, q_graph_link_pred,
# q_media_au_pcx_stats, q_ts_holt_winters, q_column_profile,
# q_doc_sentences, q_sentence_dedup, q_doc_fix_mojibake,
# q_avro_ingest, q_ts_ccf, q_archive_ingest, q_ts_ols,
# q_parquet_layout, q_graph_assortativity, plus the
# r12-deferred refresh rows above.
_CERTIFY_FIRST = [
    # -- (0) first driver rows (registered post-r10-window) --
    "q_ts_holt_linear",
    "q_ts_forecast_seasonal",
    "q_graph_ppr",
    "q_graph_pagerank_weighted",
    "q_hll_sliding",
    "q_ts_winsorize",
    "q_linkage_best_match",
    "q_schema_drift",
    "q_volume_gate",
    # -- (0b) new in round 11 --
    "q_media_webp_stats",
    "q_privacy_tcloseness",
    "q_graph_label_prop",
    "q_media_resample_stats",
    "q_ts_acf",
    # -- (0c) r11 encoder-mix refreshes: the JPEG-in-TIFF lane grew
    #    old-style (compression 6) files, the FLAC lane now cycles LPC
    #    orders 8/12, and the transcode target encodes at order 12 —
    #    their driver rows should record the new mixes (the r10
    #    precedent for changed lanes)
    "q_media_tiff_jpeg_stats",
    "q_media_flac_stats",
    "q_media_transcode_stats",
    # -- (a) newest green row is r7-vintage (33 of 49) --
    "q02_best_supplier",
    "q04_order_priority",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q_asof_join",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_bpe_vocab",
    "q_doc_decontaminate",
    "q_doc_incremental_dedup",
    "q_doc_lang_dist",
    "q_doc_overlap_pairs",
    "q_doc_pii_audit",
    "q_doc_quality",
    "q_doc_repetition",
    "q_doc_split",
    "q_doc_token_stats",
    "q_doc_weighted_sample",
    "q_embedding_topk",
    "q_embedding_topk_arrow",
    "q_fk_resolve_orphans",
    "q_lang_id",
    "q_media_jpeg420_stats",
    "q_media_jpeg_progressive_stats",
    "q_media_png16_stats",
    "q_media_png_interlaced_stats",
    "q_skew_report",
    "q_stream_join_attribution",
    "q_verified_near_dups",
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
