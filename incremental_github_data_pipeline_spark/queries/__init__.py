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
# r8-r13 proved the rotation discipline — keep it a standing edit).
# Round-14 priorities (VERDICT r13 task 1, exactly as queued there —
# after this window EVERY registry query has a driver green (union
# r1-r14) and nothing's newest green predates r9):
#   (0) the 3 never-certified late-r13 registrations
#       (q_dedup_keep_best, q_doc_cdc_chunks, q_doc_cdc_dedup);
#   (a) the 10 deferred r8-vintage rows (heavy media / tokenizer /
#       embedding-similarity lanes) — the last pre-r9 greens;
#   (b) 28 of the 48 r9-vintage rows (heaviest/most-shared lanes
#       first: dedup+similarity joins, media decode, graph, sketches;
#       the remaining 20 r9 rows queue FIRST in r15);
#   (c) genuinely-new r14 operators + changed-lane recerts
#       (q_doc_cdc_clamped: FastCDC min/max clamps; q_crawl_curation:
#       collision-free robots uid + https?:// scheme gate + advisory-
#       routed SENTENCE dedup per ADVICE r13 high/low + task 3).
_CERTIFY_FIRST = [
    # -- (0) never driver-certified (late-r13) --
    "q_dedup_keep_best",
    "q_doc_cdc_chunks",
    "q_doc_cdc_dedup",
    # -- (a) the 10 deferred r8-vintage rows --
    "q_ann_recall",
    "q_embedding_pq_topk",
    "q_embedding_quantized_topk",
    "q_hybrid_rrf_topk",
    "q_media_jpeg12_stats",
    "q_media_png_lowdepth_stats",
    "q_media_vad_segments",
    "q_media_video_motion",
    "q_unigram_pieces",
    "q_unigram_tokenize",
    # -- (b) 28 r9-vintage refreshes --
    "q01_pricing_summary",
    "q_dedup_keep_last",
    "q_doc_allpairs_join",
    "q_doc_bloom_prefilter",
    "q_doc_cm_counts",
    "q_doc_fingerprint",
    "q_doc_fuzzy_pairs",
    "q_doc_minhash_join",
    "q_doc_normalize",
    "q_doc_paragraph_dedup",
    "q_doc_tfidf_top",
    "q_embedding_ivf_topk",
    "q_embedding_near_dups",
    "q_embedding_quantized_pool",
    "q_events_props_map",
    "q_events_sliding",
    "q_graph_kcore",
    "q_graph_pagerank",
    "q_hll_registers",
    "q_incremental_join",
    "q_media_adpcm_stats",
    "q_media_decode_stats",
    "q_media_g711_stats",
    "q_media_jpeg_stats",
    "q_media_png_stats",
    "q_ngram_jaccard_dedup",
    "q_price_histogram",
    "q_privacy_kanon",
    # -- (c) new in round 14 + changed-lane recerts --
    "q_doc_cdc_clamped",
    "q_crawl_curation",
    "q_media_vp8_stats",
    "q_media_wav_stats",
    "q_media_webp_alpha_stats",
    "q_media_vp8_anim_stats",
    # q_media_webp_stats recertifies: the r14 kCodeLengthCodeOrder
    # conformance fix changed every VP8L fixture's encoded bytes
    "q_media_webp_stats",
    # (c) tail — r9-vintage rows filling the window's last slots
    "q_recursive_hierarchy",
    "q_scd2_asof",
]
# r15 queue note: after this window certifies, the whole 254-query
# registry is driver-certified (union r1-r14) and the oldest newest-
# green is r9. The 18 remaining r9-vintage rows queue FIRST in r15:
# q_privacy_suppress, q_retention_cohorts, q_scd2_history,
# q_simhash_near_dups,
# q_sketch_profile, q_ts_moving_avg, q_ts_resample_ffill,
# q_ts_seasonal, q_ts_theil_sen, q_ts_time_weighted,
# q_ts_zscore_outliers, q_unpivot_measures, q_user_streaks,
# q_vocab_overlap, q_vocab_overlap_sketch, q_window_analytics,
# q_wordpiece_merges, q_wordpiece_vocab — then continue the
# two-round rotation into the r10 vintage (45 rows).


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
