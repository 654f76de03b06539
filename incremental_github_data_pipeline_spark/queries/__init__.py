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
# r8-r11 proved the rotation discipline works — keep it a standing edit).
# Round-12 priorities (VERDICT r11 task 1, exactly as queued there):
#   (0) the 25 queries registered after the r11 window filled —
#       sweep-green 236/236 but never seen by a driver correctness row;
#       their first rows land this round;
#   (a) the 16 r7-vintage refreshes deferred from r11 (relational
#       set/agg/window/scan ops and simple text/embedding/sample
#       aggregates, operator code untouched since r7) — after this
#       round no registry query's newest driver green predates r8;
#   (b) genuinely-new r12 operators certify in the round that built
#       them, plus changed-lane recerts (q_media_tiff_stats now cycles
#       a CCITT Group 4 bilevel fixture; the JPEG lanes gained
#       EXIF-orientation fixtures via the new q_media_exif_stats).
# Queries registered after this window fills queue FIRST in r13:
# q_doc_scripts (late-r12 Unicode script profiling — sweep-green +
# benched, never driver-seen). The r12 window is exactly 50:
# 25 + 16 backlog + 9 new/changed-lane r12 rows.
_CERTIFY_FIRST = [
    # -- (0) first driver rows (registered post-r11-window) --
    "q_embedding_matryoshka",
    "q_media_augment_stats",
    "q_skew_advisory",
    "q_media_avi_stats",
    "q_media_ico_stats",
    "q_doc_html_strip",
    "q_url_canonical",
    "q_warc_ingest",
    "q_warc_html_extract",
    "q_kmv_distinct",
    "q_kmv_jaccard",
    "q_graph_hits",
    "q_graph_link_pred",
    "q_media_au_pcx_stats",
    "q_ts_holt_winters",
    "q_column_profile",
    "q_doc_sentences",
    "q_sentence_dedup",
    "q_doc_fix_mojibake",
    "q_avro_ingest",
    "q_ts_ccf",
    "q_archive_ingest",
    "q_ts_ols",
    "q_parquet_layout",
    "q_graph_assortativity",
    # -- (a) r7-vintage refreshes deferred from r11 --
    "q_anti_join",
    "q_cube",
    "q_distinct_agg",
    "q_doc_sample_stratified",
    "q_doc_top_terms",
    "q_doc_vocab",
    "q_embedding_norm_stats",
    "q_except",
    "q_intersect",
    "q_interval_overlap",
    "q_range_join_count",
    "q_rollup",
    "q_scalar_string",
    "q_semi_join",
    "q_top20_scan",
    "q_window_running_total",
    # -- (b) new in round 12 + changed-lane recerts --
    "q_media_tiff_stats",
    "q_media_exif_stats",
    "q_crawl_curation",
    "q_doc_pii_redact",
    "q_skew_mitigated_join",
    "q_graph_bfs",
    "q_privacy_dp_counts",
    "q_url_strip_tracking",
    "q_robots_gate",
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
