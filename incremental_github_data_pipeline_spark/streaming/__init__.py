from incremental_github_data_pipeline_spark.streaming.incremental import (  # noqa: F401
    attribution_join,
    dedup_within_watermark,
    enrich_stream_static,
    join_streams_windowed,
    merge_upsert,
    run_incremental_github,
    running_totals_stateful,
    session_attribution,
    session_window_agg,
    stream_json_dir,
    twap_stateful,
    windowed_counts,
)
