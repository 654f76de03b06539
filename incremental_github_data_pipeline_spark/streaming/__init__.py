from incremental_github_data_pipeline_spark.streaming.incremental import (  # noqa: F401
    dedup_within_watermark,
    merge_upsert,
    run_incremental_github,
    running_totals_stateful,
    session_window_agg,
    stream_json_dir,
    windowed_counts,
)
