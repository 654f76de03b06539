from incremental_github_data_pipeline_spark.plans import expectations  # noqa: F401
