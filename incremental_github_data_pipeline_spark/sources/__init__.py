"""Sources & sinks (SURVEY.md §2.1).

``readers``  schema'd JSON/CSV/parquet readers with structural validation (S5/S6)
``writers``  rotating snapshot writers (S4/S7) and the audit sink (S10)
``rest``     GitHub REST ingestion: pagination, fan-out, auth preflight (S1-S3, S9)
"""

from incremental_github_data_pipeline_spark.sources.readers import (  # noqa: F401
    read_json_array,
    read_parquet_table,
    read_table,
)
from incremental_github_data_pipeline_spark.sources.writers import (  # noqa: F401
    AuditLog,
    write_rotating,
)
