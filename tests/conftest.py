from __future__ import annotations

import pytest

from incremental_github_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"
REF_RAW = "/root/reference/data/raw_data"
REF_CLEAN = "/root/reference/data/clean_data"
