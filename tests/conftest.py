from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from monitoring_data_ingestion_spark.session import get_spark

    s = get_spark(app_name="mdi-spark-tests", shuffle_partitions=8)
    yield s
    from monitoring_data_ingestion_spark.plans.catalog import release_caches

    release_caches()
