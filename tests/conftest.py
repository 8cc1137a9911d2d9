from __future__ import annotations

import pytest

from coltt_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="coltt_spark_tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()
