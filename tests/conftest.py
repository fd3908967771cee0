from __future__ import annotations

import os

import pytest

from detector_network_processor_spark.session import get_spark

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="dnp-spark-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield spark
    spark.stop()
