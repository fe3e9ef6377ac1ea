import os

import pytest
from pyspark.sql import SparkSession

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests: small local parallelism


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from data_integration_est_spark.session import get_spark

    s = get_spark(app_name="di-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
