import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ratatool_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").cache()


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()
