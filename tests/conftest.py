import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from indexlab_spark.session import get_spark

    sp = get_spark(
        "indexlab-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield sp


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from indexlab_spark.session import load_tables

    return load_tables(spark, sf_dir)
