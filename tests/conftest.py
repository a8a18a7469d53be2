import os

import pytest

from iodf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("iodf_spark_tests")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
