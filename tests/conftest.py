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


@pytest.fixture(params=["posix", "objectstore"])
def fsio_backend(request):
    """Run a test against each fsio backend: the POSIX one (rename/link
    atomicity) and the object-store one (conditional-put/copy-list-delete
    semantics, no rename(2)/link(2)/exclusive-mkdir anywhere). The OCC and
    ANN-maintenance suites opt in with an autouse shim so every
    crash-safety claim is proven against both."""
    from iodf_spark.sources import fsio

    backend = (
        fsio.PosixBackend()
        if request.param == "posix"
        else fsio.ObjectStoreBackend()
    )
    with fsio.using_backend(backend):
        yield request.param
