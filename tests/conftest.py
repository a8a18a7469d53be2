import os

import pytest

from iodf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Test tiers. The suite outgrew a single-invocation budget (618 tests,
# ~1.5 h wall: round-13 shipped with the independent pytest run cut off
# mid-suite — a verification gap, not a failure). The default invocation
# (`pytest tests/`) therefore runs the FAST tier: every test's logic at
# least once, with the expensive re-parameterizations (the second and third
# fsio backends) and the long crash/replay sweeps marked `slow` and
# deselected. The FULL suite still runs with `--runslow` (or
# SPARK_GRAFT_FULL_TESTS=1) and stays the bar for store/OCC changes.


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (full tier)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running re-parameterizations and crash sweeps; "
        "deselected by default, run with --runslow or SPARK_GRAFT_FULL_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier (run with --runslow or SPARK_GRAFT_FULL_TESTS=1)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def spark():
    return get_spark("iodf_spark_tests")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(
    params=[
        "posix",
        # the second and third backends re-run identical test LOGIC against
        # a different fsio seam — full-tier only (the fast tier still runs
        # every test once, on posix)
        pytest.param("objectstore", marks=pytest.mark.slow),
        pytest.param("strictobjectstore", marks=pytest.mark.slow),
    ]
)
def fsio_backend(request):
    """Run a test against each fsio backend: the POSIX one (rename/link
    atomicity), the object-store one (conditional-put/copy-list-delete
    semantics, no rename(2)/link(2)/exclusive-mkdir anywhere), and the
    STRICT object-store one (round 12: metadata objects live ONLY in an
    in-memory dict — a store code path that reads metadata with a bare
    open()/os.path.* instead of the fsio seam sees nothing and fails
    loudly, instead of silently working against emulator-local files).
    The OCC and ANN-maintenance suites opt in with an autouse shim so
    every crash-safety claim is proven against all three."""
    from iodf_spark.sources import fsio

    backend = {
        "posix": fsio.PosixBackend,
        "objectstore": fsio.ObjectStoreBackend,
        "strictobjectstore": fsio.StrictObjectStoreBackend,
    }[request.param]()
    with fsio.using_backend(backend):
        yield request.param


def backdate_tree(path, ts):
    """Test harness for grace windows: age a path the way fsio.mtime now
    measures it — the NEWEST write under the prefix (object stores have
    no directory inodes) — so every file AND dir gets the old timestamp,
    not just the top-level inode."""
    import os

    os.utime(path, (ts, ts))
    for root, dirs, files in os.walk(path):
        for n in dirs + files:
            os.utime(os.path.join(root, n), (ts, ts))
