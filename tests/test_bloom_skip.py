"""Bloom membership bitsets in the manifest: POINT-lookup segment
skipping for unsorted high-cardinality keys — the workload zone maps
cannot prune (a shuffled user id's min/max envelope spans every
segment). Parquet bloom filters / Delta file skipping, at segment
grain; probes are pure driver-side Python (the sha256 bit positions are
recomputed identically to the Spark build expression — pinned here)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iodf_spark.sources.segments import (
    SegmentStore,
    _bloom_positions_py,
    _bloom_test,
)


@pytest.fixture()
def store(tmp_path):
    return SegmentStore(str(tmp_path / "store"))


def _users(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"user-{i}") for i in range(lo, hi)], "k long, uid string"
    )


def test_point_pruning_and_superset_guarantee(spark, store):
    for lo, hi in [(0, 400), (400, 800), (800, 1200)]:
        store.write_segment(
            _users(spark, lo, hi), order_keys=["k"], bloom_cols=["uid", "k"]
        )
    # a uid that lives only in segment 2: bloom keeps ~1 of 3 segments
    kept = store.pruned_entries_point("uid", "user-650")
    assert 1 <= len(kept) < 3
    assert any(e["segment_id"] == 1 for e in kept)
    # superset read equals the full-scan filter, global ids preserved
    via_point = (
        store.open_point(spark, "uid", "user-650")
        .filter(F.col("uid") == "user-650")
        .collect()
    )
    via_full = (
        store.open(spark).filter(F.col("uid") == "user-650").collect()
    )
    assert via_point == via_full and via_point[0]["row_id"] == 650
    # integer keys prune too
    assert 1 <= len(store.pruned_entries_point("k", 42)) < 3
    # an absent value usually prunes everything (never a false negative)
    assert len(store.pruned_entries_point("uid", "user-999999")) <= 1
    assert store.open_point(spark, "uid", "user-999999").filter(
        "uid = 'user-999999'"
    ).count() == 0
    # segments without a bloom for the column are conservatively kept
    store.write_segment(_users(spark, 2000, 2010), order_keys=["k"])
    assert any(
        "blooms" not in e or "uid" not in e["blooms"]
        for e in store.pruned_entries_point("uid", "user-999999")
    )
    assert store.describe()["bloom_columns"] == []  # not on EVERY segment


def test_compaction_merges_blooms_without_rescan(spark, store):
    for lo, hi in [(0, 100), (100, 200), (200, 300)]:
        store.write_segment(
            _users(spark, lo, hi), order_keys=["k"], bloom_cols=["uid"]
        )
    store.compact(spark)
    [entry] = store.manifest()
    assert "uid" in entry.get("blooms", {})
    # merged bloom answers for every member's values (bitwise-OR union)
    for probe in ["user-5", "user-150", "user-299"]:
        assert len(store.pruned_entries_point("uid", probe)) == 1
    assert store.describe()["bloom_columns"] == ["uid"]


def test_float_columns_refused(spark, store):
    df = spark.createDataFrame([(1, 0.5)], "k long, x double")
    with pytest.raises(ValueError, match="zone maps"):
        store.write_segment(df, order_keys=["k"], bloom_cols=["x"])


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    st.one_of(
        st.integers(-(2**40), 2**40),
        st.text(min_size=0, max_size=24),
    )
)
def test_no_false_negatives_spark_python_hash_parity(bloom_fixture, value):
    """The driver-side Python positions must match the Spark build
    expression for ANY value actually written — a mismatch would create
    false negatives (silently dropped rows). The fixture wrote a corpus
    of adversarial values through the SPARK path; here every one must
    test positive through the PYTHON path."""
    blob, m, k, written = bloom_fixture
    if value in written:
        assert _bloom_test(blob, m, k, value)
    # and positions are always in range for any probe value
    assert all(0 <= p < m for p in _bloom_positions_py(value, m, k))


@pytest.fixture(scope="module")
def bloom_fixture(spark, tmp_path_factory):
    values = [
        "", "a", "user-1", "ünïcødé-∆", "tab\there", "'quote'", '"dq"',
        "-1", "0", "1", str(2**40), str(-(2**40)), "None", "null",
    ]
    ints = [-(2**40), -1, 0, 1, 7, 2**40]
    store = SegmentStore(str(tmp_path_factory.mktemp("bloom") / "s"))
    sdf = spark.createDataFrame([(v,) for v in values], "uid string")
    idf = spark.createDataFrame([(v,) for v in ints], "k long")
    e1 = store.write_segment(sdf, order_keys=["uid"], bloom_cols=["uid"])
    e2 = store.write_segment(idf, order_keys=["k"], bloom_cols=["k"])
    b1, b2 = e1["blooms"]["uid"], e2["blooms"]["k"]
    # every written string value tests positive via the Python path
    for v in values:
        assert _bloom_test(b1["bits"], b1["m"], b1["k"], v), v
    for v in ints:
        assert _bloom_test(b2["bits"], b2["m"], b2["k"], v), v
    return b1["bits"], b1["m"], b1["k"], set(values)
