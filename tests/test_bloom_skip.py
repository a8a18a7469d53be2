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


def test_coercing_probe_never_false_negative(spark, store):
    """MEDIUM pin: the build hashed CAST(col AS STRING); a raw str(value)
    probe diverges under Spark's coercing equality — probing an int column
    with the float 1.0 hashed '1.0' vs stored '1' and PRUNED segments
    `1.0 == 1` matches (silently dropped rows). Probe values are now
    canonicalized against the bloom's stored column kind."""
    store.write_segment(_users(spark, 0, 400), order_keys=["k"], bloom_cols=["k", "uid"])
    store.write_segment(_users(spark, 400, 800), order_keys=["k"], bloom_cols=["k", "uid"])
    # float probe of an int column: 42.0 must keep segment 0 (42 lives there)
    kept = store.pruned_entries_point("k", 42.0)
    assert any(e["segment_id"] == 0 for e in kept)
    # and the coercing read agrees with the full scan
    assert (
        store.open_point(spark, "k", 42.0).filter(F.col("k") == 42.0).count()
        == store.open(spark).filter(F.col("k") == 42.0).count()
        == 1
    )
    # bool probe of an int column containing 1: str(True)='True' would
    # false-negative; canonicalized to '1' it keeps segment 0
    assert any(e["segment_id"] == 0 for e in store.pruned_entries_point("k", True))
    # cross-family probes cannot be replayed against exact-string hashes:
    # they must SKIP pruning (keep everything), never prune wrongly
    assert len(store.pruned_entries_point("k", "42")) == 2  # str vs int col
    assert len(store.pruned_entries_point("uid", 7)) == 2  # int vs str col
    assert len(store.pruned_entries_point("k", 1.5)) == 2  # fractional float
    # exact probes still prune
    assert len(store.pruned_entries_point("k", 42)) < 2
    assert len(store.pruned_entries_point("uid", "user-650")) < 2


def test_bloom_geometry_auto_sizing_and_fpp(spark, store):
    """Auto geometry: m,k derive from the segment's row count at the
    target fpp (the round-5 fixed 64 Kbit saturated at large segments).
    Measured fpp over absent keys must respect a loose bound of the
    design target."""
    from iodf_spark.sources.segments import _bloom_geometry, _bloom_may_contain

    # formula shape: m grows ~linearly in n, k stays near (m/n)ln2
    m1, k1 = _bloom_geometry(1_000)
    m2, k2 = _bloom_geometry(100_000)
    assert m1 % 64 == 0 and m2 % 64 == 0
    assert 9 * 1_000 < m1 < 11 * 1_000  # ~9.6 bits/key at fpp=0.01
    assert 9 * 100_000 < m2 < 11 * 100_000
    assert 1 <= k1 <= 8 and 1 <= k2 <= 8
    # the budget cap binds eventually
    m3, _ = _bloom_geometry(10**9)
    assert m3 == 1 << 20
    # measured fpp: 5k-key bloom probed with 2k absent keys
    e = store.write_segment(
        _users(spark, 0, 5000), order_keys=["k"], bloom_cols=["uid"]
    )
    b = e["blooms"]["uid"]
    false_pos = sum(
        _bloom_may_contain(b, f"user-{i}") for i in range(10_000, 12_000)
    )
    assert false_pos / 2000 < 0.05  # target 0.01, loose 5x bound


def test_saturated_bloom_dropped_and_flagged(spark, store):
    """A bitset past ~50% fill prunes nothing (fpp -> 1) while still
    costing manifest bytes: the build must drop it and flag the column,
    not advertise dead pruning metadata."""
    e = store.write_segment(
        _users(spark, 0, 3000),
        order_keys=["k"],
        bloom_cols=["uid"],
        # pin a geometry far too small for 3000 keys: saturates
        bloom_m=256,
        bloom_k=4,
    )
    assert "uid" in e.get("blooms_dropped", [])
    assert "uid" not in (e.get("blooms") or {})
    # absence of a bloom = conservatively kept: no false negatives
    assert len(store.pruned_entries_point("uid", "user-1")) == 1


def test_compaction_rebuilds_saturating_bloom_union(spark, store):
    """OR-merging healthy blooms from a big run saturates the shared
    geometry; compaction must REBUILD those columns at the merged row
    count's geometry (it is rewriting the data anyway) so the target fpp
    survives merge levels instead of quietly decaying."""
    for lo in range(0, 4000, 1000):
        store.write_segment(
            _users(spark, lo, lo + 1000), order_keys=["k"], bloom_cols=["uid"]
        )
    store.compact(spark)
    [entry] = store.manifest()
    b = entry.get("blooms", {}).get("uid")
    assert b is not None, "merged bloom was dropped instead of rebuilt"
    # rebuilt at the 4000-row geometry, not the per-1000-row one
    from iodf_spark.sources.segments import _bloom_fill, _bloom_geometry

    assert b["m"] == _bloom_geometry(4000)[0]
    assert _bloom_fill(b["bits"], b["m"]) <= 0.6
    # it still answers for every member's values
    for probe in ["user-5", "user-1500", "user-3999"]:
        assert len(store.pruned_entries_point("uid", probe)) == 1
