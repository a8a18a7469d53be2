"""Incremental change feed (read_changes, Delta-CDF shape): a consumer
at snapshot v catches up by reading only appended-and-still-live rows
plus the tombstoned ids it already holds — never a corpus rescan. Pure
manifest math picks the segments to open (appends land strictly at the
end of the invariant row space); purge renumbers and must refuse a
delta."""

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import SegmentStore


@pytest.fixture()
def store(tmp_path):
    return SegmentStore(str(tmp_path / "store"))


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 4) for i in range(lo, hi)], "k long, m long"
    )


def test_appends_and_deletes_feed_incrementally(spark, store):
    store.write_segment(_df(spark, 0, 50), order_keys=["k"])  # v1
    store.write_segment(_df(spark, 50, 80), order_keys=["k"])  # v2
    store.delete_where(spark, "k < 10")  # v3
    store.write_segment(_df(spark, 80, 90), order_keys=["k"])  # v4

    ch = store.read_changes(spark, 1)
    ins = ch.filter("_change_type = 'insert'")
    dels = ch.filter("_change_type = 'delete'")
    # inserts: everything appended after v1 (none of it deleted)
    assert sorted(r["k"] for r in ins.collect()) == list(range(50, 90))
    # deletes: the tombstoned ids the v1 consumer already holds
    assert sorted(r["row_id"] for r in dels.collect()) == list(range(10))
    assert dels.agg(F.count("k")).collect()[0][0] == 0  # data cols null

    # a narrower window: v2 -> v3 is deletes only
    ch23 = store.read_changes(spark, 2, 3)
    assert ch23.filter("_change_type = 'insert'").count() == 0
    assert ch23.filter("_change_type = 'delete'").count() == 10
    # empty window: zero rows but the FULL data schema (consumers union
    # deltas across windows)
    empty = store.read_changes(spark, 4, 4)
    assert empty.count() == 0
    assert set(empty.columns) >= {"row_id", "k", "m", "_change_type"}


def test_rows_inserted_and_deleted_inside_window_are_omitted(spark, store):
    store.write_segment(_df(spark, 0, 20), order_keys=["k"])  # v1
    store.write_segment(_df(spark, 100, 120), order_keys=["k"])  # v2
    store.delete_where(spark, "k >= 110")  # v3: kills 10 of the new rows
    ch = store.read_changes(spark, 1)
    ins = ch.filter("_change_type = 'insert'")
    # the consumer never saw k in [110,120): not an insert, not a delete
    assert sorted(r["k"] for r in ins.collect()) == list(range(100, 110))
    assert ch.filter("_change_type = 'delete'").count() == 0


def test_compaction_window_is_transparent(spark, store):
    store.write_segment(_df(spark, 0, 30), order_keys=["k"])  # v1
    store.write_segment(_df(spark, 30, 60), order_keys=["k"])  # v2
    store.compact(spark)  # v3: rewrite, ids invariant
    store.write_segment(_df(spark, 60, 70), order_keys=["k"])  # v4
    ch = store.read_changes(spark, 2)
    # the compacted rewrite of rows the consumer holds is NOT a change
    assert sorted(r["k"] for r in ch.collect()) == list(range(60, 70))
    assert ch.filter("_change_type = 'delete'").count() == 0


def test_purge_window_refuses_delta(spark, store):
    store.write_segment(_df(spark, 0, 40), order_keys=["k"])  # v1
    store.delete_where(spark, "k < 5")  # v2
    store.purge(spark)  # v3: renumbered
    with pytest.raises(ValueError, match="full refresh"):
        store.read_changes(spark, 1)
    # but a post-purge consumer feeds incrementally again
    store.write_segment(_df(spark, 200, 210), order_keys=["k"])  # v4
    ch = store.read_changes(spark, 3)
    assert sorted(r["k"] for r in ch.collect()) == list(range(200, 210))


def test_delete_purge_append_window_detected(spark, store):
    """MEDIUM pin: the old purge detector (total shrank / tombstone files
    vanished) had a false-negative window — from_version carries no
    tombstones (the empty set is a subset of everything) and post-purge
    appends regrow the total past from_total. The renumber epoch closes
    it: the delta must be refused, not silently mapped onto a renumbered
    row space."""
    store.write_segment(_df(spark, 0, 40), order_keys=["k"])  # v1: no tombs
    store.delete_where(spark, "k < 20")  # v2
    store.purge(spark)  # v3: renumbered, tombstones emptied
    store.write_segment(_df(spark, 100, 140), order_keys=["k"])  # v4: 60 >= 40
    to_doc = store.manifest_doc()
    assert sum(e["n_rows"] for e in to_doc["segments"]) >= 40  # regrown
    assert to_doc["tombstones"] == []  # old heuristic sees nothing wrong
    with pytest.raises(ValueError, match="full refresh"):
        store.read_changes(spark, 1)
