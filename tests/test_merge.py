"""MERGE INTO by key (SegmentStore.merge_by_key) — the lakehouse upsert
composed from the store's delete + append primitives in ONE atomic commit.

The reference is append-only (no row mutation anywhere in its surface,
SURVEY.md §1.4); merge_by_key is the extension a mutable training corpus
needs: replace documents by id, retract them, or insert-if-absent —
without rewriting any committed segment (merge-on-read, Lucene-liveDocs
economics), so a 100 TB upsert costs one id-list + one source-sized
segment + a manifest publish.

Concurrency contract under test: SERIALIZABLE abort-don't-retry — any
commit landing between the merge's snapshot read and its publish aborts
the merge with staged files cleaned (Delta's MERGE rule at Serializable
isolation), including the purge/renumber case.
"""

import os

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import ManifestConflictError, SegmentStore


@pytest.fixture()
def path(tmp_path):
    return str(tmp_path / "store")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _target(spark, path):
    """5-row base store: k=0..4, v=k*10, row_ids 0..4 (ordered by k)."""
    store = SegmentStore(path)
    store.write_segment(_df(spark, [(i, i * 10) for i in range(5)]), order_keys=["k"])
    return store


def _live(spark, store):
    return {
        (r["k"], r["v"], r["row_id"])
        for r in store.open(spark).select("k", "v", "row_id").collect()
    }


def test_upsert_update_and_insert(spark, path):
    store = _target(spark, path)
    src = _df(spark, [(2, 999), (4, 888), (7, 777)])  # 2,4 matched; 7 new
    res = store.merge_by_key(spark, src, on="k", order_keys=["k"])
    assert res["matched"] == 2 and res["appended"] == 3
    # survivors keep their original row_ids; appended rows land at the end
    # of the row space ordered by the given order_keys
    assert _live(spark, store) == {
        (0, 0, 0), (1, 10, 1), (3, 30, 3),
        (2, 999, 5), (4, 888, 6), (7, 777, 7),
    }
    # manifest accounting: one appended segment, one tombstone, exact counts
    doc = store.manifest_doc()
    assert len(doc["segments"]) == 2 and len(doc["tombstones"]) == 1
    assert doc["tombstones"][0]["n"] == 2
    assert store.live_rows() == 6 and store.total_rows() == 8


def test_update_without_insert_skips_new_keys(spark, path):
    store = _target(spark, path)
    res = store.merge_by_key(
        spark, _df(spark, [(1, 111), (9, 900)]), on="k",
        insert=False, order_keys=["k"],
    )
    assert res["matched"] == 1 and res["appended"] == 1
    assert _live(spark, store) == {
        (0, 0, 0), (2, 20, 2), (3, 30, 3), (4, 40, 4), (1, 111, 5),
    }


def test_when_matched_delete(spark, path):
    store = _target(spark, path)
    res = store.merge_by_key(
        spark, _df(spark, [(0, -1), (3, -1), (8, 80)]), on="k",
        when_matched="delete", order_keys=["k"],
    )
    # 0 and 3 retracted; 8 (unmatched) inserted
    assert res["matched"] == 2 and res["appended"] == 1
    assert _live(spark, store) == {
        (1, 10, 1), (2, 20, 2), (4, 40, 4), (8, 80, 5),
    }


def test_when_matched_ignore_is_insert_only(spark, path):
    store = _target(spark, path)
    res = store.merge_by_key(
        spark, _df(spark, [(2, 999), (6, 60)]), on="k",
        when_matched="ignore", order_keys=["k"],
    )
    # matched row keeps its ORIGINAL value; only the new key lands
    assert res["matched"] == 0 and res["appended"] == 1
    assert _live(spark, store) == {
        (0, 0, 0), (1, 10, 1), (2, 20, 2), (3, 30, 3), (4, 40, 4), (6, 60, 5),
    }
    assert store.manifest_doc()["tombstones"] == []


def test_merge_into_empty_store_inserts_everything(spark, path):
    """First batch of a streaming upsert lands on a store with no
    segments: nothing can match, every source row inserts."""
    store = SegmentStore(path)
    res = store.merge_by_key(
        spark, _df(spark, [(1, 10), (2, 20)]), on="k", order_keys=["k"]
    )
    assert res["matched"] == 0 and res["appended"] == 2
    assert _live(spark, store) == {(1, 10, 0), (2, 20, 1)}


def test_noop_merge_publishes_nothing(spark, path):
    store = _target(spark, path)
    v_before = store.versions()[-1]
    # insert-only merge whose every key already exists: no victims, no rows
    res = store.merge_by_key(
        spark, _df(spark, [(1, 111), (2, 222)]), on="k",
        when_matched="ignore",
    )
    assert res == {"matched": 0, "appended": 0, "tombstone": None, "segment": None}
    assert store.versions()[-1] == v_before


def test_multi_column_key(spark, path):
    store = SegmentStore(path)
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 30)], "k long, g string, v long"
    )
    store.write_segment(df, order_keys=["k", "g"])
    src = spark.createDataFrame(
        [(1, "b", 999), (2, "b", 40)], "k long, g string, v long"
    )
    res = store.merge_by_key(spark, src, on=["k", "g"], order_keys=["k", "g"])
    assert res["matched"] == 1 and res["appended"] == 2
    got = {
        (r["k"], r["g"], r["v"])
        for r in store.open(spark).select("k", "g", "v").collect()
    }
    assert got == {(1, "a", 10), (1, "b", 999), (2, "a", 30), (2, "b", 40)}


def test_source_row_id_column_is_restamped(spark, path):
    store = _target(spark, path)
    # a source read from another store carries row_id — those ids are
    # meaningless here and must be re-stamped, not trusted
    src = _df(spark, [(9, 90)]).withColumn("row_id", F.lit(0).cast("long"))
    store.merge_by_key(spark, src, on="k", order_keys=["k"])
    rows = {
        (r["k"], r["row_id"])
        for r in store.open(spark).select("k", "row_id").collect()
    }
    assert (9, 5) in rows and (9, 0) not in rows


def test_change_feed_shows_upsert_as_delete_plus_insert(spark, path):
    store = _target(spark, path)
    v0 = store.versions()[-1]
    store.merge_by_key(spark, _df(spark, [(2, 999), (7, 777)]), on="k",
                       order_keys=["k"])
    delta = store.read_changes(spark, v0).collect()
    dels = {r["row_id"] for r in delta if r["_change_type"] == "delete"}
    ins = {(r["k"], r["v"], r["row_id"]) for r in delta
           if r["_change_type"] == "insert"}
    # one version carries the CDC pre-image (old id retracted) and the
    # post-image (new row at the end of the row space)
    assert dels == {2}
    assert ins == {(2, 999, 5), (7, 777, 6)}


def _inject_then_conflict(victim, competitor_action):
    orig = SegmentStore._publish
    state = {"fired": False}

    def racy(entries, base_version=None):
        if not state["fired"]:
            state["fired"] = True
            competitor_action()
            raise ManifestConflictError("injected: competitor claimed the version")
        return orig(victim, entries, base_version)

    victim._publish = racy
    return state


def test_merge_aborts_on_concurrent_commit_and_cleans_staging(spark, path):
    """A commit landing inside the merge window invalidates its read set:
    the merge must ABORT (not retry) and leave no staged files behind."""
    a, b = _target(spark, path), SegmentStore(path)
    pre_live = _live(spark, a)
    pre_files = set(os.listdir(path))
    _inject_then_conflict(
        a, lambda: b.write_segment(_df(spark, [(2, 21)]), order_keys=["k"])
    )
    with pytest.raises(ManifestConflictError, match="re-run merge_by_key"):
        a.merge_by_key(spark, _df(spark, [(2, 999)]), on="k", order_keys=["k"])
    fresh = SegmentStore(path)
    # the competitor's append committed; the merge left NOTHING — no
    # manifest change beyond the competitor's, no orphan del-*/seg-* dirs
    assert fresh.manifest_doc()["tombstones"] == []
    assert {(r["k"], r["v"]) for r in fresh.open(spark).select("k", "v").collect()} \
        == {(k, v) for k, v, _ in pre_live} | {(2, 21)}
    referenced = {f"seg-{e['segment_id']:05d}" for e in fresh.manifest()}
    leftover = set(os.listdir(path)) - pre_files
    assert all(
        f.startswith("manifest") or f in referenced for f in leftover
    ), f"staged merge files survived the abort: {leftover}"


def test_merge_aborts_on_concurrent_purge(spark, path):
    """Purge renumbers the row space inside the merge window — the abort
    contract covers it as just another intervening commit."""
    a, b = _target(spark, path), SegmentStore(path)
    a.delete_where(spark, "k = 0")
    _inject_then_conflict(a, lambda: b.purge(spark))
    with pytest.raises(ManifestConflictError, match="re-run merge_by_key"):
        a.merge_by_key(spark, _df(spark, [(2, 999)]), on="k", order_keys=["k"])
    fresh = SegmentStore(path)
    assert fresh.manifest_doc()["renumber_epoch"] == 1
    assert fresh.live_rows() == 4
