"""Row-level deletes (tombstones) on the SegmentStore.

The reference's model is append-only — "updates are new segments"
(SURVEY.md §1.4) — which leaves no way to REMOVE rows (takedown /
right-to-be-forgotten) without rewriting the corpus. The store borrows
Lucene's liveDocs design (the reference's own index lineage): a delete
writes only the matching global row_ids as a tombstone id-list; every
read anti-joins it; segment files and stored index postings keep the
dead rows (as upper bounds) until `purge` materializes the delete in a
forced merge. Global row_ids are invariant under compaction, so
tombstones never rebase; `purge` is the ONE renumbering operation.
"""

import os

import pytest
from pyspark.sql import functions as F

from iodf_spark.operators import index as idx
from iodf_spark.sources.segments import ManifestConflictError, SegmentStore


@pytest.fixture()
def store(tmp_path):
    return SegmentStore(str(tmp_path / "store"))


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 5, f"u{i % 3}") for i in range(lo, hi)], "k long, m long, u string"
    )


def test_delete_where_hides_rows_everywhere(spark, store):
    store.write_segment(_df(spark, 0, 40), order_keys=["k"])
    store.write_segment(_df(spark, 40, 100), order_keys=["k"])
    t = store.delete_where(spark, "m = 2")
    assert t["n"] == 20  # k % 5 == 2 over 0..99
    # open() hides them; row ids of survivors are unchanged (no renumber)
    got = store.open(spark)
    assert got.count() == 80
    assert got.filter("m = 2").count() == 0
    assert got.agg(F.max("row_id")).collect()[0][0] == 99
    # live vs physical accounting, all metadata-only
    assert store.total_rows() == 100
    assert store.live_rows() == 80
    d = store.describe()
    assert (d["n_rows"], d["n_deleted"], d["live_rows"]) == (100, 20, 80)
    # pruned open applies tombstones too
    assert store.open_pruned(spark, [("k", 0, 9)]).filter("m = 2").count() == 0
    # deletes compose; deleting already-dead rows is a no-op
    t2 = store.delete_where(spark, F.col("u") == "u0")
    assert store.open(spark).count() == 80 - t2["n"]
    assert store.delete_where(spark, "m = 2")["n"] == 0


def test_time_travel_sees_pre_delete_rows(spark, store):
    store.write_segment(_df(spark, 0, 30), order_keys=["k"])  # v1
    store.delete_where(spark, "k < 10")  # v2
    assert store.open(spark).count() == 20
    # the pre-delete snapshot still reads all rows (tombstones are part
    # of the versioned manifest, not the segment files)
    assert store.open_at(spark, 1).count() == 30
    assert store.open_at(spark, 2).count() == 20


def test_compaction_preserves_tombstones(spark, store):
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        store.write_segment(_df(spark, lo, hi), order_keys=["k"])
    store.delete_where(spark, "m = 0")
    before = sorted(r["k"] for r in store.open(spark).select("k").collect())
    store.compact(spark)
    after_df = store.open(spark)
    after = sorted(r["k"] for r in after_df.select("k").collect())
    assert before == after  # same live rows
    assert store.live_rows() == len(after)
    # global ids invariant under compaction -> tombstones still aligned
    assert after_df.filter("m = 0").count() == 0


def test_append_after_delete_keeps_tombstones(spark, store):
    store.write_segment(_df(spark, 0, 50), order_keys=["k"])
    store.delete_where(spark, "k >= 40")
    store.write_segment(_df(spark, 100, 120), order_keys=["k"])
    got = store.open(spark)
    assert got.count() == 40 + 20
    assert got.filter("k >= 40 and k < 100").count() == 0
    assert got.filter("k >= 100").count() == 20
    assert store.live_rows() == 60


def test_purge_materializes_and_renumbers(spark, store):
    conf = idx.IndexConf(include=["u"])
    store.write_segment(_df(spark, 0, 60), order_keys=["k"], index_conf=conf,
                        batch_key="b-1")
    store.write_segment(_df(spark, 60, 90), order_keys=["k"], index_conf=conf,
                        batch_key="b-2")
    store.delete_where(spark, "m = 1")
    survivors = [
        r["k"]
        for r in store.open(spark).orderBy("row_id").select("k").collect()
    ]
    entry = store.purge(spark, index_conf=conf)
    assert entry is not None and entry["indexed"]
    doc = store.manifest_doc()
    assert doc["tombstones"] == [] and len(doc["segments"]) == 1
    got = store.open(spark).orderBy("row_id")
    rows = got.collect()
    # dense renumbered id space, original survivor order preserved
    assert [r["row_id"] for r in rows] == list(range(len(survivors)))
    assert [r["k"] for r in rows] == survivors
    assert store.total_rows() == store.live_rows() == len(survivors)
    # rebuilt index probes in the NEW row space
    ps = idx.probe(store.open_index(spark), "u", "u0", store.total_rows(),
                   encoding_hint="auto")
    via_ix = got.join(ps.to_rows(), "row_id", "left_semi")
    assert via_ix.count() == got.filter("u = 'u0'").count()
    # exactly-once keys survive the purge
    assert set(doc["segments"][0]["batch_keys"]) >= {"b-1", "b-2"}
    # purge with nothing to do is a no-op
    assert store.purge(spark) is None


def test_delete_everything_then_purge(spark, store):
    """The degenerate takedown: every row tombstoned, then materialized —
    the store must come back readable and EMPTY, not corrupt."""
    store.write_segment(_df(spark, 0, 25), order_keys=["k"])
    t = store.delete_where(spark, "k >= 0")
    assert t["n"] == 25 and store.live_rows() == 0
    assert store.open(spark).count() == 0
    store.purge(spark)
    assert store.total_rows() == store.live_rows() == 0
    assert store.open(spark).count() == 0
    # and the empty store accepts new appends afterwards
    store.write_segment(_df(spark, 100, 105), order_keys=["k"])
    assert store.open(spark).count() == 5


def test_concurrent_deletes_stay_disjoint(spark, store):
    """Two deletes race; the loser subtracts the winner's ids so
    tombstone sets stay disjoint and live_rows stays exact even though
    the predicates overlap."""
    from iodf_spark.sources.segments import SegmentStore as SS

    store.write_segment(_df(spark, 0, 100), order_keys=["k"])
    b = SS(store.path)
    orig = SS._publish
    state = {"fired": False}

    def racy(entries, base_version=None):
        if not state["fired"]:
            state["fired"] = True
            b.delete_where(spark, "k < 30")  # winner: 30 rows
            raise ManifestConflictError("injected")
        return orig(store, entries, base_version)

    store._publish = racy
    t = store.delete_where(spark, "k < 50")  # overlaps winner by 30
    assert t["n"] == 20  # only the non-overlapping ids
    doc = store.manifest_doc()
    assert sorted(x["n"] for x in doc["tombstones"]) == [20, 30]
    assert store.live_rows() == 50
    assert store.open(spark).count() == 50


def test_vacuum_reclaims_tombstone_files_of_dropped_versions(spark, store):
    import time as _time

    store.write_segment(_df(spark, 0, 20), order_keys=["k"])  # v1
    t = store.delete_where(spark, "k < 5")  # v2
    store.purge(spark)  # v3: tombstones materialized
    del_dir = os.path.join(store.path, t["file"])
    assert os.path.isdir(del_dir)
    # age everything past the grace window, then drop history
    for name in os.listdir(store.path):
        old = _time.time() - store.orphan_grace_seconds - 1
        os.utime(os.path.join(store.path, name), (old, old))
    removed = store.vacuum(keep_last=1)
    assert t["file"] in removed
    assert not os.path.isdir(del_dir)
    assert store.open(spark).count() == 15
