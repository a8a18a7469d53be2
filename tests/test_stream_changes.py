"""Streaming change-feed consumer (stream_changes): the READ twin of the
micro-batch segment ingest — a durable-cursor catch-up loop over
SegmentStore.read_changes. Interleaves appends, deletes, compactions and
purges with consumer catch-ups and asserts the consumer sees exactly the
deltas (never a corpus rescan), replays on crash (at-least-once), and gets
a clean FullRefreshRequired across a purge."""

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import SegmentStore
from iodf_spark.streaming.ingest import (
    FullRefreshRequired,
    read_cdf_cursor,
    seed_changes,
    stream_changes,
)


@pytest.fixture(autouse=True)
def _both_backends(fsio_backend):
    """The CDC cursor and every store commit in this suite run against
    BOTH fsio backends — the durable-cursor catch-up loop is driver-side
    store metadata like any manifest (round 11 routed _write_cdf_cursor
    through the seam)."""
    yield


@pytest.fixture()
def store(tmp_path):
    return SegmentStore(str(tmp_path / "store"))


@pytest.fixture()
def ckpt(tmp_path):
    return str(tmp_path / "ckpt")


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 4) for i in range(lo, hi)], "k long, m long"
    )


class Sink:
    """Records every processed delta as plain rows (the idempotent-sink
    stand-in); exposes the consumer's materialized view for asserts."""

    def __init__(self):
        self.batches = []

    def __call__(self, delta, from_v, to_v):
        self.batches.append((from_v, to_v, delta.collect()))

    def live_keys(self):
        alive = {}
        for _, _, rows in self.batches:
            for r in rows:
                if r["_change_type"] == "insert":
                    alive[r["row_id"]] = r["k"]
                else:
                    alive.pop(r["row_id"], None)
        return sorted(alive.values())


def test_interleaved_appends_deletes_compaction(spark, store, ckpt):
    store.write_segment(_df(spark, 0, 30), order_keys=["k"])  # v1
    sink = Sink()
    seeded_v = seed_changes(spark, store, ckpt, sink)
    assert seeded_v == 1
    assert sink.live_keys() == list(range(30))
    # caught up: a tick with nothing outstanding is a zero-window no-op
    assert stream_changes(spark, store, ckpt, sink) == []

    store.write_segment(_df(spark, 30, 50), order_keys=["k"])  # v2
    store.delete_where(spark, "k < 5")  # v3
    assert stream_changes(spark, store, ckpt, sink) == [(1, 3)]
    assert sink.live_keys() == list(range(5, 50))
    # the coalesced delta carried only the outstanding rows, not the corpus
    _, _, rows = sink.batches[-1]
    assert sum(r["_change_type"] == "insert" for r in rows) == 20
    assert sum(r["_change_type"] == "delete" for r in rows) == 5

    # compaction is transparent to the feed (row ids invariant)
    store.compact(spark)  # v4
    store.write_segment(_df(spark, 50, 55), order_keys=["k"])  # v5
    assert stream_changes(spark, store, ckpt, sink) == [(3, 5)]
    assert sink.live_keys() == list(range(5, 55))
    # the consumer's view equals the store's live rows at every catch-up
    assert sink.live_keys() == sorted(
        r["k"] for r in store.open(spark).collect()
    )


def test_batched_version_stepping(spark, store, ckpt):
    store.write_segment(_df(spark, 0, 10), order_keys=["k"])  # v1
    sink = Sink()
    seed_changes(spark, store, ckpt, sink)
    for lo in range(10, 50, 10):
        store.write_segment(_df(spark, lo, lo + 10), order_keys=["k"])  # v2..v5
    assert stream_changes(spark, store, ckpt, sink, batch_versions=2) == [
        (1, 3),
        (3, 5),
    ]
    assert sink.live_keys() == list(range(50))


def test_crash_between_process_and_cursor_replays(spark, store, ckpt):
    """At-least-once: a consumer that dies AFTER processing but BEFORE the
    cursor write re-reads the same window on restart — the delta, being a
    pure function of (from, to) manifests, is identical."""
    store.write_segment(_df(spark, 0, 10), order_keys=["k"])  # v1
    sink = Sink()
    seed_changes(spark, store, ckpt, sink)
    store.write_segment(_df(spark, 10, 20), order_keys=["k"])  # v2

    boom = {"armed": True}

    def crashy(delta, from_v, to_v):
        sink(delta, from_v, to_v)
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("sink died after processing")

    with pytest.raises(RuntimeError, match="sink died"):
        stream_changes(spark, store, ckpt, crashy)
    assert read_cdf_cursor(ckpt)["version"] == 1  # cursor did NOT advance
    assert stream_changes(spark, store, ckpt, crashy) == [(1, 2)]  # replay
    first, second = sink.batches[-2], sink.batches[-1]
    assert first[:2] == second[:2] and sorted(first[2]) == sorted(second[2])


def test_purge_raises_full_refresh_and_reseed_recovers(spark, store, ckpt):
    store.write_segment(_df(spark, 0, 40), order_keys=["k"])  # v1
    sink = Sink()
    seed_changes(spark, store, ckpt, sink)
    store.delete_where(spark, "k < 10")  # v2
    store.purge(spark)  # v3: renumbered
    store.write_segment(_df(spark, 100, 110), order_keys=["k"])  # v4
    with pytest.raises(FullRefreshRequired, match="re-seed"):
        stream_changes(spark, store, ckpt, sink)
    # recovery contract: re-seed from the fresh snapshot, then incremental
    seed_changes(spark, store, ckpt, sink := Sink())
    assert sink.live_keys() == list(range(10, 40)) + list(range(100, 110))
    store.write_segment(_df(spark, 200, 205), order_keys=["k"])  # v5
    assert stream_changes(spark, store, ckpt, sink) == [(4, 5)]
    assert sink.live_keys()[-5:] == list(range(200, 205))


def test_unseeded_and_vacuumed_cursor_raise(spark, store, ckpt):
    store.write_segment(_df(spark, 0, 10), order_keys=["k"])  # v1
    with pytest.raises(FullRefreshRequired, match="seed"):
        stream_changes(spark, store, ckpt, lambda *a: None)
    sink = Sink()
    seed_changes(spark, store, ckpt, sink)
    store.write_segment(_df(spark, 10, 20), order_keys=["k"])  # v2
    store.write_segment(_df(spark, 20, 30), order_keys=["k"])  # v3
    store.vacuum(keep_last=1)  # drops the cursor's version file
    with pytest.raises(FullRefreshRequired, match="vacuumed"):
        stream_changes(spark, store, ckpt, sink)


# -- store-to-store mirror (CDC apply side) ---------------------------------


def _mirror_fixture(tmp_path, name):
    return (
        SegmentStore(str(tmp_path / f"{name}_dst")),
        str(tmp_path / f"{name}_ckpt"),
    )


def _live_pairs(spark, store, src_id_col="row_id"):
    return sorted(
        (r[src_id_col], r["k"]) for r in store.open(spark).collect()
    )


def test_mirror_tracks_appends_and_deletes(spark, store, tmp_path):
    from iodf_spark.streaming.ingest import mirror_changes

    dst, ckpt = _mirror_fixture(tmp_path, "m1")
    store.write_segment(_df(spark, 0, 30), order_keys=["k"])  # v1
    # first call seeds the full snapshot, then reports caught-up
    windows = mirror_changes(spark, store, dst, ckpt)
    assert windows == [(0, 1)]
    assert _live_pairs(spark, dst, "_src_row_id") == _live_pairs(spark, store)
    # interleave appends + a delete; one catch-up applies the whole delta
    store.write_segment(_df(spark, 30, 50), order_keys=["k"])  # v2
    store.delete_where(spark, "k < 5")  # v3
    assert mirror_changes(spark, store, dst, ckpt) == [(1, 3)]
    assert _live_pairs(spark, dst, "_src_row_id") == _live_pairs(spark, store)
    # the mirror paid for the delta: its second segment holds ONLY the 20
    # appended rows, and the delete arrived as tombstones, not a rewrite
    assert [e["n_rows"] for e in dst.manifest()] == [30, 20]
    assert dst.live_rows() == store.live_rows() == 45
    # caught up -> no-op
    assert mirror_changes(spark, store, dst, ckpt) == []


def test_mirror_replay_is_exactly_once(spark, store, tmp_path):
    """Crash AFTER the insert append but BEFORE the cursor write: the
    replayed window must not duplicate the segment (batch_key ledger) nor
    re-delete (dead rows stay dead) — at-least-once delivery + idempotent
    apply = exactly-once mirror state."""
    from iodf_spark.streaming.ingest import mirror_changes, read_cdf_cursor

    dst, ckpt = _mirror_fixture(tmp_path, "m2")
    store.write_segment(_df(spark, 0, 10), order_keys=["k"])  # v1
    mirror_changes(spark, store, dst, ckpt)
    store.write_segment(_df(spark, 10, 20), order_keys=["k"])  # v2
    # delete PRE-window rows so the delta carries visible delete events
    # (an insert-and-delete inside one window is omitted by read_changes)
    store.delete_where(spark, "k < 5")  # v3
    # simulate the crash: apply the window once with the cursor write
    # suppressed, then run the normal loop (which replays the same window)
    import iodf_spark.streaming.ingest as ing

    real_write = ing._write_cdf_cursor
    try:
        ing._write_cdf_cursor = lambda *a, **k: None
        mirror_changes(spark, store, dst, ckpt)
    finally:
        ing._write_cdf_cursor = real_write
    assert read_cdf_cursor(ckpt)["version"] == 1  # crash before cursor
    assert mirror_changes(spark, store, dst, ckpt) == [(1, 3)]  # replay
    assert [e["n_rows"] for e in dst.manifest()] == [10, 10]  # no dup segment
    assert dst.live_rows() == store.live_rows() == 15
    assert _live_pairs(spark, dst, "_src_row_id") == _live_pairs(spark, store)


def test_mirror_purge_demands_full_refresh(spark, store, tmp_path):
    from iodf_spark.streaming.ingest import mirror_changes

    dst, ckpt = _mirror_fixture(tmp_path, "m3")
    store.write_segment(_df(spark, 0, 20), order_keys=["k"])  # v1
    mirror_changes(spark, store, dst, ckpt)
    store.delete_where(spark, "k < 4")  # v2
    store.purge(spark)  # v3
    with pytest.raises(FullRefreshRequired):
        mirror_changes(spark, store, dst, ckpt)
    # recovery: fresh mirror from the renumbered store
    dst2, ckpt2 = _mirror_fixture(tmp_path, "m3b")
    mirror_changes(spark, store, dst2, ckpt2)
    assert _live_pairs(spark, dst2, "_src_row_id") == _live_pairs(spark, store)


def test_mirror_seed_from_historical_version(spark, store, tmp_path):
    """seed_at_version backfills the mirror from a retained snapshot and
    the catch-up loop then replays the forward windows — the mirror state
    must converge to the live store either way."""
    from iodf_spark.streaming.ingest import mirror_changes

    dst, ckpt = _mirror_fixture(tmp_path, "m4")
    store.write_segment(_df(spark, 0, 10), order_keys=["k"])  # v1
    store.write_segment(_df(spark, 10, 25), order_keys=["k"])  # v2
    store.delete_where(spark, "k IN (3, 12)")  # v3
    windows = mirror_changes(spark, store, dst, ckpt, seed_at_version=1)
    assert windows == [(0, 1), (1, 3)]
    assert _live_pairs(spark, dst, "_src_row_id") == _live_pairs(spark, store)
    # k=12 was appended AND deleted inside the catch-up window, so the
    # delta omits it (the consumer never saw it): 14 inserts, 1 delete
    assert [e["n_rows"] for e in dst.manifest()] == [10, 14]
