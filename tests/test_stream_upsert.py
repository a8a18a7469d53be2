"""Streaming upsert sink (stream_upsert): keyed CDC materialization into
the segment store — latest version per key wins, live content converges
under replay.

Covers: two-wave drain with an in-batch duplicate key (latest_by picks
the newest), checkpoint cursor advance (second drain reads only the new
wave), and content-idempotence of a replayed batch (re-merging the same
rows leaves the live table byte-identical while versions advance).
"""

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import SegmentStore
from iodf_spark.streaming.ingest import stream_upsert


@pytest.fixture(autouse=True)
def _both_backends(fsio_backend):
    """Round-13 verdict #4: the upsert sink's checkpoint-cursor and
    merge-commit metadata I/O runs against all three fsio backends — the
    strict in-memory one makes any seam bypass fail loudly instead of
    silently passing on emulator-local files."""
    yield


@pytest.fixture()
def store(tmp_path):
    return SegmentStore(str(tmp_path / "store"))


def _wave(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long")


def _live(spark, store):
    return {
        (r["k"], r["v"], r["ts"])
        for r in store.open(spark).select("k", "v", "ts").collect()
    }


def test_two_wave_upsert_latest_per_key(spark, store, tmp_path):
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, ts long"

    _wave(spark, [(1, "a1", 10), (2, "b1", 10), (3, "c1", 10)]).write.mode(
        "append"
    ).parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", order_keys=["k"],
        checkpoint_dir=ckpt,
    )
    assert _live(spark, store) == {(1, "a1", 10), (2, "b1", 10), (3, "c1", 10)}
    v_after_wave1 = store.versions()[-1]

    # wave 2: k=2 updated TWICE in one batch (ts 20 then 30 — latest_by
    # must keep ts=30), k=4 inserted; k=1/3 untouched
    _wave(spark, [(2, "b2", 20), (2, "b3", 30), (4, "d1", 25)]).write.mode(
        "append"
    ).parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", order_keys=["k"],
        checkpoint_dir=ckpt,
    )
    assert _live(spark, store) == {
        (1, "a1", 10), (3, "c1", 10), (2, "b3", 30), (4, "d1", 25),
    }
    # checkpoint advanced: wave 1's files were NOT re-read (exactly one
    # merge commit landed in the second drain: tombstone + segment)
    assert store.versions()[-1] == v_after_wave1 + 1


def test_replayed_batch_converges(spark, store, tmp_path):
    """A crash after commit but before checkpoint advance replays the
    micro-batch: the re-merge must leave live CONTENT unchanged."""
    src_dir = str(tmp_path / "src")
    schema = "k long, v string, ts long"
    _wave(spark, [(1, "a1", 10), (2, "b1", 10)]).write.mode("append").parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    before = _live(spark, store)
    # simulate the replay: merge the same batch content again directly
    store.merge_by_key(
        spark, _wave(spark, [(1, "a1", 10), (2, "b1", 10)]), on="k"
    )
    assert _live(spark, store) == before
    # metadata churn, not data drift: the replay re-tombstoned + re-appended
    doc = store.manifest_doc()
    assert len(doc["tombstones"]) == 1
    assert store.live_rows() == 2


def test_upsert_without_latest_by_merges_batch_as_given(spark, store, tmp_path):
    src_dir = str(tmp_path / "src")
    _wave(spark, [(1, "a1", 10)]).write.mode("append").parquet(src_dir)
    stream_upsert(
        spark.readStream.schema("k long, v string, ts long").parquet(src_dir),
        store, on="k",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert _live(spark, store) == {(1, "a1", 10)}


def test_out_of_order_backfill_does_not_regress(spark, store, tmp_path):
    """A LATER batch carrying an OLDER event per key (backfill, partition
    skew) must not regress the key: the guard compares each source row's
    latest_by against the target's current value and drops stale rows
    before the merge. New keys in the same stale batch still insert."""
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, ts long"
    _wave(spark, [(1, "new", 100), (2, "cur", 50)]).write.mode("append").parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", checkpoint_dir=ckpt,
    )
    v1 = store.versions()[-1]
    # backfill batch: k=1 stale (ts 40 < 100), k=2 tie (ts 50, NOT newer),
    # k=3 brand-new — only k=3 may land
    _wave(spark, [(1, "stale", 40), (2, "tie", 50), (3, "ins", 10)]).write.mode(
        "append"
    ).parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", checkpoint_dir=ckpt,
    )
    assert _live(spark, store) == {(1, "new", 100), (2, "cur", 50), (3, "ins", 10)}
    assert store.versions()[-1] == v1 + 1


def test_fully_stale_batch_is_a_noop(spark, store, tmp_path):
    """When every event in a batch is stale the sink commits NOTHING —
    no tombstone, no empty segment, no version churn."""
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, ts long"
    _wave(spark, [(1, "a", 100)]).write.mode("append").parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", checkpoint_dir=ckpt,
    )
    v1 = store.versions()[-1]
    _wave(spark, [(1, "old", 1)]).write.mode("append").parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", checkpoint_dir=ckpt,
    )
    assert _live(spark, store) == {(1, "a", 100)}
    assert store.versions()[-1] == v1  # zero commits from the stale batch


def test_guard_off_restores_blind_replace(spark, store, tmp_path):
    """guard_out_of_order=False is the documented escape hatch for feeds
    that are per-key ordered across batches: the merge replaces matched
    rows unconditionally (the pre-guard behavior)."""
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, ts long"
    _wave(spark, [(1, "new", 100)]).write.mode("append").parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", checkpoint_dir=ckpt,
        guard_out_of_order=False,
    )
    _wave(spark, [(1, "old", 1)]).write.mode("append").parquet(src_dir)
    stream_upsert(
        spark.readStream.schema(schema).parquet(src_dir),
        store, on="k", latest_by="ts", checkpoint_dir=ckpt,
        guard_out_of_order=False,
    )
    assert _live(spark, store) == {(1, "old", 1)}


def test_guard_requested_without_latest_by_raises():
    """round-8 ADVICE: guard_out_of_order=True used to be a silent no-op
    when latest_by is None (the guard block was nested inside the
    latest_by branch). Explicit True without a version column must fail
    fast, not run unguarded."""
    import pytest as _pytest
    from iodf_spark.streaming.ingest import stream_upsert

    with _pytest.raises(ValueError, match="requires latest_by"):
        stream_upsert(None, None, on="doc_id", guard_out_of_order=True)
