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
