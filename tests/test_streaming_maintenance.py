"""Streaming ingest racing store maintenance: the interleaving a real
deployment hits daily — a foreachBatch producer appending micro-batch
segments while a maintenance job compacts, deletes, or vacuums the SAME
store. The OCC commit loop must keep every side effect exactly-once:
no lost appends, no resurrected deletes, no double-applied replays.
"""

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import SegmentStore
from iodf_spark.streaming.ingest import stream_ingest_segments


@pytest.fixture(autouse=True)
def _both_backends(fsio_backend):
    """Ingest-vs-maintenance races run against BOTH fsio backends: the
    foreachBatch producer's OCC commits and the maintenance job's
    publishes must stay exactly-once on object-store semantics too."""
    yield


@pytest.fixture()
def store(tmp_path):
    return SegmentStore(str(tmp_path / "store"))


def _stream_from(spark, tmp_path, dfs):
    """Materialize dfs as parquet files and return a file-source stream
    that will deliver them (one micro-batch per availableNow trigger run)."""
    src = str(tmp_path / "src")
    for i, df in enumerate(dfs):
        df.write.mode("append").parquet(src)
    return spark.readStream.schema(dfs[0].schema).parquet(src)


def test_ingest_interleaved_with_compaction_and_delete(spark, store, tmp_path):
    d1 = spark.createDataFrame([(i, i % 3) for i in range(40)], "k long, m long")
    # round 1: stream two files in
    stream = _stream_from(spark, tmp_path, [d1])
    stream_ingest_segments(stream, store, order_keys=["k"])
    n1 = store.live_rows()
    assert store.open(spark).count() == n1 == 40

    # maintenance between trigger runs: compact + tombstone delete
    store.compact(spark)
    store.delete_where(spark, "m = 0")
    live_after_delete = store.live_rows()
    assert live_after_delete == store.open(spark).count() < 40

    # round 2: more data arrives on the SAME checkpoint/identity
    d2 = spark.createDataFrame(
        [(i, i % 3) for i in range(100, 130)], "k long, m long"
    )
    d2.write.mode("append").parquet(str(tmp_path / "src"))
    stream2 = spark.readStream.schema(d2.schema).parquet(str(tmp_path / "src"))
    stream_ingest_segments(stream2, store, order_keys=["k"])

    got = store.open(spark)
    # the delete survived the subsequent ingest; the new rows all landed
    assert got.filter("k < 100 and m = 0").count() == 0
    assert got.filter("k >= 100").count() == 30
    assert store.live_rows() == live_after_delete + 30

    # round 3: REPLAY — a fresh reader over the same source with the same
    # checkpoint has nothing new; store unchanged (exactly-once)
    stream3 = spark.readStream.schema(d2.schema).parquet(str(tmp_path / "src"))
    stream_ingest_segments(stream3, store, order_keys=["k"])
    assert store.live_rows() == live_after_delete + 30

    # batch keys survived compaction (carried as batch_keys on the merged
    # entry) — the exactly-once ledger is intact after maintenance
    doc = store.manifest_doc()
    all_keys = set()
    for e in doc["segments"]:
        if e.get("batch_key"):
            all_keys.add(e["batch_key"])
        all_keys.update(e.get("batch_keys", ()))
    assert any(k.startswith("stream-") for k in all_keys)


def test_ingest_then_purge_then_ingest(spark, store, tmp_path):
    """Purge (the one renumbering op) between trigger runs must not break
    the producer's exactly-once ledger or the append path."""
    d1 = spark.createDataFrame([(i,) for i in range(20)], "k long")
    stream = _stream_from(spark, tmp_path, [d1])
    stream_ingest_segments(stream, store, order_keys=["k"])
    store.delete_where(spark, "k >= 15")
    store.purge(spark)
    assert store.live_rows() == 15

    d2 = spark.createDataFrame([(i,) for i in range(200, 210)], "k long")
    d2.write.mode("append").parquet(str(tmp_path / "src"))
    stream2 = spark.readStream.schema(d2.schema).parquet(str(tmp_path / "src"))
    stream_ingest_segments(stream2, store, order_keys=["k"])
    got = store.open(spark)
    assert got.count() == 25
    # dense contiguous id space across purge + append
    assert got.agg(F.max("row_id")).collect()[0][0] == 24
    # replay after purge: still a no-op (batch_keys carried through purge)
    stream3 = spark.readStream.schema(d2.schema).parquet(str(tmp_path / "src"))
    stream_ingest_segments(stream3, store, order_keys=["k"])
    assert store.open(spark).count() == 25


def test_ann_sync_rides_the_streaming_ingest(spark, store, tmp_path):
    """The standing-pipeline shape (round 9): a micro-batch stream feeds
    the corpus store while the derived ANN index keeps itself fresh off
    the change feed — sync after each trigger run, takedowns propagate,
    and a corpus purge forces (and survives) the full-refresh recovery.
    Every probe along the way equals a fresh IVF over the live corpus."""
    from iodf_spark.operators.ann_maintenance import (
        FullRefreshRequired,
        ann_store_seed,
        ann_store_sync,
    )
    from iodf_spark.operators.similarity import ann_ivf, ann_ivf_store

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .cache()
    )
    wave1 = emb.filter(F.col("vec_id") < 300)
    wave2 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))

    def probe_equals_live():
        want = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ann_ivf(
                store.open(spark), "vec_id", "embedding", [0, 1, 2], dim=64
            ).collect()
        }
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ann_ivf_store(
                emb, "vec_id", "embedding", path, [0, 1, 2], dim=64
            ).collect()
        }
        assert got == want

    # trigger run 1 -> seed the index
    stream_ingest_segments(
        _stream_from(spark, tmp_path, [wave1]), store, order_keys=["vec_id"]
    )
    path = str(tmp_path / "ivf")
    ann_store_seed(spark, store, path, "vec_id", "embedding", dim=64)
    probe_equals_live()

    # trigger run 2 (new delivery) + a takedown between runs -> one sync
    wave2.write.mode("append").parquet(str(tmp_path / "src"))
    stream_ingest_segments(
        spark.readStream.schema(wave1.schema).parquet(str(tmp_path / "src")),
        store, order_keys=["vec_id"],
    )
    store.delete_where(spark, F.col("vec_id").isin([250, 251]))
    assert ann_store_sync(spark, store, path, "vec_id", "embedding", dim=64)
    probe_equals_live()
    got_ids = {
        r["neighbor_id"]
        for r in ann_ivf_store(
            emb, "vec_id", "embedding", path, [0, 1, 2], k=50, dim=64
        ).collect()
    }
    assert got_ids.isdisjoint({250, 251})

    # purge between runs -> incremental sync must refuse; reseed recovers
    store.purge(spark)
    with pytest.raises(FullRefreshRequired):
        ann_store_sync(spark, store, path, "vec_id", "embedding", dim=64)
    ann_store_seed(spark, store, path, "vec_id", "embedding", dim=64)
    probe_equals_live()
    emb.unpersist()
