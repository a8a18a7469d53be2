"""Size-tiered compaction: partial adjacent-run merges must preserve the
store's logical content (rows, global row_ids, columns) exactly, bound the
segment count, and leave off-tier segments untouched."""

import shutil

import pytest
from pyspark.sql import functions as F

from iodf_spark.operators import index as idx
from iodf_spark.sources.segments import SegmentStore


@pytest.fixture()
def store(tmp_path):
    s = SegmentStore(str(tmp_path / "store"), bucket_size=256)
    yield s
    shutil.rmtree(s.path, ignore_errors=True)


def _append(spark, store, lo, n, **kw):
    df = spark.range(lo, lo + n).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("tag")
    )
    store.write_segment(df, order_keys=["k"], **kw)


def _snapshot(spark, store):
    return [
        tuple(r)
        for r in store.open(spark).select("row_id", "k", "tag").orderBy("row_id").collect()
    ]


def test_compact_run_merges_middle_only(spark, store):
    for lo in (0, 100, 200, 300):
        _append(spark, store, lo, 50)
    before = _snapshot(spark, store)
    ids_before = [e["segment_id"] for e in store.manifest()]
    store.compact_run(spark, 1, 3)
    entries = store.manifest()
    assert len(entries) == 3
    # outer segments untouched (same ids), middle pair replaced by a new id
    assert entries[0]["segment_id"] == ids_before[0]
    assert entries[2]["segment_id"] == ids_before[3]
    assert entries[1]["segment_id"] not in ids_before
    assert [e["row_id_offset"] for e in entries] == [0, 50, 150]
    assert entries[1]["n_rows"] == 100
    assert _snapshot(spark, store) == before
    # zone maps recomputed for the merged segment
    assert entries[1]["stats"]["k"] == [100, 249]


def test_compact_run_rejects_bad_range(spark, store):
    _append(spark, store, 0, 10)
    with pytest.raises(ValueError):
        store.compact_run(spark, 0, 2)


def test_tiered_merges_same_tier_runs_and_cascades(spark, store):
    # 4 tiny segments (tier 0 at fanout 4: n=3 < 4) cascade into one
    for lo in (0, 3, 6, 9):
        _append(spark, store, lo, 3)
    before = _snapshot(spark, store)
    store.compact_tiered(spark, fanout=4)
    assert len(store.manifest()) == 1
    assert _snapshot(spark, store) == before


def test_tiered_leaves_off_tier_segments_alone(spark, store):
    # big head segment (tier 2 at fanout 4: 100 -> 25 -> 6 -> wait)
    _append(spark, store, 0, 1000)  # tier: 1000/4=250/4=62/4=15/4=3 -> 4
    for lo in (1000, 1005, 1010, 1015):
        _append(spark, store, lo, 5)  # tier 1 (5 >= 4 once)
    before = _snapshot(spark, store)
    big_id = store.manifest()[0]["segment_id"]
    store.compact_tiered(spark, fanout=4)
    entries = store.manifest()
    # the 4 small ones merged (20 rows, still far below the big tier);
    # the big head was never rewritten
    assert entries[0]["segment_id"] == big_id
    assert len(entries) == 2
    assert entries[1]["n_rows"] == 20
    assert _snapshot(spark, store) == before


def test_compact_run_merges_indexes_without_retokenizing(spark, store):
    """writeMergedIndexedDf semantics: compacting indexed segments with NO
    index_conf must MERGE the stored posting lists (shifted to the new
    local row space) — not drop them. Offsets 0/40/80/120 on bucket_size
    256 exercise the non-aligned bucket-local shift path. Probe results,
    key stats (f), and distinct values must equal the pre-compact index."""
    conf = idx.IndexConf(include=["tag"])
    for lo in (0, 40, 80, 120):
        df = spark.range(lo, lo + 40).select(
            F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("tag")
        )
        store.write_segment(df, order_keys=["k"], index_conf=conf)
    n = store.total_rows()
    before = {
        t: sorted(
            r["row_id"]
            for r in idx.probe(
                store.open_index(spark), "tag", t, n, bucket_size=256
            ).to_rows().collect()
        )
        for t in ("0", "3", "6")
    }
    store.compact_run(spark, 0, 4)  # no index_conf -> merge path
    entries = store.manifest()
    assert len(entries) == 1 and entries[0]["indexed"]
    ix = store.open_index(spark)
    for t, want in before.items():
        got = sorted(
            r["row_id"]
            for r in idx.probe(ix, "tag", t, n, bucket_size=256).to_rows().collect()
        )
        assert got == want, t
    # f stats survive the shift (popcount recomputed on regroup)
    f3 = idx.f(ix, "tag", "3")
    assert f3 == len(before["3"])


def test_tiered_without_conf_keeps_stores_indexed(spark, store):
    conf = idx.IndexConf(include=["tag"])
    for lo in (0, 30, 60, 90):
        df = spark.range(lo, lo + 30).select(
            F.col("id").alias("k"), (F.col("id") % 5).cast("string").alias("tag")
        )
        store.write_segment(df, order_keys=["k"], index_conf=conf)
    store.compact_tiered(spark, fanout=2)
    assert len(store.manifest()) == 1
    assert store.manifest()[0]["indexed"]
    got = sorted(
        r["row_id"]
        for r in idx.probe(
            store.open_index(spark), "tag", "2", store.total_rows(), bucket_size=256
        ).to_rows().collect()
    )
    want = sorted(
        r["row_id"]
        for r in store.open(spark).filter(F.col("tag") == "2").collect()
    )
    assert got == want


def test_tiered_with_index_keeps_probes_correct(spark, store):
    conf = idx.IndexConf(include=["tag"])
    for lo in (0, 40, 80, 120):
        df = spark.range(lo, lo + 40).select(
            F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("tag")
        )
        store.write_segment(df, order_keys=["k"], index_conf=conf)
    expect = sorted(
        r["row_id"]
        for r in store.open(spark).filter(F.col("tag") == "3").collect()
    )
    store.compact_tiered(spark, fanout=2, index_conf=conf)
    assert len(store.manifest()) == 1
    ix = store.open_index(spark)
    ps = idx.probe(ix, "tag", "3", store.total_rows(), bucket_size=256)
    got = sorted(r["row_id"] for r in ps.to_rows().collect())
    assert got == expect


def test_tiered_rejects_fanout_below_two(spark, store):
    _append(spark, store, 0, 10)
    with pytest.raises(ValueError):
        store.compact_tiered(spark, fanout=1)
    with pytest.raises(ValueError):
        store.compact_tiered(spark, fanout=0)


def test_batch_keys_survive_compaction(spark, store):
    """Exactly-once across maintenance: a producer replay (crash after
    publish, before checkpoint advance) that races a compaction must still
    be recognized as committed — compact_run carries the merged entries'
    batch_key values forward as batch_keys (Delta's retained txn
    appId/version pattern)."""
    for i, lo in enumerate((0, 50, 100, 150)):
        _append(spark, store, lo, 50, batch_key=f"b{i}")
    before = _snapshot(spark, store)
    store.compact_run(spark, 0, 3)  # absorbs b0..b2
    entries = store.manifest()
    assert entries[0].get("batch_keys") == ["b0", "b1", "b2"]
    # replay of an absorbed key: no-op, returns the merged entry
    df = spark.range(999).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    )
    got = store.write_segment(df, order_keys=["k"], batch_key="b1")
    assert got["segment_id"] == entries[0]["segment_id"]
    # replay of the untouched tail key: also a no-op
    got2 = store.write_segment(df, order_keys=["k"], batch_key="b3")
    assert got2["segment_id"] == entries[1]["segment_id"]
    assert _snapshot(spark, store) == before
    # and a SECOND compaction keeps carrying them (batch_keys union)
    store.compact(spark)
    only = store.manifest()[0]
    assert set(only["batch_keys"]) == {"b0", "b1", "b2", "b3"}
    assert store.write_segment(df, order_keys=["k"], batch_key="b2")[
        "segment_id"
    ] == only["segment_id"]
    assert _snapshot(spark, store) == before
