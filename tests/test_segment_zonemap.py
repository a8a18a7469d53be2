"""Zone-map pruning + idempotent append for the segment store.

Zone maps: per-segment [min, max] column stats harvested from Parquet
footers at write time (no extra jobs) let a range read skip whole segments
at the manifest level — the pruned open must return exactly open() minus
provably-empty segments, never dropping a matching row.

Idempotent append: a batch_key re-run (foreachBatch retry after a
crash-before-checkpoint) must publish exactly one committed segment.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import SegmentStore, _entry_overlaps


@pytest.fixture()
def store(tmp_path):
    s = SegmentStore(str(tmp_path / "store"), bucket_size=1024)
    yield s
    shutil.rmtree(s.path, ignore_errors=True)


def _write_ranges(spark, store):
    # three key-disjoint segments: [0,100), [100,200), [200,300)
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("k"),
            F.concat(F.lit("s"), F.col("id")).alias("tag"),
            (F.col("id") * 2).cast("double").alias("v"),
        )
        store.write_segment(df, order_keys=["k"])


def test_footer_stats_in_manifest(spark, store):
    _write_ranges(spark, store)
    stats = [e["stats"] for e in store.manifest()]
    assert stats[0]["k"] == [0, 99]
    assert stats[1]["k"] == [100, 199]
    assert stats[2]["v"] == [400.0, 598.0]
    # string stats present and correctly ordered
    lo, hi = stats[0]["tag"]
    assert lo <= hi and lo.startswith("s")


def test_pruned_entries_skip_disjoint_segments(spark, store):
    _write_ranges(spark, store)
    kept = store.pruned_entries([("k", 120, 150)])
    assert [e["segment_id"] for e in kept] == [1]
    # conjunction: k in segment 1 but v impossible there -> nothing
    assert store.pruned_entries([("k", 120, 150), ("v", 0.0, 10.0)]) == []
    # unbounded side
    assert [e["segment_id"] for e in store.pruned_entries([("k", 150, None)])] == [1, 2]


def test_open_pruned_equals_filtered_open(spark, store):
    _write_ranges(spark, store)
    full = (
        store.open(spark)
        .filter((F.col("k") >= 120) & (F.col("k") <= 220))
        .orderBy("row_id")
        .collect()
    )
    pruned = (
        store.open_pruned(spark, [("k", 120, 220)])
        .filter((F.col("k") >= 120) & (F.col("k") <= 220))
        .orderBy("row_id")
        .collect()
    )
    assert [tuple(r) for r in pruned] == [tuple(r) for r in full]
    assert len(full) == 101
    # global row_ids preserved on the pruned path (offsets from manifest)
    assert pruned[0]["row_id"] == 120


def test_missing_stats_keep_segment(spark, store):
    _write_ranges(spark, store)
    entries = store.manifest()
    # simulate stats-free entry (e.g. pre-zonemap store or exotic types)
    entry = dict(entries[0])
    entry.pop("stats")
    assert _entry_overlaps(entry, [("k", 1000, 2000)])
    # mixed-type drift: incomparable values keep the segment
    bad = dict(entries[0], stats={"k": ["a", "z"]})
    assert _entry_overlaps(bad, [("k", 1000, 2000)])


def test_array_and_null_columns_never_emit_stats(spark, store):
    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.array(F.col("id")).alias("arr"),
        F.lit(None).cast("string").alias("always_null"),
    )
    store.write_segment(df, order_keys=["k"])
    stats = store.manifest()[0]["stats"]
    assert "k" in stats
    assert "always_null" not in stats
    assert not any(c.startswith("arr") for c in stats)


def test_timestamp_zone_maps_prune_time_ranges(spark, store):
    """The 100 TB event-store read path: segments ingested in time order,
    a time-range read plans only the overlapping segments. Timestamp stats
    are stored as epoch µs and the predicate bounds (datetimes) go through
    the same canonicalization — symmetric, so pruning is exact."""
    import datetime as dt

    for day in (1, 2, 3):
        df = spark.range(100).select(
            F.col("id").alias("k"),
            (
                F.lit(f"2026-02-0{day} 00:00:00").cast("timestamp")
                + F.make_interval(mins=F.col("id").cast("int"))
            ).alias("ts"),
        )
        store.write_segment(df, order_keys=["k"])
    stats = [e["stats"] for e in store.manifest()]
    assert all("ts" in s for s in stats), "timestamp stats missing"
    assert stats[0]["ts"][0] == 1769904000000000  # 2026-02-01T00:00:00Z in µs
    lo = dt.datetime(2026, 2, 2, 0, 30)
    hi = dt.datetime(2026, 2, 2, 1, 10)
    kept = store.pruned_entries([("ts", lo, hi)])
    assert [e["segment_id"] for e in kept] == [1]
    got = (
        store.open_pruned(spark, [("ts", lo, hi)])
        .filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
        .count()
    )
    full = (
        store.open(spark).filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()
    )
    assert got == full == 41
    # epoch-µs int bounds prune identically (callers may pass either)
    lo_us = int(lo.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    hi_us = int(hi.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert [e["segment_id"] for e in store.pruned_entries([("ts", lo_us, hi_us)])] == [1]


def test_long_text_columns_get_no_stats_and_are_never_pruned(spark, store):
    """parquet-mr OMITS min/max for oversized binary values (>~4 KB), so a
    document-text column must land in the no-stats bucket — pruned never,
    wrong never. (Verified behavior: has_min_max=False at 10-20 KB values;
    if a future writer truncated instead, naive prefix-max comparisons
    could wrongly prune — this pin turns that drift into a red test.)"""
    df = spark.createDataFrame(
        [(1, "a" * 10_000), (2, "z" * 20_000)], "k long, text string"
    )
    store.write_segment(df, order_keys=["k"])
    stats = store.manifest()[0]["stats"]
    assert "text" not in stats
    assert "k" in stats
    # a text-range predicate cannot prune the segment
    assert len(store.pruned_entries([("text", "zzz", "zzzz")])) == 1


def test_batch_key_append_is_idempotent(spark, store):
    df = spark.range(10).select(F.col("id").alias("k"))
    e1 = store.write_segment(df, order_keys=["k"], batch_key="stream-batch-7")
    e2 = store.write_segment(df, order_keys=["k"], batch_key="stream-batch-7")
    assert e1["segment_id"] == e2["segment_id"]
    assert store.total_rows() == 10
    assert len(store.manifest()) == 1
    # a different key appends normally
    store.write_segment(df, order_keys=["k"], batch_key="stream-batch-8")
    assert store.total_rows() == 20


def test_stream_ingest_survives_replayed_batch(spark, tmp_path):
    """Simulate the foreachBatch replay: same micro-batch id delivered
    twice (crash after publish, before checkpoint advance)."""
    store = SegmentStore(str(tmp_path / "st2"), bucket_size=1024)
    df = spark.range(100).select(F.col("id").alias("k"))
    for _ in range(2):  # replay
        store.write_segment(df, order_keys=["k"], batch_key="stream-batch-0")
    opened = store.open(spark)
    assert opened.count() == 100
    assert opened.select(F.countDistinct("row_id")).collect()[0][0] == 100


def test_event_store_end_to_end_time_pruning(spark, sf_dir, store):
    """The assembled time-series path: events land via the one-pass
    partitioned ingest (write_segments_by, one segment per day), the
    timestamp zone maps come for free, and a day's range read plans only
    that day's segment — equal to the filtered full read."""
    import datetime as dt

    from iodf_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())[:3]
    store.write_segments_by(
        ev.filter(F.col("day").isin(days)), "day", days, ["event_id"]
    )
    assert len(store.manifest()) == 3
    assert all("ts" in (e["stats"] or {}) for e in store.manifest())
    d = dt.datetime.strptime(days[1], "%Y-%m-%d")
    lo, hi = d, d + dt.timedelta(hours=23, minutes=59, seconds=59)
    kept = store.pruned_entries([("ts", lo, hi)])
    assert len(kept) == 1, f"day-range read should plan 1 of 3 segments, got {len(kept)}"
    pruned_n = (
        store.open_pruned(spark, [("ts", lo, hi)])
        .filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
        .count()
    )
    full_n = (
        store.open(spark).filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()
    )
    assert pruned_n == full_n > 0


def test_segment_data_is_zstd_by_default(spark, store):
    import pyarrow.parquet as pq

    store.write_segment(
        spark.range(100).select(F.col("id").alias("k")), order_keys=["k"]
    )
    data_dir = os.path.join(store.path, "seg-00000", "data")
    files = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert files
    md = pq.ParquetFile(os.path.join(data_dir, files[0])).metadata
    codecs = {
        md.row_group(rg).column(ci).compression
        for rg in range(md.num_row_groups)
        for ci in range(md.row_group(rg).num_columns)
    }
    assert codecs == {"ZSTD"}
    # footer stats (zone maps) unaffected by the codec
    assert store.manifest()[0]["stats"]["k"] == [0, 99]
