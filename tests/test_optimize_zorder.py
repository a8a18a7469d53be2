"""OPTIMIZE ZORDER BY — the multi-dimensional layout rewrite.

Pins: content preservation, z-ordered dense renumbering + epoch bump
(tombstones materialized away), MULTI-DIM zone-map pruning through the
existing open_pruned layer (the whole point: range predicates on ANY
interleaved column prune segments), batch_key carry, and the purge-style
conflict contract.
"""

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import ManifestConflictError, SegmentStore


@pytest.fixture()
def path(tmp_path):
    return str(tmp_path / "zstore")


def _grid(spark, n=32):
    # (a, b) uniform grid, deliberately INTERLEAVED in ingest order so the
    # pre-rewrite segments' zone maps span everything on both columns
    rows = [(i, i % n, (i * 7) % n, i * 100) for i in range(n * n)]
    return spark.createDataFrame(rows, "k long, a long, b long, v long")


def _seg_count_overlapping(store, col, lo, hi):
    kept = [
        e for e in store.manifest()
        if e.get("stats", {}).get(col)
        and not (int(e["stats"][col][1]) < lo or int(e["stats"][col][0]) > hi)
    ]
    return len(kept)


def test_zorder_rewrite_preserves_content_and_prunes_both_dims(spark, path):
    store = SegmentStore(path)
    df = _grid(spark)
    # 4 ingest-order segments: every segment spans ~the full (a, b) space
    for q in range(4):
        store.write_segment(
            df.filter((F.col("k") % 4) == q), order_keys=["k"]
        )
    before = sorted(
        (r["k"], r["a"], r["b"], r["v"]) for r in store.open(spark).collect()
    )
    assert all(
        _seg_count_overlapping(store, c, 4, 11) == 4 for c in ("a", "b")
    ), "fixture must start unprunable on both dims"

    entries = store.optimize_zorder(spark, ["a", "b"], bits=6, n_segments=4)
    assert len(entries) == 4 and len(store.manifest()) == 4
    # content identical (ids renumbered)
    after = sorted(
        (r["k"], r["a"], r["b"], r["v"]) for r in store.open(spark).collect()
    )
    assert after == before
    # dense contiguous ids, epoch bumped
    ids = sorted(r["row_id"] for r in store.open(spark).collect())
    assert ids == list(range(len(before)))
    assert store.manifest_doc()["renumber_epoch"] == 1
    # the payoff: a mid-range predicate on EITHER dimension now prunes
    for c in ("a", "b"):
        assert _seg_count_overlapping(store, c, 4, 11) < 4, (
            c, [e["stats"][c] for e in store.manifest()]
        )
    # and the pruned open returns exactly the predicate's rows
    got = sorted(
        r["k"]
        for r in store.open_pruned(spark, [("a", 4, 11)])
        .filter((F.col("a") >= 4) & (F.col("a") <= 11))
        .collect()
    )
    expect = sorted(r["k"] for r in df.filter((F.col("a") >= 4) & (F.col("a") <= 11)).collect())
    assert got == expect


def test_zorder_materializes_tombstones_and_bumps_epoch(spark, path):
    store = SegmentStore(path)
    store.write_segment(_grid(spark, n=8), order_keys=["k"])
    store.delete_where(spark, "a < 2")
    live = store.live_rows()
    store.optimize_zorder(spark, ["a", "b"], bits=4, n_segments=2)
    doc = store.manifest_doc()
    assert doc["tombstones"] == [] and doc["renumber_epoch"] == 1
    assert store.live_rows() == live == store.total_rows()
    assert store.open(spark).filter("a < 2").count() == 0


def test_zorder_carries_batch_keys(spark, path):
    store = SegmentStore(path)
    store.write_segment(_grid(spark, n=4), order_keys=["k"], batch_key="b-1")
    store.optimize_zorder(spark, ["a"], bits=4, n_segments=1)
    # a replayed producer must still see its batch as committed
    e = store.write_segment(_grid(spark, n=4), order_keys=["k"], batch_key="b-1")
    assert "b-1" in e.get("batch_keys", ()) or e.get("batch_key") == "b-1"
    assert store.live_rows() == 16  # no duplicate append


def test_zorder_conflict_raises_and_leaves_store_clean(spark, path):
    store = SegmentStore(path)
    store.write_segment(_grid(spark, n=8), order_keys=["k"])
    victim = SegmentStore(path)
    orig = SegmentStore._publish
    state = {"fired": False}

    def racy(entries, base_version=None):
        if not state["fired"]:
            state["fired"] = True
            SegmentStore(path).write_segment(
                _grid(spark, n=2), order_keys=["k"]
            )
            raise ManifestConflictError("injected")
        return orig(victim, entries, base_version)

    victim._publish = racy
    with pytest.raises(ManifestConflictError, match="re-run"):
        victim.optimize_zorder(spark, ["a", "b"], bits=4, n_segments=2)
    fresh = SegmentStore(path)
    # the competitor's append survived; no stray z-segments referenced
    assert fresh.live_rows() == 64 + 4
    assert fresh.manifest_doc()["renumber_epoch"] == 0


def test_zorder_rebuilds_stored_indexes(spark, path):
    """optimize_zorder(index_conf=...) must leave every z-segment with a
    usable stored index in the NEW id space: the store-level planner's
    index route answers a point predicate with exactly the right rows."""
    from iodf_spark.operators.index import IndexConf

    store = SegmentStore(path)
    df = _grid(spark, n=8)
    store.write_segment(df, order_keys=["k"], index_conf=IndexConf(include=["a"]))
    entries = store.optimize_zorder(
        spark, ["a", "b"], bits=4, n_segments=2, index_conf=IndexConf(include=["a"]),
    )
    assert all(e["indexed"] and e["indexed_cols"] == ["a"] for e in entries)
    rows, plan = store.smart_filter(spark, "a", 3, threshold=0.5)
    assert plan["path"] == "index", plan
    got = sorted(r["k"] for r in rows.collect())
    assert got == sorted(r["k"] for r in df.filter("a = 3").collect())


def test_reconcile_sweeps_crashed_zorder_staging(spark, path):
    import os

    store = SegmentStore(path)
    store.write_segment(_grid(spark, n=4), order_keys=["k"])
    crashed = os.path.join(path, "_zorder_tmp_deadbeef")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-0.parquet"), "wb") as fh:
        fh.write(b"junk")
    removed = store.reconcile(grace_seconds=0)
    assert "_zorder_tmp_deadbeef" in removed
    assert not os.path.exists(crashed)
    assert store.live_rows() == 16  # committed data untouched
