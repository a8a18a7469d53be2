"""Store-level access planning: SegmentStore.smart_filter stacks every
pruning layer the store maintains — manifest zone maps + Bloom bitsets
(zero jobs), then stored-index probe vs pushed-down scan by stored
selectivity (the store-level rendition of the reference's predicate
planning, IndexedDf.scala:71-96) — and must return exactly the
predicate's rows under every layer combination, tombstones included."""

import pytest
from pyspark.sql import functions as F

from iodf_spark.operators.index import IndexConf
from iodf_spark.sources.segments import SegmentStore


@pytest.fixture()
def store(spark, tmp_path):
    s = SegmentStore(str(tmp_path / "store"), bucket_size=1024)
    conf = IndexConf(include=["tag"])
    for lo, hi in [(0, 500), (500, 1000), (1000, 1500)]:
        df = spark.createDataFrame(
            [(i, f"u{i}", f"t{i % 7}") for i in range(lo, hi)],
            "k long, uid string, tag string",
        )
        s.write_segment(
            df, order_keys=["k"], index_conf=conf, bloom_cols=["uid"]
        )
    return s


def test_zone_map_layer_prunes_ordered_key(spark, store):
    rows, plan = store.smart_filter(spark, "k", 700)
    assert plan["pruned"] == 2 and plan["survivors"] == 1
    got = rows.collect()
    assert len(got) == 1 and got[0]["row_id"] == 700 and got[0]["k"] == 700


def test_bloom_layer_prunes_unsorted_key(spark, store):
    rows, plan = store.smart_filter(spark, "uid", "u1200")
    assert plan["survivors"] < 3  # bloom dropped segments without u1200
    got = rows.collect()
    assert len(got) == 1 and got[0]["row_id"] == 1200
    # absent key: all layers prune, schema-stable empty result
    rows0, plan0 = store.smart_filter(spark, "uid", "u99999")
    assert rows0.count() == 0
    assert plan0["path"] in ("pruned_all", "index", "scan")


def test_index_layer_routes_by_stored_selectivity(spark, store):
    # selective key (1/7 of rows is ~14% > default 10% -> may scan); use a
    # tighter threshold comparison: just assert exactness on both paths
    rows, plan = store.smart_filter(spark, "tag", "t3", threshold=0.5)
    assert plan["path"] == "index"
    expect = sorted(
        r["row_id"]
        for r in store.open(spark).filter("tag = 't3'").collect()
    )
    assert sorted(r["row_id"] for r in rows.collect()) == expect
    rows2, plan2 = store.smart_filter(spark, "tag", "t3", threshold=0.01)
    assert plan2["path"] == "scan"
    assert sorted(r["row_id"] for r in rows2.collect()) == expect


def test_tombstones_respected_on_every_path(spark, store):
    store.delete_where(spark, "k % 2 = 0")
    for probe_col, probe_val in [("tag", "t3"), ("k", 700), ("uid", "u701")]:
        rows, plan = store.smart_filter(spark, probe_col, probe_val, threshold=0.5)
        expect = sorted(
            r["row_id"]
            for r in store.open(spark)
            .filter(F.col(probe_col) == F.lit(probe_val))
            .collect()
        )
        got = sorted(r["row_id"] for r in rows.collect())
        assert got == expect, (probe_col, plan)
    # the even k=700 row is tombstoned: zone maps still prune, rows empty
    rows, plan = store.smart_filter(spark, "k", 700)
    assert plan["pruned"] == 2 and rows.count() == 0


def test_mixed_indexed_unindexed_falls_back_to_scan(spark, store):
    df = spark.createDataFrame(
        [(i, f"u{i}", "t0") for i in range(5000, 5050)],
        "k long, uid string, tag string",
    )
    store.write_segment(df, order_keys=["k"])  # unindexed, no bloom
    rows, plan = store.smart_filter(spark, "tag", "t0", threshold=0.5)
    assert plan["path"] == "scan"
    expect = store.open(spark).filter("tag = 't0'").count()
    assert rows.count() == expect


def test_conjunctive_store_planning(spark, store):
    """smart_filter_all over the store: zone maps prune the k-range,
    blooms prune the uid equality, surviving indexed segments route per
    predicate — result must equal the plain conjunctive filter."""
    rows, plan = store.smart_filter_all(
        spark, [("tag", "t3"), ("k", 600, 800)], threshold=0.5
    )
    assert plan["survivors"] == 1  # zone maps prove only segment 2 overlaps
    expect = sorted(
        r["row_id"]
        for r in store.open(spark)
        .filter("tag = 't3' and k between 600 and 800")
        .collect()
    )
    assert sorted(r["row_id"] for r in rows.collect()) == expect and expect
    # equality + bloom layer: uid u700 only lives in segment 2
    rows2, plan2 = store.smart_filter_all(
        spark, [("uid", "u700"), ("k", 0, 2000)], threshold=0.5
    )
    assert plan2["survivors"] < 3
    got2 = rows2.collect()
    assert len(got2) == 1 and got2[0]["row_id"] == 700
    # with deletes: tombstoned rows never resurface on any path
    store.delete_where(spark, "k = 700")
    rows3, _ = store.smart_filter_all(
        spark, [("uid", "u700"), ("k", 0, 2000)], threshold=0.5
    )
    assert rows3.count() == 0
    # uncovered column (uid is not indexed) -> scan fallback, still exact
    assert plan2["routed"]["scan"] or plan2["routed"]["index"]


def test_disjunctive_store_planning(spark, store):
    """smart_filter_any: a segment survives when ANY arm allows it;
    result equals the plain OR filter on every path."""
    rows, plan = store.smart_filter_any(
        spark, [("k", 100, 120), ("k", 1100, 1120)], threshold=0.5
    )
    assert plan["survivors"] == 2  # zone maps keep exactly the two ranges
    expect = sorted(
        r["row_id"]
        for r in store.open(spark)
        .filter("k between 100 and 120 or k between 1100 and 1120")
        .collect()
    )
    assert sorted(r["row_id"] for r in rows.collect()) == expect and expect
    # equality arms ride the blooms; tombstones respected
    store.delete_where(spark, "k = 1110")
    rows2, plan2 = store.smart_filter_any(
        spark, [("uid", "u1110"), ("uid", "u110")], threshold=0.5
    )
    assert plan2["survivors"] < 3
    assert sorted(r["row_id"] for r in rows2.collect()) == [110]


def test_empty_predicate_lists_raise(spark, store):
    """An empty WHERE clause is a caller bug — loud error, not a full
    scan mislabeled as a plan."""
    from iodf_spark.operators.access import smart_filter_all, smart_filter_any

    with pytest.raises(ValueError, match="at least one predicate"):
        store.smart_filter_all(spark, [])
    with pytest.raises(ValueError, match="at least one predicate"):
        store.smart_filter_any(spark, [])
    with pytest.raises(ValueError, match="at least one predicate"):
        smart_filter_all(store.open(spark), None, [], 1)
    with pytest.raises(ValueError, match="at least one predicate"):
        smart_filter_any(store.open(spark), None, [], 1)


def test_planner_reads_manifest_exactly_once(spark, store, monkeypatch):
    """LOW pin: a smart_filter call must derive entries, tombstones AND
    the total row count from ONE manifest doc read — repeated reads let a
    commit land between them and produce a mixed-version plan (e.g. old
    tombstones over new survivors: freshly deleted rows reappear)."""
    calls = {"doc": 0}
    orig_doc = SegmentStore.manifest_doc

    def counting_doc(self):
        calls["doc"] += 1
        return orig_doc(self)

    monkeypatch.setattr(SegmentStore, "manifest_doc", counting_doc)

    def forbid(self, *a, **k):  # any extra metadata read = a second view
        raise AssertionError("planner re-read the manifest mid-plan")

    monkeypatch.setattr(SegmentStore, "total_rows", forbid)
    monkeypatch.setattr(SegmentStore, "pruned_entries_point", forbid)
    monkeypatch.setattr(SegmentStore, "pruned_entries", forbid)

    calls["doc"] = 0
    rows, plan = store.smart_filter(spark, "tag", "t3")
    assert calls["doc"] == 1
    assert rows.count() > 0

    calls["doc"] = 0
    rows, plan = store.smart_filter_all(spark, [("tag", "t3"), ("k", 0, 700)])
    assert calls["doc"] == 1
    assert rows.count() > 0

    calls["doc"] = 0
    rows, path = store.smart_filter_any(spark, [("tag", "t3"), ("uid", "u42")])
    assert calls["doc"] == 1
    assert rows.count() > 0


def test_pruned_segments_never_reach_the_physical_scan(spark, store):
    """The zone-map prune must remove segments from the PHYSICAL plan, not
    just post-filter them: the planned input files of a pruned conjunctive
    read may include only the surviving segment's data files (plus
    tombstone id-lists) — a plan that lists a pruned segment's files would
    re-read 100 TB to discard it."""
    # k is segment-ordered (0-499 / 500-999 / 1000-1499): a k-range prunes
    rows, plan = store.smart_filter_all(spark, [("k", 0, 400), ("tag", "t3")])
    assert plan["survivors"] == 1
    seg_dirs = {
        f"seg-{e['segment_id']:05d}" for e in store.manifest()
    }
    survivor = f"seg-{store.manifest()[0]['segment_id']:05d}"
    for f in rows.inputFiles():
        hit = {d for d in seg_dirs if f"/{d}/data/" in f}
        assert hit <= {survivor}, f"pruned segment file in plan: {f}"
    # sanity: the survivor IS planned (the scan reads something)
    assert any(f"/{survivor}/data/" in f for f in rows.inputFiles())
