"""Z-order layout + store metadata surface.

The z-order claim, asserted concretely: a store ingested in z-value order
prunes range reads on BOTH interleaved dimensions, where a store ordered
by one column alone prunes only that column. Plus describe()/history()
metadata-only profiles, and the spark/duckdb dialect twins agreeing."""

import shutil

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from iodf_spark.functions.zorder import zorder_expr
from iodf_spark.sources.segments import SegmentStore


def _grid_df(spark, side=64):
    # a full side x side grid: both dims uniform, no accidental clustering
    return (
        spark.range(side * side)
        .select(
            (F.col("id") % side).alias("a"),
            (F.col("id") / side).cast("long").alias("b"),
        )
        .withColumn("z", F.expr(zorder_expr(["a", "b"], "spark", bits=6)))
    )


def _ingest_quartiles(spark, path, df, order_col):
    """4 segments split by the order column's quartiles — the layout a
    z-ordered (or naively-ordered) bulk OPTIMIZE would produce."""
    store = SegmentStore(path, bucket_size=1024)
    qs = df.approxQuantile(order_col, [0.25, 0.5, 0.75], 0.0)
    bounds = [None, *qs, None]
    for i in range(4):
        part = df
        if bounds[i] is not None:
            part = part.filter(F.col(order_col) > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col(order_col) <= bounds[i + 1])
        store.write_segment(part.drop("z") if order_col == "z" else part,
                            order_keys=[order_col] if order_col != "z" else ["a", "b"])
    return store


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _grid_df(spark)
    zstore = _ingest_quartiles(spark, str(tmp_path / "z"), df, "z")
    astore = _ingest_quartiles(spark, str(tmp_path / "a"), df.drop("z"), "a")
    try:
        # a-ordered layout: prunes a-ranges, CANNOT prune b-ranges (every
        # segment spans the full b domain)
        assert len(astore.pruned_entries([("a", 0, 10)])) < 4
        assert len(astore.pruned_entries([("b", 0, 10)])) == 4
        # z-ordered layout: prunes BOTH dimensions
        a_kept = len(zstore.pruned_entries([("a", 0, 10)]))
        b_kept = len(zstore.pruned_entries([("b", 0, 10)]))
        assert a_kept < 4, "z layout failed to prune dimension a"
        assert b_kept < 4, "z layout failed to prune dimension b"
        # and reads stay correct
        got = (
            zstore.open_pruned(spark, [("a", 0, 10), ("b", 0, 10)])
            .filter((F.col("a") <= 10) & (F.col("b") <= 10))
            .count()
        )
        assert got == 11 * 11
    finally:
        shutil.rmtree(zstore.path, ignore_errors=True)
        shutil.rmtree(astore.path, ignore_errors=True)


def test_zorder_dialects_agree(spark):
    pdf = pd.DataFrame({"a": [0, 1, 5, 63, 17], "b": [0, 63, 2, 63, 40]})
    sdf = spark.createDataFrame(pdf)
    got_s = [
        r["z"]
        for r in sdf.select(
            F.expr(zorder_expr(["a", "b"], "spark", bits=6)).alias("z")
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    got_d = [
        r[0]
        for r in con.execute(
            f"SELECT {zorder_expr(['a', 'b'], 'duckdb', bits=6)} FROM t"
        ).fetchall()
    ]
    assert got_s == got_d
    # interleave is a bijection on the grid: distinct inputs, distinct z
    assert len(set(got_s)) == len(got_s)


def test_zorder_expr_guards():
    with pytest.raises(ValueError):
        zorder_expr([], "spark")
    with pytest.raises(ValueError):
        zorder_expr(["a", "b", "c"], "spark", bits=21)
    with pytest.raises(ValueError):
        zorder_expr(["a"], "nope")


def test_describe_and_history_are_metadata_only(spark, tmp_path):
    store = SegmentStore(str(tmp_path / "d"), bucket_size=1024)
    for lo in (0, 100):
        store.write_segment(
            spark.range(lo, lo + 100).select(F.col("id").alias("k")),
            order_keys=["k"],
            sketch_cols=["k"],
        )
    store.write_segment(
        spark.createDataFrame([(999, "x")], "k long, t string"), order_keys=["k"]
    )
    d = store.describe()
    assert d["n_segments"] == 3 and d["n_rows"] == 201
    assert d["column_envelopes"]["k"] == {"min": 0, "max": 999, "complete": True}
    assert d["column_envelopes"]["t"]["complete"] is False  # only 1 of 3 segments
    assert d["sketched_columns"] == []  # third segment unsketched
    h = store.history()
    assert [x["version"] for x in h] == [1, 2, 3]
    assert [x["rows_delta"] for x in h] == [100, 100, 1]
    store.compact(spark)
    assert store.history()[-1]["segments_delta"] == 1 - 3
