"""Numeric schema widening on multi-segment open: type drift across
segments (int -> long, float -> double, int + float) must open as the
widened type with exact values; non-numeric conflicts must raise loudly."""

import shutil

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.segments import SegmentStore


@pytest.fixture()
def store(tmp_path):
    s = SegmentStore(str(tmp_path / "store"), bucket_size=1024)
    yield s
    shutil.rmtree(s.path, ignore_errors=True)


def test_int_then_long_opens_as_long(spark, store):
    store.write_segment(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v int"), order_keys=["k"]
    )
    store.write_segment(
        spark.createDataFrame(
            [(3, 5_000_000_000)], "k long, v long"
        ),
        order_keys=["k"],
    )
    out = store.open(spark)
    assert out.schema["v"].dataType.typeName() == "long"
    assert sorted(r["v"] for r in out.collect()) == [10, 20, 5_000_000_000]


def test_float_then_double_and_int_mix_opens_as_double(spark, store):
    store.write_segment(
        spark.createDataFrame([(1, 1.5)], "k long, v float"), order_keys=["k"]
    )
    store.write_segment(
        spark.createDataFrame([(2, 2.25)], "k long, v double"), order_keys=["k"]
    )
    store.write_segment(
        spark.createDataFrame([(3, 7)], "k long, v int"), order_keys=["k"]
    )
    out = store.open(spark)
    assert out.schema["v"].dataType.typeName() == "double"
    assert sorted(r["v"] for r in out.collect()) == [1.5, 2.25, 7.0]


def test_widened_store_compacts_and_prunes(spark, store):
    store.write_segment(
        spark.createDataFrame([(1, 10)], "k long, v int"), order_keys=["k"]
    )
    store.write_segment(
        spark.createDataFrame([(2, 20)], "k long, v long"), order_keys=["k"]
    )
    before = sorted(tuple(r) for r in store.open(spark).collect())
    store.compact(spark)
    after = sorted(tuple(r) for r in store.open(spark).collect())
    assert before == after
    assert store.open(spark).schema["v"].dataType.typeName() == "long"


def test_non_numeric_conflict_raises(spark, store):
    store.write_segment(
        spark.createDataFrame([(1, "x")], "k long, v string"), order_keys=["k"]
    )
    store.write_segment(
        spark.createDataFrame([(2, 2)], "k long, v int"), order_keys=["k"]
    )
    with pytest.raises(TypeError, match="'v'"):
        store.open(spark)
