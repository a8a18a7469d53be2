"""Pins for session.fan_out — the conditional rebalance ahead of
compute-heavy narrow stages — and for the row-id invariance of the
AQE-sized range shuffle in with_row_id.

The guard IS the scale contract: on a properly split input (a real
cluster dataset) fan_out must be a NO-OP — no Exchange may appear — while
a single-split local input must widen to the session parallelism so
vector/tokenizer kernels use every core.
"""

import os

from pyspark.sql import functions as F

from iodf_spark.session import fan_out
from iodf_spark.sources.tables import with_row_id

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_fan_out_widens_single_split_input(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    assert df.rdd.getNumPartitions() == 1  # the local testdata shape
    tgt = spark.sparkContext.defaultParallelism
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == tgt
    # content unchanged
    assert out.count() == df.count()


def test_fan_out_noops_on_well_partitioned_input(spark):
    tgt = spark.sparkContext.defaultParallelism
    df = spark.range(10_000).repartition(tgt)
    out = fan_out(df)
    # identical plan object — no Exchange inserted on the scale path
    assert out is df


def test_fan_out_respects_explicit_target(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    out = fan_out(df, target=4)
    assert out.rdd.getNumPartitions() == 4


def test_fan_out_noop_when_half_or_more(spark):
    # 2*nparts > target -> leave alone (rebalance buys < 2x)
    tgt = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(max(tgt // 2 + 1, 1))
    assert fan_out(df) is df


def test_with_row_id_ids_survive_aqe_partition_sizing(spark):
    """row_id must be a permutation of 0..n-1 whose key order is
    NON-DECREASING, regardless of how AQE sizes the sort's range shuffle
    (adjacent-partition coalescing preserves cross-partition key order;
    ties — the testdata's (l_orderkey, l_linenumber) is NOT unique — may
    order arbitrarily within their run, same as any SQL row_number)."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    stamped, n = with_row_id(li, ["l_orderkey", "l_linenumber"], return_count=True)
    assert n == li.count()
    got = stamped.select("row_id", "l_orderkey", "l_linenumber").orderBy("row_id")
    rows = got.collect()
    assert [r["row_id"] for r in rows] == list(range(n))
    keys = [(r["l_orderkey"], r["l_linenumber"]) for r in rows]
    assert keys == sorted(keys)


def test_with_row_id_invariant_to_input_partitioning(spark):
    """Stamping a pre-shuffled multi-partition input must yield the same
    (id -> key) relation as stamping the raw scan: the required sort
    normalizes whatever partitioning arrives."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_linenumber"
    )
    a, _ = with_row_id(li, ["l_orderkey", "l_linenumber"], return_count=True)
    b, _ = with_row_id(
        li.repartition(7, "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        return_count=True,
    )
    ka = [(r["l_orderkey"], r["l_linenumber"]) for r in a.orderBy("row_id").collect()]
    kb = [(r["l_orderkey"], r["l_linenumber"]) for r in b.orderBy("row_id").collect()]
    # tie runs may order arbitrarily within themselves, but the KEY at
    # every global rank is identical
    assert ka == kb


def test_with_row_id_tiny_input_coalesces(spark):
    """A 5-row stamp must not fan 32 files/tasks downstream: AQE sizing
    collapses the range shuffle to one partition."""
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    stamped = with_row_id(region, ["r_regionkey"])
    assert stamped.rdd.getNumPartitions() <= 2
    ids = [r["row_id"] for r in stamped.orderBy("row_id").collect()]
    assert ids == list(range(region.count()))
