"""Physical-plan shape regressions — the scale contract, pinned as tests.

Correctness tests prove the operators compute the right answer at sf0.001;
these prove the PLANS are the ones that survive a 100 TB scale-up:
broadcast joins stay broadcast (no sort-merge shuffle of the fact side),
scans prune columns and push filters, the segment index prunes partitions
on col_name. A regression here is a performance bug even when results stay
correct.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from iodf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_star_join_is_broadcast_not_sort_merge(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q_join_agg(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_scan_prunes_columns(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q1_pricing_summary(spark, SF))
    # ReadSchema keeps only the 5 referenced columns — no full-row scan
    assert "l_extendedprice" in plan
    assert "l_shipdate" not in plan
    assert "l_comment" not in plan
    # partial + final hash aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_filter_pushdown_reaches_parquet(spark):
    li = load_table(spark, SF, "lineitem")
    plan = plan_of(li.filter(F.col("l_returnflag") == "R").select("l_orderkey"))
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan


def test_segment_index_probe_prunes_col_name_partition(spark, tmp_path):
    from iodf_spark.operators.index import IndexConf, probe
    from iodf_spark.sources.segments import SegmentStore

    store = SegmentStore(str(tmp_path / "store"))
    orders = load_table(spark, SF, "orders")
    store.write_segment(
        orders,
        order_keys=["o_orderkey"],
        index_conf=IndexConf(include=["o_orderstatus", "o_orderpriority"]),
    )
    ix = store.open_index(spark)
    rows = probe(ix, "o_orderpriority", "1-URGENT", store.total_rows()).to_rows()
    plan = plan_of(rows)
    # partitionBy(col_name) on write + equality probe -> partition pruning
    assert "PartitionFilters" in plan
    assert "col_name" in plan.split("PartitionFilters", 1)[1][:400]


def test_topk_uses_take_ordered(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # no full global sort for LIMIT k


def test_asof_join_has_no_cross_product(spark):
    import __spark_entry__ as m

    plan = plan_of(m.q_asof_join(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
