"""CoStats formula parity: Python ground truth == Spark Column expressions
== DuckDB evaluation of the same SQL text; and the three operator paths
(predicate / index / sweep) agree with each other and with DuckDB counts."""

import duckdb
import pytest
from pyspark.sql import functions as F

from iodf_spark.functions.costats_math import costats_py, costats_sql_exprs
from iodf_spark.operators.costats import costats_index, costats_predicates
from iodf_spark.operators.index import IndexConf, build_index
from iodf_spark.sources.tables import load_table

CASES = [(100, 30, 40, 10), (1000, 1, 999, 1), (7, 0, 0, 0), (50, 50, 50, 50)]


@pytest.mark.parametrize("n,fa,fb,fab", CASES)
def test_python_vs_spark_vs_duckdb(spark, n, fa, fb, fab):
    py = costats_py(n, fa, fb, fab)
    exprs = costats_sql_exprs(round_to=None)
    row = (
        spark.createDataFrame([(n, fa, fb, fab)], "n long, fa long, fb long, fab long")
        .select([F.expr(v).alias(k) for k, v in exprs.items()])
        .collect()[0]
    )
    sql = "SELECT " + ", ".join(f"{v} AS {k}" for k, v in exprs.items()) + \
          f" FROM (SELECT {n}::BIGINT n, {fa}::BIGINT fa, {fb}::BIGINT fb, {fab}::BIGINT fab)"
    duck = duckdb.sql(sql).fetchone()
    for i, k in enumerate(exprs):
        assert row[k] == pytest.approx(py[k], rel=1e-12), k
        assert duck[i] == pytest.approx(py[k], rel=1e-12), k


def test_paths_agree_on_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", row_id=True).cache()
    n = li.count()
    pred = costats_predicates(
        li, F.col("l_returnflag") == "R", F.col("l_linestatus") == "F"
    ).collect()[0]

    idx = build_index(li, IndexConf(include=["l_returnflag", "l_linestatus"])).cache()
    via_index = costats_index(idx, ("l_returnflag", "R"), ("l_linestatus", "F"), n).collect()[0]

    duck = duckdb.sql(
        f"""SELECT count(*) n,
              count(*) FILTER (l_returnflag='R') fa,
              count(*) FILTER (l_linestatus='F') fb,
              count(*) FILTER (l_returnflag='R' AND l_linestatus='F') fab
            FROM read_parquet('{sf_dir}/lineitem.parquet')"""
    ).fetchone()

    assert (pred["n"], pred["fa"], pred["fb"], pred["fab"]) == duck
    assert pred.asDict() == via_index.asDict()
    py = costats_py(*duck)
    assert pred["mi"] == pytest.approx(py["mi"], abs=1e-9)
    li.unpersist()
    idx.unpersist()
