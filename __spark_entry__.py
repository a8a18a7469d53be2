"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (co-occurrence statistics sweep over
an indexed table — the reference's signature workload batched into one job).
`queries()` exposes one entry per implemented operator from SURVEY.md §2;
`oracle_sql()` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iodf_spark.functions.costats_math import costats_sql_exprs
from iodf_spark.operators import index as idx
from iodf_spark.operators.costats import costats_index, costats_sweep
from iodf_spark.plans.rowset import PostingSet
from iodf_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# helpers

_cache: dict[tuple[str, str], object] = {}


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("lineitem", sf_dir)
    if key not in _cache:
        _cache[key] = load_table(spark, sf_dir, "lineitem", row_id=True).cache()
    return _cache[key]  # type: ignore[return-value]


def _lineitem_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, int]:
    key = ("lineitem_index", sf_dir)
    if key not in _cache:
        li = _lineitem(spark, sf_dir)
        n = li.count()
        ix = idx.build_index(
            li, idx.IndexConf(include=["l_returnflag", "l_linestatus", "l_quantity"])
        ).cache()
        ix.count()
        _cache[key] = (ix, n)
    return _cache[key]  # type: ignore[return-value]


# SQL fragment: lineitem with the deterministic row_id (matches
# iodf_spark.sources.tables.with_row_id's natural-key numbering)
LI_RID = (
    "(SELECT *, row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS row_id"
    " FROM lineitem)"
)


# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full co-occurrence statistics sweep (every value pair of
    l_returnflag x l_linestatus) over sf0.001 — the reference's '1024 cofreq
    calculations' loop as one distributed job."""
    li = load_table(spark, SF001, "lineitem", row_id=True)
    return costats_sweep(li, "l_returnflag", "l_linestatus").orderBy("va", "vb")


# ---------------------------------------------------------------------------
# queries (SURVEY.md §2 inventory)


def q_index_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5/A1: selectivity of one index key (popcount of its bitmap)."""
    ix, _ = _lineitem_index(spark, sf_dir)
    return (
        ix.filter(idx._key_pred("l_returnflag", "R"))
        .agg(F.coalesce(F.sum("f"), F.lit(0)).cast("long").alias("f"))
    )


def q_index_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4: sorted distinct values of a column via the index key space."""
    ix, _ = _lineitem_index(spark, sf_dir)
    return idx.col_values(ix, "l_returnflag").select(F.col("value_str").alias("value"))


def q_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1/I6: the index itself as a queryable table — (col, value, f) for two
    columns, in typed key order."""
    ix, _ = _lineitem_index(spark, sf_dir)
    return (
        idx.key_stats(ix)
        .filter(F.col("col_name").isin("l_returnflag", "l_linestatus"))
        .select("col_name", F.col("value_str").alias("value"), F.col("f").cast("long").alias("f"))
        .orderBy("col_name", "value")
    )


def q_index_probe_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3/P7: probe one key -> materialized row-id set (posting lists)."""
    ix, n = _lineitem_index(spark, sf_dir)
    return idx.probe(ix, "l_returnflag", "R", n).to_rows()


def q_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1-B4 + B8: f, fAnd, OR, ANDNOT, NOT over two index bitmaps, all via
    the bucket-local posting-list kernels."""
    ix, n = _lineitem_index(spark, sf_dir)
    a = idx.probe(ix, "l_returnflag", "R", n)
    b = idx.probe(ix, "l_linestatus", "F", n)
    rows = [
        a.f_col().select(F.col("f").alias("f_a")),
        b.f_col().select(F.col("f").alias("f_b")),
        (a & b).f_col().select(F.col("f").alias("f_and")),
        (a | b).f_col().select(F.col("f").alias("f_or")),
        a.andnot(b).f_col().select(F.col("f").alias("f_andnot")),
        (~a).f_col().select(F.col("f").alias("f_not_a")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.crossJoin(r)
    return out


def q_merge_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: merge = concatenation of row spaces (NOT logical OR)."""
    ix, n = _lineitem_index(spark, sf_dir)
    a = idx.probe(ix, "l_returnflag", "R", n)
    b = idx.probe(ix, "l_linestatus", "F", n)
    return a.merge(b).to_rows()


def q_view_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: contiguous row-range view [100, 600) re-based to 0."""
    ix, n = _lineitem_index(spark, sf_dir)
    a = idx.probe(ix, "l_returnflag", "R", n)
    return a.view(100, 600).to_rows()


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3: materialize row at position 123 (cell/row access)."""
    li = _lineitem(spark, sf_dir)
    return li.filter(F.col("row_id") == 123).select(
        "row_id",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("l_quantity"),
        "l_returnflag",
        F.col("l_shipdate").cast("string").alias("l_shipdate_str"),
    )


def q_costats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: coStats of two index keys (counts + smoothed probabilities,
    entropies, per-state lifts, mutual information) via the index path."""
    ix, n = _lineitem_index(spark, sf_dir)
    return costats_index(ix, ("l_returnflag", "R"), ("l_linestatus", "F"), n)


def q_costats_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 sweep: contingency stats for every (l_returnflag, l_linestatus)
    value pair in one job."""
    li = _lineitem(spark, sf_dir)
    return costats_sweep(li, "l_returnflag", "l_linestatus").orderBy("va", "vb")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (SURVEY.md §2.5 'absent in reference' aggregates):
    grouped sum/avg/count with arithmetic — whole-stage-codegen'd partial+
    final hash aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


KNN_FEATURES = ["o_orderstatus", "o_orderpriority"]
KNN_QUERY = {"o_orderstatus": "F", "o_orderpriority": "1-URGENT"}
KNN_TARGET_SQL = "o_totalprice > 150000"


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("orders", sf_dir)
    if key not in _cache:
        _cache[key] = load_table(spark, sf_dir, "orders", row_id=True).cache()
    return _cache[key]  # type: ignore[return-value]


def q_knn_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: co-occurrence-trained per-(col,value) weight pairs."""
    from iodf_spark.operators.knn import key_value_weights

    od = _orders(spark, sf_dir)
    w = key_value_weights(od, KNN_FEATURES, F.expr(KNN_TARGET_SQL), 0.0)
    return w.select(
        "col_name", "value", F.round("w1", 9).alias("w1"), F.round("w2", 9).alias("w2")
    ).orderBy("col_name", "value")


def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2-M4: top-20 nearest rows to a query item by trained distance."""
    from iodf_spark.operators.knn import key_value_weights, knn

    od = _orders(spark, sf_dir)
    w = key_value_weights(od, KNN_FEATURES, F.expr(KNN_TARGET_SQL), 0.0)
    top = knn(od, KNN_FEATURES, w, KNN_QUERY, 20)
    return top.select("row_id", F.round("dist", 9).alias("dist"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "index_f": q_index_f,
        "index_distinct_values": q_index_distinct_values,
        "index_stats": q_index_stats,
        "index_probe_rows": q_index_probe_rows,
        "bitmap_ops": q_bitmap_ops,
        "merge_concat": q_merge_concat,
        "view_slice": q_view_slice,
        "point_lookup": q_point_lookup,
        "costats": q_costats,
        "costats_sweep": q_costats_sweep,
        "q1_pricing_summary": q1_pricing_summary,
        "knn_weights": q_knn_weights,
        "knn_topk": q_knn_topk,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI SQL)


def _costats_oracle(counts_subquery: str, extra_cols: str = "") -> str:
    stats = costats_sql_exprs()
    derived = ", ".join(f"{v} AS {k}" for k, v in stats.items())
    return (
        f"SELECT {extra_cols}n, fa, fb, fab, {derived} FROM ({counts_subquery})"
    )


def _knn_ctes() -> str:
    d = costats_sql_exprs(round_to=None)
    melt_arms = " UNION ALL ".join(
        f"SELECT row_id, t, '{c}' AS col_name, {c}::VARCHAR AS value FROM base" for c in KNN_FEATURES
    )
    q_rows = ", ".join(f"('{c}', '{v}')" for c, v in KNN_QUERY.items())
    return f"""
        base AS (
          SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id,
                 o_orderstatus, o_orderpriority, ({KNN_TARGET_SQL}) AS t
          FROM orders),
        consts AS (SELECT count(*)::BIGINT AS n, count(*) FILTER (t)::BIGINT AS fb FROM base),
        melted AS (SELECT * FROM ({melt_arms}) WHERE value IS NOT NULL),
        counts AS (
          SELECT col_name, value, count(*)::BIGINT AS fa, count(*) FILTER (t)::BIGINT AS fab,
                 (SELECT n FROM consts) AS n, (SELECT fb FROM consts) AS fb
          FROM melted GROUP BY col_name, value),
        weights AS (
          SELECT col_name, value,
                 abs(ln(({d['d_ft']}) / ({d['d_ff']}))) AS w1,
                 abs(ln(({d['d_tt']}) / ({d['d_tf']}))) AS w2
          FROM counts),
        qkv(col_name, value) AS (VALUES {q_rows}),
        wq AS (
          SELECT w.col_name, w.value, w.w1, w.w2, (q.value IS NOT NULL) AS in_q
          FROM weights w LEFT JOIN qkv q ON w.col_name = q.col_name AND w.value = q.value),
        baseline AS (SELECT coalesce(sum(w2), 0e0) AS b FROM wq WHERE in_q),
        perrow AS (
          SELECT m.row_id,
                 sum(CASE WHEN NOT w.in_q THEN w.w1 ELSE 0e0 END) AS w1_only,
                 sum(CASE WHEN w.in_q THEN w.w2 ELSE 0e0 END) AS w2_overlap
          FROM melted m JOIN wq w ON m.col_name = w.col_name AND m.value = w.value
          GROUP BY m.row_id),
        dists AS (
          SELECT b.row_id,
                 coalesce(p.w1_only, 0e0) + (SELECT b FROM baseline)
                   - coalesce(p.w2_overlap, 0e0) AS dist
          FROM base b LEFT JOIN perrow p ON b.row_id = p.row_id)
    """


def oracle_sql() -> dict[str, str]:
    costats_counts = """
        SELECT count(*)::BIGINT AS n,
               count(*) FILTER (l_returnflag = 'R')::BIGINT AS fa,
               count(*) FILTER (l_linestatus = 'F')::BIGINT AS fb,
               count(*) FILTER (l_returnflag = 'R' AND l_linestatus = 'F')::BIGINT AS fab
        FROM lineitem
    """
    sweep_counts = """
        SELECT p.va, p.vb, (SELECT count(*) FROM lineitem)::BIGINT AS n,
               a.fa::BIGINT AS fa, b.fb::BIGINT AS fb, p.fab::BIGINT AS fab
        FROM (SELECT l_returnflag va, l_linestatus vb, count(*) fab
              FROM lineitem GROUP BY 1, 2) p
        JOIN (SELECT l_returnflag va, count(*) fa FROM lineitem GROUP BY 1) a USING (va)
        JOIN (SELECT l_linestatus vb, count(*) fb FROM lineitem GROUP BY 1) b USING (vb)
    """
    return {
        "index_f": "SELECT count(*)::BIGINT AS f FROM lineitem WHERE l_returnflag = 'R'",
        "index_distinct_values": (
            "SELECT DISTINCT l_returnflag AS value FROM lineitem ORDER BY 1"
        ),
        "index_stats": """
            SELECT col_name, value, count(*)::BIGINT AS f FROM (
              SELECT 'l_returnflag' AS col_name, l_returnflag AS value FROM lineitem
              UNION ALL
              SELECT 'l_linestatus' AS col_name, l_linestatus AS value FROM lineitem
            ) GROUP BY col_name, value ORDER BY col_name, value
        """,
        "index_probe_rows": (
            f"SELECT row_id FROM {LI_RID} WHERE l_returnflag = 'R'"
        ),
        "bitmap_ops": """
            SELECT count(*) FILTER (l_returnflag = 'R')::BIGINT AS f_a,
                   count(*) FILTER (l_linestatus = 'F')::BIGINT AS f_b,
                   count(*) FILTER (l_returnflag = 'R' AND l_linestatus = 'F')::BIGINT AS f_and,
                   count(*) FILTER (l_returnflag = 'R' OR l_linestatus = 'F')::BIGINT AS f_or,
                   count(*) FILTER (l_returnflag = 'R' AND l_linestatus <> 'F')::BIGINT AS f_andnot,
                   count(*) FILTER (l_returnflag <> 'R')::BIGINT AS f_not_a
            FROM lineitem
        """,
        "merge_concat": f"""
            SELECT row_id FROM {LI_RID} WHERE l_returnflag = 'R'
            UNION ALL
            SELECT row_id + (SELECT count(*) FROM lineitem) AS row_id
            FROM {LI_RID} WHERE l_linestatus = 'F'
        """,
        "view_slice": f"""
            SELECT row_id - 100 AS row_id FROM {LI_RID}
            WHERE l_returnflag = 'R' AND row_id >= 100 AND row_id < 600
        """,
        "point_lookup": f"""
            SELECT row_id, l_orderkey, l_linenumber, l_quantity, l_returnflag,
                   strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate_str
            FROM {LI_RID} WHERE row_id = 123
        """,
        "costats": _costats_oracle(costats_counts),
        "costats_sweep": _costats_oracle(sweep_counts, extra_cols="va, vb, ") + " ORDER BY va, vb",
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   count(*)::BIGINT AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "knn_weights": f"""
            WITH {_knn_ctes()}
            SELECT col_name, value, round(w1, 9) AS w1, round(w2, 9) AS w2
            FROM weights ORDER BY col_name, value
        """,
        "knn_topk": f"""
            WITH {_knn_ctes()}
            SELECT row_id, round(dist, 9) AS dist
            FROM dists ORDER BY dist, row_id LIMIT 20
        """,
    }
