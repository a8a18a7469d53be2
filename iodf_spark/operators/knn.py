r"""Bitmap KNN with co-occurrence-trained feature weights (ml/Knn.scala;
SURVEY.md §2.13 M1-M4) as DataFrame jobs.

Semantics (re-derived from the reference's behavior, not its code):

* M1 `keyValueWeights` (ml/Knn.scala:82-111): for each feature key
  (col, value) with bitmap B and target predicate bitmap T over n rows,
  compute CoStats(n, |B|, |T|, |B∩T|) and the asymmetric weight pair
      w1 = |ln(d(F,T) / d(F,F))|    (distance added when the candidate row
                                     has the feature but the query doesn't)
      w2 = |ln(d(T,T) / d(T,F))|    (added when the query has it but the
                                     candidate doesn't)
  keeping keys with w1 >= var_d_filter.

* M2/M3 `baseDistance`/`distances` (ml/Knn.scala:28-69): for candidate row E
  and query item X,  dist(E) = Σ_{kv ∈ (E∩W)\X} w1 + Σ_{kv ∈ (X∩W)\E} w2
  — a weighted asymmetric symmetric-difference over the weighted key set W.

* M4 `knn` (ml/Knn.scala:71-76): ascending distance, ties broken by row
  order (the reference's stable sort over row index), limit k.

Spark shape: one melt of the feature columns (explode analyzers), one
broadcast join against the (small) weight table, one groupBy(row_id) — the
weight table is trained by a single groupBy over the same melt. No driver
loops over rows; the reference's per-key bitmap iteration becomes one
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iodf_spark.functions.costats_math import costats_sql_exprs


def melt_features(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """(row_id, col_name, value) with canonical string values — the
    identity-analyzer feature melt. Rows with NULL features contribute
    nothing (matches index semantics: NULL is not a token)."""
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("col_name"), F.col(c).cast("string").alias("value"))
            for c in feature_cols
        ]
    )
    return (
        df.select("row_id", F.explode(pairs).alias("kv"))
        .select("row_id", "kv.col_name", "kv.value")
        .filter(F.col("value").isNotNull())
    )


def key_value_weights(
    df: DataFrame,
    feature_cols: list[str],
    target: Column,
    var_d_filter: float = 0.0,
) -> DataFrame:
    """M1: (col_name, value, w1, w2) trained against `target`. One scan:
    melt + groupBy(col,value) computing fa and fab as conditional counts;
    fb and n are scalars folded in as literals."""
    n = df.count()
    fb = df.filter(target).count()
    # melt data columns and carry the target flag alongside each feature
    melted = (
        df.withColumn("_t", target)
        .select("row_id", "_t", F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("col_name"), F.col(c).cast("string").alias("value"))
                for c in feature_cols
            ])
        ).alias("kv"))
        .select("row_id", "_t", "kv.col_name", "kv.value")
        .filter(F.col("value").isNotNull())
    )
    counts = melted.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("fa"),
        F.count_if(F.col("_t")).alias("fab"),
    ).withColumn("n", F.lit(n).cast("long")).withColumn("fb", F.lit(fb).cast("long"))
    d = costats_sql_exprs(round_to=None)
    return (
        counts.withColumn("w1", F.expr(f"abs(ln(({d['d_ft']}) / ({d['d_ff']})))"))
        .withColumn("w2", F.expr(f"abs(ln(({d['d_tt']}) / ({d['d_tf']})))"))
        .filter(F.col("w1") >= var_d_filter)
        .select("col_name", "value", "w1", "w2")
    )


def distances(
    df: DataFrame,
    feature_cols: list[str],
    weights: DataFrame,
    query: dict[str, object],
) -> DataFrame:
    """M2+M3: per-row distance to `query` (a {col: value} mapping).
    dist = Σ w1 over weighted keys the row has minus the query-overlap
    correction, plus the constant Σ w2 over the query's weighted keys."""
    spark = df.sparkSession
    qkv = [(c, str(v)) for c, v in query.items() if v is not None]
    q_df = spark.createDataFrame(qkv, "col_name string, value string")
    w = weights.join(
        q_df.withColumn("_in_q", F.lit(True)), ["col_name", "value"], "left_outer"
    ).withColumn("_in_q", F.coalesce("_in_q", F.lit(False)))
    baseline = w.filter("_in_q").agg(
        F.coalesce(F.sum("w2"), F.lit(0.0)).alias("b")
    ).collect()[0]["b"]

    melted = melt_features(df, feature_cols)
    per_row = (
        melted.join(F.broadcast(w), ["col_name", "value"], "inner")
        .groupBy("row_id")
        .agg(
            F.sum(F.when(~F.col("_in_q"), F.col("w1")).otherwise(0.0)).alias("_w1_only"),
            F.sum(F.when(F.col("_in_q"), F.col("w2")).otherwise(0.0)).alias("_w2_overlap"),
        )
    )
    return (
        df.select("row_id")
        .join(per_row, "row_id", "left_outer")
        .select(
            "row_id",
            (
                F.coalesce(F.col("_w1_only"), F.lit(0.0))
                + F.lit(baseline)
                - F.coalesce(F.col("_w2_overlap"), F.lit(0.0))
            ).alias("dist"),
        )
    )


def knn(
    df: DataFrame,
    feature_cols: list[str],
    weights: DataFrame,
    query: dict[str, object],
    k: int,
    row_filter: Column | None = None,
) -> DataFrame:
    """M4: top-k nearest by trained distance — TakeOrderedAndProject (no
    full sort materialization); ties broken by row_id (the reference's
    stable sort over row order).

    ``row_filter`` is the reference's optional candidate bitmap
    (ml/Knn.scala:71-76: knn(k, v, filter) ranks only rows in the filter).
    Distances are row-local and the query-side baseline is candidate-
    independent, so filtering candidates FIRST is semantically identical
    and lets Catalyst push the predicate into the scan."""
    cand = df.filter(row_filter) if row_filter is not None else df
    return (
        distances(cand, feature_cols, weights, query)
        .orderBy("dist", "row_id")
        .limit(k)
    )
