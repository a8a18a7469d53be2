"""Co-occurrence statistics operators (CoStats.scala:7-47, IndexedDf.scala:
97-110; SURVEY.md A2-A3).

Three execution paths, all returning the same columns
(n, fa, fb, fab, pa, pb, ha, hb, d_ff, d_tf, d_ft, d_tt, mi):

* :func:`costats_predicates` — predicate path: ONE scan computing all four
  counts as conditional aggregates (partial+final agg), then the closed-form
  math as Column expressions. This is the honest Spark translation of
  `coStats(a, b)` = 2 popcounts + fAnd + arithmetic.

* :func:`costats_index` — index path: probe two keys, bucket-local
  array_intersect for fAB, sum over buckets. No data-table scan at all.

* :func:`costats_sweep` — the sweep the reference does as 1024 sequential
  probes (io/test/df/1024-entry-index_exp.txt:43-46) batched into ONE job:
  all value pairs of two columns via a single groupBy — where Spark's
  distributed shuffle beats the reference's sequential loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iodf_spark.functions.costats_math import costats_columns
from iodf_spark.operators import index as idx
from iodf_spark.plans.rowset import predicate_counts


def with_costats(counts: DataFrame, round_to: int | None = 9) -> DataFrame:
    """Append the derived-stat columns to a DataFrame holding n/fa/fb/fab."""
    return counts.select("*", *costats_columns(round_to=round_to))


def costats_predicates(
    df: DataFrame, pred_a: Column, pred_b: Column, round_to: int | None = 9
) -> DataFrame:
    return with_costats(predicate_counts(df, pred_a, pred_b), round_to)


def costats_index(
    index_df: DataFrame, key_a: tuple[str, object], key_b: tuple[str, object], n: int,
    round_to: int | None = 9,
    bucket_size: int = None,
) -> DataFrame:
    """fA, fB from key selectivities; fAB via bucket-aligned intersect —
    mirrors `coStats` over two opened bitmaps (IndexedDf.scala:97-110) with
    the fAnd kernel's no-materialization property (utils/LBits.scala:116-123):
    the intersect+count fuses into one join+agg job. Handles both index
    encodings per bucket: sparse id arrays (array_intersect) and dense
    packed words (word-AND + bit_count — DenseIoBits' andCount), plus the
    mixed membership-filter case."""
    from iodf_spark.plans.rowset import DEFAULT_BUCKET_SIZE, _member

    bs = bucket_size or DEFAULT_BUCKET_SIZE
    has_words = "words" in index_df.columns
    w_col = (
        F.col("words") if has_words else F.lit(None).cast("array<long>")
    )
    a = index_df.filter(idx._key_pred(*key_a)).select(
        "bucket", F.col("row_ids").alias("a_ids"), w_col.alias("a_words")
    )
    b = index_df.filter(idx._key_pred(*key_b)).select(
        "bucket", F.col("row_ids").alias("b_ids"), w_col.alias("b_words")
    )
    pop = "aggregate({w}, 0L, (_a, _w) -> _a + bit_count(_w))"
    joined = a.join(b, "bucket", "full_outer").select(
        F.expr(
            f"CASE WHEN a_words IS NOT NULL THEN {pop.format(w='a_words')} "
            "WHEN a_ids IS NOT NULL THEN cast(size(a_ids) as long) ELSE 0L END"
        ).alias("fa_part"),
        F.expr(
            f"CASE WHEN b_words IS NOT NULL THEN {pop.format(w='b_words')} "
            "WHEN b_ids IS NOT NULL THEN cast(size(b_ids) as long) ELSE 0L END"
        ).alias("fb_part"),
        F.expr(
            "CASE WHEN (a_ids IS NULL AND a_words IS NULL) "
            "OR (b_ids IS NULL AND b_words IS NULL) THEN 0L "
            "WHEN a_words IS NULL AND b_words IS NULL "
            "THEN cast(size(array_intersect(a_ids, b_ids)) as long) "
            "WHEN a_words IS NOT NULL AND b_words IS NOT NULL "
            f"THEN {pop.format(w='zip_with(a_words, b_words, (_x, _y) -> _x & _y)')} "
            f"WHEN a_words IS NULL THEN cast(size(filter(a_ids, _x -> {_member('_x', 'b_words', bs)})) as long) "
            f"ELSE cast(size(filter(b_ids, _x -> {_member('_x', 'a_words', bs)})) as long) END"
        ).alias("fab_part"),
    )
    counts = joined.agg(
        F.lit(n).cast("long").alias("n"),
        F.coalesce(F.sum("fa_part"), F.lit(0)).cast("long").alias("fa"),
        F.coalesce(F.sum("fb_part"), F.lit(0)).cast("long").alias("fb"),
        F.coalesce(F.sum("fab_part"), F.lit(0)).cast("long").alias("fab"),
    )
    return with_costats(counts, round_to)


def costats_sweep(
    df: DataFrame, col_a: str, col_b: str, round_to: int | None = 9
) -> DataFrame:
    """All (value_a, value_b) contingency tables of two columns in one job:
    count each pair, each marginal, then combine — three partial aggs over
    one scan (Spark reuses the cached scan via AQE) + a broadcast-joined
    cross of the marginals. Output: one row per observed (va, vb) pair."""
    n_total = df.count()
    pair = (
        df.groupBy(F.col(col_a).alias("va"), F.col(col_b).alias("vb"))
        .agg(F.count(F.lit(1)).alias("fab"))
    )
    fa = df.groupBy(F.col(col_a).alias("va")).agg(F.count(F.lit(1)).alias("fa"))
    fb = df.groupBy(F.col(col_b).alias("vb")).agg(F.count(F.lit(1)).alias("fb"))
    counts = (
        pair.join(F.broadcast(fa), "va")
        .join(F.broadcast(fb), "vb")
        .select("va", "vb", F.lit(n_total).cast("long").alias("n"), "fa", "fb", "fab")
    )
    return counts.select("va", "vb", "n", "fa", "fb", "fab", *costats_columns(round_to=round_to))
