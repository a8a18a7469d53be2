"""Row-set (bitmap) algebra — the Spark rendition of the reference's LBits
(utils/LBits.scala:12-75) and its set-algebra kernels (ioseq/IoBits.scala:
187-348, SURVEY.md section 2.4).

Two representations, mirroring the reference's dense/sparse adaptivity:

1. **Predicate path** (default): a row set IS a boolean Column over the data
   DataFrame. AND/OR/NOT are Column algebra; `f` (popcount, LBits.scala:18)
   is `filter(pred).count()`. Catalyst pushes predicates into the Parquet
   scan; Tungsten vectorizes. Used when no materialized index exists.

2. **Posting-list path** (:class:`PostingSet`): a row set is a DataFrame of
   bucketed sorted row-id arrays `(bucket: long, row_ids: array<long>)`,
   bucket = row_id // bucket_size. This is the materialized-index
   representation. Set algebra stays JVM-side and bucket-local:
   AND = join on bucket + `array_intersect`, OR = full-outer join +
   `array_union`, ANDNOT = `array_except`, NOT = `array_except(universe,
   ids)` with the universe generated per bucket via `sequence()`. No row
   explosion, no driver collect; each array is capped at bucket_size
   elements so giant posting lists stay distributed (SURVEY.md section 7,
   "Giant posting lists").

`merge` is **concatenation** of row spaces (offsets shifted), NOT logical OR
(ioseq/IoBits.scala:328-348 — see SURVEY.md B5): `a.merge(b)` has
n = a.n + b.n and b's ids shifted by a.n.

Both paths must agree; tests/test_rowset.py checks them against a pure-Python
ground truth (mirrors BitsTest.scala's representation matrix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKET_SIZE = 1 << 16


def predicate_counts(df: DataFrame, pred_a: Column, pred_b: Column) -> DataFrame:
    """One-pass (n, fa, fb, fab) for two predicates — the predicate-path
    `f`/`fAnd` (LBits.scala:18, utils/LBits.scala:116-160) batched into a
    single aggregation (partial + final agg, one job, no shuffle beyond the
    final combine)."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(pred_a).alias("fa"),
        F.count_if(pred_b).alias("fb"),
        F.count_if(pred_a & pred_b).alias("fab"),
    )


class PostingSet:
    """Bucketed posting-list row set over a row space of ``n`` rows.

    df schema: (bucket: long, row_ids: array<long> sorted ascending, distinct,
    all within [bucket*bucket_size, (bucket+1)*bucket_size)). Buckets with
    empty arrays may be absent.
    """

    def __init__(self, df: DataFrame, n: int, bucket_size: int = DEFAULT_BUCKET_SIZE):
        self.df = df
        self.n = int(n)
        self.bucket_size = bucket_size

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_predicate(
        cls,
        data: DataFrame,
        pred: Column,
        n: int,
        bucket_size: int = DEFAULT_BUCKET_SIZE,
    ) -> "PostingSet":
        """Materialize a predicate into posting lists (index-build shape:
        Dfs.scala:357-366). One shuffle on bucket; map-side partial
        collect_list applies."""
        df = (
            data.filter(pred)
            .select((F.col("row_id") / bucket_size).cast("long").alias("bucket"), "row_id")
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_list("row_id")).alias("row_ids"))
        )
        return cls(df, n, bucket_size)

    @classmethod
    def from_row_ids(
        cls, ids: DataFrame, n: int, bucket_size: int = DEFAULT_BUCKET_SIZE
    ) -> "PostingSet":
        df = (
            ids.select((F.col("row_id") / bucket_size).cast("long").alias("bucket"), "row_id")
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_set("row_id")).alias("row_ids"))
        )
        return cls(df, n, bucket_size)

    @classmethod
    def from_positions(
        cls,
        spark: SparkSession,
        positions: list[int],
        n: int,
        bucket_size: int = DEFAULT_BUCKET_SIZE,
    ) -> "PostingSet":
        ids = spark.createDataFrame([(int(p),) for p in positions], "row_id long")
        return cls.from_row_ids(ids, n, bucket_size)

    @classmethod
    def empty(
        cls, spark: SparkSession, n: int, bucket_size: int = DEFAULT_BUCKET_SIZE
    ) -> "PostingSet":
        return cls(
            spark.createDataFrame([], "bucket long, row_ids array<long>"), n, bucket_size
        )

    @classmethod
    def full(
        cls, spark: SparkSession, n: int, bucket_size: int = DEFAULT_BUCKET_SIZE
    ) -> "PostingSet":
        """All rows 0..n-1 — generated distributively (spark.range, one
        sequence() per bucket; no driver-side materialization)."""
        df = cls._universe(spark, n, bucket_size)
        return cls(df, n, bucket_size)

    @staticmethod
    def _universe(spark: SparkSession, n: int, bucket_size: int) -> DataFrame:
        n_buckets = -(-n // bucket_size)  # 0 buckets when n == 0
        return spark.range(n_buckets).select(
            F.col("id").alias("bucket"),
            F.sequence(
                F.col("id") * bucket_size,
                F.least(F.col("id") * bucket_size + bucket_size, F.lit(n)) - 1,
            ).alias("row_ids"),
        )

    # -- algebra (bucket-local, JVM-side array kernels) ---------------------

    def _check(self, other: "PostingSet") -> None:
        if self.n != other.n or self.bucket_size != other.bucket_size:
            raise ValueError(
                f"row-space mismatch: ({self.n},{self.bucket_size}) vs "
                f"({other.n},{other.bucket_size})"
            )

    def __and__(self, other: "PostingSet") -> "PostingSet":
        """Materialized AND (ioseq/IoBits.scala:187-233). Inner join on
        bucket (co-partitioned: both sides hash-partitioned on the same key)
        + vectorized array_intersect."""
        self._check(other)
        a, b = self.df.alias("a"), other.df.alias("b")
        df = (
            a.join(b, "bucket", "inner")
            .select("bucket", F.array_intersect("a.row_ids", "b.row_ids").alias("row_ids"))
            .filter(F.size("row_ids") > 0)
        )
        return PostingSet(df, self.n, self.bucket_size)

    def __or__(self, other: "PostingSet") -> "PostingSet":
        """Logical OR — absent in the reference (SURVEY.md B8) but free here."""
        self._check(other)
        a, b = self.df.alias("a"), other.df.alias("b")
        df = a.join(b, "bucket", "full_outer").select(
            "bucket",
            F.sort_array(
                F.array_union(
                    F.coalesce("a.row_ids", F.array().cast("array<long>")),
                    F.coalesce("b.row_ids", F.array().cast("array<long>")),
                )
            ).alias("row_ids"),
        )
        return PostingSet(df, self.n, self.bucket_size)

    def andnot(self, other: "PostingSet") -> "PostingSet":
        """A AND NOT B (ioseq/IoBits.scala:235-302)."""
        self._check(other)
        a, b = self.df.alias("a"), other.df.alias("b")
        df = (
            a.join(b, "bucket", "left_outer")
            .select(
                "bucket",
                F.array_except(
                    F.col("a.row_ids"), F.coalesce("b.row_ids", F.array().cast("array<long>"))
                ).alias("row_ids"),
            )
            .filter(F.size("row_ids") > 0)
        )
        return PostingSet(df, self.n, self.bucket_size)

    def __invert__(self) -> "PostingSet":
        """Complement with tail masking (ioseq/IoBits.scala:304-326): the
        per-bucket universe is generated by sequence(), clipped to n."""
        spark = self.df.sparkSession
        u = self._universe(spark, self.n, self.bucket_size).alias("u")
        b = self.df.alias("b")
        df = (
            u.join(b, "bucket", "left_outer")
            .select(
                "bucket",
                F.array_except(
                    F.col("u.row_ids"), F.coalesce("b.row_ids", F.array().cast("array<long>"))
                ).alias("row_ids"),
            )
            .filter(F.size("row_ids") > 0)
        )
        return PostingSet(df, self.n, self.bucket_size)

    def merge(self, other: "PostingSet") -> "PostingSet":
        """Concatenation of row spaces (NOT logical OR — ioseq/IoBits.scala:
        328-348, SURVEY.md B5): result has n = a.n + b.n, b's ids shifted by
        a.n. When a.n is bucket-aligned the shift is a pure bucket renumber
        (no data movement); otherwise ids are re-bucketed with array
        transforms + one re-group of the (rare) straddling buckets."""
        if self.bucket_size != other.bucket_size:
            raise ValueError("bucket_size mismatch")
        bs = self.bucket_size
        offset = self.n
        if offset % bs == 0:
            shifted = other.df.select(
                (F.col("bucket") + offset // bs).alias("bucket"),
                F.transform("row_ids", lambda x: x + offset).alias("row_ids"),
            )
        else:
            shifted = (
                other.df.select(
                    F.explode(F.transform("row_ids", lambda x: x + offset)).alias("row_id")
                )
                .select((F.col("row_id") / bs).cast("long").alias("bucket"), "row_id")
                .groupBy("bucket")
                .agg(F.sort_array(F.collect_list("row_id")).alias("row_ids"))
            )
        merged = self.df.unionByName(shifted)
        # straddling bucket appears in both inputs -> coalesce by union
        df = merged.groupBy("bucket").agg(
            F.sort_array(F.flatten(F.collect_list("row_ids"))).alias("row_ids")
        )
        return PostingSet(df, self.n + other.n, bs)

    def view(self, start: int, until: int) -> "PostingSet":
        """Row-range slice re-based to 0 (Df.scala:96-114, LBits view
        utils/LBits.scala:77-104): keep ids in [start, until), subtract
        start, re-bucket."""
        ids = self.to_rows().filter(
            (F.col("row_id") >= start) & (F.col("row_id") < until)
        ).select((F.col("row_id") - start).alias("row_id"))
        return PostingSet.from_row_ids(ids, until - start, self.bucket_size)

    # -- observations -------------------------------------------------------

    def f(self) -> int:
        """Popcount (LBits.scala:18; dense kernel DenseIoBits.scala:196-208).
        Distributed sum of per-bucket cardinalities — no materialized AND
        needed for fAnd: (a & b).f() fuses into one join+agg job."""
        row = self.df.agg(F.coalesce(F.sum(F.size("row_ids")), F.lit(0)).alias("f")).collect()[0]
        return int(row["f"])

    def f_col(self) -> DataFrame:
        return self.df.agg(F.coalesce(F.sum(F.size("row_ids")), F.lit(0)).cast("long").alias("f"))

    def to_rows(self) -> DataFrame:
        """Explode to a (row_id: long) DataFrame — the `trues` scanner
        equivalent (utils/MergeSortIterator.scala:34-36); in the DataFrame
        model a seekable cursor is just a filtered ordered scan."""
        return self.df.select(F.explode("row_ids").alias("row_id"))

    def to_list(self) -> list[int]:
        """Driver-side sorted positions — TEST/debug only, never in the
        100 TB path."""
        return sorted(r["row_id"] for r in self.to_rows().collect())
