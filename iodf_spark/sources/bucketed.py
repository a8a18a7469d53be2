"""Bucketed (co-located) tables — the shuffle-elimination storage layout.

The reference keeps co-access cheap by storing everything in one mmap'd
row space (Df.scala:65-76: both operands of any bitmap op share row ids).
Spark's equivalent for JOIN co-access is bucketing: both tables are
hash-partitioned into the same number of buckets ON DISK at write time,
so a subsequent equi-join on the bucket key needs NO Exchange — each task
reads matching bucket files from both sides. At 100 TB this converts the
biggest repeated cost of a star/fact-fact join pipeline (re-shuffling the
fact table for every join) into a one-time write-side layout decision,
exactly like the reference's one-time index build.

Spark requires bucketed data to go through the catalog (``saveAsTable``);
``path`` makes the table external so the files live where the caller
chooses. Bucket metadata (count + columns) is recorded in the catalog and
picked up automatically by the planner when
``spark.sql.sources.bucketing.enabled`` (default true).

tests/test_plans.py pins the contract: a join of two co-bucketed tables
plans ZERO ShuffleExchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted) table.

    ``sort_cols`` additionally sorts within each bucket file — Parquet
    min/max row-group skipping on the sort key, and sort-merge joins skip
    their sort phase when both sides are bucket-sorted."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def open_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Open a bucketed table; the planner uses the catalog's bucket spec to
    elide the Exchange on joins/aggregations keyed by the bucket columns."""
    return spark.table(table)
