"""Deterministic sampling for training-data pipelines.

Spark's native sample()/sampleBy() draw from per-partition RNG streams —
reproducible only with identical partitioning, and not reproducible by an
external system at all. Corpus curation needs sampling decisions that are a
pure function of the ROW (so a re-run, a different cluster size, or an
auditing engine selects the exact same rows). These operators hash the key
with the shared integer polynomial hash (functions/texthash.py constants)
and keep a row iff hash mod 10000 falls under the rate — one narrow map,
no shuffle, pushdown-friendly, and the DuckDB oracle reproduces the exact
selection.

* :func:`deterministic_sample` — uniform rate over the whole table.
* :func:`stratified_sample` — per-class rates (e.g. downsample the
  dominant language, keep all of a rare class): rates come in as a small
  {class: rate} dict folded into a CASE expression — no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iodf_spark.functions.texthash import MOD, MULT, SEED

BUCKETS = 10_000  # rate resolution: 0.01%


def _bucket_expr(key: str) -> str:
    """Hash bucket in [0, BUCKETS) — identical text in both dialects (pure
    integer arithmetic on non-negative integral keys, so plain % works the
    same everywhere; 31x + 7 then a large-prime mod decorrelates the bucket
    from the raw id sequence)."""
    return f"((({key} * {MULT} + {SEED}) % {MOD}) % {BUCKETS})"


def deterministic_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, decided per row by key hash — re-runnable and
    engine-independent."""
    threshold = int(rate * BUCKETS)
    return df.filter(F.expr(f"{_bucket_expr(key_col)} < {threshold}"))


def stratified_sample(
    df: DataFrame, key_col: str, class_col: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-class keep rates: the {class: rate} policy folds into one CASE
    threshold expression — a narrow filter, no join, no shuffle."""
    thr = _threshold_case(class_col, rates, default_rate)
    return df.filter(F.expr(f"{_bucket_expr(key_col)} < {thr}"))


def _threshold_case(class_col: str, rates: dict[str, float], default_rate: float) -> str:
    arms = " ".join(
        f"WHEN '{cls}' THEN {int(r * BUCKETS)}" for cls, r in sorted(rates.items())
    )
    return f"(CASE {class_col} {arms} ELSE {int(default_rate * BUCKETS)} END)"


def stratified_sample_oracle(
    table: str, key_col: str, class_col: str, rates: dict[str, float],
    default_rate: float = 0.0, select: str = "*",
) -> str:
    thr = _threshold_case(class_col, rates, default_rate)
    return f"""
        SELECT {select} FROM {table}
        WHERE {_bucket_expr(key_col)} < {thr}
    """
