"""Table profiling — the per-column statistics surface (the queryable twin
of the reference's index key stats: every column's cardinality and bounds
without building an index).

One wide aggregate job computes (nonnull count, exact distinct count,
min, max) for every column at once: Spark plans the multi-column
count_distinct via EXPAND with partial aggregation — a single data pass,
the distributed analog of the reference's per-column sequential stats
loops. The scalar agg row then melts to one row per column with stack().

Scale note: exact multi-distinct expands the scan C-fold before the
partial agg; at 100 TB profile with ``exact=False`` (HLL
approx_count_distinct — same plan shape, no expand, no oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iodf_spark.session import fan_out


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Per-column stats: (col_name, n_nonnull, n_distinct, min_str,
    max_str), min/max rendered as canonical strings so one schema fits
    every column type."""
    cols = columns or df.columns
    # fan_out the pruned projection: the exact-distinct EXPAND multiplies
    # the scan C-fold BEFORE the partial agg, so a single-split local
    # input would run the whole expansion on one core (no-op on properly
    # split inputs)
    df = fan_out(df.select(*cols))
    aggs = []
    for c in cols:
        nd = F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(F.col(c))
        aggs += [
            F.count(F.col(c)).alias(f"_n_{c}"),
            nd.alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _n_{c}, _d_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nonnull, n_distinct, min_str, max_str)"
        )
    ).orderBy("col_name")


def profile_oracle(table: str, columns: list[str]) -> str:
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, count({c})::BIGINT AS n_nonnull, "
        f"count(DISTINCT {c})::BIGINT AS n_distinct, "
        f"min({c})::VARCHAR AS min_str, max({c})::VARCHAR AS max_str "
        f"FROM {table}"
        for c in columns
    )
    return f"SELECT * FROM ({arms}) ORDER BY col_name"
