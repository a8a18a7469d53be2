"""Table loading and row identity.

The reference addresses rows by position 0..n-1 (Df.scala:65-76) and its
index bitmaps refer to row positions. Spark has no stable row position, so
every managed table gets an explicit ``row_id: long`` column (SURVEY.md
section 1.5).

Two assignment strategies:

* :func:`with_row_id` — deterministic: ``row_number() over (order by natural
  key) - 1``. Used for tests and oracle comparison, where the DuckDB oracle
  can reproduce the identical numbering. Involves a global sort, which is
  fine at test scale but is NOT the 100 TB path.

* :func:`with_row_id_scalable` — the cluster-scale path: per-partition local
  ``row_number`` plus a partition-offset fixup (classic zipWithIndex shape).
  One narrow pass + one tiny driver-side offset table (#partitions rows);
  no global sort, no wide shuffle. Ids are contiguous 0..n-1 but follow
  partition order rather than a key order — exactly the reference's
  "ingest order" semantics (rows keep ingest order forever, SURVEY.md 2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Natural (deterministic, unique) ordering keys per table — used only by the
# deterministic row_id path so Spark and the DuckDB oracle agree on numbering.
NATURAL_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic testdata;
    # l_extendedprice breaks the ties (verified unique at sf0.001-0.1) —
    # a non-unique order would make row numbering depend on shuffle arrival
    # order and diverge from the oracle's row_number()
    "lineitem": ["l_orderkey", "l_linenumber", "l_extendedprice"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any SparkSession able to read the testdata, regardless of how it
    was built. Both confs are runtime-settable SQL confs:

    * ``nanosAsLong`` — a TIMESTAMP(NANOS) events.parquet (one of the
      encodings the testdata has shipped with) would raise
      PARQUET_TYPE_ILLEGAL on a vanilla session without it; harmless for
      µs-typed files.
    * session timezone pinned to UTC — timestamp-formatting queries must not
      depend on the host JVM default timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Type-adaptive event-time normalization: branch on the dtype ACTUALLY
    stored, never on an assumed physical encoding. The testdata's events.ts
    has drifted across generations (TIMESTAMP(NANOS)-read-as-long in earlier
    drops, timestamp[us] now), and the reference never freezes an encoding at
    the read boundary either — it tags and dispatches per stored type
    (io/IoBits.scala:135-149, writer side 151-159). Single shared helper so
    the batch loader and the streaming source can never diverge.

    * LongType — ns-as-long (via the nanosAsLong conf): integer-truncate to
      µs (DuckDB's native resolution; ns epochs ~1.7e18 overflow double, so
      div not /).
    * TimestampNTZType — naive µs wall times: reinterpret as UTC instants
      (session tz is pinned UTC, so wall-clock values are unchanged) to keep
      one downstream type.
    * TimestampType — already instants: pass through.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if isinstance(dt, T.TimestampType):
        return df
    raise TypeError(f"events.ts has unsupported stored type: {dt}")


def load_table(spark: SparkSession, sf_dir: str, name: str, row_id: bool = False) -> DataFrame:
    """Open a testdata table lazily (Parquet scan; column pruning and filter
    pushdown apply downstream). With ``row_id=True``, attach the
    deterministic row id. Self-sufficient under any SparkSession (sets the
    required runtime confs itself)."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    if row_id:
        df = with_row_id(df, NATURAL_KEYS[name])
    return df


def view(df: DataFrame, start: int, until: int) -> DataFrame:
    """Df.view (Df.scala:96-114): row-range slice [start, until) of a
    row_id-addressed table, re-based to 0 — the data-table twin of
    PostingSet.view. Views COMPOSE (Df.scala:104-107: a view of a view
    addresses the outer view's row space): ``view(view(df, a, b), c, d)``
    equals ``view(df, a+c, min(a+d, b))``. The row_id range predicate
    pushes into the Parquet scan; the re-base is a narrow projection."""
    return df.filter(
        (F.col("row_id") >= start) & (F.col("row_id") < until)
    ).withColumn("row_id", F.col("row_id") - F.lit(start).cast("long"))


def write_seq(df: DataFrame, col: str, path: str) -> None:
    """writeSeq (Dfs.scala:231-242): one column as a standalone stored
    object — here a single-column Parquet dir keeping row_id so the column
    re-aligns with its table on read."""
    cols = ["row_id", col] if "row_id" in df.columns else [col]
    df.select(*cols).write.mode("overwrite").parquet(path)


def open_seq(spark: SparkSession, path: str) -> DataFrame:
    """openSeq (Dfs.scala:231-242): open a standalone column."""
    return spark.read.parquet(path)


def broadcast_offsets(stamped: DataFrame, value: "F.Column"):
    """Exclusive per-partition prefix offsets for a ``_pid``-stamped frame —
    the shared core of the distributed prefix-sum pattern (row numbering,
    token-budget cumsums): aggregate ``value`` per partition (ONE tiny job,
    #partitions result rows), cumsum on the driver, hand back a
    broadcastable ``(_pid, _offset)`` frame plus the grand total. A
    partition whose values are all NULL contributes 0. The caller must have
    pinned the stamping (localCheckpoint) — spark_partition_id is
    nondeterministic across recomputes."""
    spark = stamped.sparkSession
    parts = stamped.groupBy("_pid").agg(F.sum(value).alias("_v")).collect()
    offsets, acc = [], 0
    for row in sorted(parts, key=lambda r: r["_pid"]):
        offsets.append((int(row["_pid"]), acc))
        acc += int(row["_v"] or 0)
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    return F.broadcast(off_df), acc


def with_row_id(df: DataFrame, order_keys: list[str], return_count: bool = False):
    """Deterministic row_id = rank in natural-key order, 0-based —
    WITHOUT a single-task global window.

    Range-partition on the keys, number within each partition, then add
    per-partition offsets (computed from actual partition counts, so the
    numbering is exact regardless of where the sampled range boundaries
    fall). Equal keys land in one range partition, so global id ==
    row_number() over (order by keys) - 1, oracle-reproducible, while
    every stage stays parallel — the same plan works on 1000 executors.
    """
    # Global orderBy, NOT repartitionByRange(N): the sort's REQUIRED
    # range distribution is something AQE must preserve — it may only
    # coalesce ADJACENT partitions (cross-partition key order, and
    # therefore every row_id, unchanged) and sizes the shuffle itself
    # (a 5-row write collapses to one partition instead of paying N
    # tasks in every downstream job over the stamped plan and writing N
    # near-empty files; a large write still splits by advisory size).
    # A bare unpinned repartitionByRange is NOT safe here: AQE's local
    # shuffle reader may regroup map outputs per map task — measured
    # 3368/6005 wrong row ids (pinned by test_fan_out.py).
    part = df.orderBy(*[F.col(k) for k in order_keys])
    stamped = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=False)
    offset_df, acc = broadcast_offsets(stamped, F.lit(1))
    w = Window.partitionBy("_pid").orderBy(*[F.col(k) for k in order_keys])
    out = (
        stamped.join(offset_df, "_pid")
        .withColumn(
            "row_id", F.row_number().over(w).cast("long") - 1 + F.col("_offset")
        )
        .drop("_pid", "_offset")
    )
    # `acc` is the total row count — already paid for by the offset job, so
    # callers (segment writes) can reuse it instead of running another count
    return (out, acc) if return_count else out


def with_row_id_scalable(df: DataFrame, return_count: bool = False):
    """Contiguous 0..n-1 row ids without a global sort.

    Narrow plan: stamp each row with its partition id and a within-partition
    monotonic id, count rows per partition (small agg — #partitions rows),
    compute cumulative offsets on the driver, broadcast-join them back, and
    add. This is the DataFrame rendition of ``rdd.zipWithIndex`` and scales
    to any partition count; the only driver-side state is one long per
    partition.
    """
    # localCheckpoint pins the stamping: spark_partition_id /
    # monotonically_increasing_id are nondeterministic across recomputes
    # (task retry, scan-split changes, nondeterministic upstream), so
    # without it two actions over this plan — e.g. a segment data-write and
    # the index build — could see DIFFERENT row_ids for the same row.
    stamped = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    offset_df, acc = broadcast_offsets(stamped, F.lit(1))
    w = Window.partitionBy("_pid").orderBy("_mid")
    out = (
        stamped.join(offset_df, "_pid")
        .withColumn("row_id", F.row_number().over(w).cast("long") - 1 + F.col("_offset"))
        .drop("_pid", "_mid", "_offset")
    )
    return (out, acc) if return_count else out
