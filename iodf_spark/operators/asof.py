"""As-of and range joins — operators absent from both the reference
(SURVEY.md §2.6: no joins at all) and core Spark SQL; implemented
shuffle-efficiently as compositions of built-in DataFrame ops.

as-of join (backward): for each left row, the single latest right row with
``right_time <= left_time`` per key. Implemented with the union + windowed
last_value trick rather than a range join: tag both inputs, sort within key
by (time, tag) where right rows sort before left rows at equal time, and
carry the last non-null right payload forward. ONE shuffle on the key, no
cross-product, no per-key driver loop — survives 100x scale-up as long as
the key space partitions (a single hot key can be pre-salted by time
buckets; AQE does not split window skew).

range join: small ranges table broadcast + conditional join (Catalyst emits
BroadcastNestedLoopJoin, fine when the build side is tiny and the condition
is selective).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_asof(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join. `on` key column names must match on both sides.
    Right rows must be unique per (key, time) — pre-dedupe if not.

    ``direction``: "backward" (default) matches the latest right row with
    right_time <= left_time; "forward" the earliest right row with
    right_time >= left_time — same one-shuffle union + windowed carry, the
    window frame and tie order just flip.

    Returned columns: all of left + the requested right_cols (null when no
    right row is on the matching side of the left time, or outside
    tolerance)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    payload = F.struct(F.col(right_time).alias("_t"), *[F.col(c) for c in right_cols])

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_time"),
        F.lit(0).alias("_tag"),
        payload.alias("_payload"),
    )
    left_cols = left.columns
    l_ = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_time).alias("_time"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    r_aligned = r.select(
        *[F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[c]).alias(c)
          if c not in keys else F.col(c)
          for c in left_cols],
        "_time",
        "_tag",
        "_payload",
    )
    unioned = l_.unionByName(r_aligned)
    if direction == "backward":
        # right rows (tag 0) sort before left at equal time -> included
        w = (
            Window.partitionBy(*keys)
            .orderBy("_time", "_tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("_payload", ignorenulls=True).over(w)
    else:
        # flip tie order so equal-time right rows fall AFTER the left row,
        # inside the [current, following] frame
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_time"), F.col("_tag").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("_payload", ignorenulls=True).over(w)
    matched = unioned.withColumn("_m", carry).filter(F.col("_tag") == 1)
    if tolerance is not None:
        in_tol = (
            F.col("_m._t") >= F.col("_time") - tolerance
            if direction == "backward"
            else F.col("_m._t") <= F.col("_time") + tolerance
        )
        matched = matched.withColumn("_m", F.when(in_tol, F.col("_m")))
    out_cols = [F.col(c) for c in left_cols] + [F.col(f"_m.{c}").alias(c) for c in right_cols]
    return matched.select(*out_cols)


def join_range(
    left: DataFrame,
    ranges: DataFrame,
    value: Column,
    lo: str,
    hi: str,
) -> DataFrame:
    """Join left rows to the (small) ranges table where lo <= value < hi.
    The ranges side is broadcast — no shuffle of the big side. For a
    ranges table too large to broadcast, use :func:`join_range_binned`."""
    return left.join(
        F.broadcast(ranges), (value >= F.col(lo)) & (value < F.col(hi)), "left_outer"
    )


def join_range_binned(
    left: DataFrame,
    ranges: DataFrame,
    value: Column,
    lo: str,
    hi: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Range join for a LARGE ranges table: grid-bin both sides and
    equi-join on the bin — the shuffle-based scale path when the ranges
    side cannot broadcast (Catalyst would otherwise emit a cartesian
    BroadcastNestedLoopJoin or worse).

    Each range [lo, hi) explodes into the bins it overlaps (sequence of
    floor(lo/w)..floor((hi-eps)/w)); each left row carries exactly ONE bin
    (floor(value/w)), so every qualifying (row, range) pair meets in
    exactly one bin — no post-join dedup — and the residual lo<=v<hi
    predicate restores exactness. Per-task pair space is bounded by bin
    occupancy: pick ``bin_width`` near the typical range length so a range
    explodes into O(1) bins. ``how``: "inner" or "left_outer" (unmatched
    left rows padded with null range columns, matching join_range)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    w = float(bin_width)
    # the left-row identity for the outer-join recovery: stamped then
    # lineage-pinned (monotonically_increasing_id is nondeterministic
    # across recomputes — matched and misses must see the same ids)
    stamped = left.withColumn("_lrid", F.monotonically_increasing_id())
    if how == "left_outer":
        stamped = stamped.localCheckpoint(eager=False)
    binned_l = stamped.withColumn("_lbin", F.floor(value / F.lit(w)))
    exploded_r = ranges.withColumn(
        "_rbin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(w)),
                # hi is exclusive: a range ending exactly on a bin edge does
                # not reach into the next bin
                F.floor((F.col(hi) - F.lit(1e-9 * w)) / F.lit(w)),
            )
        ),
    )
    matched = binned_l.join(
        exploded_r,
        (F.col("_lbin") == F.col("_rbin"))
        & (value >= F.col(lo))
        & (value < F.col(hi)),
    ).drop("_lbin", "_rbin")
    if how == "inner":
        return matched.drop("_lrid")
    misses = stamped.join(
        matched.select("_lrid").dropDuplicates(["_lrid"]), "_lrid", "left_anti"
    )
    for c in ranges.columns:
        misses = misses.withColumn(c, F.lit(None).cast(ranges.schema[c].dataType))
    return matched.unionByName(misses).drop("_lrid")
