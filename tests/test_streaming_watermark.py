"""Watermark / late-data semantics (SURVEY.md §2.11): append-mode windowed
aggregation over MULTIPLE micro-batches must (a) only finalize a window
once the watermark passes it, and (b) DROP an event that arrives after its
window was finalized — the behavior that distinguishes a real streaming
engine from replaying batches.

The driver-facing streaming queries run availableNow over one file (single
batch: watermark semantics never bite). Here three parquet files +
maxFilesPerTrigger=1 force three ORDERED micro-batches inside one
availableNow run (file source processes oldest-modtime first):

* batch 0 carries the 10:00 window's events plus a 12:00 event, advancing
  the committed watermark to 11:30;
* batch 1 (one punctual event) runs under that watermark — the 10:00
  window (end 11:00 <= 11:30) is evicted and EMITTED, finalized;
* batch 2 carries an event at 10:45 — behind the watermark, its window
  already finalized: Spark must DROP it (no second row for the window, no
  changed aggregate), while the punctual 13:00 event in the same batch
  lands in open state.

(The one-batch-earlier variant — late row arriving in the same batch that
evicts its window — is merged, not dropped: the late filter uses the
previous batch's committed watermark. That is Spark's documented
best-effort boundary, and why the test separates eviction and late
arrival by a full batch.)
"""

import os
import time

from pyspark.sql import functions as F


def _write_events(spark, path, rows, mtime_bump: int):
    before = set(os.listdir(path)) if os.path.isdir(path) else set()
    spark.createDataFrame(
        [(int(i), ts, float(v)) for i, (ts, v) in enumerate(rows)],
        "event_id long, ts_s string, value double",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "value"
    ).coalesce(1).write.mode("append").parquet(path)
    # file source orders micro-batches by modification time: stamp ONLY
    # this write's files so each write forms its own, ordered batch
    now = time.time() + mtime_bump
    for name in set(os.listdir(path)) - before:
        if name.endswith(".parquet"):
            os.utime(os.path.join(path, name), (now, now))


def test_late_event_is_dropped_after_window_finalized(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    _write_events(
        spark,
        src,
        [
            ("2024-01-01 10:00:00", 1.0),
            ("2024-01-01 10:30:00", 2.0),
            ("2024-01-01 12:00:00", 3.0),  # advances watermark to 11:30
        ],
        mtime_bump=0,
    )
    _write_events(spark, src, [("2024-01-01 12:30:00", 10.0)], mtime_bump=60)
    _write_events(
        spark,
        src,
        [
            ("2024-01-01 13:00:00", 20.0),
            ("2024-01-01 10:45:00", 100.0),  # LATE: window finalized in b1
        ],
        mtime_bump=120,
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))
        .select(F.col("w.start").cast("string").alias("h"), "cnt", "sv")
    )
    q = (
        agg.writeStream.format("memory").queryName("wm_sink_test")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    q.awaitTermination()
    with_input = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(with_input) >= 3, "file source did not split into micro-batches"
    out = [tuple(r) for r in spark.table("wm_sink_test").collect()]
    # exactly ONE emission: the finalized 10:00 window with ONLY punctual
    # events — the late 10:45 row was dropped (no second row, no resum)
    assert out == [("2024-01-01 10:00:00", 2, 3.0)], out


def test_stream_dedup_watermark_bounds_state(spark, tmp_path):
    """stream_dedup with a watermark horizon GC's seen-key state: a
    duplicate INSIDE the horizon collapses; the same key re-appearing far
    beyond it is re-admitted (state was evicted) — the bounded-state trade
    an infinite stream needs. Without a watermark the key is deduped
    globally (state never evicted)."""
    from iodf_spark.streaming.ingest import stream_dedup

    src = str(tmp_path / "dedup_src")
    # value encodes the dedup key (see `k` below): 3.0/5.0 are a DIFFERENT
    # key whose job is advancing the watermark between A's appearances —
    # eviction is end-of-batch, so re-admission needs the watermark to
    # pass the key's expiry in a batch where the key is ABSENT (exactly
    # how other traffic drives state GC on a real stream)
    _write_events(spark, src, [("2024-01-01 10:00:00", 1.0)], mtime_bump=0)
    _write_events(
        spark,
        src,
        [
            ("2024-01-01 10:10:00", 2.0),   # key A again, WITHIN horizon
            ("2024-01-01 18:00:00", 3.0),   # other key: watermark -> 17:30
        ],
        mtime_bump=60,
    )
    # A again: state still present AT arrival (evicted only at batch end)
    _write_events(spark, src, [("2024-01-01 19:00:00", 4.0)], mtime_bump=120)
    _write_events(spark, src, [("2024-01-01 23:00:00", 5.0)], mtime_bump=180)
    # A after its state was evicted: re-admitted
    _write_events(spark, src, [("2024-01-01 23:30:00", 6.0)], mtime_bump=240)

    def run(with_wm: bool, name: str):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ).withColumn(
            "k", F.expr("CASE WHEN value IN (3.0, 5.0) THEN 'wm' ELSE 'A' END")
        )
        kept = stream_dedup(
            stream, ["k"], watermark=("ts", "30 minutes") if with_wm else None
        )
        q = (
            kept.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / ("c_" + name))).start()
        )
        q.awaitTermination()
        values = sorted(float(r["value"]) for r in spark.table(name).collect())
        states = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p["stateOperators"]
        ]
        return values, states

    # no watermark: each key survives exactly once, ever (unbounded state)
    values, states = run(False, "dd_plain")
    assert values == [1.0, 3.0]
    assert min(states) >= 1  # seen-key state never shrinks
    # watermark: A's 10:10 dup collapses; A@19:00 still dedupes (state
    # present at arrival); once the watermark passes every expiry the
    # state store empties (bounded state) and A@23:30 is re-admitted
    values, states = run(True, "dd_wm")
    assert values == [1.0, 3.0, 6.0]
    assert 0 in states  # the state store was fully GC'd mid-stream


def test_stream_sessionize_event_time_timeout_gc(spark, tmp_path):
    """stream_sessionize(state_timeout=True): an idle user's open-session
    state is dropped once the watermark passes session_end + gap — bounded
    state on an infinite stream — while the emitted sessions (after
    finalize_sessions) are exactly the batch sessionizer's."""
    from iodf_spark.streaming.ingest import finalize_sessions, stream_sessionize

    src = str(tmp_path / "sess_src")
    # user 1 goes idle after batch 0; user 2's later events advance the
    # watermark past user 1's timeout, GC'ing user 1's state entry
    _write_events(spark, src, [("2024-01-01 10:00:00", 1.0)], mtime_bump=0)
    _write_events(spark, src, [("2024-01-01 18:00:00", 2.0)], mtime_bump=60)
    _write_events(spark, src, [("2024-01-01 23:00:00", 2.0)], mtime_bump=120)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    ).withColumn("user_id", F.col("value").cast("long"))
    out = stream_sessionize(stream, gap_minutes=30, state_timeout=True,
                            watermark="30 minutes")
    q = (
        out.writeStream.format("memory").queryName("sess_gc")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    q.awaitTermination()
    states = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    # user 1's entry was evicted while user 2's stayed: state shrank
    assert max(states) >= 2 and states[-1] < max(states), states
    final = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"])
        for r in finalize_sessions(spark.table("sess_gc")).collect()
    }
    assert final[(1, 0)] == (1, "2024-01-01 10:00:00.000000")
    assert final[(2, 0)][0] == 1 and final[(2, 1)][0] == 1  # gap split user 2
