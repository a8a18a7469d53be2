"""Data-contract pin for the events event-time column.

Round 3 shipped silently-corrupt streaming results because the testdata's
stored encoding of events.ts drifted (ns-as-long -> timestamp[us]) and the
hardcoded reader compressed every timestamp 1000x WITHOUT erroring. These
tests turn any such drift red:

* plausibility — the loaded ts values must be real wall-clock timestamps in
  the testdata's known era, batch AND streaming (a 1000x scale error lands
  decades away from [2020, 2035]);
* batch/stream agreement — both paths must produce the identical instant for
  the same event_id sample, whatever the stored physical type.
"""

import pyspark.sql.functions as F

from iodf_spark.sources.tables import load_table, normalize_event_ts
from iodf_spark.streaming.ingest import run_to_memory, stream_events

YEAR_LO, YEAR_HI = 2020, 2035


def test_batch_ts_plausible(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    row = ev.agg(
        F.year(F.min("ts")).alias("lo"), F.year(F.max("ts")).alias("hi")
    ).collect()[0]
    assert YEAR_LO <= row["lo"] <= row["hi"] <= YEAR_HI, (
        f"batch ts outside plausible era: years [{row['lo']}, {row['hi']}] — "
        "stored-encoding drift mis-scaled the event times"
    )


def test_stream_ts_plausible_and_matches_batch(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    sample = run_to_memory(
        ev.select("event_id", F.unix_micros("ts").alias("ts_us")),
        "ts_contract_sample",
    )
    row = sample.agg(
        F.year(F.timestamp_micros(F.min("ts_us"))).alias("lo"),
        F.year(F.timestamp_micros(F.max("ts_us"))).alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row["n"] > 0
    assert YEAR_LO <= row["lo"] <= row["hi"] <= YEAR_HI, (
        f"streamed ts outside plausible era: years [{row['lo']}, {row['hi']}]"
    )

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    )
    mismatched = (
        sample.alias("s")
        .join(batch.alias("b"), "event_id")
        .filter(F.col("s.ts_us") != F.col("b.ts_us"))
        .count()
    )
    assert mismatched == 0, (
        f"{mismatched} events where streamed ts != batch ts — the two read "
        "paths diverged on the stored encoding"
    )


def test_normalize_is_type_adaptive(spark):
    # whatever physical shape ts arrives in, normalize_event_ts must yield
    # the same instant: long ns, naive micro timestamp, tz'd timestamp
    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
    long_df = spark.createDataFrame([(base_us * 1000,)], "ts long")
    ntz_df = spark.sql(
        f"select cast(timestamp_micros({base_us}) as timestamp_ntz) as ts"
    )
    ltz_df = spark.sql(f"select timestamp_micros({base_us}) as ts")
    for df in (long_df, ntz_df, ltz_df):
        out = normalize_event_ts(df)
        assert out.schema["ts"].dataType.typeName() == "timestamp"
        assert out.select(F.unix_micros("ts")).collect()[0][0] == base_us
