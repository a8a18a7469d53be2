"""Incremental ExactSubstr (streaming/ingest.stream_duplicated_windows):
stream == batch at substring granularity, under adversarial micro-batch
splits — the two copies of a duplicated run arriving in DIFFERENT batches
(the retroactive-emission path), in the SAME batch, and within one doc."""

from pyspark.sql import functions as F

from iodf_spark.operators.dedup import duplicated_spans
from iodf_spark.streaming.ingest import (
    read_duplicated_spans,
    stream_duplicated_windows,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"


def _corpus(spark):
    rows = [
        # pair split ACROSS batches (1 -> file A, 101 -> file B)
        (1, f"one unique start {SHARED} one unique end"),
        (101, f"late copy here {SHARED} trailing tail words"),
        # pair inside ONE batch (2, 102 -> file B)
        (2, f"two opening words {SHARED} two closing words"),
        (102, f"second of pair {SHARED} done"),
        # within-doc repeat, alone in file C
        (3, f"{SHARED} {SHARED} self repeat doc"),
        # never-duplicated noise in every file
        (4, "totally unrelated text with no repeats at all whatsoever"),
        (104, "more singular prose that matches nothing else in corpus"),
        (204, "short doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_stream_equals_batch_across_splits(spark, tmp_path):
    docs = _corpus(spark)
    k = 4
    batch = sorted(tuple(r) for r in duplicated_spans(docs, "doc_id", "text", k=k).collect())
    assert len(batch) >= 4  # fixture really plants spans

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    # 3 files: A={1,4}, B={101,2,102,104}, C={3,204}; maxFilesPerTrigger=1
    # forces the cross-batch retroactive emission for doc 1
    docs.withColumn(
        "_f",
        F.when(F.col("doc_id").isin(1, 4), 0)
        .when(F.col("doc_id").isin(3, 204), 2)
        .otherwise(1),
    ).repartition(3, "_f").drop("_f").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_duplicated_windows(stream, "doc_id", "text", state, k=k)
    got = sorted(tuple(r) for r in read_duplicated_spans(spark, state, k=k).collect())
    assert got == batch


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """A second availableNow run over the SAME checkpoint must emit
    nothing new (replay-proof), and NEW files afterwards must still
    discover duplicates against pre-restart state."""
    docs = _corpus(spark)
    k = 4
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    docs.filter("doc_id in (1, 4)").coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream_duplicated_windows(stream, "doc_id", "text", state, k=k)

    run()
    assert read_duplicated_spans(spark, state, k=k).count() == 0  # no dup yet
    run()  # restart, nothing new
    assert read_duplicated_spans(spark, state, k=k).count() == 0
    # deliver the late copy: doc 1's held windows emit retroactively
    docs.filter("doc_id = 101").coalesce(1).write.mode("append").parquet(src)
    run()
    got = {r["doc_id"]: (r["span_start"], r["span_toks"])
           for r in read_duplicated_spans(spark, state, k=k).collect()}
    sub = duplicated_spans(
        docs.filter("doc_id in (1, 4, 101)"), "doc_id", "text", k=k
    ).collect()
    want = {r["doc_id"]: (r["span_start"], r["span_toks"]) for r in sub}
    assert got == want and 1 in got and 101 in got
