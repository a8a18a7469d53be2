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


# ---------------------------------------------------------------------------
# Incremental benchmark decontamination (stream_contaminated_windows): the
# STATELESS twin — contamination is per-doc against a static benchmark, so
# stream == batch under any micro-batch split with no retroactive path.


def _bench(spark):
    # the benchmark carries SHARED verbatim, so every corpus doc embedding
    # SHARED is contaminated; doc 7 is benchmark-only noise
    rows = [
        (900, f"eval question {SHARED} gold answer"),
        (901, "benchmark only padding text never in corpus"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decon_stream_equals_batch_across_splits(spark, tmp_path):
    from iodf_spark.operators.dedup import contaminated_spans, decontaminate_clean
    from iodf_spark.streaming.ingest import (
        read_contaminated_spans,
        read_decontaminated_clean,
        stream_contaminated_windows,
    )

    docs, bench, k = _corpus(spark), _bench(spark), 4
    batch = sorted(
        tuple(r)
        for r in contaminated_spans(docs, "doc_id", "text", bench, k=k).collect()
    )
    assert len(batch) >= 4  # the fixture really plants benchmark overlap

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    # 3-file split + maxFilesPerTrigger=1: hits span several micro-batches
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
    stream_contaminated_windows(stream, "doc_id", "text", bench, state, k=k)
    got = sorted(
        tuple(r) for r in read_contaminated_spans(spark, state, k=k).collect()
    )
    assert got == batch
    # the twin is STATELESS by design (contamination is per-doc against a
    # fixed benchmark): a stateful operator would materialize a state/
    # directory under the checkpoint — pin its absence
    import os as _os

    assert not _os.path.isdir(_os.path.join(state, "_checkpoint", "state")), (
        "decon stream grew a state store — it must stay a stateless "
        "stream-static broadcast join"
    )
    # the materialized cut over the drained prefix equals the batch cut
    got_clean = sorted(
        tuple(r)
        for r in read_decontaminated_clean(
            spark, docs, "doc_id", "text", state, k=k
        ).collect()
    )
    want_clean = sorted(
        tuple(r)
        for r in decontaminate_clean(docs, "doc_id", "text", bench, k=k).collect()
    )
    assert got_clean == want_clean
    # the cut really removed the benchmark text from contaminated docs
    cleaned = {r[0]: r[1] for r in got_clean}
    assert SHARED not in cleaned[1] and SHARED not in cleaned[3]
    assert cleaned[4] == docs.filter("doc_id = 4").collect()[0]["text"]


def test_decon_stream_restart_is_exactly_once(spark, tmp_path):
    """Replaying the drained checkpoint emits nothing new; files arriving
    after the restart are decontaminated against the same benchmark."""
    from iodf_spark.operators.dedup import contaminated_spans
    from iodf_spark.streaming.ingest import (
        read_contaminated_spans,
        stream_contaminated_windows,
    )

    docs, bench, k = _corpus(spark), _bench(spark), 4
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    docs.filter("doc_id in (1, 4)").coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream_contaminated_windows(stream, "doc_id", "text", bench, state, k=k)

    run()
    n1 = read_contaminated_spans(spark, state, k=k).count()
    assert n1 >= 1  # doc 1 is contaminated from the first file
    run()  # restart over the same checkpoint: no re-emission
    assert read_contaminated_spans(spark, state, k=k).count() == n1
    docs.filter("doc_id = 101").coalesce(1).write.mode("append").parquet(src)
    run()
    got = sorted(
        tuple(r) for r in read_contaminated_spans(spark, state, k=k).collect()
    )
    want = sorted(
        tuple(r)
        for r in contaminated_spans(
            docs.filter("doc_id in (1, 4, 101)"), "doc_id", "text", bench, k=k
        ).collect()
    )
    assert got == want


def test_state_bucket_count_is_output_invariant(spark, tmp_path):
    """``state_buckets`` (round-13 ADVICE: the count must scale with
    expected window cardinality at corpus scale) only GROUPS state — the
    per-window transition logic keys on the full window identity inside
    the bucket value, so ANY bucket count yields the identical emitted
    row set."""
    docs = _corpus(spark)
    k = 4
    batch = sorted(
        tuple(r) for r in duplicated_spans(docs, "doc_id", "text", k=k).collect()
    )
    src = str(tmp_path / "src")
    state = str(tmp_path / "state_b3")
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
    stream_duplicated_windows(stream, "doc_id", "text", state, k=k, state_buckets=3)
    got = sorted(tuple(r) for r in read_duplicated_spans(spark, state, k=k).collect())
    assert got == batch
