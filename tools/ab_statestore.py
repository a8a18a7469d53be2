"""A/B the dedup_minhash 'stream' arm under the HDFS-backed vs RocksDB
state-store provider (round-10 verdict #6), ONE provider per process (the
isolated-session methodology from BENCH_NOTES "Round-9 A/B": interleaved
in-session A/Bs are confounded by shared caches).

Anatomy note this script exists to measure: the arm is foreachBatch over
a 4-file source — its incremental state lives in its OWN parquet dirs
(bands/shingles/pairs), NOT in Spark's keyed state store, and the plan
has no stateful operator (no dropDuplicates/applyInPandasWithState). The
providerClass therefore should be a no-op for this arm; per-batch handle
times expose what the ~6 s actually is (micro-batch job-count floor).

Usage: python tools/ab_statestore.py {hdfs|rocksdb} [sf_dir]
Prints one JSON line: provider, wall seconds, per-batch handle seconds,
pair count.
"""

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    provider = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import pyspark.sql.streaming as PS
    from pyspark.sql import SparkSession

    batch_times: list[tuple[int, float]] = []
    orig_feb = PS.DataStreamWriter.foreachBatch

    def timing_feb(self, func):
        def timed(df, bid):
            t0 = time.time()
            func(df, bid)
            batch_times.append((int(bid), time.time() - t0))

        return orig_feb(self, timed)

    PS.DataStreamWriter.foreachBatch = timing_feb

    import os

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab-statestore-{provider}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if provider == "rocksdb":
        b = b.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from iodf_spark.streaming.ingest import (
        read_neardup_pairs,
        stream_neardup_pairs,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
    )
    src = tempfile.mkdtemp(prefix="iodf_ab_src_")
    state = tempfile.mkdtemp(prefix="iodf_ab_state_")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    t0 = time.time()
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_neardup_pairs(stream, "doc_id", "text", state)
    n_pairs = read_neardup_pairs(spark, state).count()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "provider": provider,
                "wall_sec": round(wall, 3),
                "batches": [
                    {"batch": b_, "sec": round(s, 3)}
                    for b_, s in sorted(batch_times)
                ],
                "handle_sec": round(sum(s for _, s in batch_times), 3),
                "n_pairs": n_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
