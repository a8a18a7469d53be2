"""Pins for bounded_state_partitions — state-store sizing for availableNow
drains of bounded file sources (bytes-proportional, clamped to session
parallelism), and for the streaming entries still matching their oracles
at the reduced state width.
"""

import os

from iodf_spark.streaming.ingest import bounded_state_partitions

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_tiny_source_gets_min_partitions(spark):
    n = bounded_state_partitions(spark, os.path.join(SF_DIR, "events.parquet"))
    assert n == 2  # ~100 KB source -> the floor, not core count


def test_large_source_hits_parallelism_clamp(spark, tmp_path):
    # fake a huge source via a sparse file: sizing must clamp at cores
    p = tmp_path / "big.parquet"
    with open(p, "wb") as fh:
        fh.seek((64 << 20) * 100 - 1)
        fh.write(b"\0")
    n = bounded_state_partitions(spark, str(p))
    assert n == spark.sparkContext.defaultParallelism


def test_directory_source_sums_files(spark, tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.parquet").write_bytes(b"x" * 1024)
    (d / "_SUCCESS").write_bytes(b"")  # metadata files excluded
    assert bounded_state_partitions(spark, str(d)) == 2


def test_missing_path_is_floor(spark):
    assert bounded_state_partitions(spark, "/nonexistent/nope.parquet") == 2


def test_stream_stream_join_rows_stable_at_reduced_state_width(spark):
    """The drained join result must not depend on the state partition
    count — same rows at 2 and at defaultParallelism partitions."""
    from pyspark.sql import functions as F

    from iodf_spark.streaming.ingest import (
        run_to_memory,
        stream_events,
        stream_stream_join,
    )

    rows = {}
    for sp in (2, spark.sparkContext.defaultParallelism):
        j = stream_stream_join(stream_events(spark, SF_DIR), "purchase", "click")
        out = run_to_memory(j, f"sswidth_{sp}", shuffle_partitions=sp)
        rows[sp] = sorted(
            (r["left_id"], r["right_id"]) for r in out.select("left_id", "right_id").collect()
        )
    vals = list(rows.values())
    assert vals[0] == vals[1] and len(vals[0]) > 0
