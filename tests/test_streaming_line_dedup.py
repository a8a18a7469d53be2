"""Incremental line-level boilerplate dedup (streaming/ingest
stream_boilerplate_lines + read_line_dedup): stream == batch under
adversarial micro-batch splits — a line's doc frequency crossing the
gate only AFTER earlier docs carrying it were already drained (the
retroactive-verdict case: those docs' verdicts must flip on re-read),
plus restart exactly-once. Completes the dedup family's incremental
story (exact/minhash/substring/decon all have attested stream twins;
line_dedup was the round-11 gap, verdict #5)."""

from pyspark.sql import functions as F

from iodf_spark.operators.dedup import LINE_MAX_DF, line_dedup
from iodf_spark.streaming.ingest import read_line_dedup, stream_boilerplate_lines

FOOTER = "copyright footer all rights reserved"
SIDEBAR = "related articles you may like"


def _doc(i, body, extras=()):
    return (i, "\n".join([f"unique lead {i}", *extras, body, f"unique tail {i}"]))


def _corpus(spark):
    # FOOTER appears in 5 distinct docs (> LINE_MAX_DF=3): boilerplate.
    # SIDEBAR appears in exactly 3 docs (== max_df): NOT boilerplate.
    # Doc 30 repeats FOOTER twice (same doc: counts once for frequency,
    # but BOTH its occurrences drop once the line crosses).
    rows = [
        _doc(10, "alpha body text", [FOOTER]),
        _doc(11, "beta body text", [FOOTER, SIDEBAR]),
        _doc(12, "gamma body text", [SIDEBAR]),
        _doc(13, "delta body text", [SIDEBAR]),
        _doc(30, "epsilon body", [FOOTER, FOOTER]),
        _doc(31, "zeta body", [FOOTER]),
        _doc(32, "eta body", [FOOTER]),
        (40, "single line doc"),
        (41, "   \n  \n"),  # whitespace-only lines: all trimmed away
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_across_splits(spark, tmp_path):
    """Three files drained one per micro-batch, with the FOOTER's
    gate-crossing doc in the LAST file: docs 10/11 were drained while
    FOOTER was still rare, and their verdicts must flip by re-read once
    the sink carries the hash."""
    docs = _corpus(spark)
    batch = _rows(line_dedup(docs, "doc_id", "text"))
    # fixture sanity: FOOTER really drops, SIDEBAR really survives
    by_id = {r[0]: r for r in batch}
    assert by_id[10][3] == 1 and by_id[30][3] == 2  # n_dropped
    assert by_id[12][3] == 0 and by_id[13][3] == 0

    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    docs.withColumn(
        "_f",
        F.when(F.col("doc_id").isin(10, 11, 40), 0)
        .when(F.col("doc_id").isin(12, 13, 41), 1)
        .otherwise(2),  # 30, 31, 32 deliver the 3rd..5th FOOTER docs
    ).repartition(3, "_f").drop("_f").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_boilerplate_lines(stream, "doc_id", "text", state)
    got = _rows(read_line_dedup(spark, docs, "doc_id", "text", state))
    assert got == batch


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Replaying the drained checkpoint emits nothing new; later files
    still cross the gate against pre-restart state (the held doc-id set
    survives the restart)."""
    docs = _corpus(spark)
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    first = docs.filter("doc_id in (10, 11, 12, 13, 40, 41)")
    first.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream_boilerplate_lines(stream, "doc_id", "text", state)

    run()
    # only 2 FOOTER docs and 3 SIDEBAR docs so far: nothing boilerplate,
    # and the prefix verdict equals the prefix batch
    assert _rows(read_line_dedup(spark, first, "doc_id", "text", state)) == _rows(
        line_dedup(first, "doc_id", "text")
    )
    run()  # restart over the same checkpoint: replay-proof
    assert _rows(read_line_dedup(spark, first, "doc_id", "text", state)) == _rows(
        line_dedup(first, "doc_id", "text")
    )
    # the 3rd/4th/5th FOOTER docs arrive: the gate crosses mid-stream
    docs.filter("doc_id in (30, 31, 32)").coalesce(1).write.mode("append").parquet(src)
    run()
    got = _rows(read_line_dedup(spark, docs, "doc_id", "text", state))
    assert got == _rows(line_dedup(docs, "doc_id", "text"))
    # and a second full drain changes nothing (monotone sink)
    run()
    assert _rows(read_line_dedup(spark, docs, "doc_id", "text", state)) == got


def test_gate_counts_distinct_docs_not_occurrences(spark, tmp_path):
    """A line repeated MANY times inside few docs must never cross (the
    batch gate is count_distinct(doc)): doc frequency 2 <= max_df even
    with 8 occurrences."""
    rows = [
        (1, "\n".join(["spam line"] * 4 + ["one body"])),
        (2, "\n".join(["spam line"] * 4 + ["two body"])),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    stream_boilerplate_lines(stream, "doc_id", "text", state, max_df=LINE_MAX_DF)
    verdicts = _rows(read_line_dedup(spark, docs, "doc_id", "text", state))
    assert verdicts == _rows(line_dedup(docs, "doc_id", "text"))
    assert all(r[3] == 0 for r in verdicts)  # nothing dropped
