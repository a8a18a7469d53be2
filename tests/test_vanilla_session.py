"""Driver-conf independence (VERDICT r01 #1/#10).

The driver's correctness gate builds a *vanilla* SparkSession — none of the
confs from iodf_spark.session are present. Every query must still work, so
``load_table``/``stream_events`` set the required runtime confs themselves.

These tests simulate the vanilla environment by unsetting / mis-setting the
confs on the shared session before each call; if the loaders were not
self-sufficient, reading events.parquet (TIMESTAMP(NANOS)) would raise
PARQUET_TYPE_ILLEGAL exactly as CORRECTNESS_r01 recorded.
"""

import pytest

from iodf_spark.sources.tables import load_table


def _make_vanilla(spark):
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")


def test_load_events_self_sufficient(spark, sf_dir):
    _make_vanilla(spark)
    df = load_table(spark, sf_dir, "events")
    assert df.count() > 0
    # load_table must have pinned both confs
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


@pytest.mark.parametrize("qname", ["events_windowed", "asof_join", "sessionize"])
def test_event_queries_under_vanilla_confs(spark, sf_dir, qname):
    import __spark_entry__ as entry

    _make_vanilla(spark)
    df = entry.queries()[qname](spark, sf_dir)
    assert df.count() > 0


def test_stream_events_self_sufficient(spark, sf_dir):
    from iodf_spark.streaming.ingest import run_to_memory, stream_events, windowed_event_counts

    _make_vanilla(spark)
    out = run_to_memory(
        windowed_event_counts(stream_events(spark, sf_dir)), "vanilla_stream_test"
    )
    assert out.count() > 0
