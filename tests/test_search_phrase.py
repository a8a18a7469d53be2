"""Phrase search + prefix/range probe edge cases."""

import pytest
from pyspark.sql import functions as F

from iodf_spark.operators import index as idx
from iodf_spark.operators.search import phrase_search, phrase_hash


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "beta gamma"),                      # phrase shorter than doc
        (2, "x alpha  beta\tgamma y"),          # multi-space/tab separators
        (3, "alpha beta"),                      # prefix of the phrase only
        (4, "gamma alpha beta gamma delta"),    # phrase at the end
        (5, ""),                                # empty doc
        (6, "alphabeta gamma"),                 # no token boundary
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_matches_exact_token_runs(docs):
    got = sorted(
        r["doc_id"]
        for r in phrase_search(docs, "doc_id", "text", "alpha beta gamma").collect()
    )
    assert got == [0, 2, 4]


def test_single_word_phrase_is_token_membership(docs):
    got = sorted(
        r["doc_id"] for r in phrase_search(docs, "doc_id", "text", "gamma").collect()
    )
    assert got == [0, 1, 2, 4, 6]  # doc 6's second token IS 'gamma'


def test_empty_phrase_rejected(docs):
    with pytest.raises(ValueError):
        phrase_search(docs, "doc_id", "text", "   ")
    with pytest.raises(ValueError):
        phrase_hash("", "spark")


def test_prefix_and_range_probes_match_filters(spark):
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("w"), (F.col("id") % 13)).alias("tag"),
        (F.col("id") % 37).cast("double").alias("q"),
    )
    from iodf_spark.sources.tables import with_row_id

    df = with_row_id(df, ["k"])
    n = 500
    ix = idx.build_index(df, idx.IndexConf(include=["tag", "q"]), n_rows=n)
    got_pre = idx.probe_prefix(ix, "tag", "w1", n).to_list()
    want_pre = sorted(
        r["row_id"]
        for r in df.filter(F.col("tag").startswith("w1")).collect()
    )
    assert got_pre == want_pre
    got_rng = idx.probe_range(ix, "q", 5, 11, n).to_list()
    want_rng = sorted(
        r["row_id"]
        for r in df.filter((F.col("q") >= 5) & (F.col("q") <= 11)).collect()
    )
    assert got_rng == want_rng
    # unbounded sides + empty result
    assert idx.probe_range(ix, "q", 30, None, n).f() == df.filter("q >= 30").count()
    assert idx.probe_range(ix, "q", 100, None, n).to_list() == []
    assert idx.probe_prefix(ix, "tag", "zz", n).to_list() == []
