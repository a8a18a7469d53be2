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


def test_planner_mixes_equality_and_range_predicates(spark):
    """smart_filter_all with (col, lo, hi) range predicates: selective
    ranges route through probe_range + the one-stage intersect, wide ones
    stay scan filters; rows equal the plain filter either way."""
    from iodf_spark.operators.access import smart_filter_all
    from iodf_spark.sources.tables import with_row_id

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).cast("double").alias("q"),
        F.concat(F.lit("t"), (F.col("id") % 4)).alias("tag"),
    )
    df = with_row_id(df, ["k"])
    n = 1000
    ix = idx.build_index(df, idx.IndexConf(include=["q", "tag"]), n_rows=n)
    preds = [("q", 3, 5), ("tag", "t1")]  # range ~6%, equality ~25%
    out, routed = smart_filter_all(df, ix, preds, n, threshold=0.1)
    assert routed["index"] == [("q", 3, 5)]
    assert routed["scan"] == [("tag", "t1")]
    want = sorted(
        r["row_id"]
        for r in df.filter(
            (F.col("q") >= 3) & (F.col("q") <= 5) & (F.col("tag") == "t1")
        ).collect()
    )
    assert sorted(r["row_id"] for r in out.collect()) == want
    # both selective -> both probe, combined by intersect_all
    out2, routed2 = smart_filter_all(df, ix, preds, n, threshold=0.3)
    assert [p[0] for p in routed2["index"]] == ["q", "tag"]
    assert sorted(r["row_id"] for r in out2.collect()) == want
    # unbounded range side on the scan path
    out3, routed3 = smart_filter_all(df, ix, [("q", 40, None)], n, threshold=0.05)
    assert routed3["scan"] == [("q", 40, None)]
    assert out3.count() == df.filter(F.col("q") >= 40).count()


def test_disjunctive_planner_accepts_range_predicates(spark):
    """smart_filter_any with (col, lo, hi) 3-tuples — symmetric with
    smart_filter_all (reference: MinBound/MaxBound key-range scans apply in
    OR contexts too, IndexedDf.scala:50-66). A selective range+equality
    disjunction routes through union_all of probe_range+probe; a wide one
    falls back to one OR-filter scan. Rows equal the plain filter on BOTH
    paths."""
    from iodf_spark.operators.access import smart_filter_any
    from iodf_spark.sources.tables import with_row_id

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).cast("double").alias("q"),
        F.concat(F.lit("t"), (F.col("id") % 4)).alias("tag"),
    )
    df = with_row_id(df, ["k"])
    n = 1000
    ix = idx.build_index(df, idx.IndexConf(include=["q", "tag"]), n_rows=n)
    preds = [("q", 3, 5), ("q", 49.0)]  # range ~6% + equality ~2% -> index
    want = sorted(
        r["row_id"]
        for r in df.filter(
            ((F.col("q") >= 3) & (F.col("q") <= 5)) | (F.col("q") == 49)
        ).collect()
    )
    out, path = smart_filter_any(df, ix, preds, n, threshold=0.1)
    assert path == "index"
    assert sorted(r["row_id"] for r in out.collect()) == want
    # same preds under a tight threshold -> scan path, same rows
    out2, path2 = smart_filter_any(df, ix, preds, n, threshold=0.01)
    assert path2 == "scan"
    assert sorted(r["row_id"] for r in out2.collect()) == want
    # unbounded range side on the scan path
    out3, path3 = smart_filter_any(
        df, ix, [("q", 40, None), ("tag", "t1")], n, threshold=0.05
    )
    assert path3 == "scan"
    want3 = df.filter((F.col("q") >= 40) | (F.col("tag") == "t1")).count()
    assert out3.count() == want3


def test_phrase_with_apostrophe_is_escaped(spark, docs=None):
    """A phrase containing an apostrophe must not break (or inject into)
    the generated SQL in either dialect."""
    import duckdb

    from iodf_spark.operators.search import phrase_search, phrase_search_oracle

    rows = [(0, "don't stop believing"), (1, "do not stop"), (2, "don't go")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        r["doc_id"] for r in phrase_search(df, "doc_id", "text", "don't stop").collect()
    )
    assert got == [0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        "(0, 'don''t stop believing'), (1, 'do not stop'), (2, 'don''t go')"
        ") v(doc_id, text)"
    )
    osql = phrase_search_oracle("doc_id", "text", "docs", "don't stop")
    orc = sorted(r[0] for r in con.execute(osql).fetchall())
    assert orc == [0]


def test_plan_stats_batch_matches_per_call_decisions(spark):
    """plan_stats-fed planner calls must make the identical decisions and
    rows as unfed ones (the batch is a pure caching layer), fs_mixed on an
    empty batch is [], and duplicate predicates dedupe to the first form."""
    from iodf_spark.operators.access import (
        plan_stats,
        smart_filter,
        smart_filter_all,
        smart_filter_any,
    )
    from iodf_spark.operators.index import fs_mixed
    from iodf_spark.sources.tables import with_row_id

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).cast("double").alias("q"),
        F.concat(F.lit("t"), (F.col("id") % 4)).alias("tag"),
    )
    df = with_row_id(df, ["k"])
    n = 1000
    ix = idx.build_index(df, idx.IndexConf(include=["q", "tag"]), n_rows=n)
    assert fs_mixed(ix, []) == []
    preds = [("q", 3.0), ("tag", "t1"), ("q", 10, 12), ("q", 3.0)]
    stats = plan_stats(ix, preds)
    assert len(stats) == 3  # duplicate (q, 3.0) deduped
    assert stats[("q", 3.0)] == df.filter("q = 3").count()
    assert stats[("q", 10, 12)] == df.filter("q between 10 and 12").count()
    # fed vs unfed: same path, same rows, for all three planners
    a1, p1 = smart_filter(df, ix, "q", 3.0, n)
    a2, p2 = smart_filter(df, ix, "q", 3.0, n, sel=stats)
    assert p1 == p2
    assert sorted(r["row_id"] for r in a1.collect()) == sorted(
        r["row_id"] for r in a2.collect()
    )
    c1, r1 = smart_filter_all(df, ix, [("q", 3.0), ("tag", "t1")], n)
    c2, r2 = smart_filter_all(df, ix, [("q", 3.0), ("tag", "t1")], n, sel=stats)
    assert r1 == r2
    assert sorted(r["row_id"] for r in c1.collect()) == sorted(
        r["row_id"] for r in c2.collect()
    )
    d1, pa1 = smart_filter_any(df, ix, [("q", 3.0), ("q", 10, 12)], n)
    d2, pa2 = smart_filter_any(df, ix, [("q", 3.0), ("q", 10, 12)], n, sel=stats)
    assert pa1 == pa2
    assert sorted(r["row_id"] for r in d1.collect()) == sorted(
        r["row_id"] for r in d2.collect()
    )


def test_hybrid_rrf_fuses_both_lists(spark):
    """A doc ranked in BOTH lists must out-score a doc ranked in only one
    at comparable rank; docs in one list still appear (missing-rank term
    contributes 0); re-run is deterministic."""
    from iodf_spark.operators import index as IX
    from iodf_spark.operators.search import hybrid_rrf_topk

    # corpus: doc 0 matches the query term AND is the nearest embedding;
    # doc 1 only matches the term; doc 2 is only an embedding neighbor
    docs = spark.createDataFrame(
        [
            (0, "spark engine spark"),
            (1, "spark job"),
            (2, "unrelated words here"),
            (3, "other text entirely"),
        ],
        "row_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),      # orthogonal to the query
            (2, [0.9, 0.1]),
            (3, [1.0, 0.05]),     # the query vector's own row
        ],
        "vec_id long, embedding array<float>",
    )
    ix = IX.build_index(
        docs, IX.IndexConf(include=["text"], analyzers={"text": IX.text_analyzer}),
        n_rows=4,
    )
    got = hybrid_rrf_topk(
        docs, ix, "text", ["spark"], emb, "vec_id", "embedding",
        query_vec_id=3, n_rows=4, k=4, dim=2,
    ).collect()
    order = [r["row_id"] for r in got]
    scores = {r["row_id"]: r["score"] for r in got}
    # doc 0: bm25 rank 1 + ann rank 1 -> in both lists, must lead
    assert order[0] == 0, got
    # one-list docs still present: 1 (bm25 only), 2 (ann only)
    assert {1, 2} <= set(order), got
    assert scores[0] > max(scores[1], scores[2]), got
    again = hybrid_rrf_topk(
        docs, ix, "text", ["spark"], emb, "vec_id", "embedding",
        query_vec_id=3, n_rows=4, k=4, dim=2,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
