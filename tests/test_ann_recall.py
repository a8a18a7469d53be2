"""Distributed ANN recall@k evaluation (operators/similarity.ann_recall):
the standing index-quality harness, checked against driver-side set math
on the planted-cluster corpus (the fixture embeddings are isotropic and
carry no recall signal — see test_trained_quantizers docstring)."""

import math

import pytest
from pyspark.sql import functions as F

from iodf_spark.operators import similarity as S


def _planted(spark, n_clusters=8, per=40, dim=16):
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [math.cos(0.7 * c + 0.31 * j) for j in range(dim)]
        for m in range(per):
            vec = [
                center[j] + 0.05 * math.sin(1.3 * m + 2.9 * j + c)
                for j in range(dim)
            ]
            rows.append((vid, vec))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


QIDS = [0, 45, 90, 135]


def test_recall_of_truth_against_itself_is_one(spark):
    df = _planted(spark, n_clusters=2, per=20)
    truth = S.ann_brute_force(df, "vec_id", "embedding", [0, 21], dim=16)
    rows = S.ann_recall(truth, truth, k=10).collect()
    assert len(rows) == 2
    assert all(r["recall"] == 1.0 and r["n_hit"] == r["n_truth"] == 10 for r in rows)
    s = S.ann_recall_summary(truth, truth, k=10).collect()[0]
    assert (s["n_queries"], s["mean_recall"], s["n_perfect"]) == (2, 1.0, 2)


def test_recall_matches_driver_side_set_math(spark):
    """The operator IS the old collect-and-intersect computation,
    distributed: cross-check exactly on a lossy approx run."""
    df = _planted(spark).cache()
    truth = S.ann_brute_force(df, "vec_id", "embedding", QIDS, dim=16)
    approx = S.ann_ivf(df, "vec_id", "embedding", QIDS, n_centroids=8,
                       n_probe=1, dim=16)
    exact, got = {}, {}
    for r in truth.collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    want = {
        q: len(exact[q] & got.get(q, set())) / len(exact[q]) for q in QIDS
    }
    rows = {r["query_id"]: r for r in S.ann_recall(truth, approx, k=10).collect()}
    df.unpersist()
    assert set(rows) == set(QIDS)
    for q in QIDS:
        assert rows[q]["recall"] == pytest.approx(want[q])
    # summary micro-average agrees
    s = S.ann_recall_summary(truth, approx, k=10).collect()[0]
    assert s["mean_recall"] == pytest.approx(sum(want.values()) / len(want))


def test_recall_monotone_in_n_probe_via_operator(spark):
    df = _planted(spark).cache()
    truth = S.ann_brute_force(df, "vec_id", "embedding", QIDS, dim=16)
    means = []
    for p in (1, 2, 8):
        approx = S.ann_ivf(df, "vec_id", "embedding", QIDS, n_centroids=8,
                           n_probe=p, dim=16)
        means.append(
            S.ann_recall_summary(truth, approx, k=10).collect()[0]["mean_recall"]
        )
    df.unpersist()
    assert means[0] <= means[1] <= means[2]
    assert means[2] == pytest.approx(1.0)  # probing every cell IS exact


def test_recall_small_truth_and_missing_queries(spark):
    # 3-vector corpus: only 2 true neighbors exist per query (k=10 must
    # divide by the truth size, not k) ...
    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.8, 0.2])],
        "vec_id long, embedding array<double>",
    )
    truth = S.ann_brute_force(tiny, "vec_id", "embedding", [0], dim=2)
    r = S.ann_recall(truth, truth, k=10).collect()[0]
    assert (r["n_truth"], r["n_hit"], r["recall"]) == (2, 2, 1.0)
    # ... and a query the approx frame lost entirely scores 0, not absent
    empty = truth.filter("query_id <> query_id")  # zero rows, same schema
    r0 = S.ann_recall(truth, empty, k=10).collect()[0]
    assert (r0["n_hit"], r0["recall"]) == (0, 0.0)


def test_recall_preserved_under_maintenance_lifecycle(spark, tmp_path):
    """The eval composed with the maintenance surface — the reason the
    operator exists: after a takedown of rows OUTSIDE the query
    neighborhoods (deletion-list pruning) and after cell compaction, the
    probed store's recall against the LIVE corpus' brute-force truth must
    be exactly what it was before (here 1.0: n_probe = n_centroids makes
    the pre-delete probe exact)."""
    from iodf_spark.operators.ann_maintenance import (
        ann_apply_deletes,
        ann_compact_deletes,
    )
    from iodf_spark.operators.similarity import ann_ivf_store, ivf_build_store

    df = _planted(spark).cache()
    path = str(tmp_path / "store")
    ivf_build_store(df, "vec_id", "embedding", path, n_centroids=8, dim=16)
    qids = [0, 45]  # cluster-0 members

    def probe(corpus):
        return ann_ivf_store(
            corpus, "vec_id", "embedding", path, qids,
            n_centroids=8, n_probe=8, dim=16,
        )

    truth0 = S.ann_brute_force(df, "vec_id", "embedding", qids, dim=16)
    s0 = S.ann_recall_summary(truth0, probe(df), k=10).collect()[0]
    assert s0["mean_recall"] == 1.0

    # take down three cluster-7 rows (ids 280+): far from every query
    gone = [281, 282, 283]
    ids = spark.createDataFrame([(i,) for i in gone], "vec_id long")
    assert ann_apply_deletes(spark, path, ids) == 3
    live = df.filter(~F.col("vec_id").isin(gone))
    truth1 = S.ann_brute_force(live, "vec_id", "embedding", qids, dim=16)
    s1 = S.ann_recall_summary(truth1, probe(live), k=10).collect()[0]
    assert s1["mean_recall"] == 1.0  # pruning cost zero recall

    ann_compact_deletes(spark, path)  # physical rewrite of touched cells
    s2 = S.ann_recall_summary(truth1, probe(live), k=10).collect()[0]
    df.unpersist()
    assert s2["mean_recall"] == 1.0
