"""KNN parity vs a pure-Python ground-truth implementation of the
reference algorithm (ml/Knn.scala semantics re-derived in SURVEY.md §2.13):
trained weights, distances, top-k with stable tie-break."""

import math
import random

import pytest
from pyspark.sql import functions as F

from iodf_spark.functions.costats_math import costats_py
from iodf_spark.operators.knn import distances, key_value_weights, knn


def ref_weights(rows, feature_cols, targets, var_d_filter):
    n = len(rows)
    fb = sum(targets)
    keys: dict[tuple[str, str], list[int]] = {}
    for i, r in enumerate(rows):
        for c in feature_cols:
            if r[c] is not None:
                keys.setdefault((c, str(r[c])), []).append(i)
    w = {}
    for kv, ids in keys.items():
        fa = len(ids)
        fab = sum(1 for i in ids if targets[i])
        st = costats_py(n, fa, fb, fab)
        w1 = abs(math.log(st["d_ft"] / st["d_ff"]))
        w2 = abs(math.log(st["d_tt"] / st["d_tf"]))
        if w1 >= var_d_filter:
            w[kv] = (w1, w2)
    return w


def ref_distances(rows, feature_cols, w, query):
    x = {(c, str(v)) for c, v in query.items() if v is not None}
    out = []
    for i, r in enumerate(rows):
        e = {(c, str(r[c])) for c in feature_cols if r[c] is not None}
        d = sum(w[kv][0] for kv in e if kv in w and kv not in x)
        d += sum(w[kv][1] for kv in x if kv in w and kv not in e)
        out.append((d, i))
    return out


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(7)
    rows = [
        {
            "row_id": i,
            "color": rng.choice(["red", "green", "blue", None]),
            "shape": rng.choice(["circle", "square", "tri"]),
            "size_cls": rng.choice(["S", "M", "L"]),
            "hot": rng.random() < 0.3,
        }
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(r["row_id"], r["color"], r["shape"], r["size_cls"], r["hot"]) for r in rows],
        "row_id long, color string, shape string, size_cls string, hot boolean",
    )
    return rows, df


FEATURES = ["color", "shape", "size_cls"]


def test_weights_match_ground_truth(spark, data):
    rows, df = data
    targets = [r["hot"] for r in rows]
    exp = ref_weights(rows, FEATURES, targets, 0.0)
    got = {
        (r["col_name"], r["value"]): (r["w1"], r["w2"])
        for r in key_value_weights(df, FEATURES, F.col("hot"), 0.0).collect()
    }
    assert set(got) == set(exp)
    for kv in exp:
        assert got[kv][0] == pytest.approx(exp[kv][0], rel=1e-12)
        assert got[kv][1] == pytest.approx(exp[kv][1], rel=1e-12)


def test_distances_and_topk(spark, data):
    rows, df = data
    targets = [r["hot"] for r in rows]
    w = ref_weights(rows, FEATURES, targets, 0.0)
    query = {"color": "red", "shape": "circle", "size_cls": "M"}
    exp = ref_distances(rows, FEATURES, w, query)

    wdf = key_value_weights(df, FEATURES, F.col("hot"), 0.0)
    got = {r["row_id"]: r["dist"] for r in distances(df, FEATURES, wdf, query).collect()}
    assert len(got) == len(rows)
    for d, i in exp:
        assert got[i] == pytest.approx(d, rel=1e-9, abs=1e-12), i

    k = 15
    exp_top = sorted(exp, key=lambda t: (t[0], t[1]))[:k]
    got_top = [(r["dist"], r["row_id"]) for r in knn(df, FEATURES, wdf, query, k).collect()]
    assert [i for _, i in got_top] == [i for _, i in exp_top]


def test_var_d_filter_prunes(spark, data):
    rows, df = data
    targets = [r["hot"] for r in rows]
    thr = 0.05
    exp = ref_weights(rows, FEATURES, targets, thr)
    got = key_value_weights(df, FEATURES, F.col("hot"), thr).collect()
    assert {(r["col_name"], r["value"]) for r in got} == set(exp)


def test_ragged_vectors_raise(spark):
    """_infer_dim validates uniform width in its probe agg: a ragged vector
    column must fail loudly instead of silently NULLing every cosine."""
    import pytest as _pytest

    from iodf_spark.operators.similarity import _infer_dim

    ok = spark.createDataFrame([(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id long, vec array<double>")
    assert _infer_dim(ok, "vec") == 2
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0, 5.0])], "id long, vec array<double>"
    )
    with _pytest.raises(ValueError, match="ragged"):
        _infer_dim(ragged, "vec")


def test_lsh_candidate_pairs_subset_of_exact(spark, sf_dir):
    """LSH-bucketed candidate pairs are a recall<1 SUBSET of the exact
    block-grid pairs at the same threshold, with identical cosines on the
    pairs both emit (same quantized arithmetic) — and every same-bucket
    true pair is found (no false negatives within a bucket)."""
    from iodf_spark.operators.similarity import cosine_pairs, lsh_candidate_pairs
    from iodf_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_pairs(emb, "vec_id", "embedding").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in lsh_candidate_pairs(emb, "vec_id", "embedding").collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
