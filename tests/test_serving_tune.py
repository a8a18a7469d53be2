"""Adaptive n_probe (round-12 verdict #4): the IVF store's serving probe
width derived from a MEASURED recall@k target and frozen in a serving
sidecar — data-dependent (cell skew), not a guess. The tuner is closed
form (one brute-force truth job + the query x centroid ranking — recall
as a function of n_probe for every width at once, no probe-job sweep),
so tuning costs O(corpus), independent of n_cells.

Geometry fixtures are deterministic 2-d unit vectors: centroid directions
at 0/90/180/270 degrees; a TIGHT corpus puts every neighborhood inside
one cell (n_probe=1 suffices), a STRADDLING corpus centers every
neighborhood on a cell boundary (half of each query's true neighbors
live in the adjacent cell — n_probe=1 recall ~0.5, the tuner must widen).
"""

import math

import pytest
from pyspark.sql import functions as F

from iodf_spark.operators.ann_maintenance import (
    ann_apply_deletes,
    ann_compact_deletes,
    ann_tune_n_probe,
    read_serving_sidecar,
)
from iodf_spark.operators.similarity import ann_brute_force, ann_ivf_store, ann_recall, ivf_build_store

CENTS = [
    [1.0, 0.0],
    [0.0, 1.0],
    [-1.0, 0.0],
    [0.0, -1.0],
]


def _ring(spark, angles_deg):
    rows = [
        (i, [math.cos(math.radians(a)), math.sin(math.radians(a))])
        for i, a in enumerate(angles_deg)
    ]
    return spark.createDataFrame(rows, "vid bigint, vec array<double>")


def _tight_angles():
    # 12 points hugging each centroid direction: every point's neighbors
    # share its cell
    out = []
    for c in (0, 90, 180, 270):
        out += [c + d for d in (-6, -5, -4, -3, -2, -1, 1, 2, 3, 4, 5, 6)]
    return out


def _straddle_angles():
    # neighborhoods centered ON the 45/135/225/315-degree cell boundaries,
    # SIX points per boundary within +-3 degrees: every point's top-5
    # exact neighbors are its 5 groupmates, and 2-3 of them always sit in
    # the ADJACENT cell — n_probe=1 recall is ~0.5 everywhere, so the
    # tuner must widen
    out = []
    for b in (45, 135, 225, 315):
        out += [b + d for d in (-3, -2, -1, 1, 2, 3)]
    return out


@pytest.fixture()
def tight_store(spark, tmp_path):
    path = str(tmp_path / "tight")
    ivf_build_store(
        _ring(spark, _tight_angles()), "vid", "vec", path,
        n_centroids=4, dim=2, cent_vecs=CENTS,
    )
    return path


@pytest.fixture()
def straddle_store(spark, tmp_path):
    path = str(tmp_path / "straddle")
    ivf_build_store(
        _ring(spark, _straddle_angles()), "vid", "vec", path,
        n_centroids=4, dim=2, cent_vecs=CENTS,
    )
    return path


def test_skewed_store_auto_selects_wider_probe(spark, tight_store, straddle_store):
    """The tuner must read the store's geometry: a tight store serves the
    recall target at n_probe=1; a boundary-straddling store CANNOT (half
    of every true neighborhood lives in the adjacent cell) and the tuner
    widens until the measured recall clears the target."""
    t = ann_tune_n_probe(spark, tight_store, k=5, recall_target=0.9)
    assert t["n_probe"] == 1 and t["measured_recall"] >= 0.9
    s = ann_tune_n_probe(spark, straddle_store, k=5, recall_target=0.9)
    assert s["n_probe"] > 1, s
    assert s["measured_recall"] >= 0.9
    # the sidecar is durable, readable metadata
    assert read_serving_sidecar(straddle_store)["n_probe"] == s["n_probe"]
    assert read_serving_sidecar(straddle_store)["n_cells"] == 4
    # the full width->recall curve rides along, monotone (nested probes)
    curve = [s["recall_curve"][str(p)] for p in range(1, 5)]
    assert curve == sorted(curve) and curve[0] < 0.9 <= curve[s["n_probe"] - 1]


def test_auto_probe_hits_recall_floor_end_to_end(spark, straddle_store):
    """ann_ivf_store(n_probe='auto') must deliver the tuned recall on the
    serving path itself: recall@5 vs brute force >= the target the tuner
    was given — and an UNTUNED store must refuse 'auto' loudly."""
    corpus = _ring(spark, _straddle_angles())
    with pytest.raises(ValueError, match="serving sidecar"):
        ann_ivf_store(
            corpus, "vid", "vec", straddle_store, [0, 6, 12, 18],
            k=5, n_centroids=4, n_probe="auto", dim=2,
        )
    ann_tune_n_probe(spark, straddle_store, k=5, recall_target=0.9)
    truth = ann_brute_force(corpus, "vid", "vec", [0, 6, 12, 18], k=5, dim=2)
    approx = ann_ivf_store(
        corpus, "vid", "vec", straddle_store, [0, 6, 12, 18],
        k=5, n_centroids=4, n_probe="auto", dim=2,
    )
    summary = ann_recall(truth, approx, k=5).agg(F.avg("recall")).collect()[0][0]
    assert summary >= 0.9, summary


def test_tuned_n_probe_survives_takedown_and_compaction(spark, straddle_store):
    """The serving sidecar lives in _maintenance next to the ledger:
    takedowns and cell-rewrite compaction must not touch it, and the
    tuned width must still clear the recall floor on the post-compaction
    live store (measured against post-takedown truth)."""
    doc = ann_tune_n_probe(spark, straddle_store, k=5, recall_target=0.9)
    gone = [1, 7, 13, 19]
    ann_apply_deletes(
        spark, straddle_store, spark.createDataFrame([(i,) for i in gone], "vid bigint")
    )
    ann_compact_deletes(spark, straddle_store)
    assert read_serving_sidecar(straddle_store) == doc  # untouched
    live = _ring(spark, _straddle_angles()).filter(~F.col("vid").isin(gone))
    truth = ann_brute_force(live, "vid", "vec", [0, 6, 12, 18], k=5, dim=2)
    approx = ann_ivf_store(
        live, "vid", "vec", straddle_store, [0, 6, 12, 18],
        k=5, n_centroids=4, n_probe="auto", dim=2,
    )
    mean = ann_recall(truth, approx, k=5).agg(F.avg("recall")).collect()[0][0]
    assert mean >= 0.9, mean
    got = {r["neighbor_id"] for r in approx.collect()}
    assert got.isdisjoint(set(gone))


def test_tuner_refuses_codes_only_stores_loudly(spark, tmp_path):
    """IVF-PQ stores carry m-byte codes, not vectors — the tuner's
    brute-force truth is impossible there and must refuse with guidance,
    never fail with a missing-column plan error."""
    from iodf_spark.operators.similarity import ivfpq_build_store

    path = str(tmp_path / "ivfpq")
    ivfpq_build_store(
        _ring(spark, _tight_angles()), "vid", "vec", path,
        n_centroids=4, m_subspaces=2, n_codes=4, dim=2,
    )
    with pytest.raises(ValueError, match="full-vector IVF store"):
        ann_tune_n_probe(spark, path, k=5, recall_target=0.9)


def test_tune_is_deterministic_and_self_contained(spark, tight_store):
    """Same store, same params -> byte-identical sidecar (the tuner
    samples queries hash-ordered from the store itself; no RNG)."""
    d1 = ann_tune_n_probe(spark, tight_store, k=5, recall_target=0.9)
    d2 = ann_tune_n_probe(spark, tight_store, k=5, recall_target=0.9)
    # identical MEASUREMENT; only the wall-clock provenance stamp moves
    strip = lambda d: {k: v for k, v in d.items() if k != "tuned_committed_at"}
    assert strip(d1) == strip(d2)
    # external-query tuning path: a query vector pinned on a boundary
    # needs both adjacent cells even on the tight store
    d3 = ann_tune_n_probe(
        spark, tight_store, k=6, recall_target=0.99,
        query_vecs={-1: [math.cos(math.radians(45)), math.sin(math.radians(45))]},
    )
    assert d3["n_probe"] >= 2


# -- round 13: the IVF-PQ width-carry recipe + tune-time provenance ---------


def test_width_carry_recipe_serves_codes_only_store(spark, tmp_path):
    """The 100 TB serving configuration (codes-only IVF-PQ) gets a
    MEASURED width: ann_tune_ivfpq builds a plain-IVF tuning store over
    the training slice around the PQ store's own frozen centroids, tunes
    there (full-vector truth), and carries the width into the PQ store's
    sidecar — after which n_probe='auto' serves it and clears the recall
    floor end-to-end (rerank recovers exactness within the probed cells,
    so the carried cell-prune bound is the binding one)."""
    from iodf_spark.operators.ann_maintenance import ann_tune_ivfpq
    from iodf_spark.operators.similarity import ivfpq_build_store

    corpus = _ring(spark, _straddle_angles())
    pq = str(tmp_path / "pq")
    ivfpq_build_store(
        corpus, "vid", "vec", pq,
        n_centroids=4, m_subspaces=2, n_codes=4, dim=2, cent_vecs=CENTS,
    )
    from iodf_spark.operators.similarity import ann_ivfpq_store

    # untuned codes-only store: 'auto' refuses loudly, naming the recipe
    with pytest.raises(ValueError, match="width-carry"):
        ann_ivfpq_store(
            corpus, "vid", "vec", pq, [0], k=5,
            n_centroids=4, n_probe="auto", m_subspaces=2, n_codes=4, dim=2,
        )
    doc = ann_tune_ivfpq(
        spark, pq, corpus, "vid", "vec", str(tmp_path / "tuning"),
        k=5, recall_target=0.9,
    )
    assert doc["carried_from"] == str(tmp_path / "tuning")
    assert doc["n_probe"] > 1  # the straddling geometry forces widening
    assert doc["measured_recall"] >= 0.9
    from iodf_spark.operators.ann_maintenance import read_serving_sidecar

    assert read_serving_sidecar(pq) == doc
    truth = ann_brute_force(corpus, "vid", "vec", [0, 6, 12, 18], k=5, dim=2)
    approx = ann_ivfpq_store(
        corpus, "vid", "vec", pq, [0, 6, 12, 18], k=5,
        n_centroids=4, n_probe="auto", m_subspaces=2, n_codes=4, dim=2,
        rerank=10,
    )
    mean = ann_recall(truth, approx, k=5).agg(F.avg("recall")).collect()[0][0]
    assert mean >= 0.9, mean


def test_carry_refuses_mismatched_quantizers(spark, tmp_path):
    """A width is a property of the coarse quantizer's cell ranking:
    carrying between stores frozen around DIFFERENT centroids must
    refuse, not silently serve a width measured on other cells."""
    from iodf_spark.operators.ann_maintenance import (
        ann_carry_serving,
        ann_tune_n_probe,
    )
    from iodf_spark.operators.similarity import ivfpq_build_store

    corpus = _ring(spark, _straddle_angles())
    rotated = [
        [math.cos(math.radians(a + 45)), math.sin(math.radians(a + 45))]
        for a in (0, 90, 180, 270)
    ]
    tuning = str(tmp_path / "tuning")
    ivf_build_store(
        corpus, "vid", "vec", tuning, n_centroids=4, dim=2, cent_vecs=rotated
    )
    ann_tune_n_probe(spark, tuning, k=5, recall_target=0.9)
    pq = str(tmp_path / "pq")
    ivfpq_build_store(
        corpus, "vid", "vec", pq,
        n_centroids=4, m_subspaces=2, n_codes=4, dim=2, cent_vecs=CENTS,
    )
    with pytest.raises(ValueError, match="DIFFERENT coarse quantizers"):
        ann_carry_serving(tuning, pq)
    # an untuned tuning store refuses before any comparison
    bare = str(tmp_path / "bare")
    ivf_build_store(
        corpus, "vid", "vec", bare, n_centroids=4, dim=2, cent_vecs=CENTS
    )
    with pytest.raises(ValueError, match="no serving sidecar"):
        ann_carry_serving(bare, pq)


def test_carried_width_survives_takedown_and_compaction(spark, tmp_path):
    """The carried sidecar rides the PQ store's takedown/compaction
    lifecycle untouched, and 'auto' still clears the floor on the
    post-compaction live store (truth recomputed without the victims)."""
    from iodf_spark.operators.ann_maintenance import (
        ann_tune_ivfpq,
        read_serving_sidecar,
    )
    from iodf_spark.operators.similarity import ann_ivfpq_store, ivfpq_build_store

    corpus = _ring(spark, _straddle_angles())
    pq = str(tmp_path / "pq")
    ivfpq_build_store(
        corpus, "vid", "vec", pq,
        n_centroids=4, m_subspaces=2, n_codes=4, dim=2, cent_vecs=CENTS,
    )
    doc = ann_tune_ivfpq(
        spark, pq, corpus, "vid", "vec", str(tmp_path / "tuning"),
        k=5, recall_target=0.9,
    )
    gone = [1, 7, 13, 19]
    ann_apply_deletes(
        spark, pq, spark.createDataFrame([(i,) for i in gone], "vid bigint")
    )
    ann_compact_deletes(spark, pq)
    assert read_serving_sidecar(pq) == doc  # untouched by the rewrite
    live = corpus.filter(~F.col("vid").isin(gone))
    truth = ann_brute_force(live, "vid", "vec", [0, 6, 12, 18], k=5, dim=2)
    approx = ann_ivfpq_store(
        live, "vid", "vec", pq, [0, 6, 12, 18], k=5,
        n_centroids=4, n_probe="auto", m_subspaces=2, n_codes=4, dim=2,
        rerank=10,
    )
    mean = ann_recall(truth, approx, k=5).agg(F.avg("recall")).collect()[0][0]
    assert mean >= 0.9, mean
    assert {r["neighbor_id"] for r in approx.collect()}.isdisjoint(set(gone))


def test_describe_surfaces_serving_staleness(spark, tmp_path):
    """Round-13 verdict #5: the sidecar carries tune-time provenance and
    describe() surfaces the version delta since tune — tune -> 0, append
    (a manifest commit) -> >= 1, re-tune -> 0 again."""
    from iodf_spark.operators.ann_maintenance import (
        ann_manifest_init,
        ann_store_describe,
        ann_tune_n_probe,
        read_centroid_sidecar,
        read_serving_sidecar,
        serving_staleness,
    )
    from iodf_spark.operators.similarity import ivf_append

    path = str(tmp_path / "store")
    ivf_build_store(
        _ring(spark, _straddle_angles()), "vid", "vec", path,
        n_centroids=4, dim=2, cent_vecs=CENTS,
    )
    ann_manifest_init(path)
    assert serving_staleness(path) is None  # untuned
    doc = ann_tune_n_probe(spark, path, k=5, recall_target=0.9)
    assert doc["tuned_at_version"] == 1
    assert doc["tuned_committed_at"] > 0
    d = ann_store_describe(spark, path)
    assert d["serving_staleness"]["versions_since_tune"] == 0
    # growth: an append commits a manifest version -> the gap is visible
    more = _ring(spark, [33.0, 57.0]).select(
        (F.col("vid") + 1000).alias("vid"), "vec"
    )
    ivf_append(
        spark, path, more, "vid", "vec", n_centroids=4, dim=2,
        cent=read_centroid_sidecar(spark, path),
    )
    d2 = ann_store_describe(spark, path)
    assert d2["serving_staleness"]["versions_since_tune"] >= 1
    assert d2["serving_staleness"]["tuned_at_version"] == 1
    # the sidecar itself is unchanged by growth (no silent re-tune)
    assert read_serving_sidecar(path) == doc
    # re-tune clears the gap
    ann_tune_n_probe(spark, path, k=5, recall_target=0.9)
    d3 = ann_store_describe(spark, path)
    assert d3["serving_staleness"]["versions_since_tune"] == 0
