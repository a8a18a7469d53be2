"""n-ary AND/OR (intersect_all / union_all): one-shuffle k-way combinators
must equal both the Python set ground truth and the binary-op folds, for
every encoding mix, arity, disjoint/overlapping bucket layouts, and empty
results — and the plan must carry ONE exchange regardless of arity."""

import random

import pytest
from pyspark.sql import functions as F

from iodf_spark.plans.rowset import PostingSet, intersect_all, union_all

N = 200
BS = 32


def _mk(spark, ids, enc):
    return PostingSet.from_positions(spark, sorted(ids), N, BS, encoding=enc)


def _rand_sets(seed: int, k: int, p: float):
    rng = random.Random(seed)
    return [{i for i in range(N) if rng.random() < p} for _ in range(k)]


ENC_MIXES = [
    ["sparse"] * 4,
    ["dense"] * 4,
    ["sparse", "dense", "sparse", "dense"],
    ["adaptive"] * 4,
    ["dense", "sparse", "adaptive", "dense"],
]


@pytest.mark.parametrize("encs", ENC_MIXES)
def test_nary_equals_ground_truth_and_binary_fold(spark, encs):
    for seed, p in [(1, 0.3), (2, 0.05), (3, 0.8)]:
        pys = _rand_sets(seed, len(encs), p)
        pss = [_mk(spark, s, e) for s, e in zip(pys, encs)]

        want_and = set.intersection(*pys)
        got_and = intersect_all(pss).to_list()
        assert got_and == sorted(want_and), (encs, seed, "and")
        fold = pss[0]
        for s in pss[1:]:
            fold = fold & s
        assert got_and == fold.to_list()

        want_or = set.union(*pys)
        got_or = union_all(pss).to_list()
        assert got_or == sorted(want_or), (encs, seed, "or")
        foldo = pss[0]
        for s in pss[1:]:
            foldo = foldo | s
        assert got_or == foldo.to_list()


def test_nary_bucket_asymmetry_and_empty(spark):
    # operands covering DISJOINT buckets: AND empty, OR = concat
    a = {1, 2, 3}                      # bucket 0
    b = {40, 41}                       # bucket 1
    c = {100, 130}                     # buckets 3, 4
    pa, pb, pc = (_mk(spark, s, e) for s, e in [(a, "sparse"), (b, "dense"), (c, "sparse")])
    assert intersect_all([pa, pb, pc]).to_list() == []
    assert union_all([pa, pb, pc]).to_list() == sorted(a | b | c)
    # single operand passes through; empty list raises
    assert intersect_all([pa]).to_list() == sorted(a)
    with pytest.raises(ValueError):
        intersect_all([])
    with pytest.raises(ValueError):
        union_all([])


def test_nary_f_and_popcount(spark):
    pys = _rand_sets(9, 5, 0.4)
    pss = [_mk(spark, s, "adaptive") for s in pys]
    assert intersect_all(pss).f() == len(set.intersection(*pys))
    assert union_all(pss).f() == len(set.union(*pys))


def test_nary_adds_at_most_one_exchange_and_no_join_chain(spark):
    """The n-ary form must add at most ONE exchange on top of the operand
    builds (bucket co-partitioning lets Catalyst even elide that one), and
    its plan must contain NO join at all — a binary fold plans a k-1-deep
    chain of sequential join stages."""
    pys = _rand_sets(4, 6, 0.3)
    pss = [_mk(spark, s, "sparse") for s in pys]
    builds = sum(
        p.df._jdf.queryExecution().executedPlan().toString().count("Exchange")
        for p in pss
    )
    for op in (intersect_all, union_all):
        plan = op(pss).df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= builds + 1, op.__name__
        assert "Join" not in plan, op.__name__
    fold = pss[0]
    for s in pss[1:]:
        fold = fold & s
    assert fold.df._jdf.queryExecution().executedPlan().toString().count("Join") == 5


def test_nary_mismatched_row_space_rejected(spark):
    a = _mk(spark, {1, 2}, "sparse")
    bad = PostingSet.from_positions(spark, [1], N + 64, BS, encoding="sparse")
    with pytest.raises(ValueError):
        intersect_all([a, bad])


def test_union_posting_rows_dynamic_arity(spark):
    """Dynamic-arity OR (no static operand list): concatenated posting rows
    from several sets union per bucket in one aggregation, equal to the
    static union_all and the python model, across encodings."""
    from pyspark.sql import functions as F

    from iodf_spark.plans.rowset import union_posting_rows

    pys = _rand_sets(11, 4, 0.3)
    encs = ["sparse", "dense", "adaptive", "dense"]
    pss = [_mk(spark, s, e) for s, e in zip(pys, encs)]
    cat = pss[0].df
    for p in pss[1:]:
        cat = cat.unionByName(p.df)
    got = union_posting_rows(cat, N, BS).to_list()
    assert got == sorted(set.union(*pys))
    assert got == union_all(pss).to_list()
    plan = union_posting_rows(cat, N, BS).df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
