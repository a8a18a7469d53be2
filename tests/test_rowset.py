"""Property-matrix tests for the posting-list row-set algebra against a
pure-Python set ground truth — mirrors the reference's BitsTest strategy
(BitsTest.scala:45-139: random bits at sparsity p=2^-i, all ops checked
against the Seq[Boolean] ground truth).

Small n + small bucket_size so bucketing boundaries are exercised.
"""

import random

import pytest

from iodf_spark.plans.rowset import PostingSet

N = 200
BS = 32  # deliberately tiny buckets: ops must cross bucket boundaries


def make_sets(spark, seed: int, p_denom: int, enc_a: str = "sparse", enc_b: str = "sparse"):
    rng = random.Random(seed)
    a = [i for i in range(N) if rng.random() < 1.0 / p_denom]
    b = [i for i in range(N) if rng.random() < 1.0 / p_denom]
    return (
        set(a),
        set(b),
        PostingSet.from_positions(spark, a, N, BS, encoding=enc_a),
        PostingSet.from_positions(spark, b, N, BS, encoding=enc_b),
    )


# the reference's representation matrix (BitsTest.scala:237-281): every op
# must agree for every combination of physical encodings
ENCODINGS = [
    ("sparse", "sparse"),
    ("sparse", "dense"),
    ("dense", "sparse"),
    ("dense", "dense"),
    ("adaptive", "adaptive"),
]


@pytest.mark.parametrize("enc_a,enc_b", ENCODINGS)
@pytest.mark.parametrize("round_", [0, 2])
def test_algebra_matches_ground_truth(spark, round_, enc_a, enc_b):
    p_denom = 2 ** (round_ + 1)
    sa, sb, pa, pb = make_sets(spark, round_, p_denom, enc_a, enc_b)
    universe = set(range(N))

    assert pa.f() == len(sa)
    assert (pa & pb).to_list() == sorted(sa & sb)
    assert (pa | pb).to_list() == sorted(sa | sb)
    assert pa.andnot(pb).to_list() == sorted(sa - sb)
    assert pb.andnot(pa).to_list() == sorted(sb - sa)
    assert (~pa).to_list() == sorted(universe - sa)
    assert (~pb).to_list() == sorted(universe - sb)
    # fAnd without materialization (B1): count equals len of intersection
    assert (pa & pb).f() == len(sa & sb)
    # ops compose across encodings: (a & ~b) == a andnot b
    assert (pa & (~pb)).to_list() == sorted(sa - sb)


@pytest.mark.parametrize("enc", ["sparse", "dense"])
def test_merge_and_view_per_encoding(spark, enc):
    sa, sb, pa, pb = make_sets(spark, 11, 2, enc, enc)
    merged = pa.merge(pb)
    assert merged.n == 2 * N
    assert merged.to_list() == sorted(sa) + [N + i for i in sorted(sb)]
    v = pa.view(10, 150)
    assert v.to_list() == sorted(i - 10 for i in sa if 10 <= i < 150)


def test_merge_is_concatenation_not_or(spark):
    # B5: merge concatenates row spaces (ioseq/IoBits.scala:328-348)
    sa, sb, pa, pb = make_sets(spark, 42, 4)
    merged = pa.merge(pb)
    assert merged.n == 2 * N
    expected = sorted(sa) + [N + i for i in sorted(sb)]
    assert merged.to_list() == expected
    # unaligned: a view with non-bucket-aligned length, then merge
    va = pa.view(5, 100)  # length 95, not a multiple of BS
    merged2 = va.merge(pb)
    exp2 = sorted(i - 5 for i in sa if 5 <= i < 100) + [95 + i for i in sorted(sb)]
    assert merged2.to_list() == exp2
    assert merged2.n == 95 + N


def test_view_slices_and_rebases(spark):
    sa, _, pa, _ = make_sets(spark, 7, 2)
    v = pa.view(10, 150)
    assert v.n == 140
    assert v.to_list() == sorted(i - 10 for i in sa if 10 <= i < 150)
    # view of view composes (Df.scala:104-107)
    vv = v.view(20, 60)
    assert vv.to_list() == sorted(i - 30 for i in sa if 30 <= i < 70)


@pytest.mark.parametrize("enc", ["sparse", "dense", "adaptive"])
@pytest.mark.parametrize(
    "start,until",
    [(BS, 5 * BS), (0, 3 * BS), (2 * BS, N + 7), (BS, N)],  # aligned fast path
)
def test_view_bucket_aligned_fast_path(spark, enc, start, until):
    """Aligned views are a pure bucket renumber (dense words unchanged, no
    explode) — must agree with the ground truth for every encoding, and
    keep the source's encodings (a dense view of a dense set stays dense)."""
    sa, _, pa, _ = make_sets(spark, 13, 2, enc, enc)
    v = pa.view(start, until)
    hi = min(until, N)
    assert v.n == hi - start
    assert v.to_list() == sorted(i - start for i in sa if start <= i < hi)
    assert v.encodings == pa.encodings


def test_empty_and_full(spark):
    e = PostingSet.empty(spark, N, BS)
    f = PostingSet.full(spark, N, BS)
    assert e.f() == 0
    assert f.f() == N
    assert (~e).f() == N
    assert (~f).f() == 0
    sa, _, pa, _ = make_sets(spark, 3, 2)
    assert (pa & f).to_list() == sorted(sa)
    assert (pa & e).f() == 0
    assert (pa | e).to_list() == sorted(sa)


def test_empty_sparse_array_in_mixed_bucket_keeps_dense_words(spark):
    """Regression (round-2 advice): externally-supplied posting rows may
    violate the no-empty-arrays invariant; a mixed-encoding OR/ANDNOT must
    not drop a bucket's dense words when the sparse side's array is EMPTY
    (the scatter side produces no rows — only a left join keeps the
    bucket)."""
    from pyspark.sql import functions as F

    dense = PostingSet.from_positions(spark, [0, 1, 40], N, BS, encoding="dense")
    # sparse set whose bucket-0 array is EMPTY (externally constructed)
    empty_rows = spark.createDataFrame(
        [(0, [])], "bucket long, row_ids array<long>"
    )
    hollow = PostingSet(empty_rows, N, BS)  # encodings unknown -> general path
    assert sorted((dense | hollow).to_list()) == [0, 1, 40]
    assert sorted(dense.andnot(hollow).to_list()) == [0, 1, 40]


@pytest.mark.parametrize("bs", [64, 128])  # whole-word buckets: ws=0 and ws>0
@pytest.mark.parametrize(
    "enc_a,enc_b",
    [("sparse", "sparse"), ("dense", "dense"), ("sparse", "dense"), ("dense", "sparse")],
)
def test_unaligned_merge_word_shift_path(spark, bs, enc_a, enc_b):
    """Unaligned merge at production bucket geometry (bucket_size % 64 == 0)
    takes the bucket-local word/bit-shift path — dense words are shifted,
    never exploded. N=200 gives offset r = 200 % bs in (0, bs) with a
    non-zero bit shift, and bs=128 additionally crosses a word boundary
    (ws=1). Every encoding combination must match the ground truth, and a
    second merge on the (now mixed, differently-unaligned) result must
    too."""
    rng = random.Random(bs)
    a = [i for i in range(N) if rng.random() < 0.4]
    b = [i for i in range(N) if rng.random() < 0.4]
    pa = PostingSet.from_positions(spark, a, N, bs, encoding=enc_a)
    pb = PostingSet.from_positions(spark, b, N, bs, encoding=enc_b)
    merged = pa.merge(pb)
    assert merged.n == 2 * N
    assert merged.to_list() == sorted(a) + [N + i for i in sorted(b)]
    assert merged.f() == len(a) + len(b)
    # chain: merge onto the merged result (offset 2N, differently unaligned)
    pc_src = [i for i in range(N) if rng.random() < 0.4]
    pc = PostingSet.from_positions(spark, pc_src, N, bs, encoding=enc_b)
    chained = merged.merge(pc)
    assert chained.to_list() == (
        sorted(a) + [N + i for i in sorted(b)] + [2 * N + i for i in sorted(pc_src)]
    )


@pytest.mark.parametrize("enc", ["sparse", "dense", "adaptive"])
def test_trues_after_seek_semantics(spark, enc):
    """B6 cursor parity: trues_after(t, k) == the first k set ids >= t from
    the Python ground truth, for every encoding, including seeks landing
    mid-bucket, on a set id, past the last id, and at 0 (Scanner.seek,
    utils/MergeSortIterator.scala:34-58)."""
    rng = random.Random(7)
    ids = sorted({rng.randrange(N) for _ in range(60)})
    ps = PostingSet.from_positions(spark, ids, N, BS, encoding=enc)
    for t in [0, 1, ids[3], ids[3] + 1, BS, BS * 3 - 1, N - 1, N + 5]:
        for k in [1, 5, 1000]:
            expect = [i for i in ids if i >= t][:k]
            got = [r["row_id"] for r in ps.trues_after(t, k).collect()]
            assert got == expect, (enc, t, k)
