"""Hot-bucket cap for the candidate-pair self-joins (capped_candidates):
the 100 TB skew guard for posting-list dedup. An uncapped key shared by m
docs contributes m*(m-1)/2 candidates — one boilerplate shingle or LSH
band bucket becomes a single quadratic join task. With ``max_df``, hot
keys switch to STAR topology (every member pairs with the key's min-id
representative: m-1 candidates), cold keys keep the exact all-pairs path.

Pins, per the documented loss bound:
* sub-quadratic output on a planted hot key (the scale property itself);
* capped candidates are a SUBSET of uncapped (precision untouched);
* a pair sharing ANY cold key survives the cap (recall loss is confined
  to pairs whose every shared key is hot, neither side the rep);
* a no-op cap (max_df >= corpus size) is pair-identical to uncapped —
  the guard costs semantics nothing until a key is actually hot.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iodf_spark.operators.dedup import (
    capped_candidates,
    jaccard_pairs,
    minhash_lsh_pairs,
)


def _ex(spark, postings):
    """posting frame (_id, _s) from [(id, key), ...]."""
    return spark.createDataFrame(
        pd.DataFrame(postings, columns=["_id", "_s"]).astype("int64")
    )


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_hot_key_emits_star_not_quadratic(spark):
    # one key shared by 100 docs (hot), one by 3 docs (cold)
    postings = [(i, 7) for i in range(100)] + [(i, 99) for i in (200, 201, 202)]
    got = _pairs(capped_candidates(_ex(spark, postings), ["_s"], max_df=10))
    star = {(0, i) for i in range(1, 100)}  # rep = min id = 0
    cold = {(200, 201), (200, 202), (201, 202)}
    assert got == star | cold  # 102 candidates, not 4950 + 3


def test_capped_is_subset_of_uncapped(spark):
    postings = [(i, i % 4) for i in range(40)] + [(i, 1000 + i % 7) for i in range(40)]
    ex = _ex(spark, postings)
    capped = _pairs(capped_candidates(ex, ["_s"], max_df=5))
    uncapped = _pairs(capped_candidates(ex, ["_s"], max_df=None))
    assert capped <= uncapped


def test_pair_sharing_a_cold_key_survives(spark):
    # docs 50,51 share hot key 7 (with 20 others) AND private cold key 123:
    # the cap may drop their hot-key meeting, never the cold one
    postings = [(i, 7) for i in range(52)] + [(50, 123), (51, 123)]
    got = _pairs(capped_candidates(_ex(spark, postings), ["_s"], max_df=5))
    assert (50, 51) in got


def test_noop_cap_is_identity(spark):
    postings = [(i, i % 6) for i in range(30)]
    ex = _ex(spark, postings)
    assert _pairs(capped_candidates(ex, ["_s"], max_df=30)) == _pairs(
        capped_candidates(ex, ["_s"], max_df=None)
    )


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).withColumn("doc_id", F.col("doc_id").cast("long"))


def test_minhash_identical_corpus_stays_linear(spark):
    """30 identical docs: every band bucket holds all 30 (hot). Capped
    output is exactly the 29 star pairs at jaccard 1.0 — not 435."""
    docs = _docs(spark, ["alpha beta gamma delta epsilon zeta"] * 30)
    rows = minhash_lsh_pairs(docs, "doc_id", "text", max_df=8).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(0, i) for i in range(1, 30)}
    assert all(r["jaccard"] == 1.0 for r in rows)


def test_jaccard_identical_corpus_stays_linear(spark):
    docs = _docs(spark, ["one two three four five six seven"] * 25)
    rows = jaccard_pairs(docs, "doc_id", "text", max_df=5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(0, i) for i in range(1, 25)}
    assert all(r["jaccard"] == 1.0 for r in rows)


WORDS = ["red", "blue", "green", "gold", "iron", "wolf", "moon", "star"]


@st.composite
def corpora(draw):
    n_dup = draw(st.integers(2, 6))
    boiler = " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=5, max_size=8)))
    uniq = [
        " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=4, max_size=9)))
        for _ in range(draw(st.integers(0, 5)))
    ]
    return [boiler] * n_dup + uniq


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpora(), max_df=st.integers(1, 6))
def test_cap_precision_and_duplicate_connectivity(spark, texts, max_df):
    """Property: (1) capped pairs ⊆ uncapped pairs with identical scores
    (precision); (2) every planted exact-duplicate doc stays CONNECTED to
    the duplicate group in the capped pair graph — the star guarantees
    each hot-bucket member a candidate edge to the representative, and
    identical docs verify at jaccard 1.0, so transitive clustering still
    collapses the group even when pairwise edges were capped away."""
    docs = _docs(spark, texts)
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, "doc_id", "text", max_df=max_df).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, "doc_id", "text").collect()
    }
    assert set(capped) <= set(uncapped)
    assert all(uncapped[p] == j for p, j in capped.items())
    # union-find over the capped VERIFIED pairs: planted duplicates
    # (doc ids 0..n_dup-1 share identical text) must form one component
    n_dup = texts.count(texts[0])
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in capped:
        parent[find(a)] = find(b)
    roots = {find(i) for i in range(n_dup)}
    assert len(roots) == 1, f"duplicate group split: {roots}"


@pytest.mark.parametrize("max_df", [1, 3])
def test_minhash_cap_subset_property(spark, max_df):
    texts = ["a b c d e f g"] * 4 + ["h i j k l m n o"] * 3 + ["p q r s t u v"]
    docs = _docs(spark, texts)
    capped = _pairs(minhash_lsh_pairs(docs, "doc_id", "text", max_df=max_df))
    uncapped = _pairs(minhash_lsh_pairs(docs, "doc_id", "text"))
    assert capped <= uncapped
