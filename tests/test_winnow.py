"""Winnowing fingerprint properties: Spark operator vs a pure-python model
of the SIGMOD'03 algorithm vs the DuckDB oracle expression, over adversarial
corpora (unicode alphabets, heavy repetition for window-min ties, and
short-doc boundaries around the k+w-1 guarantee length)."""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from iodf_spark.functions import texthash as TH
from iodf_spark.operators.dedup import (
    _winnow_fp_list,
    winnow_fingerprints,
    winnow_pairs,
    winnow_pairs_oracle,
)

K, W = 4, 4


def _tokhash(tok: str) -> int:
    acc = TH.SEED
    for ch in tok:
        acc = (acc * TH.MULT + ord(ch)) % TH.MOD
    return acc


def model_fingerprints(text: str, k: int = K, w: int = W) -> list[int]:
    toks = [t for t in text.split() if t]
    hs = [_tokhash(t) for t in toks]
    grams = []
    for i in range(len(hs) - k + 1):
        acc = TH.SEED
        for j in range(k):
            acc = (acc * TH.MULT + hs[i + j]) % TH.MOD
        grams.append(acc)
    mins = [min(grams[j : j + w]) for j in range(len(grams) - w + 1)]
    return sorted(set(mins))


def _corpus() -> list[str]:
    rng = random.Random(7)
    texts = []
    # repetition-heavy: tiny vocab forces equal gram hashes inside windows
    for _ in range(20):
        texts.append(" ".join(rng.choice("aa bb cc".split()) for _ in range(30)))
    # unicode vocab
    vocab = ["héllo", "你好", "\U0001f600", "x" * 50, "Абв"]
    for _ in range(20):
        texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
    # boundary lengths around the guarantee length k+w-1 = 7 tokens
    for n_tok in range(0, 10):
        texts.append(" ".join(f"t{i}" for i in range(n_tok)))
    texts += ["", "   ", "\t\n"]
    return texts


@pytest.fixture(scope="module")
def corpus_df(spark):
    texts = _corpus()
    pdf = pd.DataFrame({"tid": list(range(len(texts))), "text": texts})
    return texts, pdf, spark.createDataFrame(pdf)


def test_spark_matches_python_model(corpus_df):
    texts, _, sdf = corpus_df
    got = {
        r["_id"]: list(r["_fp"])
        for r in winnow_fingerprints(sdf, "tid", "text", K, W).collect()
    }
    for tid, text in enumerate(texts):
        expect = model_fingerprints(text)
        assert got.get(tid, []) == expect, f"tid={tid} {text[:40]!r}"
        # the no-row contract: short docs (< w grams) are absent, not empty
        if not expect:
            assert tid not in got


def test_duckdb_oracle_matches_model(corpus_df):
    texts, pdf, _ = corpus_df
    con = duckdb.connect()
    con.register("fuzz", pdf)
    th, grams, fp = _winnow_fp_list("text", K, W)
    rows = con.execute(
        f"WITH th AS (SELECT tid, {th} AS _th FROM fuzz), "
        f"gr AS (SELECT tid, {grams} AS _g FROM th) "
        f"SELECT tid, {fp} AS fp FROM gr"
    ).fetchall()
    for tid, fplist in rows:
        assert list(fplist) == model_fingerprints(texts[tid]), f"tid={tid}"


def test_pairs_spark_vs_duckdb(corpus_df):
    _, pdf, sdf = corpus_df
    con = duckdb.connect()
    con.register("docs", pdf)
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in winnow_pairs(sdf, "tid", "text", K, W, threshold=0.3).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            winnow_pairs_oracle("tid", "text", "docs", K, W, threshold=0.3)
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0  # the repetition corpus must actually produce pairs


def test_guarantee_shared_run_yields_shared_fingerprint(spark):
    """Winnowing's core guarantee: two docs sharing a token run of length
    >= k + w - 1 share at least one fingerprint."""
    rng = random.Random(13)
    run = " ".join(f"s{i}" for i in range(K + W - 1))
    docs = []
    for tid in range(6):
        pre = " ".join(rng.choice("p q r".split()) for _ in range(rng.randrange(0, 12)))
        post = " ".join(rng.choice("u v w".split()) for _ in range(rng.randrange(0, 12)))
        docs.append((tid, f"{pre} {run} {post}"))
    sdf = spark.createDataFrame(docs, "tid long, text string")
    fps = {
        r["_id"]: set(r["_fp"])
        for r in winnow_fingerprints(sdf, "tid", "text", K, W).collect()
    }
    for a in range(6):
        for b in range(a + 1, 6):
            assert fps[a] & fps[b], f"docs {a},{b} share the run but no fingerprint"


def test_max_df_drops_hot_fingerprints(spark):
    # every doc shares the same text -> every fingerprint has df = 4 > 2
    docs = [(i, "a b c d e f g h i j") for i in range(4)]
    sdf = spark.createDataFrame(docs, "tid long, text string")
    assert winnow_pairs(sdf, "tid", "text", K, W, max_df=2).count() == 0
    assert winnow_pairs(sdf, "tid", "text", K, W).count() == 6
