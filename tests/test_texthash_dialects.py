"""Differential fuzz of the texthash dialect twins over adversarial
unicode. The driver corpus is ASCII [a-z ] only, so dialect divergence on
real-world text (CJK, astral emoji, regex metacharacters, quotes and
backslashes, exotic whitespace) would never show in the oracle gate —
this suite feeds both engines identical random strings through a COLUMN
(no SQL literals, so any divergence is in the formulas themselves, which
is exactly the engine's cross-dialect exactness claim).
"""

import random

import duckdb
import pandas as pd
import pytest

from iodf_spark.functions import texthash as TH

ALPHABETS = [
    "abcdefghij ",                 # plain ASCII
    "äöüßéèñçøå ",                 # latin-1 accents
    "你好世界漢字 ",  # CJK
    "Абвгд ",        # cyrillic
    "'\"\\.*+?()[]{}|^$ ",        # quotes + regex metacharacters
    "a\tb\nc\rd  e ",             # exotic whitespace runs
    "\U0001f600\U0001f680\U0001f9e0 a ",       # astral emoji
]


def _random_texts(n: int = 120) -> list[str]:
    rng = random.Random(42)
    out = ["", " ", "   ", "a", "\t\n"]
    while len(out) < n:
        alpha = rng.choice(ALPHABETS)
        out.append("".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40))))
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    texts = _random_texts()
    pdf = pd.DataFrame({"tid": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("fuzz", pdf)
    return sdf, con


def _compare(sdf, con, spark_expr: str, duck_expr: str, label: str):
    s = {
        r["tid"]: r["v"]
        for r in sdf.selectExpr("tid", f"{spark_expr} as v").collect()
    }
    d = dict(con.execute(f"SELECT tid, {duck_expr} FROM fuzz").fetchall())
    assert set(s) == set(d)
    for tid in s:
        sv, dv = s[tid], d[tid]
        if isinstance(sv, list):
            sv = list(sv)
            dv = list(dv) if dv is not None else dv
        assert sv == dv, f"{label} diverges at tid={tid}: spark={sv!r} duckdb={dv!r}"


def test_text_hash_dialects(corpora):
    sdf, con = corpora
    _compare(
        sdf, con,
        TH.text_hash("text", "spark"), TH.text_hash("text", "duckdb"),
        "text_hash",
    )


def test_tokens_dialects(corpora):
    sdf, con = corpora
    _compare(
        sdf, con, TH.tokens("text", "spark"), TH.tokens("text", "duckdb"), "tokens"
    )


def test_token_hashes_dialects(corpora):
    sdf, con = corpora
    _compare(
        sdf, con,
        TH.token_hashes("text", "spark"), TH.token_hashes("text", "duckdb"),
        "token_hashes",
    )


@pytest.mark.parametrize("n,distinct", [(2, True), (3, True), (2, False)])
def test_shingle_hashes_dialects(corpora, n, distinct):
    sdf, con = corpora
    sp = (
        f"(select {TH.shingle_hashes('_th', 'spark', n=n, distinct=distinct)} "
        f"from (select {TH.token_hashes('text', 'spark')} as _th))"
    )
    # spark lacks scalar subqueries over struct-less FROM-less selects in
    # selectExpr; inline via a lateral-style nested expression instead
    spark_expr = TH.shingle_hashes(
        f"({TH.token_hashes('text', 'spark')})", "spark", n=n, distinct=distinct
    )
    duck_expr = TH.shingle_hashes(
        f"({TH.token_hashes('text', 'duckdb')})", "duckdb", n=n, distinct=distinct
    )
    _compare(corpora[0], con, spark_expr, duck_expr, f"shingles(n={n},d={distinct})")


def test_simhash_dialects(corpora):
    sdf, con = corpora
    _compare(
        sdf, con,
        TH.simhash32("text", "spark"), TH.simhash32("text", "duckdb"),
        "simhash32",
    )


def test_text_hash2_dialects(corpora):
    # the round-10 second hash family (131 mod 998244353) must twin
    # exactly like family 1 — it carries half of every substring-dedup
    # window identity
    sdf, con = corpora
    _compare(
        sdf, con,
        TH.text_hash2("text", "spark"), TH.text_hash2("text", "duckdb"),
        "text_hash2",
    )


def test_packed_window_identity_dialects(corpora):
    # the exact packed expression the substring ops group by: both folds
    # over the token-hash arrays, packed into one int64
    sdf, con = corpora
    s1 = TH.fold_hash(TH.token_hashes("text", "spark"), "spark")
    s2 = TH.fold_hash2(
        f"transform({TH.tokens('text', 'spark')}, _tok -> "
        f"{TH.text_hash2('_tok', 'spark')})",
        "spark",
    )
    d1 = TH.fold_hash(TH.token_hashes("text", "duckdb"), "duckdb")
    d2 = TH.fold_hash2(
        f"list_transform({TH.tokens('text', 'duckdb')}, _tok -> "
        f"{TH.text_hash2('_tok', 'duckdb')})",
        "duckdb",
    )
    _compare(
        sdf, con,
        TH.pack_hashes(s1, s2), TH.pack_hashes(d1, d2),
        "packed_window_identity",
    )
    # the two families are genuinely independent: equal family-1 hashes
    # with unequal family-2 hashes must stay distinguishable after packing
    assert TH.MOD != TH.MOD2 and TH.MULT != TH.MULT2
    assert TH.pack_hashes("7", "1") != TH.pack_hashes("7", "2")


def test_wide_identity_columns_dialects(corpora):
    # the two WIDE int64 columns of the window identity: fold families
    # 3 and 4 (~2^56 moduli) over the two mixed token-hash streams — each
    # must be bit-identical across engines like the narrow families
    sdf, con = corpora
    th_s = TH.token_hashes("text", "spark")
    t2_s = (
        f"transform({TH.tokens('text', 'spark')}, _tok -> "
        f"{TH.text_hash2('_tok', 'spark')})"
    )
    th_d = TH.token_hashes("text", "duckdb")
    t2_d = (
        f"list_transform({TH.tokens('text', 'duckdb')}, _tok -> "
        f"{TH.text_hash2('_tok', 'duckdb')})"
    )
    _compare(
        sdf, con,
        TH.fold_hash3(th_s, "spark"), TH.fold_hash3(th_d, "duckdb"),
        "wide_identity_col1",
    )
    _compare(
        sdf, con,
        TH.fold_hash4(t2_s, "spark"), TH.fold_hash4(t2_d, "duckdb"),
        "wide_identity_col2",
    )
    # all four fold families are pairwise distinct functionals: distinct
    # prime moduli and distinct multipliers
    mods = [TH.MOD, TH.MOD2, TH.MOD3, TH.MOD4]
    mults = [TH.MULT, TH.MULT2, TH.MULT3, TH.MULT4]
    assert len(set(mods)) == 4 and len(set(mults)) == 4
    # int64 safety of the wide fold step: (MOD-1)*MULT + max mixed hash
    assert (TH.MOD3 - 1) * TH.MULT3 + 2**31 < 2**63
    assert (TH.MOD4 - 1) * TH.MULT4 + 2**31 < 2**63
    # the pair's combined space covers the corpus-grain math the spans
    # docstring claims: expected false pairs at 1e13 windows (100 TB) =
    # W^2/2 / (MOD3*MOD4) ~ 1.2e-8 — assert the budget with margin
    assert (1e13**2 / 2) / (TH.MOD3 * TH.MOD4) < 1e-7
