"""Hypothesis property tests — the generative complement of the seeded
property matrices (SURVEY.md §5 names hypothesis-seeded rounds as the plan;
the reference's analog is BitsTest's p=2^-i random rounds).

Two claims get adversarial generation + shrinking here:

* **Rowset algebra is a faithful set algebra under composition**: a random
  SEQUENCE of ops (and/or/andnot/not/view/merge, each operand in a random
  physical encoding) applied to a PostingSet must equal the same sequence
  applied to a plain Python set model — not just single ops, but chains
  like `view(merge(a ~b), …)` whose intermediate row spaces are unaligned
  to bucket boundaries. One Spark action per example (everything is lazy
  until the final compare), so generation stays cheap.

* **texthash dialect twins are bit-equal on arbitrary unicode**: the fixed
  fuzz alphabets (test_texthash_dialects.py) cover known-adversarial
  classes; hypothesis additionally explores the full non-surrogate plane
  (combining marks, controls, astral) with shrinking to a minimal
  counterexample on divergence.
"""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iodf_spark.functions import texthash as TH
from iodf_spark.plans.rowset import PostingSet

N_MAX = 260
ENC = st.sampled_from(["sparse", "dense", "adaptive"])


@st.composite
def op_sequences(draw):
    def ids_for(n):
        return draw(
            st.lists(st.integers(0, n - 1), unique=True, max_size=min(n, 80))
        )

    n0 = draw(st.integers(1, N_MAX))
    bs = draw(st.sampled_from([32, 64]))
    init = (ids_for(n0), draw(ENC))
    ops = []
    n = n0
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(
            st.sampled_from(["and", "or", "andnot", "not", "view", "merge"])
        )
        if kind == "view":
            start = draw(st.integers(0, n - 1))
            until = draw(st.integers(start + 1, n + 10))
            ops.append(("view", start, until))
            n = min(until, n) - start
        elif kind == "not":
            ops.append(("not",))
        elif kind == "merge":
            other_n = draw(st.integers(1, N_MAX))
            ops.append(("merge", ids_for(other_n), draw(ENC), other_n))
            n = n + other_n
        else:  # and / or / andnot — operand shares the current row space
            ops.append((kind, ids_for(n), draw(ENC), n))
    return bs, n0, init, ops


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=op_sequences())
def test_rowset_algebra_model_based(spark, seq):
    bs, n0, (ids0, enc0), ops = seq
    ps = PostingSet.from_positions(spark, ids0, n0, bs, encoding=enc0)
    model, n = set(ids0), n0
    for op in ops:
        kind = op[0]
        if kind == "view":
            _, start, until = op
            hi = min(until, n)
            ps = ps.view(start, until)
            model = {i - start for i in model if start <= i < hi}
            n = hi - start
        elif kind == "not":
            ps = ~ps
            model = set(range(n)) - model
        elif kind == "merge":
            _, other_ids, enc, other_n = op
            other = PostingSet.from_positions(spark, other_ids, other_n, bs, encoding=enc)
            ps = ps.merge(other)
            model = model | {n + i for i in other_ids}
            n = n + other_n
        else:
            _, other_ids, enc, other_n = op
            other = PostingSet.from_positions(spark, other_ids, other_n, bs, encoding=enc)
            if kind == "and":
                ps, model = ps & other, model & set(other_ids)
            elif kind == "or":
                ps, model = ps | other, model | set(other_ids)
            else:
                ps, model = ps.andnot(other), model - set(other_ids)
    assert ps.n == n
    assert ps.to_list() == sorted(model)


# NUL is excluded: pandas->duckdb VARCHAR transfer truncates at NUL while
# Spark keeps it — a transport artifact, not a formula divergence.
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_characters="\x00"),
        max_size=24,
    ),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=TEXTS)
def test_texthash_dialects_hypothesis(spark, texts):
    pdf = pd.DataFrame({"tid": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("fuzz", pdf)
    checks = {
        "h": (TH.text_hash("text", "spark"), TH.text_hash("text", "duckdb")),
        "th": (TH.token_hashes("text", "spark"), TH.token_hashes("text", "duckdb")),
        "sh": (
            TH.shingle_hashes(TH.token_hashes("text", "spark"), "spark", n=2),
            TH.shingle_hashes(TH.token_hashes("text", "duckdb"), "duckdb", n=2),
        ),
    }
    sel_spark = [f"{e} as {k}" for k, (e, _) in checks.items()]
    sel_duck = ", ".join(f"{e} as {k}" for k, (_, e) in checks.items())
    s_rows = {r["tid"]: r for r in sdf.selectExpr("tid", *sel_spark).collect()}
    d_rows = {
        r[0]: r
        for r in con.execute(f"SELECT tid, {sel_duck} FROM fuzz").fetchall()
    }
    for tid, text in enumerate(texts):
        sr, dr = s_rows[tid], d_rows[tid]
        for pos, k in enumerate(checks, start=1):
            sv, dv = sr[k], dr[pos]
            if isinstance(sv, list):
                dv = list(dv) if dv is not None else dv
            assert sv == dv, f"{k} diverges on {text!r}: spark={sv!r} duckdb={dv!r}"
