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
            st.sampled_from(
                ["and", "or", "andnot", "not", "view", "merge", "nary_and", "nary_or"]
            )
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
        elif kind in ("nary_and", "nary_or"):
            k = draw(st.integers(2, 3))
            ops.append((kind, [(ids_for(n), draw(ENC)) for _ in range(k)], n))
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
        elif kind in ("nary_and", "nary_or"):
            from iodf_spark.plans.rowset import intersect_all, union_all

            _, operands, op_n = op
            others = [
                PostingSet.from_positions(spark, ids, op_n, bs, encoding=enc)
                for ids, enc in operands
            ]
            if kind == "nary_and":
                ps = intersect_all([ps, *others])
                model = model.intersection(*(set(ids) for ids, _ in operands))
            else:
                ps = union_all([ps, *others])
                model = model.union(*(set(ids) for ids, _ in operands))
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


STORE_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("write"), st.integers(1, 40)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("vacuum"), st.just(0)),
        st.tuples(st.just("tiered"), st.just(0)),
        st.tuples(st.just("run"), st.integers(0, 97)),
        st.tuples(st.just("replay"), st.integers(1, 20)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=STORE_OPS)
def test_segment_store_lifecycle_model_based(spark, ops, tmp_path_factory):
    """Generative LSM lifecycle: any interleaving of write_segment /
    compact / compact_tiered / compact_run / idempotent-replay / vacuum
    must preserve (1) the concatenated-row model with contiguous global
    row_ids, (2) time travel — every RETAINED snapshot version re-reads
    exactly the rows it was published with, (3) vacuumed versions raise
    rather than resurrect, and (4) zone-map-pruned range reads equal the
    filtered full read."""
    _run_store_lifecycle_model(spark, ops, tmp_path_factory)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=STORE_OPS)
def test_segment_store_lifecycle_model_on_objectstore(spark, ops, tmp_path_factory):
    """The SAME generative lifecycle model with every fsio touch routed
    through the object-store backend (conditional-put claims, whole-
    object-PUT publishes, copy-list-delete adoption, prefix-LIST
    discovery — no rename/link/exclusive-mkdir): the deterministic OCC
    suite proves the commit protocol's races on both backends; this
    proves arbitrary LIFECYCLE INTERLEAVINGS (including vacuum + time
    travel) hold on object-store semantics too."""
    from iodf_spark.sources import fsio

    with fsio.using_backend(fsio.ObjectStoreBackend()):
        _run_store_lifecycle_model(spark, ops, tmp_path_factory)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=STORE_OPS)
def test_segment_store_lifecycle_model_on_strict_objectstore(
    spark, ops, tmp_path_factory
):
    """The generative lifecycle model on the STRICT backend (round 12):
    manifests, claims and pointers exist ONLY in the in-memory service —
    any lifecycle path that still read store metadata through the local
    filesystem would see nothing and fail loudly here, so arbitrary
    interleavings prove the READ side of the seam, not just the commit
    choreography."""
    from iodf_spark.sources import fsio

    with fsio.using_backend(fsio.StrictObjectStoreBackend()):
        _run_store_lifecycle_model(spark, ops, tmp_path_factory)


def _run_store_lifecycle_model(spark, ops, tmp_path_factory):
    import shutil

    from iodf_spark.sources.segments import SegmentStore

    path = str(tmp_path_factory.mktemp("hyp_store") / "store")
    store = SegmentStore(path, bucket_size=64)
    model = []  # concatenated (k, v) rows in ingest order
    snapshots = {}  # version -> model copy at publish
    next_k = 0
    try:
        for kind, arg in ops:
            if kind == "write":
                rows = [(next_k + i, (next_k + i) * 3) for i in range(arg)]
                next_k += arg
                store.write_segment(
                    spark.createDataFrame(rows, "k long, v long"), order_keys=["k"]
                )
                model.extend(rows)
            elif kind == "compact" and model:
                store.compact(spark)
            elif kind == "tiered" and model:
                store.compact_tiered(spark, fanout=2)
            elif kind == "run" and len(store.manifest()) >= 2:
                n_seg = len(store.manifest())
                start = arg % (n_seg - 1)
                store.compact_run(spark, start, start + 2)
            elif kind == "replay":
                rows = [(next_k + i, (next_k + i) * 3) for i in range(arg)]
                next_k += arg
                bkey = f"replay-{next_k}"
                for _ in range(2):  # duplicate delivery: second must no-op
                    store.write_segment(
                        spark.createDataFrame(rows, "k long, v long"),
                        order_keys=["k"],
                        batch_key=bkey,
                    )
                model.extend(rows)
            elif kind == "vacuum":
                store.vacuum(keep_last=1)
            if store.versions():
                snapshots[store.versions()[-1]] = list(model)
        if model:
            got = [
                (r["k"], r["v"], r["row_id"])
                for r in store.open(spark).orderBy("row_id").collect()
            ]
            assert [(k, v) for k, v, _ in got] == model
            assert [rid for _, _, rid in got] == list(range(len(model)))
            lo, hi = model[len(model) // 3][0], model[(2 * len(model)) // 3][0]
            want = sorted((k, v) for k, v in model if lo <= k <= hi)
            pruned = store.open_pruned(spark, [("k", lo, hi)])
            got_p = sorted(
                (r["k"], r["v"])
                for r in pruned.filter(
                    (pruned["k"] >= lo) & (pruned["k"] <= hi)
                ).collect()
            )
            assert got_p == want, "zone-map pruned read drifted"
        live = set(store.versions())
        for v, snap in snapshots.items():
            if v in live:
                got_v = [
                    (r["k"], r["v"])
                    for r in store.open_at(spark, v).orderBy("row_id").collect()
                ]
                assert got_v == snap, f"snapshot v{v} drifted"
            else:
                import pytest as _pt

                with _pt.raises(ValueError):
                    store.manifest_at(v)  # vacuumed: must raise, not resurrect
    finally:
        shutil.rmtree(path, ignore_errors=True)


@st.composite
def asof_cases(draw):
    """Small as-of join instances over a tiny key/time domain so ties,
    exact-boundary matches, keys with no right rows, and empty sides all
    occur routinely."""
    keys = st.integers(0, 2)
    times = st.integers(0, 12)
    left = draw(st.lists(st.tuples(keys, times), max_size=12))
    right = draw(
        st.lists(st.tuples(keys, times), unique=True, max_size=12)
    )  # unique (key, time): the operator's right-side contract
    direction = draw(st.sampled_from(["backward", "forward"]))
    tolerance = draw(st.one_of(st.none(), st.integers(0, 4)))
    return left, right, direction, tolerance


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=asof_cases())
def test_join_asof_model_based(spark, case):
    """join_asof vs a per-row Python model: latest right at-or-before (or
    earliest at-or-after) per key, tolerance-filtered — including equal-time
    matches, unmatched keys, and empty inputs."""
    from pyspark.sql import functions as F

    from iodf_spark.operators.asof import join_asof

    left, right, direction, tol = case
    l_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    r_rows = [(k, t, 100 * k + t) for (k, t) in right]
    ldf = spark.createDataFrame(
        l_rows or [(None, None, None)], "k int, lt int, lid int"
    ).filter(F.col("lid").isNotNull())
    rdf = spark.createDataFrame(
        r_rows or [(None, None, None)], "k int, rt int, val int"
    ).filter(F.col("val").isNotNull())
    got = {
        r["lid"]: r["val"]
        for r in join_asof(
            ldf, rdf, "k", "lt", "rt", ["val"],
            tolerance=None if tol is None else F.lit(tol),
            direction=direction,
        ).collect()
    }
    want = {}
    for k, t, lid in l_rows:
        if direction == "backward":
            cands = [(rt, v) for (rk, rt, v) in r_rows if rk == k and rt <= t]
            pick = max(cands) if cands else None
            if pick is not None and tol is not None and pick[0] < t - tol:
                pick = None
        else:
            cands = [(rt, v) for (rk, rt, v) in r_rows if rk == k and rt >= t]
            pick = min(cands) if cands else None
            if pick is not None and tol is not None and pick[0] > t + tol:
                pick = None
        want[lid] = pick[1] if pick is not None else None
    assert got == want, (direction, tol, l_rows, r_rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200)),  # (user, epoch s)
        min_size=1,
        max_size=30,
    ),
    gap_minutes=st.integers(1, 30),
)
def test_sessionize_model_based(spark, events, gap_minutes):
    """Batch sessionize vs a sort-and-split Python model: session counts,
    sizes and boundaries must match for arbitrary event layouts — including
    duplicate timestamps and gaps exactly AT the threshold (> gap splits,
    == gap does not)."""
    from pyspark.sql import functions as F

    from iodf_spark.operators.sessions import sessionize

    df = spark.createDataFrame(events, "user_id int, es int").withColumn(
        "ts", F.timestamp_seconds(F.col("es"))
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["session_start"],
            r["session_end"],
        )
        for r in sessionize(df, "user_id", "ts", gap_minutes).collect()
    }
    gap = gap_minutes * 60
    want = {}
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)

    def fmt(s):
        import pandas as pd

        return pd.Timestamp(s, unit="s").strftime("%Y-%m-%d %H:%M:%S.%f")

    for u, ts in by_user.items():
        ts.sort()
        sid, start, prev, n = 0, ts[0], ts[0], 0
        for t in ts:
            if t - prev > gap:
                want[(u, sid)] = (n, fmt(start), fmt(prev))
                sid, start, n = sid + 1, t, 0
            n += 1
            prev = t
        want[(u, sid)] = (n, fmt(start), fmt(prev))
    assert got == want


@st.composite
def contingency_counts(draw):
    """Valid 2x2 contingency tuples: 0 <= fa,fb <= n, Frechet bounds on
    fab — includes the degenerate corners (fa=0, fa=n, fab pinned)."""
    n = draw(st.integers(1, 10_000))
    fa = draw(st.integers(0, n))
    fb = draw(st.integers(0, n))
    fab = draw(st.integers(max(0, fa + fb - n), min(fa, fb)))
    return (n, fa, fb, fab)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cases=st.lists(contingency_counts(), min_size=1, max_size=25))
def test_costats_formula_triplet_agrees(spark, cases):
    """The three renditions of the CoStats closed forms — Python ground
    truth, Spark SQL text, DuckDB on the same text — must agree to the
    attested 9-digit rounding on arbitrary valid contingency counts
    (JVM and libc log() may differ in the last ulp; the 9-digit round is
    the engine's published comparison grain)."""
    from iodf_spark.functions.costats_math import costats_py, costats_sql_exprs

    pdf = pd.DataFrame(cases, columns=["n", "fa", "fb", "fab"])
    sdf = spark.createDataFrame(pdf)
    exprs = costats_sql_exprs("n", "fa", "fb", "fab", round_to=None)
    sel = [f"round({e}, 9) as {k}" for k, e in exprs.items()]
    s_rows = sdf.selectExpr("n", "fa", "fb", "fab", *sel).collect()
    con = duckdb.connect()
    con.register("cc", pdf)
    d_rows = con.execute(
        "SELECT " + ", ".join(f"round({e}, 9) AS {k}" for k, e in exprs.items())
        + " FROM cc"
    ).fetchall()
    for i, (case, sr, dr) in enumerate(zip(cases, s_rows, d_rows)):
        truth = costats_py(*case)
        for j, k in enumerate(exprs):
            want = round(truth[k], 9)
            assert abs(sr[k] - want) <= 2e-9, f"spark {k} on {case}: {sr[k]} vs {want}"
            assert abs(dr[j] - want) <= 2e-9, f"duckdb {k} on {case}: {dr[j]} vs {want}"


# NUL is excluded (pandas->duckdb VARCHAR transfer truncates at NUL while
# Spark keeps it) and so are lone surrogates (category Cs: representable in
# the JVM's UTF-16 strings but not in DuckDB's UTF-8 storage) — transport
# artifacts, not formula divergences.
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            blacklist_characters="\x00", blacklist_categories=("Cs",)
        ),
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
        "mh": (
            TH.minhash_sig(TH.token_hashes("text", "spark"), "spark", 3),
            TH.minhash_sig(TH.token_hashes("text", "duckdb"), "duckdb", 3),
        ),
        "sim": (
            TH.simhash32("text", "spark"),
            TH.simhash32("text", "duckdb"),
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


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.sampled_from([1, 63, 64, 65, 127, 128, 129]),
        min_size=3,
        max_size=5,
    ),
    probe_tags=st.sets(st.integers(0, 6), min_size=1, max_size=3),
)
def test_index_merge_parity_at_bucket_boundaries(
    spark, sizes, probe_tags, tmp_path_factory
):
    """Whitebox index-merge parity exactly AT bucket boundaries: segment
    sizes drawn from {1, 64±1, 128±1} make the run offsets land on
    row_id ≡ 0, ±1 (mod bucket_size=64) across 3+ indexed segments, so
    compaction's posting shift exercises the aligned bucket-renumber path,
    the unaligned bucket-local word/bit shift path, and the word-straddling
    carry — the analog of the reference's 150-bit unaligned concat locks
    (BitsTest.scala:342-449). Probes, f stats, and distinct values must be
    bit-identical before and after the merge."""
    import shutil

    from pyspark.sql import functions as F

    from iodf_spark.operators import index as idx
    from iodf_spark.sources.segments import SegmentStore

    path = str(tmp_path_factory.mktemp("hyp_ixmerge") / "store")
    store = SegmentStore(path, bucket_size=64)
    conf = idx.IndexConf(include=["tag"])
    try:
        lo = 0
        for sz in sizes:
            df = spark.range(lo, lo + sz).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).cast("string").alias("tag"),
            )
            store.write_segment(df, order_keys=["k"], index_conf=conf)
            lo += sz
        n = store.total_rows()
        ix_before = store.open_index(spark)
        tags = [str(t) for t in probe_tags]
        before = {
            t: idx.probe(ix_before, "tag", t, n, bucket_size=64).to_list()
            for t in tags
        }
        f_before = {t: idx.f(ix_before, "tag", t) for t in tags}
        store.compact(spark)  # no index_conf -> posting-shift merge path
        assert len(store.manifest()) == 1 and store.manifest()[0]["indexed"]
        ix_after = store.open_index(spark)
        for t in tags:
            assert (
                idx.probe(ix_after, "tag", t, n, bucket_size=64).to_list()
                == before[t]
            ), f"posting shift drifted for tag {t} at offsets {sizes}"
            assert idx.f(ix_after, "tag", t) == f_before[t]
    finally:
        shutil.rmtree(path, ignore_errors=True)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
)
def test_ivfpq_store_model_based(spark, data, tmp_path_factory):
    """Model-based check of the composed IVF-PQ store against an
    independent numpy model (assignment argmax with lowest-cid ties,
    codebook argmin with smallest-code ties, probed-cell candidate sets,
    exact-integer ADC scoring, rank ties by neighbor_id) — plus
    append==rebuild on a random split and the external-query path on the
    same store. INTEGER vector components make every dot and norm-square
    an exact int, so model and engine produce bit-equal float64 scores
    and ties break identically (no epsilon anywhere)."""
    import math
    import shutil

    import numpy as np

    from iodf_spark.operators.similarity import (
        ann_ivfpq_store,
        ivfpq_append,
        ivfpq_build_store,
    )

    DIM, M, N_CODES, N_CENT, N_PROBE, K = 8, 2, 4, 3, 2, 5
    sub = DIM // M
    n = data.draw(st.integers(8, 28), label="n")
    vec_strat = st.lists(
        st.integers(-4, 4), min_size=DIM, max_size=DIM
    ).filter(lambda v: any(x != 0 for x in v))
    vecs = {i: data.draw(vec_strat, label=f"v{i}") for i in range(n)}
    qids = sorted(data.draw(
        st.sets(st.integers(0, n - 1), min_size=1, max_size=3), label="qids"
    ))
    ext = {-1: [float(x) for x in data.draw(vec_strat, label="ext")]}

    def model(queries, exclude_self):
        V = {i: np.array(v, dtype=np.int64) for i, v in vecs.items()}
        nrm = {i: math.sqrt(float((V[i] * V[i]).sum())) for i in V}

        def ccos(x, xn, cid):
            c = V[cid]
            return float(x @ c) / (xn * nrm[cid])

        cell = {}
        for i in V:
            best = max(
                range(N_CENT), key=lambda cid: (ccos(V[i], nrm[i], cid), -cid)
            )
            cell[i] = best
        codes = {}
        for i in V:
            cs = []
            for j in range(M):
                x = V[i][j * sub:(j + 1) * sub]
                best = min(
                    range(N_CODES),
                    key=lambda c: (
                        float(
                            (V[c][j * sub:(j + 1) * sub] ** 2).sum()
                            - 2 * (x @ V[c][j * sub:(j + 1) * sub])
                        ),
                        c,
                    ),
                )
                cs.append(best)
            codes[i] = cs
        out = []
        for qid, qv in queries:
            q = np.array(qv, dtype=np.float64)
            qn = math.sqrt(float((q * q).sum()))
            probed = sorted(
                range(N_CENT),
                key=lambda cid: (-float(q @ V[cid]) / (qn * nrm[cid]), cid),
            )[:N_PROBE]
            scored = []
            for i in V:
                if cell[i] not in probed or (exclude_self and i == qid):
                    continue
                adot = sum(
                    float(
                        q[j * sub:(j + 1) * sub]
                        @ V[codes[i][j]][j * sub:(j + 1) * sub]
                    )
                    for j in range(M)
                )
                rn2 = sum(
                    float((V[codes[i][j]][j * sub:(j + 1) * sub] ** 2).sum())
                    for j in range(M)
                )
                scored.append((i, adot / (qn * math.sqrt(rn2))))
            scored.sort(key=lambda t: (-t[1], t[0]))
            out += [
                (qid, r + 1, i, round(c, 6))
                for r, (i, c) in enumerate(scored[:K])
            ]
        return out

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        schema="vec_id bigint, embedding array<double>",
    )
    base = tmp_path_factory.mktemp("ivfpq_prop")
    full_path = str(base / "full")
    ivfpq_build_store(
        emb, "vec_id", "embedding", full_path,
        n_centroids=N_CENT, m_subspaces=M, n_codes=N_CODES, dim=DIM,
    )

    def run(**kw):
        got = ann_ivfpq_store(
            emb, "vec_id", "embedding", full_path, qids,
            k=K, n_centroids=N_CENT, n_probe=N_PROBE,
            m_subspaces=M, n_codes=N_CODES, dim=DIM, **kw,
        ).collect()
        return [
            (r["query_id"], r["rank"], r["neighbor_id"], r["cos"]) for r in got
        ]

    # Python round (banker's) vs Spark round (half-up) cannot diverge
    # here: a tie needs the double to be EXACTLY d.dddddd5 in decimal,
    # and 5e-7 has no finite binary representation
    want = model([(q, vecs[q]) for q in qids], exclude_self=True)
    assert run() == want
    # external query vectors: same store, no self-exclusion
    want_ext = model(sorted(ext.items()), exclude_self=False)
    got_ext = ann_ivfpq_store(
        emb, "vec_id", "embedding", full_path, [],
        k=K, n_centroids=N_CENT, n_probe=N_PROBE,
        m_subspaces=M, n_codes=N_CODES, dim=DIM, query_vecs=ext,
    ).collect()
    assert [
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos"]) for r in got_ext
    ] == want_ext
    # append == rebuild: split anywhere past the frozen samples
    split = data.draw(st.integers(max(N_CENT, N_CODES), n - 1), label="split")
    inc_path = str(base / "inc")
    from pyspark.sql import functions as F

    ivfpq_build_store(
        emb.filter(F.col("vec_id") < split), "vec_id", "embedding", inc_path,
        n_centroids=N_CENT, m_subspaces=M, n_codes=N_CODES, dim=DIM,
    )
    ivfpq_append(
        spark, inc_path, emb.filter(F.col("vec_id") >= split), emb,
        "vec_id", "embedding",
        n_centroids=N_CENT, m_subspaces=M, n_codes=N_CODES, dim=DIM,
    )
    inc = sorted(map(tuple, spark.read.parquet(inc_path).collect()))
    full = sorted(map(tuple, spark.read.parquet(full_path).collect()))
    assert inc == full
    shutil.rmtree(str(base), ignore_errors=True)


# ---------------------------------------------------------------------------
# substring-level dedup vs a pure-python reference model (round 10)


def _ref_duplicated_spans(corpus: list[tuple[int, str]], k: int) -> set:
    """Brute-force reference: duplicated k-window start positions by token
    TUPLE equality (no hashing), islands merged — what duplicated_spans
    must reproduce through the packed-hash path."""
    occ: dict[tuple, int] = {}
    toks = {i: t.split() for i, t in corpus}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ[tuple(ts[p : p + k])] = occ.get(tuple(ts[p : p + k]), 0) + 1
    spans = set()
    for i, ts in toks.items():
        dup = [p for p in range(len(ts) - k + 1) if occ[tuple(ts[p : p + k])] >= 2]
        run: list[int] = []
        for p in dup + [None]:
            if run and (p is None or p != run[-1] + 1):
                spans.add((i, run[0], run[-1] - run[0] + k, len(run)))
                run = []
            if p is not None:
                run.append(p)
    return spans


@st.composite
def substring_corpora(draw):
    """Small corpora biased toward REAL duplication: a shared phrase pool
    pasted into random docs (sometimes twice), plus unique filler."""
    pool = [f"p{i}" for i in range(draw(st.integers(2, 4)))]
    phrases = [
        " ".join(
            draw(st.sampled_from(pool)) for _ in range(draw(st.integers(3, 7)))
        )
        for _ in range(3)
    ]
    docs = []
    for i in range(draw(st.integers(2, 6))):
        parts = []
        for _ in range(draw(st.integers(0, 3))):
            parts.append(draw(st.sampled_from(phrases)))
        # unique filler tokens break accidental cross-doc runs
        parts.append(" ".join(f"u{i}x{j}" for j in range(draw(st.integers(0, 4)))))
        draw(st.randoms()).shuffle(parts)
        docs.append((i, " ".join(parts)))
    return docs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=substring_corpora(), k=st.integers(2, 4))
def test_duplicated_spans_model_based(spark, corpus, k):
    from iodf_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_toks"], r["n_windows"])
        for r in duplicated_spans(df, "doc_id", "text", k=k).collect()
    }
    assert got == _ref_duplicated_spans(corpus, k)


def _ref_substring_clean(corpus: list[tuple[int, str]], k: int) -> dict:
    """Reference for substring_dedup_clean: keeper = lexicographically
    first occurrence per duplicated window (by token tuple), every other
    occurrence's [pos, pos+k) range cut, survivors joined by ' '."""
    toks = {i: t.split() for i, t in corpus}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    out = {}
    for i, ts in toks.items():
        cut = set()
        for p in range(len(ts) - k + 1):
            members = occ[tuple(ts[p : p + k])]
            if len(members) >= 2 and (i, p) != min(members):
                cut.update(range(p, p + k))
        kept = [t for j, t in enumerate(ts) if j not in cut]
        out[i] = (" ".join(kept), len(ts), len(cut))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=substring_corpora(), k=st.integers(2, 4))
def test_substring_clean_model_based(spark, corpus, k):
    from iodf_spark.operators.dedup import substring_dedup_clean

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_toks"], r["removed_toks"])
        for r in substring_dedup_clean(df, "doc_id", "text", k=k).collect()
    }
    assert got == _ref_substring_clean(corpus, k)


# ---------------------------------------------------------------------------
# media header parsers: total functions over arbitrary bytes (round 10)


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(max_size=200))
def test_media_parsers_never_raise(payload):
    """The 'corrupt blob in a 100 TB crawl must not kill the batch' claim,
    fuzzed: every parser is TOTAL over arbitrary bytes — returns Nones/
    zeros, never raises. Magic-byte prefixes are grafted on to force the
    fuzz past the dispatch into the chunk/box/marker walkers."""
    from iodf_spark.operators import multimodal as MM

    for blob in (
        payload,
        b"\x89PNG\r\n\x1a\n" + payload,
        b"\xff\xd8" + payload,
        b"RIFF" + payload[:4].ljust(4, b"\0") + b"WAVE" + payload,
        payload[:4].ljust(4, b"\0") + b"ftyp" + payload,
    ):
        MM.parse_image_header(blob)
        MM.parse_wav_header(blob)
        MM.parse_mp4_header(blob)
        m = MM.parse_media_header(blob)
        assert set(m) == {
            "kind", "width", "height", "channels",
            "sample_rate", "duration_ms", "n_tracks",
        }


# ---------------------------------------------------------------------------
# chunking + substring decontamination vs pure-python references (round 10)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=substring_corpora(),
    chunk_toks=st.integers(2, 6),
    overlap=st.integers(0, 3),
)
def test_chunk_documents_model_based(spark, corpus, chunk_toks, overlap):
    from hypothesis import assume

    from iodf_spark.operators.packing import chunk_documents

    assume(overlap < chunk_toks)
    stride = chunk_toks - overlap
    want = set()
    for i, t in corpus:
        ts = t.split()
        if not ts:
            continue
        starts = [0]
        while starts[-1] + chunk_toks < len(ts):
            starts.append(starts[-1] + stride)
        for ci, s in enumerate(starts):
            sl = ts[s : s + chunk_toks]
            want.add((i, ci, s, len(sl), " ".join(sl)))
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        tuple(r)
        for r in chunk_documents(
            df, "doc_id", "text", chunk_toks=chunk_toks, overlap=overlap
        ).collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=substring_corpora(), k=st.integers(2, 4))
def test_contaminated_spans_model_based(spark, corpus, k):
    from hypothesis import assume

    from iodf_spark.operators.dedup import contaminated_spans

    assume(len(corpus) >= 2)
    bench_rows = [r for r in corpus if r[0] % 2 == 0]
    train_rows = [r for r in corpus if r[0] % 2 == 1]
    assume(bench_rows and train_rows)
    bench_windows = set()
    for _, t in bench_rows:
        ts = t.split()
        for p in range(len(ts) - k + 1):
            bench_windows.add(tuple(ts[p : p + k]))
    want = set()
    for i, t in train_rows:
        ts = t.split()
        hit = [p for p in range(len(ts) - k + 1)
               if tuple(ts[p : p + k]) in bench_windows]
        run: list[int] = []
        for p in hit + [None]:
            if run and (p is None or p != run[-1] + 1):
                want.add((i, run[0], run[-1] - run[0] + k, len(run)))
                run = []
            if p is not None:
                run.append(p)
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {
        tuple(r)
        for r in contaminated_spans(train, "doc_id", "text", bench, k=k).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(0, (1 << 63) // 1_000_000 - 1),
            st.integers(0, 1_000_000 - 1),
        ),
        min_size=1,
        max_size=16,
        unique=True,
    )
)
def test_chunk_cid_pack_roundtrips_in_range(spark, pairs):
    """The guarded (doc_id, chunk_idx) -> int64 cid pack
    (__spark_entry__._chunk_cid_expr): for ANY in-range pair the pack is
    injective and unpacks exactly (div/mod round-trip); out-of-range
    inputs raise instead of aliasing (the fused when/raise_error guard —
    round-12 ADVICE fix)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "doc_id long, chunk_idx long")
    got = (
        df.select(
            "doc_id", "chunk_idx", entrymod._chunk_cid_expr().alias("cid")
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"cid div {entrymod.CHUNKVEC_ENC}").alias("d2"),
            F.expr(f"cid % {entrymod.CHUNKVEC_ENC}").alias("c2"),
            "cid",
        )
        .collect()
    )
    assert all(r["doc_id"] == r["d2"] and r["chunk_idx"] == r["c2"] for r in got)
    assert len({r["cid"] for r in got}) == len(pairs)  # injective


def test_chunk_cid_pack_raises_out_of_range(spark):
    import pytest

    import __spark_entry__ as entrymod
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    for doc, idx in [(-1, 0), (0, -1), (0, 1_000_000), ((1 << 63) // 1_000_000, 0)]:
        df = spark.createDataFrame([(doc, idx)], "doc_id long, chunk_idx long")
        with pytest.raises((SparkRuntimeException, Py4JJavaError)):
            df.select(entrymod._chunk_cid_expr().alias("cid")).collect()
