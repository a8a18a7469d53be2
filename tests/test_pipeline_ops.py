"""Training-data pipeline operators vs their DuckDB oracle twins (the
oracle generators emit the same formulas in the DuckDB dialect, so equality
here is exact, including LSH banding) and the multimodal Arrow plumbing vs
Python ground truth."""

import duckdb
import pytest
from pyspark.sql import functions as F

from iodf_spark.operators import dedup as D
from iodf_spark.operators import multimodal as MM
from iodf_spark.operators import similarity as S
from iodf_spark.operators import textstats as TS
from iodf_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


def _match(sdf, con, sql):
    s = sorted(tuple(r) for r in sdf.collect())
    d = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert len(s) == len(d)
    assert s == d


def test_dedup_family(spark, sf_dir, con):
    docs = load_table(spark, sf_dir, "documents")
    _match(D.exact_dedup(docs, "doc_id", "text"), con, D.exact_dedup_oracle("doc_id", "text", "documents"))
    _match(D.jaccard_pairs(docs, "doc_id", "text"), con, D.jaccard_pairs_oracle("doc_id", "text", "documents"))
    _match(D.minhash_lsh_pairs(docs, "doc_id", "text"), con, D.minhash_lsh_pairs_oracle("doc_id", "text", "documents"))
    _match(D.simhash_pairs(docs, "doc_id", "text"), con, D.simhash_pairs_oracle("doc_id", "text", "documents"))


def test_minhash_finds_all_high_jaccard_pairs(spark, sf_dir):
    # LSH recall sanity: every pair the exact algorithm finds at >= 0.9
    # must be found by the banded MinHash path at the same threshold
    docs = load_table(spark, sf_dir, "documents")
    exact = {(r["doc_a"], r["doc_b"]) for r in D.jaccard_pairs(docs, "doc_id", "text", threshold=0.9).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.9).collect()}
    assert exact == lsh


def test_similarity_family(spark, sf_dir, con):
    emb = load_table(spark, sf_dir, "embeddings")
    q = [0, 1, 2]
    _match(S.cosine_pairs(emb, "vec_id", "embedding"), con, S.cosine_pairs_oracle("vec_id", "embedding", "embeddings"))
    _match(S.ann_brute_force(emb, "vec_id", "embedding", q), con, S.ann_brute_force_oracle("vec_id", "embedding", "embeddings", q))
    _match(S.ann_lsh(emb, "vec_id", "embedding", q), con, S.ann_lsh_oracle("vec_id", "embedding", "embeddings", q))


def test_text_stats(spark, sf_dir, con):
    docs = load_table(spark, sf_dir, "documents")
    _match(TS.text_stats(docs, "doc_id", "text"), con, TS.text_stats_oracle("doc_id", "text", "documents"))


def test_multimodal_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    payloads = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    with_p = MM.attach_payload(docs, "text")

    meta = {r["doc_id"]: r for r in MM.decode_metadata(with_p, "doc_id").collect()}
    assert set(meta) == set(payloads)
    for i, p in payloads.items():
        exp = MM._fake_decode_meta(p)
        assert (meta[i]["n_bytes"], meta[i]["width"], meta[i]["height"], meta[i]["channels"]) == exp

    feats = {r["doc_id"]: r["features"] for r in MM.extract_features(with_p, "doc_id", dim=8).collect()}
    for i, p in payloads.items():
        assert feats[i] == pytest.approx(MM._fake_features(p, 8), rel=1e-6)

    frames = MM.frame_sample(with_p, "doc_id", n_frames=4).collect()
    assert len(frames) == 4 * len(payloads)
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, p in payloads.items():
        fs = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert [f["frame_idx"] for f in fs] == [0, 1, 2, 3]
        assert all(f["offset"] + f["length"] <= len(p) for f in fs)

    # decode_real: optional-dependency wiring. Without PIL the default
    # raises; the explicit fake fallback is SCHEMA-IDENTICAL to
    # decode_metadata (the pluggable-codec contract, IoType.scala:61-81).
    # With PIL present the real path decodes actual image bytes — see
    # test_decode_real_with_pil below (skipped in this container).
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError):
            MM.decode_real(with_p, "doc_id")
    fb = MM.decode_real(with_p, "doc_id", fallback_to_fake=True)
    if not have_pil:
        assert fb.schema == MM.decode_metadata(with_p, "doc_id").schema


def _stdlib_png(w: int, h: int, color: int = 2) -> bytes:
    """A fully VALID PNG built with stdlib alone (struct + zlib +
    binascii CRCs): real signature, real IHDR, zlib-compressed blank
    scanlines in IDAT, IEND — any conformant decoder opens it."""
    import binascii
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    nch = {0: 1, 2: 3, 6: 4}[color]
    raw = b"".join(b"\x00" + bytes(w * nch) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _minimal_jpeg(w: int, h: int, ncomp: int = 3) -> bytes:
    """A header-valid JPEG stream: SOI, a spec-shaped JFIF APP0, a SOF0
    frame header carrying the real dimensions, EOI."""
    import struct

    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", h, w) + bytes([ncomp]) + bytes(9)
        + b"\xff\xd9"
    )


def test_real_codec_headers_stdlib(spark):
    """Golden test for the REAL codec path, running in THIS container
    (round-10: the former PIL-gated perpetual skip): genuine PNG and
    JPEG byte layouts decode to their true dimensions through
    decode_headers' stdlib struct parser via the same mapInPandas
    plumbing; corrupt/truncated payloads yield NULL metadata instead of
    failing the batch; where PIL happens to be installed, decode_real
    agrees with the stdlib parse on the same bytes."""
    png = _stdlib_png(7, 5)  # RGB -> 3 channels
    rgba = _stdlib_png(640, 479, color=6)  # RGBA -> 4 channels
    jpeg = _minimal_jpeg(63, 31)
    df = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(rgba)),
            (3, bytearray(jpeg)),
            (4, bytearray(b"not an image")),
            (5, bytearray(png[:20])),  # truncated mid-IHDR
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in MM.decode_headers(df, "doc_id").collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (7, 5, 3)
    assert rows[1]["n_bytes"] == len(png)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["channels"]) == (640, 479, 4)
    assert (rows[3]["width"], rows[3]["height"], rows[3]["channels"]) == (63, 31, 3)
    assert rows[4]["width"] is None and rows[4]["channels"] is None
    assert rows[5]["width"] is None and rows[5]["channels"] is None
    assert (
        MM.decode_headers(df, "doc_id").schema
        == MM.decode_metadata(df, "doc_id").schema
    )
    # driver-side parser twins (the unit under the plumbing)
    assert MM.parse_image_header(png) == (7, 5, 3)
    assert MM.parse_image_header(jpeg) == (63, 31, 3)
    assert MM.parse_image_header(b"") == (None, None, None)
    try:
        import PIL  # noqa: F401
    except ImportError:
        return
    real = {r["doc_id"]: r for r in MM.decode_real(df, "doc_id").collect()}
    assert (real[1]["width"], real[1]["height"], real[1]["channels"]) == (7, 5, 3)


def test_jaccard_prefix_filter_lossless_vs_bruteforce(spark):
    # prefix filtering must be lossless for pairs >= threshold: compare to a
    # pure-Python brute force over random small docs (mirrors the
    # reference's ground-truth-matrix test style, BitsTest.scala:45-114)
    import itertools
    import random

    from iodf_spark.operators.dedup import jaccard_pairs

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = []
    for i in range(60):
        base = [rng.choice(vocab) for _ in range(rng.randint(3, 14))]
        docs.append((i, " ".join(base)))
        if rng.random() < 0.5:  # planted near-dups
            mutated = list(base)
            if rng.random() < 0.7 and len(mutated) > 4:
                mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            docs.append((1000 + i, " ".join(mutated)))

    def shingles(text, n=3):
        toks = text.split()
        out = set()
        for j in range(len(toks) - n + 1):
            out.add(tuple(toks[j : j + n]))
        return out

    want = set()
    by_id = {i: shingles(t) for i, t in docs if shingles(t)}
    for a, b in itertools.combinations(sorted(by_id), 2):
        sa, sb = by_id[a], by_id[b]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= 0.8:
            want.add((a, b))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect()
    }
    assert got == want


def test_dedup_clusters_transitive_chain(spark):
    """Connected components must close transitively: pairs (1,2) and (2,3)
    put 1,2,3 in ONE cluster even though (1,3) is not a pair; singletons
    keep themselves."""
    import pandas as pd

    from iodf_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6], "text": ["x"] * 6})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 5], "doc_b": [2, 3, 6], "jaccard": [1.0] * 3})
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_clusters(docs, "doc_id", "text", pairs=pairs).collect()
    }
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (5, False),
    }


@pytest.mark.parametrize("bin_width", [0.5, 2.0, 10.0])
@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_join_range_binned_equals_broadcast(spark, sf_dir, bin_width, how):
    """The shuffle-based grid range join must equal the broadcast range
    join exactly — every bin width (ranges spanning one bin, many bins,
    sub-bin), both join modes, with edges landing exactly on bin
    boundaries and overlapping ranges producing multiple matches."""
    import pandas as pd

    from iodf_spark.operators.asof import join_range, join_range_binned

    ev = load_table(spark, sf_dir, "events").select("event_id", "value").limit(500)
    ranges = spark.createDataFrame(
        pd.DataFrame(
            {
                "rname": ["a", "b", "c", "d", "e"],
                "rlo": [0.0, 2.0, 2.5, 10.0, 500.0],  # b/c overlap; e matches none
                "rhi": [2.0, 4.0, 3.0, 50.0, 600.0],  # a ends ON a bin edge at w=2
            }
        )
    )
    from pyspark.sql import functions as F2

    broad = join_range(ev, ranges, F2.col("value"), "rlo", "rhi")
    if how == "inner":
        broad = broad.filter(F2.col("rname").isNotNull())
    binned = join_range_binned(
        ev, ranges, F2.col("value"), "rlo", "rhi", bin_width, how=how
    )
    key = lambda df: sorted(
        (r["event_id"], r["rname"]) for r in df.select("event_id", "rname").collect()
    )
    assert key(binned) == key(broad)


def test_char_entropy_and_surprisal_semantics(spark):
    """Ground-truth spot checks: entropy('aaaa')=0, entropy('abcd')=2,
    empty text -> 0; surprisal ranks all-common-token docs below
    all-rare/OOV docs, no-token docs get NULL."""
    import math

    import pandas as pd

    from iodf_spark.operators.textstats import text_stats, token_surprisal

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["aaaa", "abcd", "", "aabb"],
            }
        )
    )
    ent = {r["doc_id"]: r["char_entropy"] for r in text_stats(docs, "doc_id", "text").collect()}
    assert ent[1] == 0.0
    assert ent[2] == 2.0
    assert ent[3] == 0.0
    assert abs(ent[4] - 1.0) < 1e-9
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["the the the the", "zqxj", "   "],
            }
        )
    )
    surp = {
        r["doc_id"]: r["surprisal"]
        for r in token_surprisal(corpus, "doc_id", "text", vocab_size=1).collect()
    }
    # T=5, V=1, denom=7; 'the' in vocab (c=4) -> p=5/7; 'zqxj' OOV -> p=1/7
    assert abs(surp[1] - round(-math.log2(5 / 7), 6)) < 1e-6
    assert abs(surp[2] - round(-math.log2(1 / 7), 6)) < 1e-6
    assert surp[1] < surp[2]
    assert surp[3] is None


def test_dedup_materialize_one_survivor_per_cluster(spark, sf_dir):
    """End-to-end clean-corpus materialization: cluster -> keep_best ->
    materialize. Output = exactly one doc per cluster (the quality argmax),
    all non-clustered docs intact, no duplicates."""
    from iodf_spark.operators.dedup import dedup_clusters, dedup_materialize, keep_best

    docs = load_table(spark, sf_dir, "documents")
    labeled = keep_best(
        dedup_clusters(docs, "doc_id", "text"),
        docs.select("doc_id", F.col("n_chars").alias("score")),
    )
    clean = dedup_materialize(docs, labeled, policy="best")
    ids = [r["doc_id"] for r in clean.select("doc_id").collect()]
    assert len(ids) == len(set(ids))
    n_clusters = labeled.select("cluster_id").distinct().count()
    assert len(ids) == n_clusters  # full-corpus labels: one doc per cluster
    best = {r["doc_id"] for r in labeled.filter(F.col("keep_best")).collect()}
    assert set(ids) == best


def test_source_cap_exact_vs_global_window(spark, sf_dir):
    """The salted two-phase top-k must equal one global per-class window
    exactly (the per-salt union provably contains the global top-k), and
    the cap must bind: min(k, class size) rows per class survive."""
    from pyspark.sql import Window

    from iodf_spark.operators.sampling import _bucket_expr, source_cap

    docs = load_table(spark, sf_dir, "documents")
    k = 7
    got = sorted(
        r["doc_id"] for r in source_cap(docs, "doc_id", "source", k, salts=4).collect()
    )
    w = Window.partitionBy("source").orderBy("_b", "doc_id")
    want = sorted(
        r["doc_id"]
        for r in docs.withColumn("_b", F.expr(_bucket_expr("doc_id")))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .collect()
    )
    assert got == want
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    kept = {
        r["source"]: r["n"]
        for r in source_cap(docs, "doc_id", "source", k, salts=4)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert kept == {s: min(k, n) for s, n in sizes.items()}


def test_token_budget_select_vs_global_window(spark, sf_dir):
    """The range-partitioned two-pass prefix sum must equal one global
    window exactly, and the kept set must be the maximal quality-ordered
    prefix that fits the budget."""
    from pyspark.sql import Window

    from iodf_spark.operators.sampling import token_budget_select
    from iodf_spark.operators.textstats import quality_filter

    qf = quality_filter(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    budget = 3000
    got = {
        r["doc_id"]: (r["cum_tokens"], r["in_budget"])
        for r in token_budget_select(
            qf, "doc_id", "quality_score", "n_tokens", budget
        ).collect()
    }
    w = (
        Window.orderBy(F.col("quality_score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["doc_id"]: (r["c"], r["c"] <= budget)
        for r in qf.withColumn(
            "c", F.sum(F.col("n_tokens").cast("long")).over(w)
        ).collect()
    }
    assert got == want
    kept = [d for d, (_, in_b) in got.items() if in_b]
    assert kept, "budget keeps at least the best doc"
    # frontier: total of kept fits, kept + next-best doc would not
    ordered = sorted(got.items(), key=lambda kv: kv[1][0])
    total_kept = max(c for d, (c, in_b) in got.items() if in_b)
    assert total_kept <= budget
    first_out = next(((d, c) for d, (c, in_b) in ordered if not in_b), None)
    if first_out is not None:
        assert first_out[1] > budget


def test_keep_best_argmax_and_ties(spark):
    """Quality-argmax canonical selection: highest score wins the cluster;
    a score tie falls to the smallest doc id; singletons pick themselves."""
    import pandas as pd

    from iodf_spark.operators.dedup import keep_best

    labeled = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5, 6], "cluster_id": [1, 1, 1, 4, 5, 5]}
        )
    )
    scores = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6], "score": [10, 30, 30, 7, 2, 2]})
    )
    out = {
        r["doc_id"]: (r["best_id"], r["keep_best"])
        for r in keep_best(labeled, scores).collect()
    }
    assert out == {
        1: (2, False), 2: (2, True), 3: (2, False),  # 30 ties -> min id 2
        4: (4, True),
        5: (5, True), 6: (5, False),  # 2 ties -> min id 5
    }
    # score-coverage holes must not drop docs: unscored members rank at
    # -inf; a fully unscored cluster falls back to min id
    partial = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 6], "score": [1, 1]})
    )
    out2 = {
        r["doc_id"]: (r["best_id"], r["keep_best"])
        for r in keep_best(labeled, partial).collect()
    }
    assert out2 == {
        1: (3, False), 2: (3, False), 3: (3, True),  # only scored member wins
        4: (4, True),                                # fully unscored: min id
        5: (6, False), 6: (6, True),
    }


def test_sequence_pack_contiguity(spark, sf_dir):
    """Packing invariants per shard: the first doc starts at (0, 0), every
    doc begins exactly where the previous one ended (the packed token
    stream has no gaps and no overlaps), and end_seq is consistent with
    start + n_tokens."""
    from iodf_spark.operators.packing import sequence_pack
    from iodf_spark.sources.tables import load_table

    L = 512
    rows = sequence_pack(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", seq_len=L
    ).collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        start = r["start_seq"] * L + r["start_off"]
        expect = by_shard.get(r["shard"], 0)
        assert start == expect, (r["doc_id"], start, expect)
        assert r["end_seq"] == (start + max(r["n_tokens"], 1) - 1) // L
        by_shard[r["shard"]] = start + r["n_tokens"]
    assert len(by_shard) == 8


def test_sequence_pack_edge_shapes(spark):
    """Constructed edges the testdata can't produce: empty text (0 tokens
    occupies zero width but still gets a well-defined placement), a
    single-token doc, and a doc long enough to straddle a chop boundary
    — validated against a pure-Python packer."""
    from iodf_spark.operators.packing import sequence_pack

    L, S = 8, 2
    rows = [
        (0, ""),                          # 0 tokens
        (2, "a"),                         # 1 token
        (4, " ".join(["w"] * 11)),        # 11 tokens: straddles at L=8
        (6, " ".join(["x"] * 8)),         # exactly L tokens
        (1, "b c"),
        (3, " ".join(["y"] * 20)),        # multi-boundary straddle
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in sequence_pack(df, "doc_id", "text", seq_len=L, n_shards=S).collect()
    }
    # python reference: per shard (id % S), docs in id order, running start
    cursor = {}
    for doc_id, text in sorted(rows):
        n = len(text.split())
        shard = doc_id % S
        start = cursor.get(shard, 0)
        r = got[doc_id]
        assert (r["shard"], r["n_tokens"]) == (shard, n), doc_id
        assert (r["start_seq"], r["start_off"]) == (start // L, start % L), doc_id
        assert r["end_seq"] == (start + max(n, 1) - 1) // L, doc_id
        cursor[shard] = start + n


@pytest.mark.parametrize("n_planes,threshold", [(2, 0.3), (4, 0.45), (6, 0.6)])
def test_lsh_candidate_pairs_vs_oracle_params(spark, sf_dir, con, n_planes, threshold):
    """Differential check at NON-default parameters — catches threshold
    boundary (>= vs >) and plane-count formula drift the fixed-parameter
    driver gate can't see."""
    emb = load_table(spark, sf_dir, "embeddings")
    _match(
        S.lsh_candidate_pairs(
            emb, "vec_id", "embedding", threshold=threshold, n_planes=n_planes
        ),
        con,
        S.lsh_candidate_pairs_oracle(
            "vec_id", "embedding", "embeddings",
            threshold=threshold, n_planes=n_planes,
        ),
    )


@pytest.mark.parametrize("seq_len,n_shards", [(16, 1), (64, 4), (512, 8)])
def test_sequence_pack_vs_oracle_params(spark, sf_dir, con, seq_len, n_shards):
    from iodf_spark.operators import packing as P

    docs = load_table(spark, sf_dir, "documents")
    _match(
        P.sequence_pack(docs, "doc_id", "text", seq_len=seq_len, n_shards=n_shards),
        con,
        P.sequence_pack_oracle(
            "doc_id", "text", "documents", seq_len=seq_len, n_shards=n_shards
        ),
    )


@pytest.mark.parametrize("n,threshold", [(2, 0.3), (3, 0.5), (4, 0.8)])
def test_contamination_vs_oracle_params(spark, sf_dir, con, n, threshold):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(docs.doc_id % 20 == 0)
    corpus = docs.filter(docs.doc_id % 20 != 0)
    _match(
        D.contamination(corpus, "doc_id", "text", bench, n=n, threshold=threshold),
        con,
        D.contamination_oracle(
            "doc_id", "text", "documents",
            "_id % 20 = 0", "_id % 20 <> 0", n=n, threshold=threshold,
        ),
    )


def test_line_dedup_ground_truth(spark):
    # hand-built corpus: 'FOOTER' appears in 4 docs (> max_df=3) -> dropped
    # everywhere; '  spaced  ' trims to the same line as 'spaced'; blank and
    # whitespace-only lines never count
    rows = [
        (1, "alpha\nFOOTER\nbeta"),
        (2, "gamma\nFOOTER"),
        (3, "FOOTER\n\n   \ndelta"),
        (4, "FOOTER"),
        (5, "epsilon\nzeta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in D.line_dedup(df, "doc_id", "text", max_df=3).collect()}
    assert {k: (v["n_lines"], v["n_kept"], v["n_dropped"]) for k, v in out.items()} == {
        1: (3, 2, 1), 2: (2, 1, 1), 3: (2, 1, 1), 4: (1, 0, 1), 5: (2, 2, 0),
    }
    # doc 4 loses every line: fingerprint folds the empty array = seed
    from iodf_spark.functions.texthash import SEED
    assert out[4]["cleaned_fp"] == SEED
    # trim-equivalence: identical post-trim lines share one frequency bucket
    df2 = spark.createDataFrame(
        [(1, "  spaced  "), (2, "spaced"), (3, "spaced\t"), (4, "spaced"), (5, "other")],
        ["doc_id", "text"],
    )
    out2 = {r["doc_id"]: r["n_dropped"] for r in D.line_dedup(df2, "doc_id", "text", max_df=3).collect()}
    assert out2 == {1: 1, 2: 1, 3: 1, 4: 1, 5: 0}


@pytest.mark.parametrize("max_df", [0, 1, 3])
def test_line_dedup_vs_oracle_params(spark, sf_dir, con, max_df):
    # corpus docs are single-line; each page fixture line appears on one page
    # (df=1) except replicated boilerplate (df=LINE_PAGES) -> thresholds 0/1/3
    # cover drop-everything, keep-unique, and keep-under-cap regimes
    import __spark_entry__ as E

    docs = load_table(spark, sf_dir, "documents")
    pages = E._boilerplate_pages(docs)
    _match(
        D.line_dedup(pages, "page_id", "text", max_df=max_df),
        con,
        D.line_dedup_oracle("page_id", "text", E._boilerplate_pages_sql(), max_df=max_df),
    )


def test_pii_scan_ground_truth_and_dialects(spark, con):
    rows = [
        (1, "mail a.b+c_d%e@sub.domain.org and x@y.io twice"),
        (2, "server at 10.0.0.1 and 255.255.255.255, not 1.2.3.4.5 exactly"),
        (3, "call +1 (555) 010-1234 or +442071234567 now"),
        (4, "no pii here, just words and 42"),
        (5, "edge: @nouser.com 999.999.999.999 +12 34"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TS.pii_scan(df, "doc_id", "text").collect()}
    assert (out[1]["n_emails"], out[1]["pii_clean"]) == (2, False)
    # 1.2.3.4.5: the regex takes the leftmost 4 octets; \b rejects a
    # 5th-octet tail only when digits follow — the '.5' tail still leaves
    # '1.2.3.4' matching, so 3 hits on doc 2 (no range validation by design)
    assert (out[2]["n_ipv4"], out[2]["n_emails"]) == (3, 0)
    assert out[3]["n_phones"] == 2
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ipv4"], out[4]["pii_clean"]) == (0, 0, 0, True)
    # 999.* still counts (pattern is shape-only); '+12 34' is too short
    assert (out[5]["n_ipv4"], out[5]["n_phones"], out[5]["n_emails"]) == (1, 0, 0)
    # dialect agreement on the same rows (Java regex vs RE2)
    con.execute("CREATE OR REPLACE TABLE _pii_probe AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in rows)
                + ") t(doc_id, text)")
    _match(TS.pii_scan(df, "doc_id", "text"), con,
           TS.pii_scan_oracle("doc_id", "text", "_pii_probe"))


def test_temperature_sample_rebalances(spark, sf_dir):
    from iodf_spark.operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents")
    before = {r["source"]: r["cnt"] for r in docs.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")).collect()}
    kept = SA.temperature_sample(docs, "doc_id", "source", "4e-1")
    after = {r["source"]: r["cnt"] for r in kept.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")).collect()}
    # sqrt-temperature on a SKEWED synthetic corpus: rarer class => strictly
    # higher keep rate, rarest class under the cap keeps everything
    # (the real corpus is perfectly balanced, so skew needs a fixture)
    skew = spark.createDataFrame(
        [(i, "a") for i in range(1000)]
        + [(1000 + i, "b") for i in range(100)]
        + [(1100 + i, "c") for i in range(10)],
        ["doc_id", "cls"],
    )
    skept = SA.temperature_sample(skew, "doc_id", "cls", "3e-1")
    scnt = {r["cls"]: r["cnt"] for r in skept.groupBy("cls").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")).collect()}
    # expected rates ~ a:0.235  b:0.74  c:capped at 1.0
    assert scnt["c"] == 10, scnt  # under the cap: rare class fully kept
    assert 0.55 <= scnt["b"] / 100 <= 0.95, scnt
    assert 0.1 <= scnt["a"] / 1000 <= 0.4, scnt
    assert scnt["c"] / 10 > scnt["b"] / 100 > scnt["a"] / 1000
    # overall budget on the real corpus is roughly honored (hash slack)
    frac = sum(after.values()) / sum(before.values())
    assert 0.2 <= frac <= 0.6, frac
    # re-run selects the exact same rows (pure row-hash decision)
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in SA.temperature_sample(
        docs, "doc_id", "source", "4e-1").select("doc_id").collect())
    assert ids1 == ids2


def test_mixture_sample_hits_target_shares(spark):
    from pyspark.sql import functions as F

    from iodf_spark.operators import sampling as SA

    # skewed synthetic corpus: masses far from the 50/30/20 target
    rows = (
        [(i, "web", 10) for i in range(4000)]        # mass 40000
        + [(10_000 + i, "wiki", 10) for i in range(300)]   # mass 3000
        + [(20_000 + i, "code", 10) for i in range(1000)]  # mass 10000
        + [(30_000 + i, "junk", 10) for i in range(500)]   # unlisted
    )
    df = spark.createDataFrame(rows, ["doc_id", "src", "mass"])
    weights = {"web": "5e-1", "wiki": "3e-1", "code": "2e-1"}
    kept = SA.mixture_sample(df, "doc_id", "src", weights, "mass")
    got = {
        r["src"]: r["m"]
        for r in kept.groupBy("src").agg(F.sum("mass").alias("m")).collect()
    }
    # binding domain: wiki (3000/0.3 = 10000 = smallest) keeps EVERYTHING
    assert got["wiki"] == 3000, got
    # unlisted classes are dropped entirely
    assert "junk" not in got, got
    # achieved shares track the target (hash-rate slack ~ +-20% per class)
    total = sum(got.values())
    for cls, w in (("web", 0.5), ("wiki", 0.3), ("code", 0.2)):
        assert abs(got[cls] / total - w) < 0.07, (cls, got, total)
    # deterministic: a re-run selects the exact same rows
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in SA.mixture_sample(df, "doc_id", "src", weights, "mass")
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_mixture_sample_vs_oracle(spark, sf_dir, con):
    from iodf_spark.operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": "4e-1", "src1": "3e-1", "src2": "2e-1", "src3": "1e-1"}
    _match(
        SA.mixture_sample(docs, "doc_id", "source", weights, "n_chars").select(
            "doc_id", "source"
        ),
        con,
        SA.mixture_sample_oracle(
            "documents", "doc_id", "source", weights, "n_chars",
            select="doc_id, _d.source",
        ),
    )


@pytest.mark.parametrize("frac", ["1e-1", "4e-1", "9e-1"])
def test_temperature_sample_vs_oracle_params(spark, sf_dir, con, frac):
    from iodf_spark.operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents")
    _match(
        SA.temperature_sample(docs, "doc_id", "source", frac).select("doc_id", "source"),
        con,
        SA.temperature_sample_oracle(
            "documents", "doc_id", "source", frac, select="doc_id, _d.source"
        ),
    )


def test_line_dedup_clean_materializes_stripped_text(spark):
    rows = [
        (1, "alpha\nFOOTER\nbeta"),
        (2, "gamma\n  FOOTER  "),
        (3, "FOOTER\n\n   \ndelta"),
        (4, "FOOTER"),
        (5, "epsilon\nzeta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["clean_text"]
           for r in D.line_dedup_clean(df, "doc_id", "text", max_df=3).collect()}
    assert out == {
        1: "alpha\nbeta",   # FOOTER stripped, order kept
        2: "gamma",          # trim-equivalent '  FOOTER  ' stripped too
        3: "delta",          # blank/whitespace lines dropped
        4: "",               # fully-boilerplate doc present with empty text
        5: "epsilon\nzeta",  # untouched
    }


# ---------------------------------------------------------------------------
# substring-level dedup (ExactSubstr family)


def test_duplicated_spans_ground_truth(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"one unique start {shared} one unique end"),
        (2, f"two opening words {shared} two closing words here"),
        (3, "totally unrelated text with no repeats at all whatsoever"),
        (4, f"{shared} {shared} self repeat doc"),
        (5, ""),
        (6, "short doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        tuple(r) for r in D.duplicated_spans(df, "doc_id", "text", k=4).collect()
    )
    # exact boundaries: the 8-token run starts at token 3 in docs 1 and 2
    # (5 duplicated 4-windows each); doc 4's two pasted copies are SEPARATE
    # spans because the junction windows (straddling copy 1 -> copy 2) occur
    # only once corpus-wide; docs 3/5/6 never appear
    assert got == [
        (1, 3, 8, 5),
        (2, 3, 8, 5),
        (4, 0, 8, 5),
        (4, 8, 8, 5),
    ]


def test_duplicated_spans_min_occurrences(spark):
    shared = "w x y z q r s t"
    rows = [(1, f"a b c {shared}"), (2, f"d e f {shared}"), (3, f"g h i {shared}")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # every window of `shared` occurs 3x -> min_occurrences=3 still fires
    assert D.duplicated_spans(df, "doc_id", "text", k=4, min_occurrences=3).count() == 3
    # but a pair-only duplicate does not
    rows2 = [(1, f"a b c {shared}"), (2, f"d e f {shared}"), (3, "g h i j k l m n")]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    assert D.duplicated_spans(df2, "doc_id", "text", k=4, min_occurrences=3).count() == 0


def test_duplicated_spans_chimeric_merge_is_coalesced(spark):
    # the documented approximation has a sharp edge, pinned both ways:
    # (a) doc 3 = two halves shared with different sources and NO window
    # straddling the junction duplicated -> the halves stay SEPARATE spans;
    rows = [
        (1, "doc one has a b c d only here"),
        (2, "doc two has e f g h only here"),
        (3, "a b c d e f g h"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans3 = sorted(
        (r["span_start"], r["span_toks"])
        for r in D.duplicated_spans(df, "doc_id", "text", k=4).collect()
        if r["doc_id"] == 3
    )
    assert spans3 == [(0, 4), (4, 4)]
    # (b) when the sources OVERLAP at the junction (every window of doc 3
    # is duplicated somewhere, each half against a different source), the
    # windows are consecutive and fuse into ONE chimeric span even though
    # no single source contains the whole run — the coalescing a suffix
    # array would not do
    rows2 = [
        (1, "prefix source a b c d e f g end"),
        (2, "start d e f g h i j suffix source"),
        (3, "a b c d e f g h i j"),
    ]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    spans3b = sorted(
        (r["span_start"], r["span_toks"])
        for r in D.duplicated_spans(df2, "doc_id", "text", k=4).collect()
        if r["doc_id"] == 3
    )
    assert spans3b == [(0, 10)]


def test_substring_dedup_clean_keeper_policy(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"one unique start {shared} one unique end"),
        (2, f"two opening words {shared} two closing words here"),
        (4, f"{shared} {shared} self repeat doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           D.substring_dedup_clean(df, "doc_id", "text", k=4).collect()}
    # doc 1 holds the lexicographically-first occurrence -> keeps everything
    assert out[1]["clean_text"] == f"one unique start {shared} one unique end"
    assert out[1]["removed_toks"] == 0
    # doc 2 loses exactly the shared run
    assert out[2]["clean_text"] == "two opening words two closing words here"
    assert (out[2]["n_toks"], out[2]["removed_toks"]) == (15, 8)
    # doc 4 loses BOTH pasted copies (keeper lives in doc 1)
    assert out[4]["clean_text"] == "self repeat doc"
    assert out[4]["removed_toks"] == 16


def test_substring_dedup_clean_rejects_out_of_range_ids(spark):
    """The int64 keeper key packs (id, pos) at radix 2^31; an id >= 2^32
    would wrap the pack negative and min(_enc) would silently crown wrong
    keepers. The fused when/raise_error guard must fail the job loudly
    instead."""
    body = " ".join(f"tok{i}" for i in range(20))
    rows = [(2**33, body), (2, body)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(Exception, match="keeper-key range"):
        D.substring_dedup_clean(df, "doc_id", "text", k=8).collect()
    neg = spark.createDataFrame([(-1, body), (2, body)], ["doc_id", "text"])
    with pytest.raises(Exception, match="keeper-key range"):
        D.substring_dedup_clean(neg, "doc_id", "text", k=8).collect()


def test_substring_dedup_untouched_docs_roundtrip(spark):
    # docs with no duplicated window come back token-identical (whitespace
    # normalized to single spaces, the documented convention) — including
    # empty and shorter-than-k docs
    rows = [(1, "just  some   spaced\ttext"), (2, ""), (3, "tiny"),
            (4, "another unique document body")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           D.substring_dedup_clean(df, "doc_id", "text", k=3).collect()}
    assert out[1]["clean_text"] == "just some spaced text"
    assert out[2]["clean_text"] == "" and out[2]["n_toks"] == 0
    assert out[3]["clean_text"] == "tiny"
    assert all(r["removed_toks"] == 0 for r in out.values())


@pytest.mark.parametrize("k", [8, 16])
def test_dedup_substring_vs_oracle(spark, sf_dir, con, k):
    docs = load_table(spark, sf_dir, "documents")
    _match(
        D.duplicated_spans(docs, "doc_id", "text", k=k),
        con,
        D.duplicated_spans_oracle("doc_id", "text", "documents", k=k),
    )
    _match(
        D.substring_dedup_clean(docs, "doc_id", "text", k=k),
        con,
        D.substring_dedup_clean_oracle("doc_id", "text", "documents", k=k),
    )


# ---------------------------------------------------------------------------
# audio/video container headers (round 10: WAV RIFF / MP4 ISO-BMFF)


def _stdlib_wav(channels: int, rate: int, n_frames: int) -> bytes:
    """A REAL WAV stream written by the stdlib `wave` encoder — the parser
    is tested against bytes an actual codec produced, not hand-rolled
    ones."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00" * (2 * channels * n_frames))
    return buf.getvalue()


def _minimal_mp4(timescale: int, duration: int, n_tracks: int,
                 version: int = 0) -> bytes:
    """A box-walk-valid ISO-BMFF stream: ftyp, then moov holding a
    version-0 (or version-1, with widened time fields) mvhd plus
    n_tracks empty trak boxes."""
    import struct

    if version == 0:
        mvhd_body = bytes([0, 0, 0, 0]) + bytes(8) + struct.pack(
            ">II", timescale, duration
        )
    else:
        mvhd_body = bytes([1, 0, 0, 0]) + bytes(16) + struct.pack(
            ">IQ", timescale, duration
        )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    traks = (struct.pack(">I", 8) + b"trak") * n_tracks
    moov = struct.pack(">I", 8 + len(mvhd) + len(traks)) + b"moov" + mvhd + traks
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + bytes(4)
    return ftyp + moov


def test_wav_header_real_stdlib_roundtrip():
    # bytes from the REAL stdlib wave encoder parse back exactly
    wav = _stdlib_wav(2, 22050, 441)
    assert MM.parse_wav_header(wav) == (2, 22050, 16, 441)
    m = MM.parse_media_header(wav)
    assert (m["kind"], m["channels"], m["sample_rate"]) == ("wav", 2, 22050)
    assert m["duration_ms"] == 441 * 1000 // 22050  # 20 ms
    assert m["width"] is None and m["n_tracks"] is None
    # mono, odd-sized data chunk exercises the RIFF word-alignment rule
    wav2 = _stdlib_wav(1, 8000, 3)
    assert MM.parse_wav_header(wav2) == (1, 8000, 16, 3)
    # corrupt / truncated / wrong-magic degrade to Nones, never raise
    assert MM.parse_wav_header(wav[:10]) == (None, None, None, None)
    assert MM.parse_wav_header(b"RIFFxxxxAVI ") == (None, None, None, None)
    assert MM.parse_wav_header(b"") == (None, None, None, None)


def test_mp4_header_box_walk():
    mp4 = _minimal_mp4(600, 1800, 2)
    assert MM.parse_mp4_header(mp4) == (600, 1800, 2)
    m = MM.parse_media_header(mp4)
    assert (m["kind"], m["duration_ms"], m["n_tracks"]) == ("mp4", 3000, 2)
    # version-1 mvhd (64-bit duration) parses through the widened offsets
    v1 = _minimal_mp4(90000, 90000 * 7 + 1, 1, version=1)
    assert MM.parse_mp4_header(v1) == (90000, 90000 * 7 + 1, 1)
    assert MM.parse_media_header(v1)["duration_ms"] == 7000
    # zero tracks, missing moov, truncation, size-0 box, garbage
    assert MM.parse_mp4_header(_minimal_mp4(600, 60, 0)) == (600, 60, 0)
    import struct
    assert MM.parse_mp4_header(struct.pack(">I", 16) + b"ftyp" + bytes(8)) == (
        None, None, 0)
    assert MM.parse_mp4_header(_minimal_mp4(600, 60, 1)[:20]) == (None, None, 0)
    assert MM.parse_mp4_header(b"") == (None, None, None)
    assert MM.parse_mp4_header(b"not a video at all") == (None, None, None)


def test_mp4_truncated_v1_mvhd_degrades_to_none():
    """A version-1 mvhd box whose body ends inside [s2+28, s2+32) used to
    pass the (too-loose) 28-byte guard and then struct.unpack 12 bytes
    ending at s2+32 — struct.error killing the whole Arrow batch, or (when
    the enclosing payload continued) a silent read across the box
    boundary. Both shapes must degrade to None fields now."""
    import struct

    # full v1 body is 32 bytes (ver/flags 4 + ctime/mtime 16 + ts 4 + dur 8);
    # cut it to 30 so the box ends at s2+30 — inside the hazardous window
    full = bytes([1, 0, 0, 0]) + bytes(16) + struct.pack(">IQ", 90000, 630001)
    for cut in (28, 29, 30, 31):
        body = full[:cut]
        mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
        moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
        ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + bytes(4)
        blob = ftyp + moov
        assert MM.parse_mp4_header(blob) == (None, None, 0), cut
        m = MM.parse_media_header(blob)
        assert m["kind"] == "mp4" and m["duration_ms"] is None
        # trailing bytes AFTER the truncated box must not be read across
        # the boundary as if they were the duration field
        tail = blob + struct.pack(">IQ", 1, 1)
        assert MM.parse_mp4_header(tail) == (None, None, 0), cut


def test_decode_media_headers_mixed_modalities(spark):
    """The unified all-modality decoder over one binary column: per-row
    magic dispatch inside a single Arrow batch, nullable per-modality
    fields, corrupt rows as NULL-kind rows."""
    png = _stdlib_png(7, 5)
    wav = _stdlib_wav(2, 16000, 320)
    mp4 = _minimal_mp4(600, 1200, 3)
    df = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(wav)),
            (3, bytearray(mp4)),
            (4, bytearray(b"opaque blob")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in MM.decode_media_headers(df, "doc_id").collect()}
    assert (rows[1]["kind"], rows[1]["width"], rows[1]["channels"]) == ("png", 7, 3)
    assert rows[1]["sample_rate"] is None
    assert (rows[2]["kind"], rows[2]["sample_rate"], rows[2]["duration_ms"]) == (
        "wav", 16000, 20)
    assert rows[2]["width"] is None
    assert (rows[3]["kind"], rows[3]["duration_ms"], rows[3]["n_tracks"]) == (
        "mp4", 2000, 3)
    assert rows[4]["kind"] is None and rows[4]["n_bytes"] == 11


def test_contaminated_spans_locates_benchmark_overlap(spark):
    """Substring-grain decontamination: verbatim benchmark runs inside
    train docs come back with exact boundaries; paraphrased (gap-broken)
    overlap and train-train duplication do NOT flag."""
    bench_run = "q a1 a2 a3 a4 a5 a6 a7 a8 end"  # 10 tokens
    bench = spark.createDataFrame(
        [(1000, f"benchmark question {bench_run} answer")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            # verbatim contamination mid-doc
            (1, f"some training text {bench_run} more text here"),
            # gap-broken: the run with one token swapped mid-way —
            # only the two clean halves flag, separately
            (2, f"t {('q a1 a2 a3 a4 XX a6 a7 a8 end')} t"),
            # train-train duplication must NOT flag (not in benchmark)
            (3, "dup dup dup shared train only run one two three four"),
            (4, "dup dup dup shared train only run one two three four"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        tuple(r)
        for r in D.contaminated_spans(train, "doc_id", "text", bench, k=4).collect()
    )
    # doc 1: tokens 3..12 inclusive = start 3, 10 toks, 7 windows
    # doc 2: halves 'q a1 a2 a3 a4' (start 1, 5 toks) and 'a6 a7 a8 end'
    #        (start 7, 4 toks = 1 window)
    assert got == [(1, 3, 10, 7), (2, 1, 5, 2), (2, 7, 4, 1)]


def test_chunk_documents_geometry(spark):
    """Overlapping token-window chunking: stride/overlap arithmetic,
    remainder tail, short and empty docs, and the adjacent-chunk overlap
    invariant (each chunk's first `overlap` tokens == its predecessor's
    last `overlap`)."""
    from iodf_spark.operators.packing import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, "a b c"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, "doc_id", "text", chunk_toks=4, overlap=2).collect()
    }
    # doc 1: starts 0,2,4,6 (stride 2); all full-width; tail covered
    assert sorted(k for k in got if k[0] == 1) == [(1, i) for i in range(4)]
    assert got[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert got[(1, 3)]["chunk_text"] == "t6 t7 t8 t9"
    for i in range(1, 4):
        prev, cur = got[(1, i - 1)]["chunk_text"].split(), got[(1, i)]["chunk_text"].split()
        assert prev[-2:] == cur[:2]  # the overlap invariant
    # short doc: one remainder chunk; empty doc: absent
    assert (got[(2, 0)]["n_toks"], got[(2, 0)]["chunk_text"]) == (3, "a b c")
    assert not any(k[0] == 3 for k in got)
    # parameter validation
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_toks=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_toks=0)


def test_chunk_embed_retrieve_composition(spark):
    """The advertised composition end-to-end: chunk -> hash_embed the
    chunk text -> brute-force cosine retrieval returns the planted
    near-duplicate chunk as the top neighbor, at chunk grain (the doc
    pair is only half-similar — chunking is what isolates the overlap)."""
    from iodf_spark.operators.packing import chunk_documents
    from iodf_spark.operators.similarity import ann_brute_force, hash_embed

    shared = " ".join(f"s{i}" for i in range(8))
    rows = [
        (1, f"{shared} {' '.join(f'a{i}' for i in range(8))}"),
        (2, f"{' '.join(f'b{i}' for i in range(8))} {shared}"),
        (3, " ".join(f"c{i}" for i in range(16))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = chunk_documents(docs, "doc_id", "text", chunk_toks=8, overlap=0)
    # chunk key = doc_id * 16 + chunk_idx (unique, reversible)
    keyed = chunks.select(
        (F.col("doc_id") * 16 + F.col("chunk_idx")).alias("chunk_key"),
        F.col("chunk_text"),
    )
    emb = hash_embed(keyed, "chunk_key", "chunk_text", dim=64)
    # query = doc 1's FIRST chunk (the shared half): key 16
    res = ann_brute_force(emb, "chunk_key", "vec", [16], k=1, dim=64)
    top = res.collect()[0]
    # its nearest neighbor is doc 2's SECOND chunk (key 33), similarity 1.0
    assert (top["neighbor_id"], round(top["cos"], 4)) == (33, 1.0)


def test_decontaminate_clean_cuts_benchmark_text(spark):
    """The decon CUT: verbatim benchmark runs vanish from train docs
    (every occurrence — no keeper), clean docs round-trip untouched, and
    the within-doc double paste loses BOTH copies."""
    bench_run = "q a1 a2 a3 a4 a5 a6 a7 a8 end"
    bench = spark.createDataFrame(
        [(1000, f"benchmark question {bench_run} answer")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, f"some training text {bench_run} more text here"),
            (2, "pristine document with no benchmark overlap at all"),
            (3, f"{bench_run} {bench_run}"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           D.decontaminate_clean(train, "doc_id", "text", bench, k=4).collect()}
    assert out[1]["clean_text"] == "some training text more text here"
    assert (out[1]["n_toks"], out[1]["removed_toks"]) == (16, 10)
    assert out[2]["clean_text"] == "pristine document with no benchmark overlap at all"
    assert out[2]["removed_toks"] == 0
    assert (out[3]["clean_text"], out[3]["removed_toks"]) == ("", 20)
