"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k (the correctness baseline) and a sign-random-projection LSH
bucketed variant (the scale path), plus embedding-cosine near-duplicate
pairs.

Determinism-by-construction: all arithmetic is double-precision sequential
folds (zip_with + aggregate in Spark; list_transform + list_sum in DuckDB)
over identical element orders, and the LSH hyperplanes are ±1 vectors
derived from an integer polynomial hash — so the DuckDB oracle reproduces
bucketing and scores exactly.

Scale design: brute-force is O(Q·N) with the query side broadcast — right
for small Q or as a re-ranker. The LSH path buckets both sides by projection
sign bits (one narrow map per side + a bucket-equi-join), turning top-k into
per-bucket local work; at 100 TB add multi-probe (flip one bit) and a
re-rank stage. For massive fan-out, partition the corpus by bucket and keep
per-bucket Parquet sort order so scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iodf_spark.functions.texthash import MOD, MULT, SEED
from iodf_spark.session import fan_out


def _dot(a: str, b: str, dialect: str, dim: int | None = None) -> str:
    """Dot product. With ``dim`` known (embedding columns have a fixed
    width), the sum is UNROLLED into dim codegen'd subscript terms —
    higher-order-function folds are interpreted per element (~µs each,
    the round-1 lesson), so unrolling is a 5-20x win in hot joins. The
    unrolled left-associative ascending sum performs the identical
    float64 addition order as the sequential fold, so engine and oracle
    stay bit-equal in any mix."""
    if dim is not None:
        if dialect == "spark":
            terms = [
                f"cast({a}[{i}] as double) * cast({b}[{i}] as double)"
                for i in range(dim)
            ]
        else:
            terms = [f"{a}[{i + 1}]::DOUBLE * {b}[{i + 1}]::DOUBLE" for i in range(dim)]
        return "(" + " + ".join(terms) + ")"
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (_x, _y) -> cast(_x as double) * cast(_y as double)), "
            f"cast(0 as double), (_acc, _v) -> _acc + _v)"
        )
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"_i -> {a}[_i]::DOUBLE * {b}[_i]::DOUBLE))"
    )


def cosine_expr(a: str, b: str, dialect: str, dim: int | None = None) -> str:
    return (
        f"({_dot(a, b, dialect, dim)}) / "
        f"(sqrt({_dot(a, a, dialect, dim)}) * sqrt({_dot(b, b, dialect, dim)}))"
    )


def norm_expr(vec: str, dialect: str, dim: int | None = None) -> str:
    """sqrt(<v, v>) — precomputed per ROW so pair-scoring joins evaluate
    only the cross dot: cos = dot(a,b) / (a_norm * b_norm) performs the
    exact same float64 operations as cosine_expr (sqrt then multiply),
    just factored out of the O(pairs) loop — bit-identical, 3x less work
    and 3x smaller codegen.

    With ``dim`` fixed (spark dialect) the unrolled subscript kernels would
    silently produce NULL cosines on a ragged vector column (out-of-range
    subscripts are NULL in Spark); since every ANN operator norms every row
    exactly once, this is THE chokepoint — a size guard here makes ragged
    input raise instead of corrupting scores. The guard is a size()
    comparison per row: noise next to the dim multiplies."""
    base = f"sqrt({_dot(vec, vec, dialect, dim)})"
    if dim is not None and dialect == "spark":
        return (
            f"CASE WHEN size({vec}) = {dim} THEN {base} "
            f"ELSE cast(raise_error('ragged embedding column: expected fixed "
            f"dim {dim}') as double) END"
        )
    return base


def _plane_component(j: int, d: str, dialect: str) -> str:
    """Deterministic ±1 hyperplane component for plane j, dimension d:
    parity of the integer polynomial hash of (j, d)."""
    h = f"((({SEED} * {MULT} + {j}) % {MOD}) * {MULT} + {d}) % {MOD}"
    return f"(2 * (({h}) % 2) - 1)"


def _plane_sign(j: int, d: int) -> int:
    """Python twin of :func:`_plane_component` — same integer formula, so
    plan-time-folded signs equal the SQL-computed ones exactly."""
    h = ((SEED * MULT + j) % MOD * MULT + d) % MOD
    return 2 * (h % 2) - 1


def lsh_bucket_expr(vec: str, n_planes: int, dialect: str, dim: int | None = None) -> str:
    """Bucket id in [0, 2^n_planes): bit j = sign of <vec, plane_j>. With
    ``dim`` known the ±1 hyperplane signs fold to literals at plan time and
    each projection unrolls to dim codegen'd terms (same addition order as
    the fold — see _dot)."""
    bits = []
    for j in range(n_planes):
        if dim is not None:
            sub = (lambda i: f"{vec}[{i}]") if dialect == "spark" else (
                lambda i: f"{vec}[{i + 1}]"
            )
            cast = "cast({} as double)" if dialect == "spark" else "{}::DOUBLE"
            proj = " + ".join(
                f"({cast.format(sub(d))} * {_plane_sign(j, d)})" for d in range(dim)
            )
        elif dialect == "spark":
            proj = (
                f"aggregate(zip_with({vec}, sequence(0, size({vec}) - 1), "
                f"(_x, _d) -> cast(_x as double) * {_plane_component(j, '_d', dialect)}), "
                f"cast(0 as double), (_acc, _v) -> _acc + _v)"
            )
        else:
            proj = (
                f"list_sum(list_transform(range(len({vec})), "
                f"_d -> {vec}[_d + 1]::DOUBLE * {_plane_component(j, '_d', dialect)}))"
            )
        bits.append(f"(case when ({proj}) >= 0 then {1 << j} else 0 end)")
    return "(" + " + ".join(bits) + ")"


def _infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Learn the fixed embedding width at plan time — unlocks the unrolled
    codegen kernels (see _dot). One narrow agg over the vector sizes (column
    pruned to a single int per row) that also VALIDATES the width is uniform:
    a ragged vector column would otherwise silently NULL every cosine
    downstream. Callers that already know the width pass ``dim=`` explicitly
    and skip this probe entirely — the right move at 100 TB."""
    row = df.select(
        F.min(F.size(F.col(vec_col))).alias("_lo"),
        F.max(F.size(F.col(vec_col))).alias("_hi"),
    ).collect()[0]
    if row["_lo"] is None:
        return None
    if row["_lo"] != row["_hi"]:
        raise ValueError(
            f"ragged vector column {vec_col!r}: sizes range "
            f"[{row['_lo']}, {row['_hi']}] — fixed width required"
        )
    return int(row["_hi"])


# --------------------------------------------------------------------------
# operators


# Quantization scale for the exact-integer cosine path: components are
# snapped to 1/2^20 grid, so dot products are EXACT int64 arithmetic
# (64 dims * (2^20)^2 = 2^46 << 2^63) — any summation order gives the
# identical result, which lets the engine use vectorized numpy block
# matmul while the DuckDB oracle uses sequential list folds, bit-equal.
QSCALE = 1 << 20


def quant_expr(vec: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"transform({vec}, _x -> cast(floor(cast(_x as double) * {QSCALE} + 0.5e0) as bigint))"
        )
    return f"list_transform({vec}, _x -> floor(_x::DOUBLE * {QSCALE} + 0.5e0)::BIGINT)"


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.45,
    n_blocks: int | None = None, dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs with quantized cosine >=
    threshold, as a fully distributed block-grid self-join — nothing is ever
    collected to the driver.

    The corpus is hash-split into ``n_blocks`` blocks; the pair space is the
    upper-triangular grid of block pairs (ba <= bb). Every row is shuffled to
    the grid cells it participates in (A-side copies to cells (blk, bb>=blk),
    B-side copies to cells (ba<=blk, blk)), then one Arrow-batched
    ``applyInPandas`` kernel per cell runs the exact int64 block matmul.

    Scale: shuffle volume is (n_blocks+1)x the corpus and per-cell memory is
    ~2*N/n_blocks rows, so pick n_blocks ~ N*rowbytes/executor_mem; work is
    the inherent O(N^2) dots but vectorized and spread over
    n_blocks*(n_blocks+1)/2 independent cells. Use the LSH/IVF buckets as a
    pre-filter when recall < 1 is acceptable. Scores stay oracle-exact: dots
    are int64 (any summation order), normalization float64 as in the oracle.
    """
    nb = int(n_blocks) if n_blocks is not None else _auto_blocks(df, vec_col, dim)
    q = fan_out(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))).select(
        "id",
        F.expr(quant_expr("_v", "spark")).alias("qv"),
        F.lit(0).alias("_bkt"),
    )
    return _blocked_pair_scores(q, nb, threshold)


def _auto_blocks(df: DataFrame, vec_col: str, dim: int | None = None) -> int:
    """Size grid blocks to a memory budget, not a fixed count: a cell holds
    ~2 blocks of quantized int64 vectors, so block_rows ~ budget / (dim * 8).
    Small corpora collapse to a handful of cells (fewer Arrow kernel
    launches); at 100 TB the same rule yields thousands of independent
    cells, each bounded by executor memory."""
    if dim is None:
        head = df.select(F.size(F.col(vec_col)).alias("_d")).limit(1).collect()
        dim = int(head[0]["_d"]) if head else 1
    n = df.count()
    block_budget_bytes = 64 << 20
    block_rows = max(1, block_budget_bytes // (max(dim, 1) * 8))
    n_blocks = max(1, min(256, -(-n // block_rows)))
    # spread to the cluster parallelism only when the O(n^2) dot work is
    # big enough to be worth the extra cells (upper-triangular grid of b
    # blocks has b*(b+1)/2 cells); below that, fewer cells = fewer
    # Arrow kernel launches wins
    par = df.sparkSession.sparkContext.defaultParallelism
    if n * n * max(dim, 1) > 1_000_000_000 and n_blocks * (n_blocks + 1) // 2 < par:
        n_blocks = min(256, max(n_blocks, int((2 * par) ** 0.5) + 1))
    return int(n_blocks)


def _blocked_pair_scores(q: DataFrame, nb: int, threshold: float) -> DataFrame:
    """Shared block-grid pair-scoring engine over ``q`` = (id, qv:
    array<bigint> quantized, _bkt). Pairs are generated WITHIN a bucket only
    (callers that want all pairs pass a constant bucket); each bucket's pair
    space is an upper-triangular grid of hash-blocks, every row is shuffled
    to the (bucket, cell)s it participates in, and one Arrow-batched
    ``applyInPandas`` kernel per cell runs the exact int64 block matmul.

    This keeps the heavy part — candidate scoring — vectorized (numpy
    matmul) and memory-bounded (~2 blocks per cell) regardless of bucket
    skew: a hot LSH bucket becomes many independent bounded cells, never
    one giant join partition (the naive bucket equi-join caps parallelism
    at #buckets AND re-evaluates interpreted array expressions per pair —
    measured 37 s vs <2 s on the same input)."""
    import numpy as np
    import pandas as pd

    qb = q.withColumn("_blk", F.pmod(F.xxhash64(F.col("id")), F.lit(nb)).cast("int"))
    # replicate each row to its grid cells: A-side rows fan to (blk, bb>=blk),
    # B-side rows fan to (ba<=blk, blk); a pair {x, y} with blocks (bx, by)
    # meets in exactly one cell: (min(bx,by), max(bx,by))
    a_side = qb.withColumn(
        "_bb", F.explode(F.sequence(F.col("_blk"), F.lit(nb - 1)))
    ).select(
        "_bkt", F.col("_blk").alias("_ba"), "_bb", "id", "qv", F.lit(0).alias("_side")
    )
    b_side = qb.withColumn(
        "_ba", F.explode(F.sequence(F.lit(0), F.col("_blk")))
    ).select(
        "_bkt", "_ba", F.col("_blk").alias("_bb"), "id", "qv", F.lit(1).alias("_side")
    )
    cells = a_side.unionByName(b_side)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        diagonal = pdf["_ba"].iat[0] == pdf["_bb"].iat[0]
        a = pdf[pdf["_side"] == 0]
        b = pdf[pdf["_side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        aid = a["id"].to_numpy()
        bid = b["id"].to_numpy()
        A = np.array(a["qv"].tolist(), dtype=np.int64)
        B = np.array(b["qv"].tolist(), dtype=np.int64)
        an = np.sqrt((A * A).sum(axis=1).astype(np.float64))
        bn = np.sqrt((B * B).sum(axis=1).astype(np.float64))
        # int64 matmul has no BLAS kernel (numpy falls back to a scalar
        # loop — measured 10 s vs ~0.5 s on a 5K x 5K x 256 cell). When
        # every possible dot is < 2^53, float64 products AND every partial
        # sum are exact integers regardless of summation order, so the
        # BLAS path is bit-identical to the int64 one — check the bound,
        # don't assume it (unnormalized count vectors can exceed it).
        bound = (
            float(A.shape[1])
            * max(1.0, float(np.abs(A).max(initial=0)))
            * max(1.0, float(np.abs(B).max(initial=0)))
        )
        if bound < 2.0**53:
            dots = A.astype(np.float64) @ B.T.astype(np.float64)
        else:
            dots = A @ B.T
        C = dots / (an[:, None] * bn[None, :])
        if diagonal:
            # same rows on both sides: emit each pair once, ordered
            mask = (C >= threshold) & (aid[:, None] < bid[None, :])
        else:
            # disjoint blocks: pair appears only in this cell; normalize order
            mask = (C >= threshold) & (aid[:, None] != bid[None, :])
        ai, bj = np.nonzero(mask)
        id_a = np.minimum(aid[ai], bid[bj])
        id_b = np.maximum(aid[ai], bid[bj])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos": C[ai, bj]})

    out = cells.groupBy("_bkt", "_ba", "_bb").applyInPandas(
        kernel, "id_a long, id_b long, cos double"
    )
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def cosine_pairs_oracle(
    id_col: str, vec_col: str, table: str, threshold: float = 0.45
) -> str:
    qa, qb = "a._q", "b._q"
    dot = (
        f"list_sum(list_transform(range(1, len({qa}) + 1), "
        f"_i -> {qa}[_i] * {qb}[_i]))::DOUBLE"
    )
    nrm = "sqrt(list_sum(list_transform({v}, _x -> _x * _x))::DOUBLE)"
    cos = f"({dot}) / ({nrm.format(v=qa)} * {nrm.format(v=qb)})"
    return f"""
        WITH qv AS (SELECT {id_col} AS _id,
                           {quant_expr(vec_col, 'duckdb')} AS _q FROM {table})
        SELECT a._id AS id_a, b._id AS id_b, round({cos}, 6) AS cos
        FROM qv a JOIN qv b ON a._id < b._id
        WHERE ({cos}) >= {threshold}
    """


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    n_planes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed — the 100 TB path. Only
    vectors sharing a sign-projection bucket ever meet (one equi-join on
    the bucket key; shuffle is corpus-linear, work is sum of per-bucket
    squares — no block-grid O(N^2) stage anywhere in the plan), then the
    exact quantized cosine verifies each candidate. Recall < 1 by design:
    a true pair whose signs differ on some plane is missed — the standard
    LSH trade; :func:`cosine_pairs` is the exact (but O(N^2)-work) twin.

    Deterministic buckets + exact verification make this oracle-checkable
    despite being "approximate": engine and oracle miss the SAME pairs.
    Skew note: 2^n_planes buckets bound the join fan-out; raise n_planes
    for bigger corpora (bucket occupancy ~ N / 2^n_planes) and let AQE
    skew-join split any hot bucket.

    Same pair-graph contract as cosine_pairs / jaccard_pairs (id_a < id_b),
    so it drops into ``dedup_clusters(pairs=...)`` unchanged — reference
    seed: ml/Knn.scala's feature-space neighbor generation feeding the
    dedup policy layer.

    Verification runs on the shared block-grid numpy kernel with the LSH
    bucket as an extra grid key: real embedding buckets are SKEWED (vectors
    correlate with the hyperplanes — measured ~50% of all pairs landing in
    one of 16 buckets), and a plain bucket equi-join would both cap
    parallelism at #buckets and evaluate interpreted array expressions per
    candidate. The grid splits every bucket into memory-bounded cells
    scored by int64 matmul — bit-equal to the oracle's per-pair folds."""
    dim = dim or _infer_dim(df, vec_col)
    q = fan_out(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))).select(
        "id",
        F.expr(quant_expr("_v", "spark")).alias("qv"),
        F.expr(lsh_bucket_expr("_v", n_planes, "spark", dim)).alias("_bkt"),
    )
    return _blocked_pair_scores(q, _auto_blocks(df, vec_col, dim), threshold)


def lsh_candidate_pairs_oracle(
    id_col: str,
    vec_col: str,
    table: str,
    threshold: float = 0.45,
    n_planes: int = 4,
    dim: int | None = None,
) -> str:
    dot = _dot("a._q", "b._q", "duckdb", dim)
    cos = (
        f"({dot})::DOUBLE / (sqrt(({_dot('a._q', 'a._q', 'duckdb', dim)})::DOUBLE)"
        f" * sqrt(({_dot('b._q', 'b._q', 'duckdb', dim)})::DOUBLE))"
    )
    return f"""
        WITH qv AS (SELECT {id_col} AS _id,
                           {quant_expr(vec_col, 'duckdb')} AS _q,
                           {lsh_bucket_expr(vec_col, n_planes, 'duckdb', dim)} AS _bkt
                    FROM {table})
        SELECT a._id AS id_a, b._id AS id_b, round({cos}, 6) AS cos
        FROM qv a JOIN qv b ON a._bkt = b._bkt AND a._id < b._id
        WHERE ({cos}) >= {threshold}
    """


def ann_brute_force(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    dim: int | None = None,
    query_vecs: dict[int, list[float]] | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector (queries drawn from the corpus
    by id, or EXTERNAL vectors via ``query_vecs`` — see _query_frame).
    Query side is broadcast; ranking is a per-query window top-k with
    deterministic tie-break."""
    dim = dim or _infer_dim(df, vec_col)
    q = _query_frame(df, id_col, vec_col, query_ids, query_vecs).select(
        "query_id",
        "_qv",
        F.expr(norm_expr("_qv", "spark", dim)).alias("_qn"),
    )
    # corpus side: fan_out BEFORE the norm/dot projections — single-row-group
    # local files scan as one split, serializing the vector kernels onto one
    # core (no-op on properly split inputs); queries keep their pushable
    # isin filter on the raw scan
    c = fan_out(
        df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    ).withColumn("_cn", F.expr(norm_expr("_cv", "spark", dim)))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"({_dot('_qv', '_cv', 'spark', dim)}) / (_qn * _cn)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


def _check_query_vecs(query_vecs: dict | None) -> None:
    """Validate caller-supplied external query vectors at the entry point:
    an empty dict would emit an invalid empty VALUES list in the oracle
    SQL, and a NaN/inf component yields literal `nan`/`inf` tokens DuckDB
    cannot parse (and the two engines would diverge on NaN ordering even
    if it did) — fail fast with a clear error instead."""
    import math as _math

    if query_vecs is None:
        return
    if not query_vecs:
        raise ValueError("query_vecs must be a non-empty dict of id -> vector")
    for k, v in query_vecs.items():
        if not v:
            raise ValueError(f"query_vecs[{k!r}] is empty")
        for x in v:
            if not _math.isfinite(float(x)):
                raise ValueError(
                    f"query_vecs[{k!r}] contains a non-finite component "
                    f"({x!r}); all components must be finite floats"
                )


def _qsrc_sql(
    id_col: str,
    vec_col: str,
    table: str,
    query_ids: list[int],
    query_vecs: dict[int, list[float]] | None = None,
) -> str:
    """SQL for the query side: corpus rows by id, or a VALUES list of
    EXTERNAL vectors (full-precision repr literals parse to the identical
    float64 in both engines)."""
    _check_query_vecs(query_vecs)
    if query_vecs is None:
        ids = ", ".join(str(i) for i in query_ids)
        return (
            f"SELECT {id_col} AS query_id, {vec_col} AS _qv FROM {table} "
            f"WHERE {id_col} IN ({ids})"
        )
    rows = ", ".join(
        f"({int(k)}, [{', '.join(repr(float(x)) for x in v)}]::DOUBLE[])"
        for k, v in sorted(query_vecs.items())
    )
    return f"SELECT * FROM (VALUES {rows}) AS _q(query_id, _qv)"


def ann_brute_force_oracle(
    id_col: str, vec_col: str, table: str, query_ids: list[int], k: int = 10,
    dim: int | None = None,
    query_vecs: dict[int, list[float]] | None = None,
) -> str:
    cos = cosine_expr("q._qv", "c._cv", "duckdb", dim)
    return f"""
        WITH q AS ({_qsrc_sql(id_col, vec_col, table, query_ids, query_vecs)}),
        c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cv FROM {table}),
        scored AS (
          SELECT q.query_id, c.neighbor_id, {cos} AS cos
          FROM q JOIN c ON q.query_id <> c.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id)::INT AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
        FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def ann_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int = 2,
    dim: int | None = None,
    cent_vecs: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: the corpus is partitioned into inverted lists by
    nearest centroid; queries probe only the `n_probe` nearest lists.
    Centroids are deterministic (the vectors with id < n_centroids — a
    fixed 'training sample' — or TRAINED literals via ``cent_vecs``, the
    driver-side Lloyd's output), so assignment and results are
    oracle-checkable. Scale path: centroids are tiny and broadcast both
    times; the corpus is scanned once to assign cells (narrow after the
    broadcast join) and candidate generation touches only probed cells —
    at 100 TB the assigned corpus is written partitioned by cell so probes
    prune to n_probe/n_centroids of the data."""
    dim = dim or _infer_dim(df, vec_col)
    cent = _ivf_centroids(df, id_col, vec_col, n_centroids, dim, cent_vecs)
    assigned = _ivf_assign(df, id_col, vec_col, n_centroids, dim, cent=cent)
    qcells = _ivf_query_cells(
        df, id_col, vec_col, query_ids, n_centroids, n_probe, dim, cent=cent
    )
    return _ivf_score(qcells, assigned, k, dim)



# --- narrow (shuffle-free) quantizer kernels -------------------------------
# When the quantizer is SMALL (every store geometry this engine serves:
# n_centroids * dim and n_codes * dim bounded), cell assignment and PQ
# encoding need no crossJoin/aggregate/self-join at all: the centroids /
# codewords enter the plan as full-precision double literals and the
# argmax/argmin is ONE narrow projection (array_max/array_min over per-
# candidate score structs) — the corpus is scanned once, nothing is
# shuffled, and the embed chain feeding a store build is planned exactly
# once instead of twice (the agg branch + the re-attach join branch of the
# previous plan). Bit-equality: the literals are collect()ed from the SAME
# centroid/codebook frames the broadcast path used (Spark computed _cen /
# _cn2 itself; repr() round-trips every float64 exactly and the 'd'-suffix
# literal parses back to the identical bits), the dot terms keep _dot's
# exact shape and order, and array_max/array_min use the same struct
# ordering as the max/min aggregates they replace (ccos then -cid; _d then
# code). Geometries past the cap fall back to the broadcast crossJoin +
# argmax-aggregate plan, which handles any quantizer size.
_NARROW_QUANTIZER_MAX_TERMS = 1024


def _dlit(x: float) -> str:
    """repr(float) as an exact Spark SQL double literal ('d' suffix for
    fixed-point forms; exponent forms already lex as double)."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r) else r + "d"


def _cent_literal_rows(cent, n_centroids: int, dim: int):
    """The centroid frame collected driver-side for the narrow kernel, or
    None when the geometry is past the unroll cap. The collect is bounded
    at n_centroids rows — the same rows the broadcast build shipped.

    Also returns None (round-13 ADVICE) when the collected rows cannot be
    rendered as valid SQL literals: an EMPTY centroid set would emit
    ``array_max(array())`` (analysis error) and a non-finite component
    would render via ``repr`` as 'nand'/'infd' (parse error) — the
    aggregate fallback kernel handles both shapes, so fall back instead
    of raising at plan time."""
    import math

    if n_centroids * dim > _NARROW_QUANTIZER_MAX_TERMS:
        return None
    rows = cent.select("cid", "_ce", "_cen").collect()
    if not rows:
        return None
    cid_type = dict(
        (f.name, f.dataType.simpleString()) for f in cent.schema.fields
    )["cid"]
    out = [(int(r["cid"]), [float(x) for x in r["_ce"]], float(r["_cen"])) for r in rows]
    if any(
        not math.isfinite(cn) or any(not math.isfinite(x) for x in ce)
        for _, ce, cn in out
    ):
        return None
    out.sort(key=lambda t: t[0])
    return out, cid_type


def _assign_cid_sql(rows, cid_type: str, dim: int, vec: str = "_cv", vecn: str = "_cvn") -> str:
    """SQL for the narrow argmax cell assignment: per centroid the SAME
    ccos expression the crossJoin path computed (unrolled _dot / (vecn *
    cen)), best-of via array_max over struct(ccos, -cid) — the identical
    ordering (and NaN semantics) of max(struct(ccos, -cid))."""
    suf = "L" if cid_type == "bigint" else ""
    structs = []
    for cid, ce, cen in rows:
        dot = " + ".join(
            f"cast({vec}[{i}] as double) * {_dlit(ce[i])}" for i in range(dim)
        )
        structs.append(
            f"struct((({dot})) / ({vecn} * {_dlit(cen)}) as ccos, {-cid}{suf} as _nc)"
        )
    return f"(-(array_max(array({', '.join(structs)}))._nc))"


def _ivf_centroids(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int, dim: int,
    cent_vecs: list[list[float]] | None = None,
):
    """(cid, _ce, _cen): the coarse quantizer. Default = the deterministic
    id-prefix sample (vectors with id < n_centroids). ``cent_vecs``
    substitutes TRAINED centroids (functions/kmeans.lloyd_kmeans output —
    driver-side deterministic Lloyd's): they enter as full-precision
    float64 literals, the norm is computed by the same unrolled expression
    in both engines, so the oracle twin stays bit-equal."""
    if cent_vecs is not None:
        if len(cent_vecs) != n_centroids:
            raise ValueError(
                f"cent_vecs has {len(cent_vecs)} centroids but n_centroids="
                f"{n_centroids} — the geometry params must agree (probe "
                "counts and the oracle twin key off n_centroids)"
            )
        bad = [(i, len(v)) for i, v in enumerate(cent_vecs) if len(v) != dim]
        if bad:
            # fail fast at the entry point (the _check_query_vecs style):
            # a wrong-length centroid otherwise flows into the unrolled
            # element_at dot/norm expressions and surfaces as nulls or a
            # runtime error deep in the plan
            raise ValueError(
                f"cent_vecs dimension mismatch: expected dim={dim}, got "
                f"len(cent_vecs[{bad[0][0]}])={bad[0][1]}"
                + (f" (+{len(bad) - 1} more)" if len(bad) > 1 else "")
            )
        lit = df.sparkSession.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(cent_vecs)],
            schema="cid int, _ce array<double>",
        )
        return lit.select(
            "cid", "_ce", F.expr(norm_expr("_ce", "spark", dim)).alias("_cen")
        )
    return df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("_ce"),
        F.expr(norm_expr(vec_col, "spark", dim)).alias("_cen"),
    )


def _ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int, dim: int,
    cent: DataFrame | None = None, allow_narrow: bool = True,
) -> DataFrame:
    """(cid, neighbor_id, _cv, _cvn): each corpus row assigned to its
    nearest centroid's inverted list. Cell assignment is an argmax
    AGGREGATION (max_by over (ccos, -cid) = best cosine, lowest cid on
    ties), not a row_number window: partial aggregation combines map-side,
    so the n_centroids-fold expansion collapses per partition before the
    shuffle — one narrow agg at any centroid count, vs the window's full
    sort-shuffle of the expansion. ``cent`` overrides the centroid frame
    (ivf_append assigns against a store's FROZEN centroids)."""
    if cent is None:
        cent = _ivf_centroids(df, id_col, vec_col, n_centroids, dim)
    # fan_out BEFORE the norm projection and the centroid-fold expansion:
    # a single-row-group local file scans as ONE split, so the whole
    # n_centroids x dim dot workload would run on one core (no-op on
    # properly split inputs); the centroid subquery keeps its pushable
    # id < n_centroids filter on the raw scan
    corpus = fan_out(
        df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    ).withColumn("_cvn", F.expr(norm_expr("_cv", "spark", dim)))
    # the argmax aggregates SCALARS ONLY: any variable-size payload (the
    # vector) in a max/max_by buffer demotes the agg to SortAggregate and
    # sorts the whole n_centroids-fold expansion WITH its arrays (measured
    # 6.5 s at 64 centroids x 50 K rows vs ~0.5 s scalar); ccos is computed
    # in the same narrow stage and the arrays are projected away before the
    # shuffle, then the winner's vector re-attaches by one corpus-size join
    lit_rows = (
        _cent_literal_rows(cent, n_centroids, dim) if allow_narrow else None
    )
    if lit_rows is not None:
        rows, cid_type = lit_rows
        return corpus.select(
            F.expr(_assign_cid_sql(rows, cid_type, dim)).alias("cid"),
            "neighbor_id", "_cv", "_cvn",
        )
    scored = (
        corpus.crossJoin(F.broadcast(cent))
        .withColumn("ccos", F.expr(f"({_dot('_cv', '_ce', 'spark', dim)}) / (_cvn * _cen)"))
        .select("neighbor_id", "cid", "ccos")
    )
    best = (
        scored.groupBy("neighbor_id")
        .agg(F.max(F.struct(F.col("ccos"), (-F.col("cid")).alias("_nc"))).alias("_b"))
        .select("neighbor_id", (-F.col("_b._nc")).alias("cid"))
    )
    return best.join(corpus, "neighbor_id").select(
        "cid", "neighbor_id", "_cv", "_cvn"
    )


def _query_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    query_vecs: dict[int, list[float]] | None = None,
) -> DataFrame:
    """(query_id, _qv): the query side — corpus rows selected by id, or
    EXTERNAL literal vectors (``query_vecs``: id -> vector, ids chosen by
    the caller and never matched against the corpus). External queries are
    the production shape — a user queries an ANN store with a fresh
    embedding, not a corpus row id."""
    _check_query_vecs(query_vecs)
    if query_vecs is None:
        return df.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    rows = [
        (int(k), [float(x) for x in v]) for k, v in sorted(query_vecs.items())
    ]
    return df.sparkSession.createDataFrame(
        rows, schema="query_id bigint, _qv array<double>"
    )


def _ivf_query_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    n_centroids: int,
    n_probe: int,
    dim: int,
    query_vecs: dict[int, list[float]] | None = None,
    cent: DataFrame | None = None,
) -> DataFrame:
    """(cid, query_id, _qv, _qn): the n_probe nearest cells per query.
    ``cent`` overrides the centroid frame (trained literals or a store's
    frozen sidecar)."""
    if cent is None:
        cent = _ivf_centroids(df, id_col, vec_col, n_centroids, dim)
    q = _query_frame(df, id_col, vec_col, query_ids, query_vecs).select(
        "query_id",
        "_qv",
        F.expr(norm_expr("_qv", "spark", dim)).alias("_qn"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    return (
        q.crossJoin(F.broadcast(cent))
        .withColumn("ccos", F.expr(f"({_dot('_qv', '_ce', 'spark', dim)}) / (_qn * _cen)"))
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("cid", "query_id", "_qv", "_qn")
    )


def _ivf_score(qcells: DataFrame, assigned: DataFrame, k: int, dim: int) -> DataFrame:
    scored = (
        F.broadcast(qcells)
        .join(assigned, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"({_dot('_qv', '_cv', 'spark', dim)}) / (_qn * _cvn)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


def ivf_build_store(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_centroids: int = 4,
    dim: int | None = None,
    cent_vecs: list[list[float]] | None = None,
) -> None:
    """Materialize the IVF index as a cell-PARTITIONED parquet store — the
    100 TB layout: each inverted list is its own partition directory, so a
    probe reads n_probe/n_centroids of the data at the FILE level
    (PartitionFilters prune before any IO; asserted by plan test).
    ``cent_vecs`` builds the store around TRAINED centroids (driver-side
    Lloyd's literals) instead of the id-prefix sample.

    The build ALWAYS freezes the effective centroids into the store's
    sidecar (ann_maintenance.write_centroid_sidecar) — trained or
    id-prefix alike — so every store is self-contained: probes and
    appends never depend on the training rows surviving in the source
    corpus, and a store built with trained centroids can never be
    silently probed against the id-prefix sample (the round-9 advice
    hazard: cent_vecs accepted at build, ignored at probe)."""
    dim = dim or _infer_dim(df, vec_col)
    cent = _ivf_centroids(df, id_col, vec_col, n_centroids, dim, cent_vecs)
    # cluster by cell before the partitioned write: each inverted list lands
    # in one task's output (<= 1 file per cell), instead of every assign
    # partition fragmenting every cell directory
    _ivf_assign(
        df, id_col, vec_col, n_centroids, dim, cent=cent
    ).repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(path)
    from .ann_maintenance import write_centroid_sidecar

    write_centroid_sidecar(cent, path)


def ivf_append(
    spark: SparkSession,
    store_path: str,
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 4,
    dim: int | None = None,
    cent: DataFrame | None = None,
) -> None:
    """Incremental IVF maintenance — the growing-corpus path: assign ONLY
    the new vectors against the store's FROZEN centroids and append them to
    their cell partition directories. No rebuild, no touch of existing
    inverted lists; the delivery's cost is one broadcast-assign over the
    new rows plus an append write. Result is row-identical to a one-shot
    build over the union (same centroids -> same cells; probes prune the
    same partitions). ``cent`` supplies the frozen centroids explicitly
    (the centroid SIDECAR a maintained store carries — see
    ann_maintenance.write_centroid_sidecar: recovery from in-store member
    rows breaks once a takedown of a training row is compacted away);
    None falls back to the legacy recovery — the centroid vectors are
    corpus members with id < n_centroids, each stored in its own cell at
    build time."""
    if cent is None:
        store = spark.read.parquet(store_path)
        cent = store.filter(F.col("neighbor_id") < n_centroids).select(
            F.col("neighbor_id").cast("int").alias("cid"),
            F.col("_cv").alias("_ce"),
            F.col("_cvn").alias("_cen"),
        )
    dim = dim or _infer_dim(new_df, vec_col)
    from .ann_maintenance import _commit_append_diff, _snapshot_for_append

    before = _snapshot_for_append(store_path)
    _ivf_assign(new_df, id_col, vec_col, n_centroids, dim, cent=cent).write.mode(
        "append"
    ).partitionBy("cid").parquet(store_path)
    # manifest-tracked stores register the appended files (no-op legacy)
    _commit_append_diff(store_path, before)


def ann_ivf_store(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    store_path: str,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int | str = 2,
    dim: int | None = None,
    cent_vecs: list[list[float]] | None = None,
    query_vecs: dict[int, list[float]] | None = None,
) -> DataFrame:
    """ANN over a materialized IVF store: query cells are resolved first
    (tiny: n_queries x n_probe cell ids, collected driver-side), then the
    store scan carries a STATIC cid IN (...) predicate — Spark prunes the
    non-probed cell partitions before reading a byte. Results are
    bit-identical to ann_ivf on the same corpus/params (same float ops on
    the same values; parquet round-trips doubles exactly).

    ``n_probe="auto"`` (round-12 verdict #4) reads the store's TUNED
    serving width from the sidecar ann_maintenance.ann_tune_n_probe
    froze next to the ledger — the data-dependent knob (cell skew)
    derived from a measured recall@k target instead of a guess. Raises
    on an untuned store rather than silently guessing.

    Centroid precedence (matching ann_ivfpq_store): explicit ``cent_vecs``
    literals > the store's frozen sidecar (every ivf_build_store /
    ann_store_seed writes one) > the source-derived id-prefix sample —
    so a store built with trained centroids is probed against the SAME
    quantizer automatically; probing the wrong (id-prefix) cells returned
    wrong/missing neighbors with no error. ``query_vecs`` queries with
    EXTERNAL vectors (the serving shape), same contract as
    ann_ivfpq_store."""
    spark = df.sparkSession
    dim = dim or _infer_dim(df, vec_col)
    from .ann_maintenance import read_centroid_sidecar, read_serving_sidecar

    if n_probe == "auto":
        serving = read_serving_sidecar(store_path)
        if serving is None:
            raise ValueError(
                f"{store_path}: n_probe='auto' but the store has no "
                "serving sidecar — run ann_maintenance.ann_tune_n_probe "
                "after build/seed (or pass an explicit n_probe)"
            )
        n_probe = int(serving["n_probe"])
    cent = (
        _ivf_centroids(df, id_col, vec_col, n_centroids, dim, cent_vecs)
        if cent_vecs is not None
        else read_centroid_sidecar(spark, store_path)
    )
    qcells = _ivf_query_cells(
        df, id_col, vec_col, query_ids, n_centroids, n_probe, dim,
        query_vecs=query_vecs, cent=cent,
    )
    probe_cells = sorted({r["cid"] for r in qcells.select("cid").collect()})
    # delete-aware scan: anti-join the store's pending-deletion list
    # (pruned to the probed cells, broadcast) so takedowns stop surfacing
    # immediately — see ann_maintenance for the lifecycle
    from .ann_maintenance import live_codes

    assigned = live_codes(spark, store_path, cells=probe_cells)
    return _ivf_score(qcells, assigned, k, dim)


def _cent_sql(
    id_col: str,
    vec_col: str,
    table: str,
    n_centroids: int,
    cent_vecs: list[list[float]] | None = None,
) -> str:
    """SQL for the coarse quantizer: the id-prefix sample, or TRAINED
    centroids as full-precision VALUES literals (the repr of the same
    float64s the Spark side feeds createDataFrame — bit-equal by
    construction)."""
    if cent_vecs is None:
        return (
            f"SELECT {id_col} AS cid, {vec_col} AS _ce FROM {table} "
            f"WHERE {id_col} < {n_centroids}"
        )
    if not cent_vecs:
        raise ValueError("cent_vecs must be non-empty (empty VALUES is invalid SQL)")
    rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in v)}]::DOUBLE[])"
        for i, v in enumerate(cent_vecs)
    )
    return f"SELECT * FROM (VALUES {rows}) AS _c(cid, _ce)"


def ann_ivf_oracle(
    id_col: str,
    vec_col: str,
    table: str,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int = 2,
    dim: int | None = None,
    cent_vecs: list[list[float]] | None = None,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    acos = cosine_expr("c._cv", "ct._ce", "duckdb", dim)
    qccos = cosine_expr("q._qv", "ct._ce", "duckdb", dim)
    cos = cosine_expr("qc._qv", "a._cv", "duckdb", dim)
    return f"""
        WITH cent AS ({_cent_sql(id_col, vec_col, table, n_centroids, cent_vecs)}),
        corpus AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cv FROM {table}),
        ascore AS (
          SELECT c.neighbor_id, c._cv, ct.cid, {acos} AS ccos
          FROM corpus c CROSS JOIN cent ct),
        assigned AS (
          SELECT cid, neighbor_id, _cv FROM (
            SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                         ORDER BY ccos DESC, cid) AS _r
            FROM ascore) WHERE _r = 1),
        q AS (SELECT {id_col} AS query_id, {vec_col} AS _qv FROM {table}
              WHERE {id_col} IN ({ids})),
        qscore AS (
          SELECT q.query_id, q._qv, ct.cid, {qccos} AS ccos
          FROM q CROSS JOIN cent ct),
        qcells AS (
          SELECT cid, query_id, _qv FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY ccos DESC, cid) AS _r
            FROM qscore) WHERE _r <= {n_probe}),
        scored AS (
          SELECT qc.query_id, a.neighbor_id, {cos} AS cos
          FROM qcells qc JOIN assigned a ON qc.cid = a.cid
          WHERE qc.query_id <> a.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id)::INT AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
        FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def ann_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 4,
    multi_probe: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: both sides keyed by sign-projection bucket; each
    query scans only its bucket (recall < 1 by design — the scale path).
    Bucketing and scores are deterministic, so this is oracle-checkable.

    ``multi_probe``: each query also probes the n_planes buckets at Hamming
    distance 1 (flip one sign bit) — the classic multi-probe LSH recall
    boost that costs query-side fan-out only (the corpus is hashed once;
    no extra corpus passes)."""
    dim = dim or _infer_dim(df, vec_col)
    bucket = F.expr(lsh_bucket_expr(vec_col, n_planes, "spark", dim))
    q = (
        df.filter(F.col(id_col).isin(query_ids))
        .withColumn("_bkt", bucket)
        .withColumn("_n", F.expr(norm_expr(vec_col, "spark", dim)))
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
            F.col("_n").alias("_qn"), "_bkt",
        )
    )
    if multi_probe:
        probes = F.array(
            F.col("_bkt"), *[F.expr(f"_bkt ^ {1 << j}") for j in range(n_planes)]
        )
        q = q.select("query_id", "_qv", "_qn", F.explode(probes).alias("_bkt"))
    # corpus hashed once, but AFTER a fan_out: bucket bits + norm are
    # n_planes x dim unrolled terms per row — single-split local inputs
    # would compute them all on one core (no-op on split inputs)
    c = (
        fan_out(df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")))
        .withColumn("_bkt", F.expr(lsh_bucket_expr("_cv", n_planes, "spark", dim)))
        .withColumn("_cn", F.expr(norm_expr("_cv", "spark", dim)))
        .select("neighbor_id", "_cv", "_cn", "_bkt")
    )
    scored = (
        F.broadcast(q)
        .join(c, "_bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"({_dot('_qv', '_cv', 'spark', dim)}) / (_qn * _cn)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


def ann_lsh_oracle(
    id_col: str,
    vec_col: str,
    table: str,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 4,
    multi_probe: bool = False,
    dim: int | None = None,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    bkt = lsh_bucket_expr(vec_col, n_planes, "duckdb", dim)
    cos = cosine_expr("q._qv", "c._cv", "duckdb", dim)
    if multi_probe:
        # DuckDB: xor() function (the ^ operator is exponentiation there)
        flips = ", ".join(f"xor(_bkt, {1 << j})" for j in range(n_planes))
        q_cte = f"""q AS (
            SELECT query_id, _qv, unnest([_bkt, {flips}]) AS _bkt
            FROM (SELECT _id AS query_id, _v AS _qv, _bkt FROM wb
                  WHERE _id IN ({ids})))"""
    else:
        q_cte = f"q AS (SELECT _id AS query_id, _v AS _qv, _bkt FROM wb WHERE _id IN ({ids}))"
    return f"""
        WITH wb AS (SELECT {id_col} AS _id, {vec_col} AS _v, {bkt} AS _bkt FROM {table}),
        {q_cte},
        c AS (SELECT _id AS neighbor_id, _v AS _cv, _bkt FROM wb),
        scored AS (
          SELECT q.query_id, c.neighbor_id, {cos} AS cos
          FROM q JOIN c ON q._bkt = c._bkt AND q.query_id <> c.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id)::INT AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
        FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


# --------------------------------------------------------------------------
# Product quantization (PQ) ADC — the compressed-scan half of IVF-PQ


def _pq_subspaces(df, id_col, vec_col, m_subspaces, sub_dim, out_id,
                  carry_cols=()):
    """(out_id, [carry...], m, sub): one row per (vector, subspace), sub =
    the subspace's slice of the vector. The m literals live inside an
    exploded struct array (the band_structs pattern), so every slice is a
    STATIC offset — whole-stage-codegen, no runtime-offset slicing."""
    carry = list(carry_cols)
    structs = [
        F.struct(
            F.lit(j).alias("m"),
            F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim).alias("sub"),
        )
        for j in range(m_subspaces)
    ]
    return df.select(
        F.col(id_col).alias(out_id), *carry,
        F.explode(F.array(*structs)).alias("s"),
    ).select(out_id, *carry, "s.m", "s.sub")


def ann_pq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    m_subspaces: int = 4,
    n_codes: int = 16,
    dim: int | None = None,
    rerank: int | None = None,
    codebook_vecs: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ/ADC approximate top-k (Jégou et al., 'Product Quantization for
    Nearest Neighbor Search', TPAMI'11 — the compressed-scan half of
    IVF-PQ, the standard billion-scale ANN layout): each corpus vector is
    ENCODED as m_subspaces one-byte codes (nearest codeword per subspace),
    and queries rank candidates by the asymmetric distance computation —
    exact query subvector against the RECONSTRUCTED corpus vector, read
    from a per-query distance table instead of the float corpus.

    Why this is the 100 TB shape: after one encoding pass, scans read
    m_subspaces small ints per vector instead of dim floats (64x smaller
    at dim=64/m=4 — the corpus' float embeddings never travel again), and
    per-candidate scoring is m_subspaces table lookups + adds instead of
    a dim-wide dot product. The codes table is the thing you store,
    partition (by IVF cell, composing with ivf_build_store) and scan.

    Determinism-by-construction, like the IVF family: codebooks are the
    subvectors of the vectors with id < n_codes (a fixed 'training
    sample' — k-means would converge data-dependently and be
    un-attestable), code assignment breaks distance ties by smallest
    code, all float sums are unrolled fixed-order doubles, so the DuckDB
    oracle reproduces codes, ADC scores, and ranking bit-for-bit.

    Output (query_id, rank, neighbor_id, cos): cos is the ADC
    APPROXIMATION of cosine — query norm exact, candidate norm and dot
    from the reconstruction. Candidates whose every subspace quantizes
    identically tie exactly; ranking tie-breaks by neighbor_id.

    ``rerank=C`` adds the production IVF-PQ second stage: the ADC pass
    SHORTLISTS C candidates per query from the codes scan, and only
    those Q*C rows touch the float corpus for an exact-cosine re-rank
    (output cos is then exact). Final recall@k equals the ADC pass's
    recall@C — C is a constant knob, so the float reads stay O(Q*C)
    while the corpus grows."""
    dim = dim or _infer_dim(df, vec_col)
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub_dim = dim // m_subspaces
    cb = _pq_codebook(
        df, id_col, vec_col, m_subspaces, sub_dim, n_codes, codebook_vecs
    )
    codes = _pq_encode(df, id_col, vec_col, m_subspaces, sub_dim, cb)
    ranked = _pq_adc_rank(
        codes, df, id_col, vec_col, query_ids, m_subspaces, sub_dim, dim, cb
    )
    if rerank is None:
        return (
            ranked.filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
            .orderBy("query_id", "rank")
        )
    return _pq_rerank(ranked, df, id_col, vec_col, query_ids, k, rerank, dim)


def _pq_codebook(df, id_col, vec_col, m_subspaces, sub_dim, n_codes,
                 codebook_vecs=None):
    """(code, m, csub, _cn2): the deterministic sample codebooks — the
    subvectors of the vectors with id < n_codes (see ann_pq's determinism
    note), plus each codeword's squared norm. ``codebook_vecs``
    ([m][n_codes][sub_dim], functions/kmeans.train_pq_codebooks output)
    substitutes TRAINED codewords as float64 literals; _cn2 is computed
    by the same unrolled expression either way so the oracle twin stays
    bit-equal."""
    if codebook_vecs is not None:
        if len(codebook_vecs) != m_subspaces or any(
            len(words) != n_codes for words in codebook_vecs
        ):
            raise ValueError(
                f"codebook_vecs must be [m_subspaces={m_subspaces}]"
                f"[n_codes={n_codes}][sub_dim] — got "
                f"[{len(codebook_vecs)}][{[len(w) for w in codebook_vecs]}]"
            )
        bad = [
            (m, c, len(cw))
            for m, words in enumerate(codebook_vecs)
            for c, cw in enumerate(words)
            if len(cw) != sub_dim
        ]
        if bad:
            # same fail-fast contract as _ivf_centroids' dim check
            m0, c0, got = bad[0]
            raise ValueError(
                f"codebook_vecs sub_dim mismatch: expected {sub_dim}, got "
                f"len(codebook_vecs[{m0}][{c0}])={got}"
                + (f" (+{len(bad) - 1} more)" if len(bad) > 1 else "")
            )
        rows = [
            (c, m, [float(x) for x in cw])
            for m, words in enumerate(codebook_vecs)
            for c, cw in enumerate(words)
        ]
        lit = df.sparkSession.createDataFrame(
            rows, schema="code int, m int, csub array<double>"
        )
        return lit.select(
            "code", "m", "csub",
            F.expr(_dot("csub", "csub", "spark", sub_dim)).alias("_cn2"),
        )
    return _pq_subspaces(
        df.filter(F.col(id_col) < n_codes), id_col, vec_col, m_subspaces, sub_dim, "code"
    ).select(
        "code",
        "m",
        F.col("sub").alias("csub"),
        F.expr(_dot("sub", "sub", "spark", sub_dim)).alias("_cn2"),
    )


def _pq_encode(df, id_col, vec_col, m_subspaces, sub_dim, cb, carry_cols=()):
    """(neighbor_id, [carry...], code0..codeM-1): per (vector, subspace)
    the argmin-distance codeword. The ||x_sub||^2 term is constant within
    the argmin, so the compared quantity is ||c||^2 - 2<x,c>; min over
    struct(_d, code) collapses map-side (partial agg) and tie-breaks by
    smallest code. ``carry_cols`` threads extra columns of ``df`` (e.g. a
    precomputed cell id) through the aggregation as grouping keys, so
    store builds need no codes-to-cells re-join afterwards. (A fully
    unrolled literal-codebook projection was A/B'd here and LOST 2x: the
    n_codes * dim expression tree is past the codegen comfort zone and
    the interpreted fallback re-evaluates subexpressions — notably a
    residual vec_col — per subscript; the explode + broadcast join +
    scalar argmin-agg below stays codegen'd at any codebook size.)"""
    carry = list(carry_cols)
    corpus_sub = _pq_subspaces(
        fan_out(df), id_col, vec_col, m_subspaces, sub_dim, "neighbor_id",
        carry_cols=carry,
    )
    return (
        corpus_sub.join(F.broadcast(cb), "m")
        .withColumn(
            "_d",
            F.col("_cn2") - 2 * F.expr(_dot("sub", "csub", "spark", sub_dim)),
        )
        .groupBy("neighbor_id", *carry)
        .agg(
            *[
                F.min(F.when(F.col("m") == j, F.struct("_d", "code"))).alias(f"_a{j}")
                for j in range(m_subspaces)
            ]
        )
        .select(
            "neighbor_id",
            *carry,
            *[F.col(f"_a{j}.code").alias(f"code{j}") for j in range(m_subspaces)],
        )
    )


def _pq_adc_rank(
    codes, df, id_col, vec_col, query_ids, m_subspaces, sub_dim, dim, cb,
    query_vecs=None,
):
    """ADC-score a codes frame against the queries' distance tables and
    rank per query. ``codes`` is (neighbor_id, code0..) or, when the IVF
    store already joined probe cells, (query_id, neighbor_id, code0..) —
    with query_id present every distance-table join is a per-query
    equi-join; without it the first join fans the codes scan out per
    query. Returns the full ranked frame (query_id, neighbor_id, cos,
    rank) for the caller to cut at k or at the rerank shortlist depth."""
    # per-query distance table: <q_sub, codeword> for every (m, code) —
    # m_subspaces * n_codes rows per query, broadcast to the codes scan
    q = _query_frame(df, id_col, vec_col, query_ids, query_vecs)
    qsub = _pq_subspaces(q, "query_id", "_qv", m_subspaces, sub_dim, "query_id")
    # localCheckpoint: the m per-subspace broadcast builds would each
    # re-run the qsub+codebook chain as its own job (see
    # _ivfpq_residual_rank); the table is Q * m * n_codes rows
    dt = qsub.join(F.broadcast(cb), "m").select(
        "query_id",
        "m",
        "code",
        F.expr(_dot("sub", "csub", "spark", sub_dim)).alias("_pdot"),
        "_cn2",
    ).localCheckpoint()
    qn = q.select(
        "query_id",
        F.expr(norm_expr("_qv", "spark", dim)).alias("_qn"),
    )

    per_query = "query_id" in codes.columns
    scored = codes
    for j in range(m_subspaces):
        dtj = dt.filter(F.col("m") == j).select(
            "query_id",
            F.col("code").alias(f"code{j}"),
            F.col("_pdot").alias(f"_p{j}"),
            F.col("_cn2").alias(f"_c{j}"),
        )
        on = ["query_id", f"code{j}"] if per_query or j > 0 else [f"code{j}"]
        scored = scored.join(F.broadcast(dtj), on)

    # fixed-order (left-assoc) sums keep engine and oracle bit-equal
    adot = " + ".join(f"_p{j}" for j in range(m_subspaces))
    rn2 = " + ".join(f"_c{j}" for j in range(m_subspaces))
    scored = (
        scored.join(F.broadcast(qn), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(f"({adot}) / (_qn * sqrt({rn2}))"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w))


def _pq_rerank(ranked, df, id_col, vec_col, query_ids, k, rerank, dim,
               query_vecs=None):
    """The production IVF-PQ second stage: cut the ADC ranking at depth
    ``rerank``, then exact-cosine re-rank ONLY that shortlist against the
    float corpus — the single stage that reads float vectors, and it reads
    Q*rerank of them."""
    shortlist = ranked.filter(F.col("rank") <= rerank).select("query_id", "neighbor_id")
    qv = _query_frame(df, id_col, vec_col, query_ids, query_vecs).select(
        "query_id",
        "_qv",
        F.expr(norm_expr("_qv", "spark", dim)).alias("_qn"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.expr(norm_expr(vec_col, "spark", dim)).alias("_cvn"),
    )
    rr = (
        F.broadcast(shortlist)
        .join(c, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos", F.expr(f"({_dot('_qv', '_cv', 'spark', dim)}) / (_qn * _cvn)"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


def ann_pq_oracle(
    id_col: str,
    vec_col: str,
    table: str,
    query_ids: list[int],
    k: int = 10,
    m_subspaces: int = 4,
    n_codes: int = 16,
    dim: int | None = None,
    rerank: int | None = None,
    codebook_vecs: list[list[list[float]]] | None = None,
) -> str:
    """DuckDB twin of ann_pq: same sample codebooks (or the same TRAINED
    codeword literals), same argmin (row_number tie-broken by code), same
    fixed-order ADC sums, same optional exact-cosine re-rank of the ADC
    shortlist."""
    if dim is None or dim % m_subspaces:
        raise ValueError("oracle needs an explicit dim divisible by m_subspaces")
    sub_dim = dim // m_subspaces
    ids = ", ".join(str(i) for i in query_ids)

    def sub_arms(src_filter: str, out_id: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {id_col} AS {out_id}, {j} AS m, "
            f"list_slice({vec_col}, {j * sub_dim + 1}, {(j + 1) * sub_dim}) AS sub "
            f"FROM {table}{src_filter}"
            for j in range(m_subspaces)
        )
    code_cols = ", ".join(
        f"max(CASE WHEN m = {j} AND _rn = 1 THEN code END) AS code{j}"
        for j in range(m_subspaces)
    )
    dt_joins = "\n          ".join(
        (
            f"JOIN dt d{j} ON d{j}.m = {j} AND d{j}.code = c.code{j}"
            if j == 0
            else f"JOIN dt d{j} ON d{j}.m = {j} AND d{j}.code = c.code{j} "
            f"AND d{j}.query_id = d0.query_id"
        )
        for j in range(m_subspaces)
    )
    adot = " + ".join(f"d{j}._pdot" for j in range(m_subspaces))
    rn2 = " + ".join(f"d{j}._cn2" for j in range(m_subspaces))
    rr_ctes, final_src = "", "ranked"
    if rerank is not None:
        cos_rr = cosine_expr("qv._qv", "cv._cv", "duckdb", dim)
        rr_ctes = f""",
        shortlist AS (SELECT query_id, neighbor_id FROM ranked
                      WHERE rank <= {rerank}),
        qv AS (SELECT {id_col} AS query_id, {vec_col} AS _qv FROM {table}
               WHERE {id_col} IN ({ids})),
        cv AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cv FROM {table}),
        rr AS (
          SELECT s.query_id, s.neighbor_id, {cos_rr} AS cos
          FROM shortlist s
          JOIN cv ON cv.neighbor_id = s.neighbor_id
          JOIN qv ON qv.query_id = s.query_id),
        rranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id)::INT AS rank
          FROM rr)"""
        final_src = "rranked"
    if codebook_vecs is None:
        cb_src = (
            f"SELECT code, m, sub AS csub, "
            f"{_dot('sub', 'sub', 'duckdb', sub_dim)} AS _cn2 "
            f"FROM ({sub_arms(f' WHERE {id_col} < {n_codes}', 'code')})"
        )
    else:
        rows = ", ".join(
            f"({c}, {m}, [{', '.join(repr(float(x)) for x in cw)}]::DOUBLE[])"
            for m, words in enumerate(codebook_vecs)
            for c, cw in enumerate(words)
        )
        cb_src = (
            f"SELECT code, m, csub, "
            f"{_dot('csub', 'csub', 'duckdb', sub_dim)} AS _cn2 "
            f"FROM (VALUES {rows}) AS _cb(code, m, csub)"
        )
    return f"""
        WITH cb AS ({cb_src}),
        nsub AS ({sub_arms("", "neighbor_id")}),
        dists AS (
          SELECT neighbor_id, n.m, code,
                 _cn2 - 2 * {_dot("sub", "csub", "duckdb", sub_dim)} AS _d
          FROM nsub n JOIN cb ON n.m = cb.m),
        ranked_codes AS (
          SELECT neighbor_id, m, code,
                 row_number() OVER (PARTITION BY neighbor_id, m
                                    ORDER BY _d, code) AS _rn
          FROM dists),
        codes AS (
          SELECT neighbor_id, {code_cols} FROM ranked_codes GROUP BY neighbor_id),
        qsub AS ({sub_arms(f" WHERE {id_col} IN ({ids})", "query_id")}),
        dt AS (
          SELECT query_id, q.m, code,
                 {_dot("sub", "csub", "duckdb", sub_dim)} AS _pdot, _cn2
          FROM qsub q JOIN cb ON q.m = cb.m),
        qn AS (SELECT {id_col} AS query_id, {norm_expr(vec_col, "duckdb", dim)} AS _qn
               FROM {table} WHERE {id_col} IN ({ids})),
        scored AS (
          SELECT d0.query_id, c.neighbor_id,
                 ({adot}) / (_qn * sqrt({rn2})) AS cos
          FROM codes c
          {dt_joins}
          JOIN qn ON qn.query_id = d0.query_id
          WHERE d0.query_id <> c.neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id)::INT AS rank
          FROM scored){rr_ctes}
        SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
        FROM {final_src} WHERE rank <= {k} ORDER BY query_id, rank
    """


# --------------------------------------------------------------------------
# Hashed-TF document embeddings: the text -> vector bridge


def hash_embed(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """Deterministic signed feature-hashing embedding (Weinberger et al.
    ICML'09, the 'hashing trick'): each whitespace token hashes to one of
    ``dim`` buckets with a ±1 sign from the hash's next bit, and the
    document vector is the per-bucket signed token count — so the ENTIRE
    vector stack (cosine_pairs, ann_*, semdedup) runs on a plain text
    table with no model in the loop. Near-duplicate documents share
    almost all tokens, so their hashed vectors are near-parallel; sign
    hashing keeps unrelated documents near-orthogonal in expectation.

    One-pass at any scale: explode to (id, token_hash), groupBy
    (id, bucket) summing signs — a NARROW two-column agg with map-side
    combine (a dim-wide conditional-sum agg evaluates dim whens per token
    row: measured 5.7 s vs ~1 s at 5M tokens x dim 256) — then scatter
    the <=dim (bucket, sum) entries per document into the array via one
    map lookup per slot. The shuffle carries at most dim ints per
    document, never tokens. Token hashing reuses the dialect-pinned
    polynomial (functions/texthash.py), so the DuckDB twin reproduces
    vectors exactly; documents with no tokens embed as the zero vector.

    Output vectors are L2-NORMALIZED (zero vector stays zero): cosine is
    scale-invariant, and unit-scale components keep downstream quantized
    kernels inside their exact float64 fast path (raw counts can push
    dim * max|a| * max|b| past 2^53, forcing the slow exact-int route).

    Returns (id_col, vec: array<double> length dim)."""
    from iodf_spark.functions import texthash as TH

    ex = df.select(
        F.col(id_col),
        F.explode_outer(F.expr(TH.token_hashes(text_col, "spark"))).alias("_h"),
    )
    b = (
        ex.withColumn("_b", F.col("_h") % dim)
        .withColumn("_s", F.expr(f"1 - 2 * ((_h div {dim}) % 2)"))
        .groupBy(id_col, "_b")
        .agg(F.sum("_s").alias("_v"))
    )
    m = b.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("_b").isNotNull(), F.struct("_b", "_v"))
            )
        ).alias("_m")
    )
    raw = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"_i -> cast(coalesce(element_at(_m, cast(_i as bigint)), 0) as double))"
    )
    return (
        m.select(id_col, raw.alias("_raw"))
        .select(
            id_col,
            "_raw",
            F.expr(f"sqrt({_dot('_raw', '_raw', 'spark', dim)})").alias("_n"),
        )
        .select(
            id_col,
            F.expr("transform(_raw, _x -> if(_n = 0d, 0d, _x / _n))").alias("vec"),
        )
    )


def hash_embed_oracle(
    id_col: str, text_col: str, table: str, dim: int = 64
) -> str:
    """DuckDB twin of hash_embed: same token hashes, same bucket/sign
    arithmetic (hashes are non-negative, so %/integer-div agree across
    engines), same zero vector for token-less documents, same fixed-order
    L2 normalization (raw components are exact integers in both engines,
    so the normalized doubles are bit-equal)."""
    from iodf_spark.functions import texthash as TH

    sums = ", ".join(
        f"sum(CASE WHEN _h % {dim} = {i} "
        f"THEN 1 - 2 * (((_h // {dim}))::BIGINT % 2) END) AS _v{i}"
        for i in range(dim)
    )
    vec = ", ".join(f"coalesce(_v{i}, 0)::DOUBLE" for i in range(dim))
    # list_sum, not the unrolled fixed-order dot: raw components are exact
    # integers, so the sum of squares is exact in ANY order (and the
    # unrolled form's 256-deep nesting exceeds DuckDB's binder recursion
    # cap); the Spark side may therefore also sum in any order
    nrm = "sqrt(list_sum(list_transform(_raw, _x -> _x * _x))::DOUBLE)"
    return f"""
        WITH tok AS (
          SELECT {id_col}, unnest({TH.token_hashes(text_col, 'duckdb')}) AS _h
          FROM {table}),
        agg AS (SELECT {id_col}, {sums} FROM tok GROUP BY {id_col}),
        raw AS (
          SELECT t.{id_col}, list_value({vec}) AS _raw
          FROM {table} t LEFT JOIN agg USING ({id_col})),
        nrmed AS (SELECT {id_col}, _raw, {nrm} AS _n FROM raw)
        SELECT {id_col},
               list_transform(_raw,
                 _x -> CASE WHEN _n = 0 THEN 0::DOUBLE ELSE _x / _n END) AS vec
        FROM nrmed
    """


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup scoped to embedding clusters


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 64,
    threshold: float = 0.45,
    dim: int | None = None,
    n_blocks: int | None = None,
    keep_by: str | None = None,
    n_probe: int = 1,
    cent_vecs: list[list[float]] | None = None,
) -> DataFrame:
    """Semantic deduplication (Abbas et al. 2023, 'SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication'): cluster the
    corpus in embedding space, then mark as duplicates only rows whose
    cosine to a HIGHER-PRIORITY row in the SAME cluster clears
    ``threshold`` — the clusters bound the quadratic, which is the
    paper's entire scale argument (k clusters cut pair work by ~k;
    cross-cluster near-dups are missed by design, recall < 1 like every
    ANN family member).

    Composition, not new machinery: cell assignment is `_ivf_assign`
    (deterministic id-prefix centroids, max_by agg) and within-cell pair
    scoring is `_blocked_pair_scores` with the cell as the bucket — so a
    HOT cluster becomes many independent memory-bounded grid cells
    (vectorized int64 matmul), never one giant join partition; skew in
    cluster sizes cannot produce an unbounded task.

    Keep rule, pinned deterministic where the paper keeps a random
    exemplar: priority is smallest-id by default, or the ``keep_by``
    column (higher wins, ties break to the smaller id — the quality-argmax
    survivor policy, mirroring dedup_clusters' best_id). A row is kept iff
    NO same-cell above-threshold row outranks it; a removed row's
    ``cluster_id`` is its strongest witness (not transitively closed —
    5~7 and 7~9 without 5~9 removes 9 with witness 7 even though 7 is
    itself removed; that matches the paper's per-ball marking, and
    `dedup_clusters` is the transitive alternative).

    ``n_probe`` (round-9 verdict #5) recovers most cross-cell near-dups:
    each row enters its top-n_probe cells for PAIR GENERATION (the
    corpus-side mirror of the IVF probe knob), so a boundary pair is
    found whenever ANY probed cell is shared. Pair work grows ~n_probe^2
    per cell in the worst case but stays cluster-bounded; the found-pair
    set is MONOTONE in n_probe (probe-1 cells are a subset of probe-2
    cells), so recall can only improve — property-tested. Duplicate
    pairs from multiply-shared cells are absorbed by the witness
    aggregations (min/argmax are idempotent), never double-counted.

    ``cent_vecs`` (round-10, the same knob the ANN family grew in round
    9) clusters around TRAINED centroids (functions/kmeans spherical
    Lloyd's literals) instead of the id-prefix sample — on a corpus with
    real cluster structure, trained cells align with the clusters, so
    near-dup pairs land in the SAME cell where arbitrary prefix cells
    split them (recall gain pinned on a planted corpus in pytest; both
    dialects consume the identical literals).

    Output (doc_id, cluster_id, keep), oracle-exact: quantized int64 dots
    (any summation order) + float64 normalization, same as cosine_pairs."""
    dim = dim or _infer_dim(df, vec_col)
    cent = _ivf_centroids(df, id_col, vec_col, n_centroids, dim, cent_vecs)
    if n_probe <= 1:
        assigned = _ivf_assign(df, id_col, vec_col, n_centroids, dim, cent=cent)
    else:
        # top-n_probe cells per row: score on SCALARS only (the _ivf_assign
        # lesson — arrays in the expansion sort kill the stage), rank with
        # a window, re-attach the vector by one corpus-sized join
        corpus = fan_out(
            df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
        ).withColumn("_cvn", F.expr(norm_expr("_cv", "spark", dim)))
        scored = (
            corpus.crossJoin(F.broadcast(cent))
            .withColumn(
                "ccos", F.expr(f"({_dot('_cv', '_ce', 'spark', dim)}) / (_cvn * _cen)")
            )
            .select("neighbor_id", "cid", "ccos")
        )
        wp = Window.partitionBy("neighbor_id").orderBy(
            F.col("ccos").desc(), F.col("cid")
        )
        top = (
            scored.withColumn("_r", F.row_number().over(wp))
            .filter(F.col("_r") <= n_probe)
            .select("cid", "neighbor_id")
        )
        assigned = top.join(
            df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
            "neighbor_id",
        )
    q = assigned.select(
        F.col("neighbor_id").alias("id"),
        F.expr(quant_expr("_cv", "spark")).alias("qv"),
        F.col("cid").alias("_bkt"),
    )
    nb = int(n_blocks) if n_blocks is not None else _auto_blocks(df, vec_col, dim)
    pairs = _blocked_pair_scores(q, nb, threshold)
    if keep_by is None:
        w = pairs.groupBy(F.col("id_b").alias("doc_id")).agg(
            F.min("id_a").alias("_w")
        )
    else:
        pr = df.select(F.col(id_col).alias("_pid"), F.col(keep_by).alias("_p"))
        scored = (
            pairs.join(
                pr.select(
                    F.col("_pid").alias("id_a"), F.col("_p").alias("_pa")
                ),
                "id_a",
            ).join(
                pr.select(
                    F.col("_pid").alias("id_b"), F.col("_p").alias("_pb")
                ),
                "id_b",
            )
        )
        # orient each pair: the out-ranked side loses to the other (pairs
        # carry id_a < id_b, so on equal priority id_a wins); the loser's
        # witness is its STRONGEST beater (max priority, then min id)
        b_wins = F.col("_pb") > F.col("_pa")
        edges = scored.select(
            F.when(b_wins, F.col("id_b")).otherwise(F.col("id_a")).alias("_win"),
            F.when(b_wins, F.col("id_a")).otherwise(F.col("id_b")).alias("_lose"),
            F.when(b_wins, F.col("_pb")).otherwise(F.col("_pa")).alias("_wp"),
        )
        w = (
            edges.groupBy(F.col("_lose").alias("doc_id"))
            .agg(
                F.max(
                    F.struct(F.col("_wp"), (-F.col("_win")).alias("_nw"))
                ).alias("_b")
            )
            .select("doc_id", (-F.col("_b._nw")).alias("_w"))
        )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(w, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_w", "doc_id").alias("cluster_id"),
            F.col("_w").isNull().alias("keep"),
        )
        .orderBy("doc_id")
    )


def semdedup_oracle(
    id_col: str,
    vec_col: str,
    table: str,
    n_centroids: int = 64,
    threshold: float = 0.45,
    dim: int | None = None,
    keep_by: str | None = None,
    n_probe: int = 1,
    cent_vecs: list[list[float]] | None = None,
) -> str:
    """DuckDB twin of semdedup: same centroids (id-prefix, or the same
    TRAINED full-precision literals via ``cent_vecs``) and max-cosine
    (top-n_probe) cell assignment, same quantized within-cell pair
    scores, same smallest-witness (or keep_by strongest-witness) keep
    rule. Multi-probe duplicate pairs are absorbed by the same
    idempotent witness aggregates as the Spark side."""
    if dim is None:
        raise ValueError("oracle needs an explicit dim")
    acos = cosine_expr("c._cv", "ct._ce", "duckdb", dim)
    qa, qb = "a._q", "b._q"
    dot = (
        f"list_sum(list_transform(range(1, len({qa}) + 1), "
        f"_i -> {qa}[_i] * {qb}[_i]))::DOUBLE"
    )
    nrm = "sqrt(list_sum(list_transform({v}, _x -> _x * _x))::DOUBLE)"
    cos = f"({dot}) / ({nrm.format(v=qa)} * {nrm.format(v=qb)})"
    if keep_by is None:
        w_ctes = "w AS (SELECT id_b AS doc_id, min(id_a) AS _w FROM prs GROUP BY id_b)"
    else:
        w_ctes = f"""pr AS (SELECT {id_col} AS _pid, {keep_by} AS _p FROM {table}),
        edges AS (
          SELECT CASE WHEN pb._p > pa._p THEN id_b ELSE id_a END AS _win,
                 CASE WHEN pb._p > pa._p THEN id_a ELSE id_b END AS _lose,
                 CASE WHEN pb._p > pa._p THEN pb._p ELSE pa._p END AS _wp
          FROM prs
          JOIN pr pa ON pa._pid = prs.id_a
          JOIN pr pb ON pb._pid = prs.id_b),
        w AS (
          SELECT _lose AS doc_id, _win AS _w FROM (
            SELECT *, row_number() OVER (PARTITION BY _lose
                                         ORDER BY _wp DESC, _win) AS _r
            FROM edges) WHERE _r = 1)"""
    return f"""
        WITH cent AS ({_cent_sql(id_col, vec_col, table, n_centroids, cent_vecs)}),
        corpus AS (SELECT {id_col} AS _id, {vec_col} AS _cv FROM {table}),
        ascore AS (
          SELECT c._id, ct.cid, {acos} AS ccos
          FROM corpus c CROSS JOIN cent ct),
        assigned AS (
          SELECT cid, _id FROM (
            SELECT *, row_number() OVER (PARTITION BY _id
                                         ORDER BY ccos DESC, cid) AS _r
            FROM ascore) WHERE _r <= {n_probe}),
        qv AS (SELECT {id_col} AS _id,
                      {quant_expr(vec_col, 'duckdb')} AS _q FROM {table}),
        av AS (SELECT s.cid, q._id, q._q
               FROM assigned s JOIN qv q ON q._id = s._id),
        prs AS (
          SELECT a._id AS id_a, b._id AS id_b
          FROM av a JOIN av b ON a.cid = b.cid AND a._id < b._id
          WHERE ({cos}) >= {threshold}),
        {w_ctes}
        SELECT e.{id_col} AS doc_id,
               coalesce(w._w, e.{id_col}) AS cluster_id,
               (w._w IS NULL) AS keep
        FROM {table} e LEFT JOIN w ON w.doc_id = e.{id_col}
        ORDER BY doc_id
    """


# --------------------------------------------------------------------------
# IVF-PQ: the composed billion-scale layout — PQ codes stored inside the
# cell-partitioned IVF store


def ivfpq_build_store(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_centroids: int = 4,
    m_subspaces: int = 4,
    n_codes: int = 16,
    dim: int | None = None,
    residual: bool = False,
    cent_vecs: list[list[float]] | None = None,
    codebook_vecs: list[list[list[float]]] | None = None,
) -> None:
    """Materialize the IVF-PQ index (Jégou et al. TPAMI'11, the layout
    behind every billion-scale ANN service): each corpus vector is
    assigned to its nearest-centroid inverted list AND encoded to
    m_subspaces one-byte PQ codes; the store holds ONLY
    (neighbor_id, code0..codeM-1), partitioned by cell — no float vectors.

    Why this is the 100 TB shape, compounding both prunes: a probe reads
    n_probe/n_centroids of the data at the FILE level (PartitionFilters,
    same as ivf_build_store) and each row it does read is m_subspaces
    small ints instead of dim floats (64x narrower at dim=64/m=4). The
    float corpus is touched only by the optional rerank stage, and only
    for Q*C shortlisted rows. Centroids and codebooks are the
    deterministic id-prefix samples of the corpus (see ann_pq/_ivf notes),
    so the probe recovers both from the source table, not the store.

    ``residual=True`` is the paper's actual IVFADC: vectors are encoded
    as residuals to their ASSIGNED centroid (x - c), which are much
    smaller in magnitude than x, so the same code budget quantizes finer
    — measurably better ADC recall at identical store bytes. The
    codebooks become the residuals of the id-prefix sample vectors
    (w.r.t. their own cells), still recoverable from the source table."""
    dim = dim or _infer_dim(df, vec_col)
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub_dim = dim // m_subspaces
    cent = _ivf_centroids(df, id_col, vec_col, n_centroids, dim, cent_vecs)
    if residual:
        res = _ivf_residuals(df, id_col, vec_col, n_centroids, dim, cent)
        if codebook_vecs is not None:
            # TRAINED residual codebooks (kmeans.train_residual_codebooks)
            cb = _pq_codebook(
                df, id_col, vec_col, m_subspaces, sub_dim, n_codes,
                codebook_vecs,
            )
        else:
            # sample-only residual chain for the codebook (see
            # _ivfpq_residual_rank — full-corpus assign for n_codes rows is
            # pure waste; residuals depend only on the vector + centroids)
            res_s = _ivf_residuals(
                df.filter(F.col(id_col) < n_codes), id_col, vec_col,
                n_centroids, dim, cent,
            )
            cb = _pq_codebook(
                res_s, "neighbor_id", "_rv", m_subspaces, sub_dim, n_codes
            )
        codes = _pq_encode(
            res, "neighbor_id", "_rv", m_subspaces, sub_dim, cb,
            carry_cols=["cid"],
        )
    else:
        cb = _pq_codebook(
            df, id_col, vec_col, m_subspaces, sub_dim, n_codes, codebook_vecs
        )
        # encode on the ASSIGNED frame (same vectors, renamed) so the cell
        # id rides the encode as a carry column — the previous
        # codes-join-cells re-join replanned the corpus twice and shuffled
        # both sides by neighbor_id just to reunite columns computed from
        # the same row
        assigned = _ivf_assign(df, id_col, vec_col, n_centroids, dim, cent=cent)
        codes = _pq_encode(
            assigned, "neighbor_id", "_cv", m_subspaces, sub_dim, cb,
            carry_cols=["cid"],
        )
    # cluster by cell before the partitioned write (one file per cell, not
    # one fragment per assign partition per cell)
    codes.repartition("cid").write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(path)
    # freeze BOTH training artifacts into the store's sidecars: the codes
    # hold no float vectors, so without the frozen codebooks every append
    # re-derived them from the live corpus's id-prefix rows — and a
    # takedown of any id < n_codes row changed the codewords, silently
    # encoding appended rows against a different quantizer than the
    # existing ones (corrupted ADC rankings, no error). Residual stores
    # freeze the RESIDUAL-domain codebooks — exactly what _pq_encode used.
    from .ann_maintenance import write_centroid_sidecar, write_codebook_sidecar

    write_centroid_sidecar(cent, path)
    write_codebook_sidecar(cb, path)


def _ivf_residuals(df, id_col, vec_col, n_centroids, dim, cent):
    """(cid, neighbor_id, _rv): each corpus vector's residual to its
    assigned centroid — the thing IVFADC quantizes. zip_with keeps the
    subtraction elementwise-exact in both engines.

    allow_narrow=False: downstream of a residual frame sits the PQ-encode
    explode + codebook join, and project-collapse re-inlines a narrow
    assign's unrolled argmax past those operators — measured 2x SLOWER
    than the agg-based assign whose shuffle materializes the cell id
    before the expansion (A/B'd at sf0.1: residual build 6.6 s agg vs
    14.4 s narrow). The plain build/append paths keep the narrow kernel:
    there the projection feeds the partitioned write directly.
    """
    assigned = _ivf_assign(
        df, id_col, vec_col, n_centroids, dim, cent=cent, allow_narrow=False
    )
    return assigned.join(F.broadcast(cent), "cid").select(
        "cid",
        "neighbor_id",
        F.expr("zip_with(_cv, _ce, (x, c) -> x - c)").alias("_rv"),
    )


def ivfpq_append(
    spark: SparkSession,
    store_path: str,
    new_df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 4,
    m_subspaces: int = 4,
    n_codes: int = 16,
    dim: int | None = None,
    residual: bool = False,
    cent_vecs: list[list[float]] | None = None,
    codebook_vecs: list[list[list[float]]] | None = None,
    cent: DataFrame | None = None,
    cb: DataFrame | None = None,
) -> None:
    """Incremental IVF-PQ maintenance: encode ONLY the new delivery
    against the FROZEN codebooks and assign it against the FROZEN
    centroids, then append to the cell partition directories — no
    rebuild, no touch of existing codes. Row-identical to a one-shot
    build over the union (same centroids -> same cells, same codebooks ->
    same codes; tested append==rebuild). ``residual`` must match the
    store's build flag.

    The frozen training artifacts come in, by precedence: ``cent``/``cb``
    frames (the store's SIDECARS — ann_maintenance.read_centroid_sidecar/
    read_codebook_sidecar; the maintained-store path, immune to corpus
    takedowns), else ``cent_vecs``/``codebook_vecs`` trained literals,
    else derived from ``train_df`` (the rows with id <
    max(n_centroids, n_codes) of the ORIGINAL corpus — a legacy path
    that silently drifts if a training-prefix row is taken down and
    compacted; new code should pass the sidecars). ``train_df`` may be
    None when both frames are supplied."""
    dim = dim or _infer_dim(new_df, vec_col)
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub_dim = dim // m_subspaces
    if cent is None or cb is None:
        if train_df is None:
            raise ValueError(
                "ivfpq_append needs either both sidecar frames (cent + cb) "
                "or a train_df to derive the missing artifact from"
            )
    if cent is None:
        cent = _ivf_centroids(train_df, id_col, vec_col, n_centroids, dim, cent_vecs)
    if cb is None:
        if residual:
            if codebook_vecs is not None:
                cb = _pq_codebook(
                    train_df, id_col, vec_col, m_subspaces, sub_dim, n_codes,
                    codebook_vecs,
                )
            else:
                res_train = _ivf_residuals(
                    train_df.filter(F.col(id_col) < n_codes), id_col, vec_col,
                    n_centroids, dim, cent,
                )
                cb = _pq_codebook(
                    res_train, "neighbor_id", "_rv", m_subspaces, sub_dim, n_codes
                )
        else:
            cb = _pq_codebook(
                train_df, id_col, vec_col, m_subspaces, sub_dim, n_codes,
                codebook_vecs,
            )
    if residual:
        res_new = _ivf_residuals(new_df, id_col, vec_col, n_centroids, dim, cent)
        codes = _pq_encode(
            res_new, "neighbor_id", "_rv", m_subspaces, sub_dim, cb,
            carry_cols=["cid"],
        )
    else:
        assigned = _ivf_assign(
            new_df, id_col, vec_col, n_centroids, dim, cent=cent
        )
        codes = _pq_encode(
            assigned, "neighbor_id", "_cv", m_subspaces, sub_dim, cb,
            carry_cols=["cid"],
        )
    from .ann_maintenance import _commit_append_diff, _snapshot_for_append

    before = _snapshot_for_append(store_path)
    codes.repartition("cid").write.mode(
        "append"
    ).partitionBy("cid").parquet(store_path)
    # manifest-tracked stores register the appended files (no-op legacy)
    _commit_append_diff(store_path, before)


def ann_ivfpq_store(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    store_path: str,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int | str = 2,
    m_subspaces: int = 4,
    n_codes: int = 16,
    dim: int | None = None,
    rerank: int | None = None,
    query_vecs: dict[int, list[float]] | None = None,
    residual: bool = False,
    cent_vecs: list[list[float]] | None = None,
    codebook_vecs: list[list[list[float]]] | None = None,
) -> DataFrame:
    """ANN over a materialized IVF-PQ store: query cells resolve first
    (n_queries x n_probe cell ids, collected driver-side — tiny), the
    codes scan carries a STATIC cid IN (...) predicate so non-probed cell
    partitions are pruned before any IO, candidates ADC-score against the
    broadcast per-query distance tables, and ``rerank=C`` exact-re-ranks
    the Q*C shortlist against the float corpus (the only float reads).
    Candidate sets are per-query by construction — the probed-cells join
    stamps query_id onto the codes rows, so every distance-table join is
    an equi-join on (query_id, code_j).

    ``query_vecs`` (id -> vector) queries with EXTERNAL vectors instead of
    corpus row ids — the production serving shape; caller-chosen ids are
    never matched against the corpus, so no self-exclusion applies.

    ``residual=True`` probes a residual-encoded store (IVFADC): the
    reconstruction is cent_c + r-hat, so scoring needs THREE broadcast
    lookup tables instead of one — per-(query, cell) centroid dots, the
    per-(query, m, code) residual distance table, and the per-(cell, m,
    code) centroid-residual cross terms — all tiny, all join-keyed; the
    scanned candidate row is still just cid + m codes.

    ``n_probe="auto"`` (round-13 verdict #1) serves the MEASURED width
    from the store's serving sidecar — which, for a codes-only store, is
    written by the width-carry recipe (ann_maintenance.ann_tune_ivfpq:
    tune a plain-IVF store over the training slice against this store's
    frozen centroids, carry the width here), since the tuner's
    brute-force truth needs full vectors. Raises on an untuned store
    rather than silently guessing, naming the recipe."""
    spark = df.sparkSession
    dim = dim or _infer_dim(df, vec_col)
    if n_probe == "auto":
        from .ann_maintenance import read_serving_sidecar

        serving = read_serving_sidecar(store_path)
        if serving is None:
            raise ValueError(
                f"{store_path}: n_probe='auto' but the store has no "
                "serving sidecar — codes-only stores are tuned via the "
                "width-carry recipe (ann_maintenance.ann_tune_ivfpq: "
                "plain-IVF tuning store over the training slice, same "
                "frozen centroids, then carry), or pass an explicit "
                "n_probe"
            )
        n_probe = int(serving["n_probe"])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub_dim = dim // m_subspaces
    # localCheckpoint before the collect: the qcells window chain feeds
    # the probe-cell collect AND the candidate join AND (residual) the
    # centroid-dot table — one evaluation instead of three
    # training-artifact precedence (both quantizers): explicit trained
    # literals > the store's frozen sidecar (every ivfpq_build_store
    # writes both) > derived from the source's id-prefix rows. The
    # sidecar path is also the FAST one: the derived residual codebook
    # chain cost ~6 s of the probe at sf0.1 (see _ivfpq_residual_rank);
    # the sidecar is a one-file scan.
    from .ann_maintenance import read_centroid_sidecar, read_codebook_sidecar

    cent = (
        _ivf_centroids(df, id_col, vec_col, n_centroids, dim, cent_vecs)
        if cent_vecs is not None
        else read_centroid_sidecar(spark, store_path)
    )
    side_cb = (
        None if codebook_vecs is not None
        else read_codebook_sidecar(spark, store_path)
    )
    qcells = _ivf_query_cells(
        df, id_col, vec_col, query_ids, n_centroids, n_probe, dim,
        query_vecs=query_vecs, cent=cent,
    ).localCheckpoint()
    probe_cells = sorted({r["cid"] for r in qcells.select("cid").collect()})
    # delete-aware: a maintained store carries a pending-deletion list
    # (ann_maintenance) — live_codes anti-joins it, pruned to the probed
    # cells, so a taken-down document stops surfacing the moment its
    # delete is applied, compaction or not
    from .ann_maintenance import live_codes

    codes = live_codes(spark, store_path, cells=probe_cells)
    if residual:
        ranked = _ivfpq_residual_rank(
            df, id_col, vec_col, codes, qcells,
            n_centroids, m_subspaces, sub_dim, dim, n_codes,
            cent=cent, codebook_vecs=codebook_vecs, cb=side_cb,
        )
    else:
        cand = codes.join(
            F.broadcast(qcells.select("cid", "query_id")), "cid"
        ).drop("cid")
        cb = side_cb if side_cb is not None else _pq_codebook(
            df, id_col, vec_col, m_subspaces, sub_dim, n_codes, codebook_vecs
        )
        ranked = _pq_adc_rank(
            cand, df, id_col, vec_col, query_ids, m_subspaces, sub_dim, dim, cb,
            query_vecs=query_vecs,
        )
    if rerank is None:
        return (
            ranked.filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
            .orderBy("query_id", "rank")
        )
    return _pq_rerank(
        ranked, df, id_col, vec_col, query_ids, k, rerank, dim,
        query_vecs=query_vecs,
    )


def _ivfpq_residual_rank(
    df, id_col, vec_col, codes, qcells,
    n_centroids, m_subspaces, sub_dim, dim, n_codes,
    cent=None, codebook_vecs=None, cb=None,
):
    """Rank residual-encoded candidates by the IVFADC cosine
    approximation: reconstruction = cent_c + r-hat, so

      cos = (<q,cent_c> + sum_j <q_j, cw_j>)
            / (qn * sqrt(||cent_c||^2 + 2*sum_j <cent_c_j, cw_j>
                          + sum_j ||cw_j||^2))

    Every non-exact term reads from a broadcast table keyed by the
    candidate's (cid, code_j) or the query's (query_id, code_j); sums are
    fixed-order so the DuckDB twin is bit-equal. ``cent``/``codebook_vecs``
    override the frozen training artifacts (sidecar / trained literals);
    ``cb`` supplies the codebook FRAME directly (the store's frozen
    sidecar — one file scan instead of the derived sample-assign chain)."""
    if cent is None:
        cent = _ivf_centroids(df, id_col, vec_col, n_centroids, dim)
    if cb is not None:
        cb = cb.localCheckpoint()  # same one-evaluation contract as below
    elif codebook_vecs is not None:
        cb = _pq_codebook(
            df, id_col, vec_col, m_subspaces, sub_dim, n_codes, codebook_vecs
        ).localCheckpoint()
    else:
        # codebooks need ONLY the sample vectors' residuals: filter the
        # corpus BEFORE the assign chain (residual of a vector depends only
        # on itself + centroids) — assigning the whole corpus just to keep
        # n_codes rows cost ~6 s of the probe at sf0.1. Checkpointed: the
        # dt AND cc builds below both consume cb — without it each re-runs
        # the sample assign chain
        res_s = _ivf_residuals(
            df.filter(F.col(id_col) < n_codes), id_col, vec_col,
            n_centroids, dim, cent,
        )
        cb = _pq_codebook(
            res_s, "neighbor_id", "_rv", m_subspaces, sub_dim, n_codes
        ).localCheckpoint()

    # The three lookup tables are TINY (Q*P, Q*m*n_codes, cells*m*n_codes
    # rows) but their PLANS are multi-stage chains (codebook assign, query
    # dedup); each of the 9 downstream broadcast builds would re-run its
    # chain as a separate job — measured ~5 s of pure job-count floor at
    # sf0.1. localCheckpoint materializes each table once; the broadcast
    # builds become trivial scans.
    # per-(query, cell) centroid dot + cell norm^2 (dot(ce,ce), NOT
    # _cen^2 — sqrt then square is a different double)
    qc = qcells.join(F.broadcast(cent), "cid").select(
        "query_id",
        "cid",
        F.expr(_dot("_qv", "_ce", "spark", dim)).alias("_qc"),
        F.expr(_dot("_ce", "_ce", "spark", dim)).alias("_ccn2"),
        "_qn",
    ).localCheckpoint()
    # per-(query, m, code) residual distance table
    qsub = _pq_subspaces(
        qcells.select("query_id", "_qv").distinct(), "query_id", "_qv",
        m_subspaces, sub_dim, "query_id",
    )
    dt = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "m", "code",
        F.expr(_dot("sub", "csub", "spark", sub_dim)).alias("_pdot"),
    ).localCheckpoint()
    # per-(cell, m, code) centroid x codeword cross terms (+ codeword
    # self-norms riding along)
    csub = _pq_subspaces(cent, "cid", "_ce", m_subspaces, sub_dim, "cid")
    cc = csub.join(F.broadcast(cb), "m").select(
        "cid", "m", "code",
        F.expr(_dot("sub", "csub", "spark", sub_dim)).alias("_cc"),
        "_cn2",
    ).localCheckpoint()

    scored = codes.join(F.broadcast(qcells.select("cid", "query_id")), "cid")
    for j in range(m_subspaces):
        dtj = dt.filter(F.col("m") == j).select(
            "query_id", F.col("code").alias(f"code{j}"),
            F.col("_pdot").alias(f"_p{j}"),
        )
        ccj = cc.filter(F.col("m") == j).select(
            "cid", F.col("code").alias(f"code{j}"),
            F.col("_cc").alias(f"_x{j}"), F.col("_cn2").alias(f"_c{j}"),
        )
        scored = scored.join(F.broadcast(dtj), ["query_id", f"code{j}"]).join(
            F.broadcast(ccj), ["cid", f"code{j}"]
        )
    adot = " + ".join(["_qc"] + [f"_p{j}" for j in range(m_subspaces)])
    cross = " + ".join(f"_x{j}" for j in range(m_subspaces))
    rn2 = " + ".join(f"_c{j}" for j in range(m_subspaces))
    scored = (
        scored.join(F.broadcast(qc), ["query_id", "cid"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(f"({adot}) / (_qn * sqrt(_ccn2 + 2 * ({cross}) + ({rn2})))"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w))


def ann_ivfpq_oracle(
    id_col: str,
    vec_col: str,
    table: str,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int = 2,
    m_subspaces: int = 4,
    n_codes: int = 16,
    dim: int | None = None,
    rerank: int | None = None,
    query_vecs: dict[int, list[float]] | None = None,
    residual: bool = False,
    cent_vecs: list[list[float]] | None = None,
    codebook_vecs: list[list[list[float]]] | None = None,
) -> str:
    """DuckDB twin of ivfpq_build_store + ann_ivfpq_store: the IVF
    oracle's assigned/qcells CTEs restrict the PQ oracle's candidate set
    to the probed cells; same codebooks, argmin codes, fixed-order ADC
    sums, optional exact re-rank, and (with ``query_vecs``) the same
    external query VALUES the engine sees. ``residual`` mirrors the
    IVFADC scoring (centroid dot + residual table + cross terms)."""
    if dim is None or dim % m_subspaces:
        raise ValueError("oracle needs an explicit dim divisible by m_subspaces")
    sub_dim = dim // m_subspaces
    acos = cosine_expr("c._cv", "ct._ce", "duckdb", dim)
    qccos = cosine_expr("q._qv", "ct._ce", "duckdb", dim)

    def sub_arms_src(src: str, idc: str, vecc: str, out_id: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {idc} AS {out_id}, {j} AS m, "
            f"list_slice({vecc}, {j * sub_dim + 1}, {(j + 1) * sub_dim}) AS sub "
            f"FROM {src}"
            for j in range(m_subspaces)
        )

    def sub_arms(src_filter: str, out_id: str) -> str:
        return sub_arms_src(f"{table}{src_filter}", id_col, vec_col, out_id)

    def qsub_arms() -> str:
        # query-side subspace slices come from qsrc (corpus filter OR the
        # external VALUES), never from the table directly
        return sub_arms_src("qsrc", "query_id", "_qv", "query_id")
    code_cols = ", ".join(
        f"max(CASE WHEN m = {j} AND _rn = 1 THEN code END) AS code{j}"
        for j in range(m_subspaces)
    )
    dt_joins = "\n          ".join(
        f"JOIN dt d{j} ON d{j}.m = {j} AND d{j}.code = cand.code{j} "
        f"AND d{j}.query_id = cand.query_id"
        for j in range(m_subspaces)
    )
    adot = " + ".join(f"d{j}._pdot" for j in range(m_subspaces))
    rn2 = " + ".join(f"d{j}._cn2" for j in range(m_subspaces))
    rr_ctes, final_src = "", "ranked"
    if rerank is not None:
        cos_rr = cosine_expr("qv._qv", "cv._cv", "duckdb", dim)
        rr_ctes = f""",
        shortlist AS (SELECT query_id, neighbor_id FROM ranked
                      WHERE rank <= {rerank}),
        qv AS (SELECT query_id, _qv FROM qsrc),
        cv AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cv FROM {table}),
        rr AS (
          SELECT s.query_id, s.neighbor_id, {cos_rr} AS cos
          FROM shortlist s
          JOIN cv ON cv.neighbor_id = s.neighbor_id
          JOIN qv ON qv.query_id = s.query_id),
        rranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id)::INT AS rank
          FROM rr)"""
        final_src = "rranked"
    if codebook_vecs is not None:
        _rows = ", ".join(
            f"({c}, {m}, [{', '.join(repr(float(x)) for x in cw)}]::DOUBLE[])"
            for m, words in enumerate(codebook_vecs)
            for c, cw in enumerate(words)
        )
        cb_literal = (
            f"SELECT code, m, csub, "
            f"{_dot('csub', 'csub', 'duckdb', sub_dim)} AS _cn2 "
            f"FROM (VALUES {_rows}) AS _cb(code, m, csub)"
        )
    else:
        cb_literal = None
    shared_head = f"""
        WITH cent AS ({_cent_sql(id_col, vec_col, table, n_centroids, cent_vecs)}),
        corpus AS (SELECT {id_col} AS neighbor_id, {vec_col} AS _cv FROM {table}),
        ascore AS (
          SELECT c.neighbor_id, ct.cid, {acos} AS ccos
          FROM corpus c CROSS JOIN cent ct),
        assigned AS (
          SELECT cid, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                         ORDER BY ccos DESC, cid) AS _r
            FROM ascore) WHERE _r = 1),
        qsrc AS ({_qsrc_sql(id_col, vec_col, table, query_ids, query_vecs)}),
        q AS (SELECT query_id, _qv FROM qsrc),
        qscore AS (
          SELECT q.query_id, ct.cid, {qccos} AS ccos
          FROM q CROSS JOIN cent ct),
        qcells AS (
          SELECT cid, query_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY ccos DESC, cid) AS _r
            FROM qscore) WHERE _r <= {n_probe}),"""
    shared_tail = f"""
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id)::INT AS rank
          FROM scored){rr_ctes}
        SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
        FROM {final_src} WHERE rank <= {k} ORDER BY query_id, rank
    """
    codes_ctes = f"""
        dists AS (
          SELECT neighbor_id, n.m, code,
                 _cn2 - 2 * {_dot("sub", "csub", "duckdb", sub_dim)} AS _d
          FROM nsub n JOIN cb ON n.m = cb.m),
        ranked_codes AS (
          SELECT neighbor_id, m, code,
                 row_number() OVER (PARTITION BY neighbor_id, m
                                    ORDER BY _d, code) AS _rn
          FROM dists),
        codes AS (
          SELECT neighbor_id, {code_cols} FROM ranked_codes GROUP BY neighbor_id),
        cand AS (
          SELECT qc.query_id, a.cid, co.* FROM codes co
          JOIN assigned a ON a.neighbor_id = co.neighbor_id
          JOIN qcells qc ON qc.cid = a.cid),
        qsub AS ({qsub_arms()}),"""
    if not residual:
        cb_src = cb_literal or (
            f"SELECT code, m, sub AS csub, "
            f"{_dot('sub', 'sub', 'duckdb', sub_dim)} AS _cn2 "
            f"FROM ({sub_arms(f' WHERE {id_col} < {n_codes}', 'code')})"
        )
        return f"""{shared_head}
        cb AS ({cb_src}),
        nsub AS ({sub_arms("", "neighbor_id")}),{codes_ctes}
        dt AS (
          SELECT query_id, qs.m, code,
                 {_dot("sub", "csub", "duckdb", sub_dim)} AS _pdot, _cn2
          FROM qsub qs JOIN cb ON qs.m = cb.m),
        qn AS (SELECT query_id, {norm_expr("_qv", "duckdb", dim)} AS _qn
               FROM qsrc),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 ({adot}) / (_qn * sqrt({rn2})) AS cos
          FROM cand
          {dt_joins}
          JOIN qn ON qn.query_id = cand.query_id
          WHERE cand.query_id <> cand.neighbor_id),{shared_tail}"""
    # residual (IVFADC): codebooks over residuals, scoring adds the
    # per-(query, cell) centroid dot and the per-(cell, m, code) cross
    # terms — same fixed-order sums as the engine
    rvec = f"list_transform(range(1, {dim} + 1), _i -> c._cv[_i] - ct._ce[_i])"
    cc_joins = "\n          ".join(
        f"JOIN cc x{j} ON x{j}.m = {j} AND x{j}.code = cand.code{j} "
        f"AND x{j}.cid = cand.cid"
        for j in range(m_subspaces)
    )
    radot = " + ".join(["qc._qc"] + [f"d{j}._pdot" for j in range(m_subspaces)])
    rcross = " + ".join(f"x{j}._cc" for j in range(m_subspaces))
    rrn2 = " + ".join(f"x{j}._cn2" for j in range(m_subspaces))
    rcb_src = cb_literal or (
        f"SELECT code, m, sub AS csub, "
        f"{_dot('sub', 'sub', 'duckdb', sub_dim)} AS _cn2 "
        f"FROM ({sub_arms_src(f'res WHERE neighbor_id < {n_codes}', 'neighbor_id', '_rv', 'code')})"
    )
    return f"""{shared_head}
        res AS (
          SELECT a.cid, a.neighbor_id, {rvec} AS _rv
          FROM assigned a
          JOIN corpus c ON c.neighbor_id = a.neighbor_id
          JOIN cent ct ON ct.cid = a.cid),
        cb AS ({rcb_src}),
        nsub AS ({sub_arms_src("res", "neighbor_id", "_rv", "neighbor_id")}),{codes_ctes}
        dt AS (
          SELECT query_id, qs.m, code,
                 {_dot("sub", "csub", "duckdb", sub_dim)} AS _pdot
          FROM qsub qs JOIN cb ON qs.m = cb.m),
        qc AS (
          SELECT qc0.query_id, qc0.cid,
                 {_dot("q._qv", "ct._ce", "duckdb", dim)} AS _qc,
                 {_dot("ct._ce", "ct._ce", "duckdb", dim)} AS _ccn2,
                 {norm_expr("q._qv", "duckdb", dim)} AS _qn
          FROM qcells qc0
          JOIN q ON q.query_id = qc0.query_id
          JOIN cent ct ON ct.cid = qc0.cid),
        csub AS ({sub_arms_src("cent", "cid", "_ce", "cid")}),
        cc AS (
          SELECT cid, cs.m, code,
                 {_dot("sub", "csub", "duckdb", sub_dim)} AS _cc, _cn2
          FROM csub cs JOIN cb ON cs.m = cb.m),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 ({radot}) / (qc._qn * sqrt(qc._ccn2 + 2 * ({rcross}) + ({rrn2}))) AS cos
          FROM cand
          {dt_joins}
          {cc_joins}
          JOIN qc ON qc.query_id = cand.query_id AND qc.cid = cand.cid
          WHERE cand.query_id <> cand.neighbor_id),{shared_tail}"""


# ---------------------------------------------------------------------------
# ANN quality evaluation (round 10): distributed recall@k — the standing
# eval a pipeline runs on a query sample whenever an index is trained,
# synced, or compacted (faiss's knn-recall harness shape), expressed as
# two joins + one agg instead of driver-side set math


def ann_recall(truth: DataFrame, approx: DataFrame, k: int = 10) -> DataFrame:
    """Per-query recall@k of any ANN result frame against an exact one:
    (query_id, n_truth, n_hit, recall). Both inputs are (query_id,
    neighbor_id, rank, ...) — the shape every ann_* operator in this
    module returns — so brute-force truth and IVF/PQ/LSH/store candidates
    plug in directly. The denominator is the TRUTH's row count at rank<=k
    (tiny corpora can have fewer than k true neighbors; recall against a
    padded k would understate such queries). Queries the approx frame
    misses entirely score 0, not absent.

    Scale: the truth sample is Q*k rows — the joins are hash joins on
    (query_id, neighbor_id) with the tiny side broadcast by AQE; nothing
    here touches vectors, so the eval costs the two ANN runs, not a third
    pass over the corpus."""
    t = truth.filter(F.col("rank") <= F.lit(k)).select("query_id", "neighbor_id")
    a = approx.filter(F.col("rank") <= F.lit(k)).select("query_id", "neighbor_id")
    hits = (
        t.join(a, ["query_id", "neighbor_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per_q = t.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        per_q.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_truth")
            ).alias("recall"),
        )
    )


def ann_recall_summary(truth: DataFrame, approx: DataFrame, k: int = 10) -> DataFrame:
    """One-row corpus roll-up of :func:`ann_recall`: (n_queries,
    mean_recall, min_recall, n_perfect). mean is micro-averaged over
    queries (each query weighs 1 regardless of its truth size — the
    faiss-recall convention)."""
    r = ann_recall(truth, approx, k)
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.avg("recall").alias("mean_recall"),
        F.min("recall").alias("min_recall"),
        F.sum((F.col("recall") >= 1.0).cast("bigint")).alias("n_perfect"),
    )
