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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iodf_spark.functions.texthash import MOD, MULT, SEED


def _dot(a: str, b: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (_x, _y) -> cast(_x as double) * cast(_y as double)), "
            f"cast(0 as double), (_acc, _v) -> _acc + _v)"
        )
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"_i -> {a}[_i]::DOUBLE * {b}[_i]::DOUBLE))"
    )


def cosine_expr(a: str, b: str, dialect: str) -> str:
    return (
        f"({_dot(a, b, dialect)}) / "
        f"(sqrt({_dot(a, a, dialect)}) * sqrt({_dot(b, b, dialect)}))"
    )


def _plane_component(j: int, d: str, dialect: str) -> str:
    """Deterministic ±1 hyperplane component for plane j, dimension d:
    parity of the integer polynomial hash of (j, d)."""
    h = f"((({SEED} * {MULT} + {j}) % {MOD}) * {MULT} + {d}) % {MOD}"
    return f"(2 * (({h}) % 2) - 1)"


def lsh_bucket_expr(vec: str, n_planes: int, dialect: str) -> str:
    """Bucket id in [0, 2^n_planes): bit j = sign of <vec, plane_j>."""
    bits = []
    for j in range(n_planes):
        if dialect == "spark":
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


# --------------------------------------------------------------------------
# operators


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.45
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs with cosine >= threshold.
    O(N^2) — the exact baseline; use lsh buckets as the pre-filter at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.expr(cosine_expr("_va", "_vb", "spark")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def cosine_pairs_oracle(
    id_col: str, vec_col: str, table: str, threshold: float = 0.45
) -> str:
    cos = cosine_expr(f"a.{vec_col}", f"b.{vec_col}", "duckdb")
    return f"""
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, round({cos}, 6) AS cos
        FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
        WHERE ({cos}) >= {threshold}
    """


def ann_brute_force(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query vector (queries drawn from the corpus by
    id). Query side is broadcast; ranking is a per-query window top-k with
    deterministic tie-break."""
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(cosine_expr("_qv", "_cv", "spark")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


def ann_brute_force_oracle(
    id_col: str, vec_col: str, table: str, query_ids: list[int], k: int = 10
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = cosine_expr("q._qv", "c._cv", "duckdb")
    return f"""
        WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS _qv FROM {table}
                   WHERE {id_col} IN ({ids})),
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
) -> DataFrame:
    """IVF-style ANN: the corpus is partitioned into inverted lists by
    nearest centroid; queries probe only the `n_probe` nearest lists.
    Centroids are deterministic (the vectors with id < n_centroids — a
    fixed 'training sample'), so assignment and results are
    oracle-checkable. Scale path: centroids are tiny and broadcast both
    times; the corpus is scanned once to assign cells (narrow after the
    broadcast join) and candidate generation touches only probed cells —
    at 100 TB the assigned corpus is written partitioned by cell so probes
    prune to n_probe/n_centroids of the data."""
    cent = df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("_ce")
    )
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    wa = Window.partitionBy("neighbor_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    assigned = (
        corpus.crossJoin(F.broadcast(cent))
        .withColumn("ccos", F.expr(cosine_expr("_cv", "_ce", "spark")))
        .withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") == 1)
        .select("cid", "neighbor_id", "_cv")
    )
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    qcells = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("ccos", F.expr(cosine_expr("_qv", "_ce", "spark")))
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("cid", "query_id", "_qv")
    )
    scored = (
        F.broadcast(qcells)
        .join(assigned, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(cosine_expr("_qv", "_cv", "spark")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
        .orderBy("query_id", "rank")
    )


def ann_ivf_oracle(
    id_col: str,
    vec_col: str,
    table: str,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int = 2,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    acos = cosine_expr("c._cv", "ct._ce", "duckdb")
    qccos = cosine_expr("q._qv", "ct._ce", "duckdb")
    cos = cosine_expr("qc._qv", "a._cv", "duckdb")
    return f"""
        WITH cent AS (SELECT {id_col} AS cid, {vec_col} AS _ce FROM {table}
                      WHERE {id_col} < {n_centroids}),
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
) -> DataFrame:
    """LSH-bucketed ANN: both sides keyed by sign-projection bucket; each
    query scans only its bucket (recall < 1 by design — the scale path).
    Bucketing and scores are deterministic, so this is oracle-checkable."""
    bucket = F.expr(lsh_bucket_expr(vec_col, n_planes, "spark"))
    with_b = df.withColumn("_bkt", bucket)
    q = with_b.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "_bkt"
    )
    c = with_b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_bkt"
    )
    scored = (
        F.broadcast(q)
        .join(c, "_bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.expr(cosine_expr("_qv", "_cv", "spark")))
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
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    bkt = lsh_bucket_expr(vec_col, n_planes, "duckdb")
    cos = cosine_expr("q._qv", "c._cv", "duckdb")
    return f"""
        WITH wb AS (SELECT {id_col} AS _id, {vec_col} AS _v, {bkt} AS _bkt FROM {table}),
        q AS (SELECT _id AS query_id, _v AS _qv, _bkt FROM wb WHERE _id IN ({ids})),
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
