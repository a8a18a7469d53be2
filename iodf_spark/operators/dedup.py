"""Deduplication operators for large-scale training-data pipelines: exact,
n-gram Jaccard (exact all-pairs via shared-shingle join), MinHash+LSH,
SimHash. Embedding-cosine near-dup lives in operators/similarity.py.

All hash computations come from iodf_spark.functions.texthash, which emits
the identical formulas in Spark SQL and DuckDB dialects — so the DuckDB
oracle reproduces LSH banding EXACTLY (no probabilistic mismatch between
engine and oracle; LSH recall affects quality, not correctness).

Scale design (100 TB):
* exact dedup groups by a 256-bit content hash, never shuffling full text;
* Jaccard candidates come from the inverted shared-shingle join (only docs
  sharing a shingle meet — no all-pairs product). Hot shingles (stopword
  n-grams) are the skew risk: cap/document-frequency-filter them upstream
  if needed; AQE skew-join splits the stragglers.
* MinHash/LSH: signature + banding reduces candidate pairs to near-linear;
  band join keys are (band_id, band_hash) — well-distributed by design.
* verification joins are pair-keyed; everything stays JVM-side
  (higher-order functions, no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iodf_spark.functions import texthash as TH

DEFAULT_NUM_HASHES = 16
DEFAULT_BAND_ROWS = 4


# --------------------------------------------------------------------------
# exact


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: (keeper_id, dup_count).
    keeper = min id per group. Group key is sha2-256 of the text, so the
    shuffle carries 32 bytes/row, not documents."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("_h"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keeper_id", "dup_count")
    )


def exact_dedup_oracle(id_col: str, text_col: str, table: str) -> str:
    return f"""
        SELECT min({id_col}) AS keeper_id, count(*)::BIGINT AS dup_count
        FROM {table} GROUP BY {text_col}
    """


# --------------------------------------------------------------------------
# n-gram Jaccard (exact)


def _with_shingles(df: DataFrame, text_col: str, n: int) -> DataFrame:
    return (
        df.withColumn("_th", F.expr(TH.token_hashes(text_col, "spark")))
        .withColumn("_sh", F.expr(TH.shingle_hashes("_th", "spark", n)))
        .withColumn("_sz", F.size("_sh"))
        .filter(F.col("_sz") > 0)
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """EXACT n-gram-Jaccard near-duplicate pairs >= threshold.
    Candidates via the inverted shared-shingle join (a pair with Jaccard > 0
    must share a shingle), common counts by pair, closed-form Jaccard."""
    sh = _with_shingles(df, text_col, n).select(
        F.col(id_col).alias("_id"), "_sz", F.explode("_sh").alias("_s")
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("_common"),
            F.any_value(F.col("a._sz")).alias("_sza"),
            F.any_value(F.col("b._sz")).alias("_szb"),
        )
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_sza") + F.col("_szb") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def jaccard_pairs_oracle(
    id_col: str, text_col: str, table: str, n: int = 3, threshold: float = 0.8
) -> str:
    th = TH.token_hashes(text_col, "duckdb")
    sh = TH.shingle_hashes("_th", "duckdb", n)
    return f"""
        WITH hashed AS (
          SELECT {id_col} AS _id, {sh} AS _sh
          FROM (SELECT {id_col}, {th} AS _th FROM {table})),
        sized AS (SELECT _id, _sh, len(_sh) AS _sz FROM hashed WHERE len(_sh) > 0),
        ex AS (SELECT _id, _sz, unnest(_sh) AS _s FROM sized),
        pairs AS (
          SELECT a._id AS doc_a, b._id AS doc_b, count(*) AS _common,
                 any_value(a._sz) AS _sza, any_value(b._sz) AS _szb
          FROM ex a JOIN ex b ON a._s = b._s AND a._id < b._id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(_common * 1e0 / (_sza + _szb - _common), 6) AS jaccard
        FROM pairs WHERE _common * 1e0 / (_sza + _szb - _common) >= {threshold}
    """


# --------------------------------------------------------------------------
# MinHash + LSH


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding, then EXACT
    Jaccard verification of the candidates (so output = candidates that
    truly clear the threshold; banding only bounds recall)."""
    sh = _with_shingles(df, text_col, n)
    sig_cols = [
        F.expr(TH.minhash_sig("_sh", "spark", i)).alias(f"_sig{i}") for i in range(num_hashes)
    ]
    sigs = sh.select(F.col(id_col).alias("_id"), "_sh", *sig_cols)
    n_bands = num_hashes // band_rows
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(
                TH.band_hash([f"_sig{b * band_rows + r}" for r in range(band_rows)], "spark")
            ).alias("key"),
        )
        for b in range(n_bands)
    ]
    banded = sigs.select(
        "_id", "_sh", F.explode(F.array(*band_structs)).alias("bk")
    ).select("_id", "_sh", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a._sh").alias("_sha"),
            F.col("b._sh").alias("_shb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cands.withColumn(
        "jaccard",
        F.size(F.array_intersect("_sha", "_shb"))
        / (F.size("_sha") + F.size("_shb") - F.size(F.array_intersect("_sha", "_shb"))),
    ).filter(F.col("jaccard") >= threshold)
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def minhash_lsh_pairs_oracle(
    id_col: str,
    text_col: str,
    table: str,
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    threshold: float = 0.8,
) -> str:
    th = TH.token_hashes(text_col, "duckdb")
    sh = TH.shingle_hashes("_th", "duckdb", n)
    sig_sel = ", ".join(
        f"{TH.minhash_sig('_sh', 'duckdb', i)} AS _sig{i}" for i in range(num_hashes)
    )
    n_bands = num_hashes // band_rows
    band_arms = " UNION ALL ".join(
        f"SELECT _id, _sh, {b} AS band, "
        + TH.band_hash([f"_sig{b * band_rows + r}" for r in range(band_rows)], "duckdb")
        + " AS key FROM sigs"
        for b in range(n_bands)
    )
    return f"""
        WITH hashed AS (
          SELECT {id_col} AS _id, {sh} AS _sh
          FROM (SELECT {id_col}, {th} AS _th FROM {table})),
        sized AS (SELECT _id, _sh FROM hashed WHERE len(_sh) > 0),
        sigs AS (SELECT _id, _sh, {sig_sel} FROM sized),
        banded AS ({band_arms}),
        cands AS (
          SELECT DISTINCT a._id AS doc_a, b._id AS doc_b,
                 any_value(a._sh) AS _sha, any_value(b._sh) AS _shb
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key AND a._id < b._id
          GROUP BY a._id, b._id),
        verified AS (
          SELECT doc_a, doc_b,
                 len(list_intersect(_sha, _shb)) * 1e0
                   / (len(_sha) + len(_shb) - len(list_intersect(_sha, _shb))) AS jaccard
          FROM cands)
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
        FROM verified WHERE jaccard >= {threshold}
    """


# --------------------------------------------------------------------------
# SimHash


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by 32-bit SimHash: candidates share at least one of
    the 4 bytes (pigeonhole guarantees recall for hamming <= 3), verified
    by exact hamming distance."""
    hashed = (
        df.withColumn("_th", F.expr(TH.token_hashes(text_col, "spark")))
        .filter(F.size("_th") > 0)
        .withColumn("_sh32", F.expr(TH.simhash32(text_col, "spark", src="_th")))
        .select(F.col(id_col).alias("_id"), "_sh32")
    )
    bands = hashed.select(
        "_id",
        "_sh32",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(_sh32, {8 * b}) & 255").alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sh32", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.expr(TH.hamming32("a._sh32", "b._sh32", "spark")).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


def simhash_pairs_oracle(
    id_col: str, text_col: str, table: str, max_hamming: int = 3
) -> str:
    th = TH.token_hashes(text_col, "duckdb")
    sh32 = TH.simhash32(text_col, "duckdb", src="_th")
    band_arms = " UNION ALL ".join(
        f"SELECT _id, _sh32, {b} AS band, (_sh32 >> {8 * b}) & 255 AS key FROM hashed"
        for b in range(4)
    )
    return f"""
        WITH toks AS (
          SELECT {id_col} AS _id, {th} AS _th FROM {table}),
        hashed AS (
          SELECT _id, {sh32} AS _sh32 FROM toks WHERE len(_th) > 0),
        banded AS ({band_arms}),
        pairs AS (
          SELECT DISTINCT a._id AS doc_a, b._id AS doc_b,
                 {TH.hamming32('any_value(a._sh32)', 'any_value(b._sh32)', 'duckdb')} AS hamming
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key AND a._id < b._id
          GROUP BY a._id, b._id)
        SELECT doc_a, doc_b, hamming::INT AS hamming
        FROM pairs WHERE hamming <= {max_hamming}
    """
