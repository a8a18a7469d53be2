"""Training-sequence packing: place documents into fixed-length token
sequences (the standard concat-and-chop pre-training scheme — concatenate
docs in a deterministic order, chop every ``seq_len`` tokens, let documents
straddle sequence boundaries).

Distributed shape: packing is inherently sequential (each doc's placement
depends on the running token total before it), so a single global order
would serialize the corpus through one task. Instead docs are packed WITHIN
hash shards — shard = doc_id % n_shards — which is exactly how a
multi-worker data loader consumes training data anyway (each worker owns a
shard of sequences). The plan is one shuffle to shard partitions + a
per-shard window running sum; every stage is parallel at any corpus size,
and the only determinism requirement (stable doc order within a shard) is
satisfied by ordering on the id.

Everything is arithmetic over token counts (no text movement: the shuffle
carries one long per doc), and the formulas are shared verbatim with the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iodf_spark.functions import texthash as TH


def sequence_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Per-document placement in the packed token stream of its shard:

    * ``shard``       — id % n_shards (oracle-reproducible, uniform for
                        dense ids; swap for a hash at ragged id spaces)
    * ``n_tokens``    — whitespace token count (stand-in for a tokenizer)
    * ``start_seq``   / ``start_off`` — sequence index and offset where the
                        doc begins (seq index is shard-local)
    * ``end_seq``     — sequence index where the doc's last token lands
                        (> start_seq means the doc straddles a chop point)
    """
    toks = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.expr(f"size({TH.tokens(text_col, 'spark')})").cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = toks.withColumn(
        "_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    return placed.select(
        id_col,
        "shard",
        "n_tokens",
        (F.col("_start") / seq_len).cast("long").alias("start_seq"),
        (F.col("_start") % seq_len).alias("start_off"),
        (
            (F.col("_start") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / seq_len
        ).cast("long").alias("end_seq"),
    ).orderBy(id_col)


def sequence_pack_oracle(
    id_col: str, text_col: str, table: str, seq_len: int = 512, n_shards: int = 8
) -> str:
    return f"""
        WITH toks AS (
          SELECT {id_col}, ({id_col} % {n_shards})::BIGINT AS shard,
                 len({TH.tokens(text_col, 'duckdb')})::BIGINT AS n_tokens
          FROM {table}),
        placed AS (
          SELECT *, coalesce(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                 AS _start
          FROM toks)
        SELECT {id_col}, shard, n_tokens,
               (_start // {seq_len})::BIGINT AS start_seq,
               (_start % {seq_len})::BIGINT AS start_off,
               ((_start + greatest(n_tokens, 1) - 1) // {seq_len})::BIGINT AS end_seq
        FROM placed ORDER BY {id_col}
    """
