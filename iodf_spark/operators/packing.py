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


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_toks: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking — the pre-embedding step of every
    retrieval/embedding pipeline (split long documents into chunk_toks-token
    windows striding chunk_toks - overlap, so each chunk shares `overlap`
    tokens of context with its predecessor): (doc_id, chunk_idx, start_tok,
    n_toks, chunk_text). Chunk boundaries are TOKEN boundaries (chunk_text
    re-joins its tokens by single spaces, the tokenizer convention shared
    with substring_dedup_clean); the last chunk is the remainder (>= 1
    token, possibly short); empty docs yield no chunks. Feed chunk_text to
    hash_embed/ann_* for chunk-grain retrieval.

    Scale: one narrow pass — tokenize, slice per start offset, posexplode;
    no shuffle at all (chunking is per-document), and chunk text is emitted
    exactly once, into the output that contains it by definition."""
    if chunk_toks <= 0 or overlap < 0 or overlap >= chunk_toks:
        raise ValueError(
            f"need chunk_toks > 0 and 0 <= overlap < chunk_toks, got "
            f"chunk_toks={chunk_toks} overlap={overlap}"
        )
    stride = chunk_toks - overlap
    toks = TH.tokens(text_col, "spark")
    # start offsets 0, stride, 2*stride, ... while start < n (and at least
    # one chunk for any non-empty doc); a start with < chunk_toks tokens
    # left takes the remainder
    chunks = (
        f"case when size(_toks) = 0 then cast(array() as array<struct<"
        f"start_tok: int, toks: array<string>>>) else "
        f"transform("
        f"  sequence(0, greatest(int(ceil((size(_toks) - {chunk_toks})"
        f"           / {stride}e0)), 0) * {stride}, {stride}),"
        f"  _s -> struct(int(_s) as start_tok,"
        f"               slice(_toks, _s + 1, {chunk_toks}) as toks)) end"
    )
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.expr(toks).alias("_toks"),
        )
        .select("doc_id", F.posexplode(F.expr(chunks)).alias("chunk_idx", "_c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("_c.start_tok").cast("bigint").alias("start_tok"),
            F.size("_c.toks").cast("bigint").alias("n_toks"),
            F.array_join("_c.toks", " ").alias("chunk_text"),
        )
    )


def chunk_documents_oracle(
    id_col: str,
    text_col: str,
    table: str,
    chunk_toks: int = 128,
    overlap: int = 16,
) -> str:
    stride = chunk_toks - overlap
    toks = TH.tokens(text_col, "duckdb")
    return f"""
        WITH _t AS (SELECT {id_col}::BIGINT AS doc_id, {toks} AS _toks
                    FROM {table}),
        _c AS (
          SELECT doc_id,
                 unnest(range(len(_starts))) AS chunk_idx,
                 unnest(_starts) AS start_tok,
                 _toks
          FROM (SELECT doc_id, _toks,
                       list_transform(
                         range(0, greatest(ceil((len(_toks) - {chunk_toks})
                                                / {stride}e0)::BIGINT, 0)
                                  * {stride} + 1, {stride}),
                         _s -> _s) AS _starts
                FROM _t WHERE len(_toks) > 0)
        )
        SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
               start_tok::BIGINT AS start_tok,
               len(list_slice(_toks, start_tok + 1,
                              start_tok + {chunk_toks}))::BIGINT AS n_toks,
               list_aggregate(list_slice(_toks, start_tok + 1,
                                         start_tok + {chunk_toks}),
                              'string_agg', ' ') AS chunk_text
        FROM _c
    """


# -- chunk identity: the (doc_id, chunk_idx) -> int64 radix pack -------------

#: radix of the pack: chunk_idx rides in the low digits, doc_id above it.
#: 2^63 / 1e6 ~= 9.2e12 docs x 1e6 chunks per doc covers any real corpus;
#: violations fail LOUDLY in chunk_cid_expr below.
CHUNK_CID_ENC = 1_000_000
CHUNK_CID_MAX_DOC = (1 << 63) // CHUNK_CID_ENC


def chunk_cid_expr(
    doc_col: str = "doc_id", idx_col: str = "chunk_idx",
) -> "F.Column":
    """Fused range-guarded (doc_id, chunk_idx) -> int64 chunk identity —
    injective within the radix (cid div ENC recovers doc_id, cid mod ENC
    the chunk index, which is what lets a DOCUMENT takedown resolve to
    its chunk ids with pure arithmetic). The guard is part of the value
    expression itself (when/raise_error, un-prunable): outside the radix
    the bare pack silently ALIASES two chunks onto one identity — the
    wrap class the substring-dedup keeper key guards the same way.
    Library twin of the entry's pinned _chunk_cid_expr; generative
    injectivity pin in tests/test_hypothesis_properties.py."""
    in_range = (
        (F.col(doc_col) >= 0)
        & (F.col(doc_col) < F.lit(CHUNK_CID_MAX_DOC))
        & (F.col(idx_col) >= 0)
        & (F.col(idx_col) < F.lit(CHUNK_CID_ENC))
    )
    return F.when(
        in_range,
        F.col(doc_col).cast("long") * F.lit(CHUNK_CID_ENC) + F.col(idx_col),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "chunk cid pack: (doc_id, chunk_idx) outside the radix "
                    f"(need 0 <= doc_id < {CHUNK_CID_MAX_DOC}, "
                    f"0 <= chunk_idx < {CHUNK_CID_ENC}); got doc_id="
                ),
                F.col(doc_col).cast("string"),
                F.lit(" chunk_idx="),
                F.col(idx_col).cast("string"),
            )
        ).cast("long")
    )
