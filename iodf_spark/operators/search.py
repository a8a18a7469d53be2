"""Ranked text retrieval (BM25 top-k) over the inverted text index — the
query layer above the reference's text analyzers + index (IndexedDf.scala:
71-85 gives boolean row sets for one token; DfTest.scala:69-70 is the
whitespace analyzer). The reference stops at boolean probes; ranked
retrieval is the natural engine capability on top, and a training-data
pipeline uses it for corpus curation (query-relevant subset extraction).

Spark-first plan (no Python in the hot path, no driver-side data):

* **document frequency** per query term comes from the INDEX key stats
  (sum of per-bucket ``f`` — a near-point read under col_name partition
  pruning), folded to one broadcast row via conditional aggregation.
* **candidates** come from the index too: the OR of the per-term posting
  sets (PostingSet bucket-local kernels) — only docs containing at least
  one query term are scanned, the BM25 score of every other doc is 0 by
  construction.
* **tf / length** are per-row array expressions over the tokenized text
  (``size(filter(tokens, t -> t = term))``) — codegen'd, no explode, no
  shuffle; corpus stats (N, total token count) are one tiny aggregation
  cross-joined as a broadcast row.
* **top-k** is ``ORDER BY score DESC, row_id LIMIT k`` =
  TakeOrderedAndProject.

Cross-engine determinism: the classic ln() idf is NOT bit-stable across
engines (Java Math.log admits 1-ulp error vs a correctly-rounded libm), so
scores use the *rational* idf variant ``(N - df + 0.5) / (df + 0.5)`` —
monotone in df like the ln form, but built purely from IEEE +,-,*,/ whose
results are fully determined, so Spark and the DuckDB oracle agree on every
bit. All numeric literals are written in ``25e-2`` style (a bare ``0.25``
parses as DECIMAL in both dialects) and the whole score expression is
emitted for both dialects from one builder with one parenthesization, so
evaluation order is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iodf_spark.functions import texthash as TH

# BM25 shape parameters (k1 = 1.2, b = 0.75) as exact double literals:
# K1P1 = k1 + 1, OMB = 1 - b
K1 = "12e-1"
K1P1 = "22e-1"
B = "75e-2"
OMB = "25e-2"


def _tf(tok_arr: str, term: str, dialect: str) -> str:
    term = term.replace("'", "''")  # SQL-escape the literal, both dialects
    if dialect == "spark":
        return f"cast(size(filter({tok_arr}, _t -> _t = '{term}')) as double)"
    return f"len(list_filter({tok_arr}, _t -> _t = '{term}'))::DOUBLE"


def bm25_score_sql(tok_arr: str, terms: list[str], dialect: str) -> str:
    """The full per-document BM25 score as one scalar SQL expression.

    References columns ``_n`` (corpus doc count), ``_slen`` (corpus total
    token count) and ``_df0.._df{k}`` (per-term document frequencies) —
    provided by a broadcast stats row on the Spark side and CTEs on the
    DuckDB side, so both engines compute every intermediate from the same
    integers with the same operation order (bit-identical doubles).
    """
    sp = dialect == "spark"
    dlen = (
        f"cast(size({tok_arr}) as double)" if sp else f"len({tok_arr})::DOUBLE"
    )
    davg = "(cast(_slen as double) / _n)" if sp else "(_slen::DOUBLE / _n)"
    parts = []
    for i, term in enumerate(terms):
        tf = _tf(tok_arr, term, dialect)
        idf = f"(((_n - _df{i}) + 5e-1) / (_df{i} + 5e-1))"
        denom = f"({tf} + {K1} * ({OMB} + ({B} * {dlen}) / {davg}))"
        parts.append(f"({idf} * ({tf} * {K1P1}) / {denom})")
    return "(" + " + ".join(parts) + ")"


def bm25_topk(
    docs: DataFrame,
    index_df: DataFrame,
    text_col: str,
    terms: list[str],
    n_rows: int,
    k: int = 15,
    bucket_size: int | None = None,
) -> DataFrame:
    """Top-k documents by BM25 over ``terms``. ``docs`` must carry
    ``row_id`` in the index's row space; ``index_df`` is the text index
    built with the whitespace analyzer (same tokenizer as TH.tokens).
    Returns (row_id, score) with score > 0, ordered score DESC, row_id.

    ``bucket_size`` must match the index's build-time bucket size when it
    differs from the default — DENSE posting words decode positions as
    bucket*bucket_size + word*64 + bit, so a mismatched decode silently
    yields wrong candidate ids (sparse postings don't care, which is why
    low-df query terms mask the mistake).
    """
    from iodf_spark.operators.index import KIND_STR
    from iodf_spark.plans.rowset import DEFAULT_BUCKET_SIZE, union_posting_rows

    # per-term df from the index: one near-point agg folded to a single row
    dfs = index_df.filter(
        (F.col("col_name") == text_col) & F.col("value_str").isin(terms)
    ).agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("value_str") == t, F.col("f"))), F.lit(0)
            )
            .cast("long")
            .alias(f"_df{i}")
            for i, t in enumerate(terms)
        ]
    )
    # corpus stats: N docs, total token count (one aggregation)
    tok = TH.tokens(text_col, "spark")
    stats = docs.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.expr(f"size({tok})")).cast("long").alias("_slen"),
    )
    # candidates: dynamic-arity OR of ALL query terms' posting rows in one
    # aggregation stage (union_posting_rows) — no per-term probe chain
    term_rows = index_df.filter(
        (F.col("col_name") == text_col)
        & (F.col("value_kind") == KIND_STR)
        & F.col("value_str").isin(terms)
    )
    sel = term_rows.select(
        "bucket", "row_ids",
        *( ["words"] if "words" in index_df.columns else [] ),
    )
    if "words" not in index_df.columns:
        sel = sel.withColumn("words", F.lit(None).cast("array<long>"))
    cand_ids = union_posting_rows(
        sel, n_rows, bucket_size or DEFAULT_BUCKET_SIZE
    ).to_rows()
    scored = (
        docs.join(cand_ids, "row_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfs))
        .withColumn("_tok", F.expr(tok))
        .select(
            "row_id",
            F.expr(bm25_score_sql("_tok", terms, "spark")).alias("score"),
        )
    )
    return (
        scored.filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), "row_id")
        .limit(k)
    )


def bm25_topk_oracle(
    table: str, id_col: str, text_col: str, terms: list[str], k: int = 15
) -> str:
    """DuckDB rendition: same tokenizer, same stats integers, same score
    expression text (dialect='duckdb'), same ORDER BY/LIMIT."""
    tok = TH.tokens(text_col, "duckdb")
    df_cols = ", ".join(
        f"count(*) FILTER (WHERE list_contains(_tok, '{t.replace(chr(39), chr(39) * 2)}'))"
        f"::BIGINT AS _df{i}"
        for i, t in enumerate(terms)
    )
    score = bm25_score_sql("_tok", terms, "duckdb")
    return f"""
        WITH d AS (SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS row_id,
                          {text_col} FROM {table}),
        tok AS (SELECT row_id, {tok} AS _tok FROM d),
        stats AS (SELECT count(*)::BIGINT AS _n,
                         sum(len(_tok))::BIGINT AS _slen FROM tok),
        dfs AS (SELECT {df_cols} FROM tok),
        scored AS (SELECT row_id, {score} AS score FROM tok, stats, dfs)
        SELECT row_id, score FROM scored WHERE score > 0
        ORDER BY score DESC, row_id LIMIT {k}
    """


def phrase_hash(phrase: str, dialect: str) -> str:
    """SQL literal: the rolling k-gram hash of a k-word phrase — identical
    to the values _gram_stream/shingle_hashes emit, so a phrase probe is a
    plain integer equality against the document's gram hashes."""
    toks = [t for t in phrase.split() if t]
    if not toks:
        raise ValueError("empty phrase")
    acc = f"cast({TH.SEED} as bigint)" if dialect == "spark" else f"{TH.SEED}::BIGINT"
    for t in toks:
        # SQL-escape the token literal — a phrase like "don't stop" must
        # not produce a broken (or injectable) expression in either dialect
        lit = t.replace("'", "''")
        th = TH.text_hash(f"'{lit}'", dialect)
        acc = f"((({acc}) * {TH.MULT} + {th}) % {TH.MOD})"
    return acc


def phrase_search(
    df, id_col: str, text_col: str, phrase: str, verify: bool = True
):
    """Exact phrase search without a positional index: a k-word phrase IS
    one k-gram, so membership of its rolling hash in the document's gram
    stream finds every candidate (the same hash stream the dedup family
    computes — one shared tokenization everywhere). ``verify`` re-checks
    candidates with a whitespace-normalized substring test, eliminating
    the (MOD ~1e9) hash-collision tail — candidates are few, so the exact
    pass is near-free. Scale shape: the gram probe is the explode +
    window-lead pipeline (one shuffle on _id) with an early hash-equality
    filter; nothing quadratic, no positional posting lists to store."""
    from pyspark.sql import functions as F

    from iodf_spark.operators.dedup import _gram_stream

    k = len([t for t in phrase.split() if t])
    if k == 0:
        raise ValueError("empty phrase")
    target = phrase_hash(phrase, "spark")
    cands = (
        _gram_stream(df, id_col, text_col, k)
        .filter(F.expr(f"_s = {target}"))
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    out = df.join(cands, id_col, "left_semi")
    if verify:
        norm_text = f"concat(' ', array_join({TH.tokens(text_col, 'spark')}, ' '), ' ')"
        norm_phrase = " ".join(phrase.split())
        out = out.filter(
            F.expr(norm_text).contains(f" {norm_phrase} ")
        )
    return out


def phrase_search_oracle(
    id_col: str, text_col: str, table: str, phrase: str
) -> str:
    """DuckDB twin: same gram hashes, same normalized-substring verify."""
    k = len([t for t in phrase.split() if t])
    th = TH.token_hashes(text_col, "duckdb")
    grams = TH.shingle_hashes("_th", "duckdb", k, distinct=False)
    target = phrase_hash(phrase, "duckdb")
    norm_phrase = " ".join(phrase.split()).replace("'", "''")
    return f"""
        SELECT * EXCLUDE (_th) FROM (
          SELECT *, {th} AS _th FROM {table})
        WHERE list_contains({grams}, {target})
          AND contains(
                ' ' || array_to_string(_th_tokens, ' ') || ' ',
                ' {norm_phrase} ')
    """.replace(
        "_th_tokens", TH.tokens(text_col, "duckdb")
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 + embedding cosine, fused by reciprocal rank
#
# The modern two-tower search stack: a lexical ranked list (BM25 over the
# inverted text index) and a semantic ranked list (cosine top-k over the
# embedding column) are FUSED by reciprocal-rank: rrf(d) = sum over lists
# of 1 / (K + rank_list(d)), K = 60 (the Cormack/Clarke/Buettcher
# constant). RRF uses only the RANKS — never the incomparable raw scores —
# which is what makes the fusion robust and, here, oracle-exact: ranks are
# integers, 1/(K + r) and their two-term sum are fully-determined IEEE
# ops, and both engines evaluate the identical expression text.
#
# Scale: each list is its own already-bounded top-pool operator (BM25 =
# index-candidates + TakeOrdered; ANN = broadcast query against the
# corpus, or the IVF store for big corpora); the fusion joins two
# pool-sized frames — constant-size work regardless of corpus size.

RRF_K = 60
RRF_FMT = (
    "(coalesce(1e0 / ({k} + _rb), 0e0) + coalesce(1e0 / ({k} + _ra), 0e0))"
)


def hybrid_rrf_topk(
    docs: DataFrame,
    index_df: DataFrame,
    text_col: str,
    terms: list[str],
    emb: DataFrame,
    vec_id_col: str,
    vec_col: str,
    query_vec_id: int,
    n_rows: int,
    k: int = 15,
    pool: int = 50,
    dim: int | None = None,
    bucket_size: int | None = None,
) -> DataFrame:
    """Top-k documents by reciprocal-rank fusion of the BM25 list for
    ``terms`` and the cosine-ANN list for ``query_vec_id``'s embedding.
    ``docs.row_id`` and ``emb.{vec_id_col}`` must share the id space (the
    corpus row id). Documents appearing in only one list still score
    (missing rank contributes 0). Returns (row_id, score), score DESC,
    row_id tie-break; both pools are ``pool`` deep."""
    from pyspark.sql.window import Window

    from iodf_spark.operators.similarity import ann_brute_force

    b = bm25_topk(
        docs, index_df, text_col, terms, n_rows, k=pool, bucket_size=bucket_size
    )
    # the pool is `pool` rows — a single-task rank window over it is fine
    wb = Window.orderBy(F.col("score").desc(), "row_id")
    branks = b.select("row_id", F.row_number().over(wb).alias("_rb"))
    aranks = ann_brute_force(
        emb, vec_id_col, vec_col, [query_vec_id], k=pool, dim=dim
    ).select(F.col("neighbor_id").alias("_aid"), F.col("rank").alias("_ra"))
    fused = (
        branks.join(aranks, branks["row_id"] == aranks["_aid"], "full_outer")
        .select(
            F.coalesce(branks["row_id"], aranks["_aid"]).alias("row_id"),
            F.expr(RRF_FMT.format(k=RRF_K)).alias("_rrf"),
        )
    )
    return (
        fused.select("row_id", F.round("_rrf", 9).alias("score"))
        .orderBy(F.col("score").desc(), "row_id")
        .limit(k)
    )


def hybrid_rrf_topk_oracle(
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    emb_table: str,
    vec_id_col: str,
    vec_col: str,
    query_vec_id: int,
    k: int = 15,
    pool: int = 50,
    dim: int | None = None,
) -> str:
    from iodf_spark.operators.similarity import ann_brute_force_oracle

    rrf = RRF_FMT.format(k=RRF_K)
    return f"""
        WITH _b AS (
          SELECT row_id,
                 row_number() OVER (ORDER BY score DESC, row_id) AS _rb
          FROM ({bm25_topk_oracle(table, id_col, text_col, terms, k=pool)})),
        _a AS (
          SELECT neighbor_id AS _aid, rank AS _ra
          FROM ({ann_brute_force_oracle(
              vec_id_col, vec_col, emb_table, [query_vec_id], k=pool, dim=dim
          )})),
        _f AS (
          SELECT coalesce(_b.row_id, _a._aid) AS row_id, {rrf} AS _rrf
          FROM _b FULL OUTER JOIN _a ON _b.row_id = _a._aid)
        SELECT row_id, round(_rrf, 9) AS score FROM _f
        ORDER BY score DESC, row_id LIMIT {k}
    """
