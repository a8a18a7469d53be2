"""Text analysis for training-data pipelines: token counting, quality
scoring, language identification (marker-word + CJK heuristic), document
fingerprinting. All JVM-side (regex + higher-order functions, no Python
UDFs), all emitted in both Spark and DuckDB dialects so the oracle
reproduces every score exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iodf_spark.functions import texthash as TH
from iodf_spark.session import fan_out

# whitespace is excluded via the shared LITERAL char set (texthash.WS_CHARS)
# — a bare \s here would make \x0B count as punctuation in DuckDB (RE2)
# but not in Spark (Java), shifting punct_ratio/quality_score per dialect
BPE_RE = f"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{TH.WS_CHARS}]"
PUNCT_RE = f"[^A-Za-z0-9{TH.WS_CHARS}]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "para", "en", "que"],
}
LANGS = ["de", "en", "es", "fr"]  # deterministic priority order for argmax ties


def _arr_lit(words: list[str], dialect: str) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"array({inner})" if dialect == "spark" else f"[{inner}]"


def _lang_score(toks: str, lang: str, dialect: str) -> str:
    """# distinct marker words of `lang` present in the token array."""
    lit = _arr_lit(STOPWORDS[lang], dialect)
    if dialect == "spark":
        return f"size(array_intersect({toks}, {lit}))"
    return f"len(list_intersect({toks}, {lit}))"


def _exprs(text: str, dialect: str) -> dict[str, str]:
    """All text metrics as dialect SQL over a token-array expr `_tok` and the
    raw text column. Keys = output column names."""
    sp = dialect == "spark"
    n_tokens = f"size(_tok)" if sp else "len(_tok)"
    cps = TH.codepoints(text, dialect)
    # Spark SQL string literals process backslash escapes; DuckDB's don't
    bpe_re = BPE_RE.replace("\\", "\\\\") if sp else BPE_RE
    punct_re = PUNCT_RE.replace("\\", "\\\\") if sp else PUNCT_RE
    if sp:
        n_bpe = f"size(regexp_extract_all({text}, '{bpe_re}', 0))"
        n_punct = f"size(regexp_extract_all({text}, '{punct_re}', 0))"
        cjk = f"size(filter({cps}, _c -> _c >= 19968 and _c <= 40959))"
    else:
        n_bpe = f"len(regexp_extract_all({text}, '{bpe_re}'))"
        n_punct = f"len(regexp_extract_all({text}, '{punct_re}'))"
        cjk = f"len(list_filter({cps}, _c -> _c >= 19968 and _c <= 40959))"
    n_chars = f"length({text})"
    punct_ratio = f"({n_punct} * 1e0 / greatest({n_chars}, 1))"
    scores = {lang: _lang_score("_tok", lang, dialect) for lang in LANGS}
    stop_hits = "(" + " + ".join(scores.values()) + ")"
    stop_ratio = f"({stop_hits} * 1e0 / greatest({n_tokens}, 1))"
    quality = (
        f"({stop_ratio} * 4e-1 + (1e0 - {punct_ratio}) * 3e-1 "
        f"+ least({n_tokens}, 100) * 3e-3)"
    )
    # deterministic argmax cascade: CJK presence wins outright; otherwise the
    # first language (in LANGS order) whose score is >= 1 and >= every later
    # language's score — identical formula text in both dialects
    case = f"case when {cjk} > 0 then 'zh' "
    for i, lang in enumerate(LANGS):
        conds = [f"{scores[lang]} >= 1"] + [
            f"{scores[lang]} >= {scores[other]}" for other in LANGS[i + 1 :]
        ]
        case += f"when {' and '.join(conds)} then '{lang}' "
    case += "else 'unknown' end"
    # Shannon entropy over codepoints (gibberish/low-diversity detector):
    # fold over the SORTED distinct codepoints so the float accumulation
    # order is identical in both engines (list_distinct order is arbitrary
    # in DuckDB); O(distinct x len) per row, all codegen.
    if sp:
        ent = (
            f"case when size({cps}) = 0 then cast(0 as double) else "
            f"aggregate(transform(array_sort(array_distinct({cps})), "
            f"_c -> size(filter({cps}, _x -> _x = _c))), cast(0 as double), "
            f"(_a, _k) -> _a - (_k / cast(size({cps}) as double)) "
            f"* log2(_k / cast(size({cps}) as double))) end"
        )
    else:
        ent = (
            f"case when len({cps}) = 0 then 0e0 else "
            f"list_reduce(list_prepend(0e0, list_transform("
            f"list_sort(list_distinct({cps})), "
            f"_c -> len(list_filter({cps}, _x -> _x = _c)))), "
            f"(_a, _k) -> _a - (_k / len({cps})::DOUBLE) "
            f"* log2(_k / len({cps})::DOUBLE)) end"
        )
    return {
        "n_tokens": f"{n_tokens}",
        "n_bpe_pieces": f"{n_bpe}",
        "n_chars": f"{n_chars}",
        "punct_ratio": f"round({punct_ratio}, 6)",
        "stopword_ratio": f"round({stop_ratio}, 6)",
        "quality_score": f"round({quality}, 6)",
        "char_entropy": f"round({ent}, 6)",
        "lang_pred": case,
        "fingerprint": TH.fold_hash(
            TH.codepoints(f"trim(regexp_replace(lower({text}), '{TH.WS_CLASS}+', ' '))"
                          if sp else f"trim(regexp_replace(lower({text}), '{TH.WS_CLASS}+', ' ', 'g'))",
                          dialect),
            dialect,
        ),
    }


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document metrics: token/BPE-piece/char counts, punctuation and
    stopword ratios, composite quality score, predicted language,
    64-bit-range fingerprint of the normalized text."""
    exprs = _exprs(text_col, "spark")
    # fan_out ahead of the metric battery: the tokenizer + regex exprs are
    # one narrow pass, and on single-split local inputs they'd run on one
    # core until the final sort's shuffle (no-op on split inputs)
    toks = fan_out(df.select(F.col(id_col), F.col(text_col))).withColumn(
        "_tok", F.expr(TH.tokens(text_col, "spark"))
    )
    return toks.select(
        F.col(id_col), *[F.expr(v).alias(k) for k, v in exprs.items()]
    ).orderBy(id_col)


def text_stats_oracle(id_col: str, text_col: str, table: str) -> str:
    exprs = _exprs(text_col, "duckdb")
    cols = ", ".join(f"{v} AS {k}" for k, v in exprs.items())
    return f"""
        SELECT {id_col}, {cols}
        FROM (SELECT {id_col}, {text_col}, {TH.tokens(text_col, 'duckdb')} AS _tok
              FROM {table})
        ORDER BY {id_col}
    """


# --------------------------------------------------------------------------
# Quality gate: the filter a training pipeline actually applies


QF_MIN_QUALITY = "25e-2"
QF_MIN_TOKENS = 5
QF_MAX_PUNCT = "2e-1"


def _keep_expr() -> str:
    """Shared verdict formula over the (rounded) text_stats columns —
    identical literal text in both dialects so the gate is oracle-exact."""
    return (
        f"(quality_score >= {QF_MIN_QUALITY} AND n_tokens >= {QF_MIN_TOKENS} "
        f"AND punct_ratio <= {QF_MAX_PUNCT})"
    )


def quality_filter(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality verdict: composite score, token floor and
    punctuation ceiling (the standard pre-training heuristics) — returns
    every document with its metrics and a keep flag, so the caller can
    drop, sample, or audit the rejects. Pure column algebra over
    text_stats: one narrow pass, no shuffle."""
    stats = text_stats(df, id_col, text_col)
    return stats.select(
        id_col,
        "n_tokens",
        "punct_ratio",
        "quality_score",
        "lang_pred",
        F.expr(_keep_expr()).alias("keep"),
    )


def quality_filter_oracle(id_col: str, text_col: str, table: str) -> str:
    return f"""
        SELECT {id_col}, n_tokens, punct_ratio, quality_score, lang_pred,
               {_keep_expr()} AS keep
        FROM ({text_stats_oracle(id_col, text_col, table)})
        ORDER BY {id_col}
    """


def token_surprisal(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 1000
) -> DataFrame:
    """Unigram-LM surprisal per document: mean -log2 p(token) under the
    corpus's OWN top-V unigram distribution, add-1 smoothed, OOV tokens at
    the unseen-mass floor — the cheap stand-in for LM-perplexity quality
    filtering (CCNet-style: fluent text scores low, gibberish and
    boilerplate-of-rare-symbols score high). Deterministic vocabulary:
    top-V tokens by (count DESC, token ASC).

    Scale: vocab = one map-side-combined token groupBy + an ordered LIMIT
    (TakeOrdered — V rows to the driver, never the full vocab); scoring =
    explode + BROADCAST vocab join + per-doc avg. p = (c+1)/(T+V+1) with T
    = total corpus tokens, so probabilities are exact rationals and the
    only float steps are log2 + the mean (rounded to 6, the engine's
    float-agg comparison grain). Docs with no tokens get NULL."""
    tok = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.expr(TH.tokens(text_col, "spark"))).alias("_t"),
    )
    total = tok.count()
    vocab = (
        tok.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("_t").asc())
        .limit(vocab_size)
    )
    denom = float(total + vocab_size + 1)
    scored = tok.join(F.broadcast(vocab), "_t", "left").withColumn(
        "_sp", -F.log2((F.coalesce(F.col("_c"), F.lit(0)) + 1) / F.lit(denom))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.avg("_sp"), 6).alias("surprisal")
    )
    return df.select(id_col).join(per_doc, id_col, "left")


def token_surprisal_oracle(
    id_col: str, text_col: str, table: str, vocab_size: int = 1000
) -> str:
    t = TH.tokens(text_col, "duckdb")
    return f"""
        WITH _tok AS (
          SELECT {id_col} AS _id, unnest({t}) AS _t FROM {table}
        ),
        _tot AS (SELECT count(*)::BIGINT AS _T FROM _tok),
        _voc AS (
          SELECT _t, count(*)::BIGINT AS _c FROM _tok
          GROUP BY _t ORDER BY count(*) DESC, _t ASC LIMIT {vocab_size}
        ),
        _sc AS (
          SELECT k._id,
                 -log2((coalesce(v._c, 0) + 1)
                       / (_tot._T + {vocab_size} + 1)::DOUBLE) AS _sp
          FROM _tok k LEFT JOIN _voc v USING (_t), _tot
        )
        SELECT d.{id_col}, s.surprisal
        FROM {table} d
        LEFT JOIN (SELECT _id, round(avg(_sp), 6) AS surprisal
                   FROM _sc GROUP BY _id) s ON s._id = d.{id_col}
    """


# --------------------------------------------------------------------------
# Repetition signals (Gopher/C4-style): repeated content is the strongest
# single indicator of low-quality training text


REP_MAX_TOP_TOKEN = "2e-1"   # most frequent token may cover <= 20% of tokens
REP_MAX_DUP_BIGRAM = "6e-1"  # <= 60% of bigram occurrences may be repeats


def _rep_exprs(dialect: str) -> dict[str, str]:
    """Repetition metrics over a token array ``_tok`` and a NON-distinct
    bigram-hash array ``_bg`` (order-preserving, one entry per occurrence).
    Counting runs inside array lambdas — O(tokens * distinct) per document,
    all codegen, no explode and no shuffle: at 100 TB this is a pure narrow
    map over the corpus."""
    sp = dialect == "spark"
    nt = "size(_tok)" if sp else "len(_tok)"
    nb = "size(_bg)" if sp else "len(_bg)"
    if sp:
        top_tok = (
            "array_max(transform(array_distinct(_tok), "
            "_d -> size(filter(_tok, _x -> _x = _d))))"
        )
        top_bg = (
            "array_max(transform(array_distinct(_bg), "
            "_d -> size(filter(_bg, _x -> _x = _d))))"
        )
        nb_distinct = "size(array_distinct(_bg))"
    else:
        top_tok = (
            "list_max(list_transform(list_distinct(_tok), "
            "_d -> len(list_filter(_tok, _x -> _x = _d))))"
        )
        top_bg = (
            "list_max(list_transform(list_distinct(_bg), "
            "_d -> len(list_filter(_bg, _x -> _x = _d))))"
        )
        nb_distinct = "len(list_distinct(_bg))"
    top_token_frac = f"(coalesce({top_tok}, 0) * 1e0 / greatest({nt}, 1))"
    top_bigram_frac = f"(coalesce({top_bg}, 0) * 1e0 / greatest({nb}, 1))"
    dup_bigram_frac = f"((({nb}) - {nb_distinct}) * 1e0 / greatest({nb}, 1))"
    verdict = (
        f"({top_token_frac} <= {REP_MAX_TOP_TOKEN} "
        f"AND {dup_bigram_frac} <= {REP_MAX_DUP_BIGRAM})"
    )
    return {
        "n_tokens": f"cast({nt} as bigint)",
        "n_bigrams": f"cast({nb} as bigint)",
        "top_token_frac": f"round({top_token_frac}, 6)",
        "dup_bigram_frac": f"round({dup_bigram_frac}, 6)",
        "top_bigram_frac": f"round({top_bigram_frac}, 6)",
        "keep": verdict,
    }


def text_repetition(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition gate: top-token fraction (Gopher's
    most-common-word share) and duplicate/top bigram fractions (Gopher's
    duplicate-n-gram family), with a keep verdict at the module thresholds.
    Bigrams are hashes of adjacent token pairs — multiplicity preserved —
    via the shared texthash formulas, so the oracle is exact."""
    exprs = _rep_exprs("spark")
    prepped = fan_out(df.select(F.col(id_col), F.col(text_col))).withColumn(
        "_tok", F.expr(TH.tokens(text_col, "spark"))
    ).withColumn(
        "_th", F.expr(TH.token_hashes(text_col, "spark"))
    ).withColumn(
        "_bg", F.expr(TH.shingle_hashes("_th", "spark", n=2, distinct=False))
    )
    return prepped.select(
        F.col(id_col), *[F.expr(v).alias(k) for k, v in exprs.items()]
    ).orderBy(id_col)


def text_repetition_oracle(id_col: str, text_col: str, table: str) -> str:
    exprs = _rep_exprs("duckdb")
    cols = ", ".join(f"{v} AS {k}" for k, v in exprs.items())
    return f"""
        SELECT {id_col}, {cols}
        FROM (SELECT {id_col}, _tok,
                     {TH.shingle_hashes('_th', 'duckdb', n=2, distinct=False)} AS _bg
              FROM (SELECT {id_col},
                           {TH.tokens(text_col, 'duckdb')} AS _tok,
                           {TH.token_hashes(text_col, 'duckdb')} AS _th
                    FROM {table}))
        ORDER BY {id_col}
    """


def vocab_topk(df: DataFrame, id_col: str, text_col: str, k: int = 50) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by term frequency, with
    document frequency — explode + ONE groupBy (map-side partial combine,
    so the shuffle carries per-partition token counts, not raw tokens) +
    TakeOrdered for the limit. Deterministic total order (tf desc, token)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.expr(TH.tokens(text_col, "spark"))).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "token")
        .limit(k)
    )


def vocab_topk_oracle(id_col: str, text_col: str, table: str, k: int = 50) -> str:
    return f"""
        SELECT token, count(*)::BIGINT AS tf, count(DISTINCT _id)::BIGINT AS df
        FROM (SELECT {id_col} AS _id,
                     unnest({TH.tokens(text_col, 'duckdb')}) AS token
              FROM {table})
        GROUP BY token ORDER BY tf DESC, token LIMIT {k}
    """


# --------------------------------------------------------------------------
# PII detection: the scrubbing pre-pass every training pipeline runs before
# text ships. Counts only (redaction = regexp_replace with the same
# patterns); patterns are chosen to behave identically under Java's
# backtracking engine (Spark) and RE2 (DuckDB): no alternations with
# ambiguous match extents, no lookaround, greedy quantifiers whose longest
# feasible match is unique.

PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PII_IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE_RE = "\\+[0-9][0-9 ()\\-]{5,13}[0-9]"


def _pii_count(text: str, pat: str, dialect: str) -> str:
    # Spark SQL string literals process backslash escapes; DuckDB's don't
    if dialect == "spark":
        return f"size(regexp_extract_all({text}, '{pat.replace(chr(92), chr(92) * 2)}', 0))"
    return f"len(regexp_extract_all({text}, '{pat}'))"


def _pii_exprs(text: str, dialect: str) -> dict[str, str]:
    n_email = _pii_count(text, PII_EMAIL_RE, dialect)
    n_ipv4 = _pii_count(text, PII_IPV4_RE, dialect)
    n_phone = _pii_count(text, PII_PHONE_RE, dialect)
    return {
        "n_emails": f"cast({n_email} as bigint)",
        "n_phones": f"cast({n_phone} as bigint)",
        "n_ipv4": f"cast({n_ipv4} as bigint)",
        "pii_clean": f"({n_email} = 0 AND {n_phone} = 0 AND {n_ipv4} = 0)",
    }


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII hit counts (emails / phone numbers / IPv4
    addresses) and a clean verdict — a narrow regex map, pushdown- and
    codegen-friendly; fanned out first so the (expensive) regex battery
    uses every core on single-split local inputs (no-op otherwise)."""
    exprs = _pii_exprs(text_col, "spark")
    return fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), *[F.expr(v).alias(k) for k, v in exprs.items()]
    )


def pii_scan_oracle(id_col: str, text_col: str, table: str) -> str:
    exprs = _pii_exprs(text_col, "duckdb")
    cols = ", ".join(f"{v} AS {k}" for k, v in exprs.items())
    return f"SELECT {id_col}, {cols} FROM {table}"
