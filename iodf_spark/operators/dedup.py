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
from iodf_spark.session import fan_out

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


def _gram_stream(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Positioned word-n-gram hash stream (_id, _pos, _s): one row per gram,
    _pos = index of the gram's first token, _s = its rolling hash.

    Gram hashes are built on the exploded token stream with window lead() —
    scalar whole-stage-codegen arithmetic — rather than array higher-order
    functions: Catalyst's CollapseProject inlines a token-hash-array
    expression into every lambda reference, silently recomputing the whole
    array per element access (measured 3-10x blowup). One shuffle on _id;
    values identical to the per-array fold. Shared by the shingle-set
    builders (Jaccard/MinHash) and the winnowing fingerprinter, so every
    gram-based operator hashes identically by construction.

    UNMIXED on purpose (contrast _gram_stream2): these consumers are
    set-overlap ESTIMATORS — a rare gram collision perturbs a Jaccard
    ratio by one element — while the substring family makes an exact
    per-window duplicate CLAIM with no downstream verification, so only
    it pays for texthash.mix's non-linearity."""
    from pyspark.sql.window import Window

    # fan_out before tokenization: split/posexplode/hash are narrow and
    # would otherwise run on the scan's (single, for local one-row-group
    # files) splits until the window's _id shuffle; no-op on real inputs
    base = fan_out(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    )
    tok = base.select(
        "_id",
        F.posexplode(F.expr(TH.tokens("_txt", "spark"))).alias("_pos", "_t"),
    ).withColumn("_h", F.expr(TH.text_hash("_t", "spark")))
    w = Window.partitionBy("_id").orderBy("_pos")
    acc = f"cast({TH.SEED} as bigint)"
    for j in range(n):
        acc = f"((({acc}) * {TH.MULT} + _h{j}) % {TH.MOD})"
    with_leads = tok.select(
        "_id",
        "_pos",
        F.col("_h").alias("_h0"),
        *[F.lead("_h", j).over(w).alias(f"_h{j}") for j in range(1, n)],
    )
    return (
        with_leads.filter(F.col(f"_h{n - 1}").isNotNull())
        .withColumn("_s", F.expr(acc))
        .select("_id", "_pos", "_s")
    )


def _with_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(_id, _sh: sorted distinct shingle hashes, _sz) per document."""
    return (
        _gram_stream(df, id_col, text_col, n)
        .groupBy("_id")
        .agg(F.sort_array(F.collect_set("_s")).alias("_sh"))
        .withColumn("_sz", F.size("_sh"))
        .filter(F.col("_sz") > 0)
    )


def capped_candidates(
    ex: DataFrame, key_cols: list[str], max_df: int | None
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs from an inverted posting frame
    (_id, *key_cols) — the shared candidate generator for the two
    self-join dedup detectors, with an optional HOT-KEY CAP.

    Without a cap, a key shared by m documents contributes m*(m-1)/2
    candidate pairs: one corpus-wide boilerplate shingle or LSH band
    bucket (every page sharing a site template collapses into one band
    key) turns into a single quadratic join task that no amount of
    cluster width can absorb — at 100 TB this is THE failure mode of
    posting-list self-joins. ``max_df`` switches representation per key
    (the adaptive density dispatch idea, reference utils/LBits.scala:
    107-114 — a dense posting set is a different data structure, not a
    bigger sparse one):

    * cold keys (<= max_df member docs): exact all-pairs self-join, the
      lossless path — unchanged semantics;
    * hot keys (> max_df): STAR topology — every member pairs with the
      key's min-id representative only, m-1 candidates instead of
      m*(m-1)/2. This is the standard industrial LSH-bucket shape (each
      bucket member links to one anchor; transitive clustering restores
      the group).

    Loss bound (documented, not silent): precision is UNAFFECTED — every
    emitted candidate still passes exact verification downstream. Recall
    loses only pairs (x, y) where NEITHER x nor y is the representative
    AND every key x and y share is hot — any single shared cold key
    (another band, a rarer shingle) still surfaces the pair; exact
    verification of (rep, x) and (rep, y) may then cluster them via the
    representative. Candidate output is bounded by
    sum_cold(m^2) + sum_hot(m), and the hot side's skewed dimension join
    (every posting of a hot key meets exactly one rep row) is linear and
    AQE-splittable.

    PRECONDITION: ``ex`` must be per-doc-distinct — at most ONE row per
    (_id, *key_cols) combination. The hot/cold classification counts
    posting ROWS per key (count(1)) as a proxy for member DOCS; duplicate
    (_id, key) rows would inflate the frequency and silently reclassify
    keys against this contract (the all-pairs output would still be
    correct — pairs are deduped — but the cap boundary would shift).
    Both callers satisfy this structurally: jaccard prefixes explode a
    sorted DISTINCT shingle array, and MinHash bands emit one row per
    (doc, band). A defensive dropDuplicates here would add a full
    posting-table shuffle on every call to pay for a caller bug —
    documented instead."""
    import functools
    import operator as op

    def _all_pairs(side: DataFrame) -> DataFrame:
        a, b = side.alias("a"), side.alias("b")
        same_key = functools.reduce(
            op.and_, [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
        )
        return a.join(b, same_key & (F.col("a._id") < F.col("b._id"))).select(
            F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b")
        )

    if max_df is None:
        return _all_pairs(ex).dropDuplicates(["doc_a", "doc_b"])
    dfreq = ex.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_df"))
    hot = dfreq.filter(F.col("_df") > max_df).select(*key_cols)
    cold_pairs = _all_pairs(ex.join(hot, key_cols, "left_anti"))
    hot_ex = ex.join(hot, key_cols, "left_semi")
    reps = hot_ex.groupBy(*key_cols).agg(F.min("_id").alias("_rep"))
    star = (
        hot_ex.join(reps, key_cols)
        .filter(F.col("_id") > F.col("_rep"))
        .select(F.col("_rep").alias("doc_a"), F.col("_id").alias("doc_b"))
    )
    return cold_pairs.unionByName(star).dropDuplicates(["doc_a", "doc_b"])


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram-Jaccard near-duplicate pairs >= threshold.

    Candidate generation uses PREFIX FILTERING (AllPairs/PPJoin): under a
    global total order of shingle hashes, a pair with J >= t must share a
    shingle among each side's first (sz - ceil(t*sz) + 1) sorted shingles —
    so only prefixes are exploded into the self-join, cutting candidate
    pairs by orders of magnitude on hot shingles while staying LOSSLESS
    (the exact array_intersect verification restores precision; the prefix
    lemma guarantees recall). ceil(t*sz) is computed in exact integer
    arithmetic so no float rounding can shorten a prefix.

    ``max_df`` caps a prefix shingle's posting list before the self-join
    (see :func:`capped_candidates`): corpus-wide boilerplate grams that
    survive prefix filtering switch to star topology, bounding the join
    at the cost of the documented recall loss (a pair is missed only if
    EVERY shared prefix shingle is hot and neither side is a hot key's
    representative). None = exact/lossless (the prefix lemma holds)."""
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    tn, td = frac.numerator, frac.denominator
    docs = _with_shingles(df, id_col, text_col, n).cache()
    prefix = F.expr(
        f"slice(_sh, 1, cast(_sz - (({tn} * _sz + {td - 1}) div {td}) + 1 as int))"
    )
    pref = docs.select("_id", F.explode(prefix).alias("_s"))
    cands = capped_candidates(pref, ["_s"], max_df)
    da = docs.select(
        F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha"), F.col("_sz").alias("_sza")
    )
    db = docs.select(
        F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb"), F.col("_sz").alias("_szb")
    )
    verified = (
        cands.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn("_common", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_sza") + F.col("_szb") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def jaccard_pairs_oracle(
    id_col: str,
    text_col: str,
    table: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> str:
    th = TH.token_hashes(text_col, "duckdb")
    sh = TH.shingle_hashes("_th", "duckdb", n)
    if max_df is not None:
        # capped twin: replicate candidate generation EXACTLY (prefix
        # filter + hot-key star, mirroring capped_candidates) and verify
        # by exact list intersection — same semantics, same answer
        from fractions import Fraction

        frac = Fraction(threshold).limit_denominator(1_000_000)
        tn, td = frac.numerator, frac.denominator
        return f"""
        WITH hashed AS (
          SELECT {id_col} AS _id, {sh} AS _sh
          FROM (SELECT {id_col}, {th} AS _th FROM {table})),
        sized AS (SELECT _id, _sh, len(_sh) AS _sz FROM hashed WHERE len(_sh) > 0),
        pref AS (
          SELECT _id, unnest(list_slice(
            _sh, 1, _sz - (({tn} * _sz + {td - 1}) // {td}) + 1)) AS _s
          FROM sized),
        dfreq AS (SELECT _s, count(*) AS _df FROM pref GROUP BY 1),
        hot AS (SELECT _s FROM dfreq WHERE _df > {max_df}),
        cold AS (SELECT * FROM pref WHERE _s NOT IN (SELECT _s FROM hot)),
        hotex AS (SELECT * FROM pref WHERE _s IN (SELECT _s FROM hot)),
        reps AS (SELECT _s, min(_id) AS _rep FROM hotex GROUP BY 1),
        cands AS (
          SELECT DISTINCT a._id AS doc_a, b._id AS doc_b
          FROM cold a JOIN cold b ON a._s = b._s AND a._id < b._id
          UNION
          SELECT DISTINCT r._rep AS doc_a, h._id AS doc_b
          FROM hotex h JOIN reps r ON h._s = r._s WHERE h._id > r._rep),
        verified AS (
          SELECT doc_a, doc_b,
                 len(list_intersect(sa._sh, sb._sh)) * 1e0
                   / (sa._sz + sb._sz - len(list_intersect(sa._sh, sb._sh)))
                   AS jaccard
          FROM cands
          JOIN sized sa ON sa._id = cands.doc_a
          JOIN sized sb ON sb._id = cands.doc_b)
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
        FROM verified WHERE jaccard >= {threshold}
        """
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
# Winnowing fingerprints (rolling-hash document fingerprinting)


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS algorithm): per document, the set of per-window minima over
    the rolling k-gram hash stream, window width w. Guarantee: any shared
    token run of length >= k + w - 1 contributes at least one SHARED
    fingerprint, while the stored set is ~2/(w+1) the size of the full
    shingle set — the density/guarantee trade the paper proves optimal.

    Returns (_id, _fp sorted distinct fingerprint hashes, _nfp). Documents
    with fewer than k + w - 1 tokens (< w grams, no full window) yield no
    row — the document is shorter than the guarantee length.

    Scale shape: the gram stream is the same explode + window-lead pipeline
    as the shingle builders (one shuffle on _id, all codegen'd scalar
    arithmetic); the sliding minimum is a frame-bounded window min over the
    already-partitioned stream — no second shuffle."""
    from pyspark.sql.window import Window

    g = _gram_stream(df, id_col, text_col, k)
    wspec = (
        Window.partitionBy("_id").orderBy("_pos").rowsBetween(Window.currentRow, w - 1)
    )
    sel = g.select(
        "_id",
        F.min("_s").over(wspec).alias("_m"),
        F.count("_s").over(wspec).alias("_c"),
    ).filter(F.col("_c") == w)
    return (
        sel.groupBy("_id")
        .agg(F.sort_array(F.collect_set("_m")).alias("_fp"))
        .withColumn("_nfp", F.size("_fp"))
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 4,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by winnowing-fingerprint Jaccard >= threshold: docs
    meet only through a shared fingerprint (inverted join — no all-pairs),
    then exact set overlap on the ~2/(w+1)-compressed fingerprint sets.
    Complements the exact shingle-Jaccard operator: same join topology over
    a winnowed sketch whose sharing GUARANTEES a k+w-1-token common run, so
    it surfaces contained copies (plagiarism-style overlap) that whole-set
    Jaccard scores low.

    ``max_df`` drops fingerprints appearing in more than max_df documents
    before the join — the boilerplate/stop-gram skew guard at 100 TB (a
    fingerprint shared by millions of docs would otherwise build a hot-key
    near-cartesian); precision is unaffected (verification is exact on the
    kept sets), recall loses only matches attested SOLELY by dropped
    ubiquitous grams."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w).cache()
    ex = fps.select("_id", F.explode("_fp").alias("_f"))
    if max_df is not None:
        keep = ex.groupBy("_f").agg(F.count(F.lit(1)).alias("_df")).filter(
            F.col("_df") <= max_df
        )
        ex = ex.join(keep.select("_f"), "_f")
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, (F.col("a._f") == F.col("b._f")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    da = fps.select(F.col("_id").alias("doc_a"), F.col("_nfp").alias("_na"))
    db = fps.select(F.col("_id").alias("doc_b"), F.col("_nfp").alias("_nb"))
    return (
        common.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn(
            "jaccard", F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _winnow_fp_list(text_col: str, k: int, w: int) -> str:
    """DuckDB expression: sorted distinct winnowing fingerprints of a text
    column (list-typed); [] for docs with fewer than w grams."""
    th = TH.token_hashes(text_col, "duckdb")
    grams = TH.shingle_hashes("_th", "duckdb", k, distinct=False)
    mins = (
        f"list_transform(range(greatest(len(_g) - {w - 1}, 0)), "
        f"_j -> list_min(list_slice(_g, _j + 1, _j + {w})))"
    )
    return th, grams, f"list_sort(list_distinct({mins}))"


def winnow_pairs_oracle(
    id_col: str,
    text_col: str,
    table: str,
    k: int = 4,
    w: int = 4,
    threshold: float = 0.5,
) -> str:
    th, grams, fp = _winnow_fp_list(text_col, k, w)
    return f"""
        WITH th AS (SELECT {id_col} AS _id, {th} AS _th FROM {table}),
        gr AS (SELECT _id, {grams} AS _g FROM th),
        fp AS (SELECT _id, {fp} AS _fp FROM gr),
        sized AS (SELECT _id, _fp, len(_fp) AS _n FROM fp WHERE len(_fp) > 0),
        ex AS (SELECT _id, _n, unnest(_fp) AS _f FROM sized),
        pairs AS (
          SELECT a._id AS doc_a, b._id AS doc_b, count(*) AS _common,
                 any_value(a._n) AS _na, any_value(b._n) AS _nb
          FROM ex a JOIN ex b ON a._f = b._f AND a._id < b._id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(_common * 1e0 / (_na + _nb - _common), 6) AS jaccard
        FROM pairs WHERE _common * 1e0 / (_na + _nb - _common) >= {threshold}
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
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding, then EXACT
    Jaccard verification of the candidates (so output = candidates that
    truly clear the threshold; banding only bounds recall).

    Signatures are computed by explode + groupBy-min — whole-stage-codegen
    integer aggregates (identical values to a per-row array fold: min is
    order-independent) instead of interpreted higher-order lambdas; the
    band self-join carries only ids, with shingle arrays re-joined by id
    for verification (small shuffles, no array payloads through the join).

    ``max_df`` caps a band BUCKET's size before the self-join (see
    :func:`capped_candidates`): a template shared by millions of pages
    collapses them into one (band, key) bucket, whose all-pairs join is
    quadratic in the template's popularity — with the cap, hot buckets
    link members to a representative instead (star), and a missed pair
    must have ALL of its colliding bands hot to be lost. None preserves
    the original full-bucket behavior."""
    sized = _with_shingles(df, id_col, text_col, n).select("_id", "_sh").cache()
    banded = band_signatures(sized, num_hashes, band_rows)
    cands = capped_candidates(banded, ["band", "key"], max_df)
    return verify_jaccard(cands, sized, threshold)


def band_signatures(
    sized: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
) -> DataFrame:
    """LSH band keys (_id, band, key) from shingle sets (_id, _sh).
    MinHash via explode + groupBy-min (order-independent, codegen'd);
    shared by the batch pair generator and the incremental streaming
    near-dup (streaming/ingest.py), so both paths band identically by
    construction."""
    ex = sized.select("_id", F.explode("_sh").alias("_x"))
    sig_aggs = [
        F.min((F.col("_x") * (2 * i + 3) + (5 * i + 7)) % TH.MOD).alias(f"_sig{i}")
        for i in range(num_hashes)
    ]
    sigs = ex.groupBy("_id").agg(*sig_aggs)
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
    return sigs.select("_id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "_id", "bk.band", "bk.key"
    )


def verify_jaccard(
    cands: DataFrame, sized: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs against
    shingle sets (_id, _sh): integer set intersection, no approximation —
    LSH banding bounds recall only, never precision."""
    verified = (
        cands.join(sized.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha")), "doc_a")
        .join(sized.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb")), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / (F.size("_sha") + F.size("_shb") - F.size(F.array_intersect("_sha", "_shb"))),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def minhash_lsh_pairs_oracle(
    id_col: str,
    text_col: str,
    table: str,
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    threshold: float = 0.8,
    max_df: int | None = None,
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
    if max_df is not None:
        # capped twin of capped_candidates over (band, key) buckets:
        # cold buckets all-pairs, hot buckets star to the min-id rep
        return f"""
        WITH hashed AS (
          SELECT {id_col} AS _id, {sh} AS _sh
          FROM (SELECT {id_col}, {th} AS _th FROM {table})),
        sized AS (SELECT _id, _sh, len(_sh) AS _sz FROM hashed WHERE len(_sh) > 0),
        sigs AS (SELECT _id, _sh, {sig_sel} FROM sized),
        banded AS ({band_arms}),
        bk AS (SELECT _id, band, key FROM banded),
        dfreq AS (SELECT band, key, count(*) AS _df FROM bk GROUP BY 1, 2),
        hot AS (SELECT band, key FROM dfreq WHERE _df > {max_df}),
        cold AS (SELECT bk.* FROM bk ANTI JOIN hot USING (band, key)),
        hotex AS (SELECT bk.* FROM bk SEMI JOIN hot USING (band, key)),
        reps AS (SELECT band, key, min(_id) AS _rep FROM hotex GROUP BY 1, 2),
        cands AS (
          SELECT DISTINCT a._id AS doc_a, b._id AS doc_b
          FROM cold a JOIN cold b
            ON a.band = b.band AND a.key = b.key AND a._id < b._id
          UNION
          SELECT DISTINCT r._rep AS doc_a, h._id AS doc_b
          FROM hotex h JOIN reps r ON h.band = r.band AND h.key = r.key
          WHERE h._id > r._rep),
        verified AS (
          SELECT doc_a, doc_b,
                 len(list_intersect(sa._sh, sb._sh)) * 1e0
                   / (sa._sz + sb._sz - len(list_intersect(sa._sh, sb._sh)))
                   AS jaccard
          FROM cands
          JOIN sized sa ON sa._id = cands.doc_a
          JOIN sized sb ON sb._id = cands.doc_b)
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
        FROM verified WHERE jaccard >= {threshold}
        """
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
    by exact hamming distance.

    Per-bit vote sums come from explode + groupBy (32 codegen'd integer
    sum aggregates over the token-hash multiset) instead of 32 interpreted
    array folds per row; bit b is set iff 2*count_of_set_bit >= n_tokens —
    algebraically identical to the reference sum(+1/-1) >= 0 criterion."""
    toks = (
        fan_out(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")))
        .withColumn("_th", F.expr(TH.token_hashes("_txt", "spark")))
        .filter(F.size("_th") > 0)
        .select("_id", "_th")
    )
    ex = toks.select("_id", F.explode("_th").alias("_x"))
    bit_aggs = [
        F.sum(F.shiftright(F.col("_x"), bit).bitwiseAND(F.lit(1))).alias(f"_b{bit}")
        for bit in range(32)
    ]
    sums = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"), *bit_aggs)
    sh32 = None
    for bit in range(32):
        term = F.when(
            F.col(f"_b{bit}") * 2 >= F.col("_n"), F.lit(1 << bit).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sh32 = term if sh32 is None else sh32 + term
    hashed = sums.select("_id", sh32.alias("_sh32")).cache()
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


# --------------------------------------------------------------------------
# Benchmark contamination: n-gram containment against a held-out set


def contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, the
    fraction of its distinct word n-grams that also occur anywhere in the
    ``benchmark`` set (eval suites, test splits), flagging docs at or above
    ``threshold`` — the standard decontamination pass before training.

    Scale shape: the benchmark side is tiny relative to the corpus (eval
    suites are MBs), so its distinct shingle hashes BROADCAST — the corpus
    is touched in one narrow pass (shingle + broadcast-hash-lookup + one
    groupBy on doc id); no corpus-sized shuffle against the benchmark.
    Documents shorter than n tokens have no n-grams and are excluded
    (mirrored in the oracle)."""
    doc_sh = _with_shingles(df, id_col, text_col, n)
    bench_sh = (
        _with_shingles(benchmark, id_col, text_col, n)
        .select(F.explode("_sh").alias("_s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    exploded = doc_sh.select("_id", "_sz", F.explode("_sh").alias("_s"))
    frac = "(count(_hit) * 1e0 / count(1))"
    return (
        exploded.join(F.broadcast(bench_sh), "_s", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.expr(f"round({frac}, 6)").alias("overlap_frac"),
            F.expr(f"{frac} >= {threshold}").alias("contaminated"),
        )
        .select(F.col("_id").alias(id_col), "n_shingles", "overlap_frac", "contaminated")
        .orderBy(id_col)
    )


def contamination_oracle(
    id_col: str,
    text_col: str,
    table: str,
    bench_pred: str,
    doc_pred: str,
    n: int = 3,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of :func:`contamination` where benchmark membership is a
    predicate over the same table (``bench_pred`` / ``doc_pred`` partition
    it, e.g. ``{id} % 20 = 0`` vs ``<> 0``)."""
    return f"""
        WITH th AS (SELECT {id_col} AS _id,
                           {TH.token_hashes(text_col, 'duckdb')} AS _th
                    FROM {table}),
        sh AS (SELECT _id, {TH.shingle_hashes('_th', 'duckdb', n=n)} AS _sh
               FROM th),
        nz AS (SELECT _id, _sh FROM sh WHERE len(_sh) > 0),
        bench AS (SELECT DISTINCT unnest(_sh) AS _s FROM nz
                  WHERE {bench_pred}),
        docs AS (SELECT _id, unnest(_sh) AS _s FROM nz WHERE {doc_pred})
        SELECT d._id AS {id_col}, count(*)::BIGINT AS n_shingles,
               round(count(b._s) * 1e0 / count(*), 6) AS overlap_frac,
               (count(b._s) * 1e0 / count(*)) >= {threshold} AS contaminated
        FROM docs d LEFT JOIN bench b ON d._s = b._s
        GROUP BY d._id ORDER BY {id_col}
    """


# --------------------------------------------------------------------------
# Dedup clusters: connected components over near-duplicate pairs


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame | None = None,
    n: int = 3,
    threshold: float = 0.8,
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the pair graph,
    labeling every document with the minimum doc id of its component and
    flagging the canonical survivor (keep = doc is its component's min) —
    the step that turns pair detection into an actual training-set dedup
    policy (drop all non-canonical members).

    Pregel-style min-label propagation WITH pointer doubling: per iteration
    (1) one edges-to-labels join + a min aggregation pushes labels one hop,
    then (2) a label-to-label self-join follows each label to ITS label
    (path halving) — so label distance covered doubles per round and the
    loop converges in O(log diameter) iterations instead of O(diameter)
    (long chain-shaped components — common in cosine graphs — would
    otherwise pay a full Spark job per hop). Edges (only near-dup pairs —
    tiny relative to the corpus) and each label frontier are checkpointed
    so lineage stays flat; the loop stops at fixpoint (one count per
    iteration, piggybacked on the frontier materialization).

    Non-SQL-expressible on the engine side (iterative); the DuckDB oracle
    uses a recursive CTE transitive closure instead.
    """
    if pairs is None:
        pairs = jaccard_pairs(df, id_col, text_col, n, threshold)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(id_col).cast("long").alias("cluster_id"),
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        prop = edges.join(labels, F.col("src") == F.col("doc_id")).select(
            F.col("dst").alias("doc_id"), "cluster_id"
        )
        hop = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # pointer doubling: cluster_id is itself a doc id, so follow it to
        # its (possibly smaller) label — one self-join, halves path lengths.
        # The old label is folded into the SAME materialized plan as a
        # _changed flag, so the fixpoint check is a scan of the checkpoint
        # (no extra join job per iteration).
        new_labels = (
            hop.alias("h")
            .join(
                hop.select(
                    F.col("doc_id").alias("_ld"), F.col("cluster_id").alias("_lc")
                ),
                F.col("h.cluster_id") == F.col("_ld"),
                "left",
            )
            .select(
                "doc_id",
                F.coalesce(F.col("_lc"), F.col("h.cluster_id")).alias("cluster_id"),
            )
            .join(
                labels.select("doc_id", F.col("cluster_id").alias("_old")), "doc_id"
            )
            .select(
                "doc_id",
                "cluster_id",
                (F.col("cluster_id") != F.col("_old")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.withColumn("keep", F.col("doc_id") == F.col("cluster_id"))


def keep_best(
    labeled: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical selection: for every cluster pick the member
    with the HIGHEST quality score (ties -> smallest id) as the survivor —
    the policy real curation pipelines use instead of min-id (the longest /
    highest-quality page wins, not whichever crawled first).

    One co-keyed join (labels x scores on the doc id) and ONE groupBy
    shuffle carrying only (cluster_id, score, -id) triples — the argmax is
    a lexicographic struct max, so there is no per-cluster window sort and
    never any document text on the wire. Output = labeled plus ``best_id``
    (the cluster's survivor) and ``keep_best`` (this doc is it).

    Docs missing from ``scores`` are NOT dropped (left join): they rank at
    -infinity, so they never win over a scored member, and a fully
    unscored cluster falls back to its min id — every labeled doc appears
    in the output exactly once regardless of score coverage.
    """
    j = labeled.join(scores.select(id_col, score_col), id_col, "left")
    best = (
        j.groupBy(cluster_col)
        .agg(
            F.max(
                F.struct(
                    F.coalesce(
                        F.col(score_col).cast("double"),
                        F.lit(float("-inf")),
                    ).alias("_s"),
                    (-F.col(id_col)).cast("long").alias("_nid"),
                )
            ).alias("_m")
        )
        .select(cluster_col, (-F.col("_m._nid")).cast("long").alias("best_id"))
    )
    return labeled.join(best, cluster_col).withColumn(
        "keep_best", F.col(id_col) == F.col("best_id")
    )


def dedup_materialize(
    docs: DataFrame,
    labeled: DataFrame,
    id_col: str = "doc_id",
    policy: str = "best",
) -> DataFrame:
    """The final dedup step: the cleaned corpus itself. Keeps exactly one
    survivor per cluster — ``policy="best"`` uses keep_best's quality
    argmax (labeled must carry ``keep_best``), ``policy="min_id"`` the
    min-id flag (``keep``) — plus every unlabeled doc (docs absent from
    ``labeled`` were never in any near-dup cluster... callers that label
    the full corpus, like dedup_clusters, pass labels for everyone, and
    then this is a pure semi-join). Survivor ids are usually a large
    fraction of the corpus, so this is a key-only shuffle join, NOT a
    broadcast."""
    flag = {"best": "keep_best", "min_id": "keep"}.get(policy)
    if flag is None:
        raise ValueError(f"policy must be best|min_id, got {policy!r}")
    keep_ids = labeled.filter(F.col(flag)).select(id_col)
    unlabeled = docs.join(labeled.select(id_col), id_col, "left_anti")
    return docs.join(keep_ids, id_col, "left_semi").unionByName(unlabeled)


def _cluster_labels_ctes(
    id_col: str, text_col: str, table: str, n: int, threshold: float
) -> str:
    """Shared WITH-body: recursive-CTE transitive closure producing
    ``labels(doc_id, cluster_id)`` — the oracle twin of the engine's
    iterative min-label propagation."""
    jp = jaccard_pairs_oracle(id_col, text_col, table, n, threshold)
    return f"""jp AS ({jp}),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
                  UNION SELECT doc_b, doc_a FROM jp),
        reach(id, r) AS (
          SELECT {id_col}::BIGINT, {id_col}::BIGINT FROM {table}
          UNION
          SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        ),
        labels AS (
          SELECT id AS doc_id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY id
        )"""


def dedup_clusters_oracle(
    id_col: str, text_col: str, table: str, n: int = 3, threshold: float = 0.8
) -> str:
    ctes = _cluster_labels_ctes(id_col, text_col, table, n, threshold)
    return f"""
        WITH RECURSIVE {ctes}
        SELECT doc_id, cluster_id, (doc_id = cluster_id) AS keep
        FROM labels ORDER BY doc_id
    """


def dedup_clusters_best_oracle(
    id_col: str,
    text_col: str,
    table: str,
    score_expr: str,
    n: int = 3,
    threshold: float = 0.8,
) -> str:
    """dedup_clusters + keep_best in one statement: ``score_expr`` is a SQL
    expression over ``{table}`` rows (e.g. ``n_chars``). Max-score-then-
    min-id selection is spelled as two aggs + an equi-join — integer scores,
    so the score-equality join is exact in both engines."""
    ctes = _cluster_labels_ctes(id_col, text_col, table, n, threshold)
    return f"""
        WITH RECURSIVE {ctes},
        j AS (
          SELECT l.doc_id, l.cluster_id, ({score_expr})::BIGINT AS _score
          FROM labels l JOIN {table} t ON t.{id_col} = l.doc_id
        ),
        m AS (SELECT cluster_id, max(_score) AS _ms FROM j GROUP BY cluster_id),
        b AS (
          SELECT j.cluster_id, min(j.doc_id) AS best_id
          FROM j JOIN m ON j.cluster_id = m.cluster_id AND j._score = m._ms
          GROUP BY j.cluster_id
        )
        SELECT l.doc_id, l.cluster_id, (l.doc_id = l.cluster_id) AS keep,
               b.best_id, (l.doc_id = b.best_id) AS keep_best
        FROM labels l JOIN b ON b.cluster_id = l.cluster_id
        ORDER BY doc_id
    """


# --------------------------------------------------------------------------
# Line-level dedup (boilerplate removal)
#
# The RefinedWeb/CCNet preprocessing step the document-level family cannot
# express: navigation bars, cookie banners and license footers repeat
# VERBATIM as individual lines across thousands of pages while the pages
# themselves are unique. Reference seed: the per-(col,value) posting model
# (Dfs.scala:338-395) — a line is a "value" whose posting frequency across
# documents decides its fate.

LINE_MAX_DF = 3  # a line seen in more than this many distinct docs is boilerplate
_POS_ENC = 2_147_483_648  # 2^31 > texthash.MOD: (pos, line_hash) packs into one int64


def _line_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, _pos, _lh) for every NON-EMPTY (after trim) line of every doc.
    One narrow pass: split + posexplode + polynomial hash, all codegen —
    fanned out first so single-split local inputs use every core."""
    return (
        fan_out(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")))
        .select(
            "_id",
            F.posexplode(F.split(F.col("_txt"), "\n")).alias("_pos", "_line"),
        )
        # regex trim, not trim(): trim strips only 0x20 in both engines, but
        # boilerplate matching must be whitespace-run-insensitive at the ends
        .withColumn("_lt", F.regexp_replace("_line", f"^{TH.WS_CLASS}+|{TH.WS_CLASS}+$", ""))
        .filter(F.col("_lt") != "")
        .withColumn("_lh", F.expr(TH.text_hash("_lt", "spark")))
        .drop("_line", "_lt")
    )


def line_dedup(
    df: DataFrame, id_col: str, text_col: str, max_df: int = LINE_MAX_DF
) -> DataFrame:
    """Per-document line-level dedup verdict: (doc_id, n_lines, n_kept,
    n_dropped, cleaned_fp) where cleaned_fp is the polynomial fold of the
    surviving lines' hashes in original order — the fingerprint of the
    boilerplate-stripped document, so downstream exact dedup can run on
    cleaned content without materializing it.

    Scale: the shuffle carries (line_hash, doc_id) pairs — 16 bytes/line,
    never line text. Line frequency is a map-side-combined groupBy on an
    8-byte hash; the verdict join is hash-keyed. Hot boilerplate lines
    (every page's footer) are bounded by doc count, not corpus size, and
    AQE skew handling splits any straggler buckets.
    """
    lines = _line_rows(df, id_col, text_col)
    # only lines OVER the threshold matter for the verdict, and that
    # boilerplate set is small by construction (each member repeats across
    # > max_df docs), so the verdict join is a left join against the
    # filtered aggregate — AQE broadcasts it and the full line set never
    # shuffles on _lh; the big side's only wide op is the per-doc
    # reassembly groupBy. (A plain inner join on the unfiltered frequency
    # table would shuffle every line twice.)
    boiler = (
        lines.groupBy("_lh")
        .agg(F.count_distinct("_id").alias("_ldf"))
        .filter(F.col("_ldf") > F.lit(max_df))
        .select("_lh", F.lit(True).alias("_bp"))
    )
    return _line_verdict(lines, boiler)


def _line_verdict(lines: DataFrame, boiler: DataFrame) -> DataFrame:
    """The per-doc verdict given a (_lh, _bp) boilerplate frame — shared
    by the batch operator (boiler = the corpus frequency aggregate) and
    the streaming reader (boiler = the accumulated sink of line hashes
    whose doc frequency crossed the gate; streaming/ingest
    read_line_dedup), so stream == batch is equality by construction
    once the boilerplate SETS agree."""
    keep = F.col("_bp").isNull()
    enc = F.col("_pos") * F.lit(_POS_ENC) + F.col("_lh")
    per_doc = (
        lines.join(boiler, "_lh", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sort_array(F.collect_list(F.when(keep, enc))).alias("_kept"),
        )
    )
    fp = TH.fold_hash(f"transform(_kept, _e -> _e % {_POS_ENC})", "spark")
    return per_doc.select(
        F.col("_id").alias("doc_id"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        (F.col("n_lines") - F.col("n_kept")).cast("bigint").alias("n_dropped"),
        F.expr(fp).alias("cleaned_fp"),
    )


def line_dedup_oracle(
    id_col: str, text_col: str, table: str, max_df: int = LINE_MAX_DF
) -> str:
    """DuckDB mirror: parallel unnest(range(len(l)))/unnest(l) zips position
    with line (same 0-based order as posexplode); identical hash/threshold
    formulas; empty kept-lists coalesced to [] so the fold matches Spark's
    seed-only aggregate."""
    lh = TH.text_hash(f"regexp_replace(_line, '^{TH.WS_CLASS}+|{TH.WS_CLASS}+$', '', 'g')", "duckdb")
    fold = TH.fold_hash(
        f"list_transform(coalesce(_kept, []::BIGINT[]), _e -> _e % {_POS_ENC})",
        "duckdb",
    )
    return f"""
        WITH _lines AS (
          SELECT _id, _pos, {lh} AS _lh
          FROM (SELECT {id_col} AS _id,
                       unnest(range(len(_l))) AS _pos,
                       unnest(_l) AS _line
                FROM (SELECT {id_col}, string_split({text_col}, chr(10)) AS _l
                      FROM {table}))
          WHERE regexp_replace(_line, '^{TH.WS_CLASS}+|{TH.WS_CLASS}+$', '', 'g') <> ''
        ),
        _boiler AS (SELECT _lh, true AS _bp FROM _lines
                    GROUP BY _lh HAVING count(DISTINCT _id) > {max_df}),
        _doc AS (
          SELECT _id,
                 count(*)::BIGINT AS n_lines,
                 count(*) FILTER (_bp IS NULL)::BIGINT AS n_kept,
                 list_sort(list(_pos * {_POS_ENC} + _lh)
                           FILTER (_bp IS NULL)) AS _kept
          FROM _lines LEFT JOIN _boiler USING (_lh)
          GROUP BY _id
        )
        SELECT _id AS doc_id, n_lines, n_kept,
               (n_lines - n_kept)::BIGINT AS n_dropped,
               {fold} AS cleaned_fp
        FROM _doc
    """


def line_dedup_clean(
    df: DataFrame, id_col: str, text_col: str, max_df: int = LINE_MAX_DF
) -> DataFrame:
    """Materialize the boilerplate-stripped corpus: (doc_id, clean_text)
    with the surviving lines re-joined by '\\n' in original order — the
    artifact a curation pipeline actually ships (line_dedup emits only the
    verdict + fingerprint).

    Scale note vs line_dedup: line TEXT must travel to the reassembly
    groupBy here (unavoidable: the output contains it), so the wide shuffle
    carries the kept portion of the corpus exactly once; the boilerplate
    verdict side is the same broadcastable filtered aggregate. Dropped-only
    docs come back with clean_text = '' (present, not silently vanished)."""
    lines = _line_rows_text(df, id_col, text_col)
    boiler = (
        lines.groupBy("_lh")
        .agg(F.count_distinct("_id").alias("_ldf"))
        .filter(F.col("_ldf") > F.lit(max_df))
        .select("_lh", F.lit(True).alias("_bp"))
    )
    kept = (
        lines.join(boiler, "_lh", "left")
        .groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_bp").isNull(), F.struct("_pos", "_lt"))
                        )
                    ),
                    lambda s: s["_lt"],
                ),
                "\n",
            ).alias("clean_text")
        )
    )
    return kept.select(F.col("_id").alias("doc_id"), "clean_text")


def _line_rows_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Like _line_rows but keeps the trimmed line text (for clean-corpus
    materialization)."""
    return (
        fan_out(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")))
        .select(
            "_id",
            F.posexplode(F.split(F.col("_txt"), "\n")).alias("_pos", "_line"),
        )
        .withColumn("_lt", F.regexp_replace("_line", f"^{TH.WS_CLASS}+|{TH.WS_CLASS}+$", ""))
        .filter(F.col("_lt") != "")
        .withColumn("_lh", F.expr(TH.text_hash("_lt", "spark")))
        .drop("_line")
    )


def line_dedup_clean_oracle(
    id_col: str, text_col: str, table: str, max_df: int = LINE_MAX_DF
) -> str:
    lh = TH.text_hash("_lt", "duckdb")
    return f"""
        WITH _lines AS (
          SELECT _id, _pos, _lt, {lh} AS _lh
          FROM (SELECT {id_col} AS _id,
                       unnest(range(len(_l))) AS _pos,
                       regexp_replace(unnest(_l), '^{TH.WS_CLASS}+|{TH.WS_CLASS}+$', '', 'g') AS _lt
                FROM (SELECT {id_col}, string_split({text_col}, chr(10)) AS _l
                      FROM {table}))
          WHERE _lt <> ''
        ),
        _boiler AS (SELECT _lh, true AS _bp FROM _lines
                    GROUP BY _lh HAVING count(DISTINCT _id) > {max_df})
        SELECT _id AS doc_id,
               coalesce(string_agg(_lt, chr(10) ORDER BY _pos)
                        FILTER (_bp IS NULL), '') AS clean_text
        FROM _lines LEFT JOIN _boiler USING (_lh)
        GROUP BY _id
    """


# --------------------------------------------------------------------------
# substring-level dedup (the ExactSubstr family: find and remove verbatim
# token runs that repeat across — or within — documents)


DEFAULT_SPAN_K = 16  # Lee et al. use 50 BPE tokens; whitespace tokens run
# denser, and the engine parameterizes k per corpus anyway


def _gram_stream2(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """_gram_stream with a TWO-COLUMN ~2^112 gram identity (_id, _pos,
    _s, _s2): two independent WIDE polynomial folds over the two mixed
    per-token hash streams — _s = fold family 3 (137 mod ~2^56) over the
    mixed family-1 token hashes, _s2 = fold family 4 (139 mod ~2^56) over
    the mixed family-2 token hashes (texthash fold_hash3/fold_hash4). The
    substring ops group windows by identity with no downstream pair
    verification, and the groupBy is CORPUS-wide: the round-10 single
    packed int64 (~9.2e18 space) expects ~5e6 false-duplicated windows at
    1e13 windows (100 TB) — the wide pair puts expected false pairs at
    ~1.2e-8 at the same scale, +8 B/window on the shuffle. COST SHAPE IS
    ROUND-10's: exactly two unrolled fold chains per window (a 4-chain
    quad-fold design measured 3.4-5.6x slower on the spans ladder in an
    isolated A/B — the chains dominate); independence rationale, int64
    bounds, and the degenerate-collision floor are at the texthash wide-
    family definitions. Same lead()-window scalar construction as
    _gram_stream (the array-lambda form recomputes the token-hash array
    per element access — measured 3-10x), same one shuffle on _id."""
    from pyspark.sql.window import Window

    base = fan_out(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    )
    tok = (
        base.select(
            "_id",
            F.posexplode(F.expr(TH.tokens("_txt", "spark"))).alias("_pos", "_t"),
        )
        # mix() before the fold: the fold is affine in its inputs, and
        # correlated token edits cancel inside an UNmixed fold in both
        # families at once (see functions/texthash.mix — hypothesis-found)
        .withColumn(
            "_h", F.expr(TH.mix(TH.text_hash("_t", "spark"), "spark"))
        )
        .withColumn(
            "_g",
            F.expr(TH.mix(TH.text_hash2("_t", "spark"), "spark", mod=TH.MOD2)),
        )
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    acc3 = f"cast({TH.SEED3} as bigint)"
    acc4 = f"cast({TH.SEED4} as bigint)"
    for j in range(n):
        acc3 = f"((({acc3}) * {TH.MULT3} + _h{j}) % {TH.MOD3})"
        acc4 = f"((({acc4}) * {TH.MULT4} + _g{j}) % {TH.MOD4})"
    with_leads = tok.select(
        "_id",
        "_pos",
        F.col("_h").alias("_h0"),
        F.col("_g").alias("_g0"),
        *[F.lead("_h", j).over(w).alias(f"_h{j}") for j in range(1, n)],
        *[F.lead("_g", j).over(w).alias(f"_g{j}") for j in range(1, n)],
    )
    return (
        with_leads.filter(F.col(f"_h{n - 1}").isNotNull())
        .withColumn("_s", F.expr(acc3))
        .withColumn("_s2", F.expr(acc4))
        .select("_id", "_pos", "_s", "_s2")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_SPAN_K,
    min_occurrences: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans: (doc_id, span_start, span_toks,
    n_windows), one row per maximal run of tokens in which EVERY k-token
    window occurs >= min_occurrences times corpus-wide (within-doc repeats
    count — a doc that pastes its own header twice flags both copies, like
    the suffix-array ExactSubstr it approximates; Lee et al., ACL 2022,
    'Deduplicating Training Data Makes Language Models Better'). A verbatim
    duplicated run of length L >= k has all L-k+1 of its windows duplicated,
    so true duplicated spans are recovered EXACTLY with their boundaries;
    the one approximation vs a suffix array is chimeric merges (adjacent
    windows each duplicated against DIFFERENT sources fuse into one reported
    span) — the same span-coalescing the reference family applies when
    cutting remove-ranges out of documents. Window identity is the
    two-column ~2^112 wide-fold pair (_gram_stream2's two int64 columns,
    dialect-exact so the oracle reproduces every verdict bit-for-bit):
    unlike the Jaccard candidates, nothing downstream re-verifies pairs,
    and THIS groupBy is corpus-wide — at 1e13 windows (100 TB) a single
    1e9+7 space would mark everything duplicated and even the round-10
    packed int64 (~9.2e18) expected ~5e6 false-dup windows; the ~4.2e33
    wide pair puts expected corpus-wide false pairs at ~1.2e-8, no
    sharding caveat.

    Scale (100 TB): the window stream is (_id 8B, _pos 4B, identity 16B)
    per token — linear in token count, within 8 B/window of the MinHash
    shingle pass's wire cost, never text. The duplicate filter is a
    map-side-combined count on the 16-byte identity pair; the join-back is
    hash-keyed (hot boilerplate windows are exactly what it finds — AQE
    skew-join splits them); the
    island merge is a per-document window sort, bounded by document length.
    Suffix arrays (the reference implementation of ExactSubstr) need a
    global sort of the whole corpus' suffixes — this is the shuffle-local
    re-expression of the same detector.
    """
    stream = _gram_stream2(df, id_col, text_col, k)
    dup = (
        stream.groupBy("_s", "_s2")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") >= F.lit(min_occurrences))
        .select("_s", "_s2")
    )
    hits = stream.join(dup, ["_s", "_s2"], "leftsemi")
    return windows_to_spans(hits, k, id_col="_id", pos_col="_pos")


def windows_to_spans(
    df: DataFrame, k: int, id_col: str = "doc_id", pos_col: str = "pos"
) -> DataFrame:
    """Coalesce duplicated k-window START POSITIONS into maximal spans:
    (doc_id, span_start, span_toks, n_windows). The gaps-and-islands
    merge shared by the batch detector and the streaming reader — a run
    of consecutive positions i..j covers tokens [i, j+k)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(pos_col)
    isl = df.select(id_col, pos_col).withColumn(
        "_isl", F.col(pos_col) - F.row_number().over(w)
    )
    return (
        isl.groupBy(id_col, "_isl")
        .agg(
            F.min(pos_col).alias("_s0"),
            F.max(pos_col).alias("_s1"),
            F.count(F.lit(1)).alias("_nw"),
        )
        .select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.col("_s0").cast("bigint").alias("span_start"),
            (F.col("_s1") - F.col("_s0") + F.lit(k)).cast("bigint").alias("span_toks"),
            F.col("_nw").cast("bigint").alias("n_windows"),
        )
    )


def packed_grams_expr(th1: str, th2: str, k: int) -> str:
    """Spark SQL expr: in-order two-column ~2^112 k-gram identity array —
    one struct<s1:bigint, s2:bigint> per window (the same wide-fold pair
    as _gram_stream2's _s/_s2) — from two PRE-MATERIALIZED, PRE-MIXED
    token-hash array COLUMNS (texthash.mix applied per token; the folds
    are affine, mixing is what makes window identity collision-honest).
    The array form of _gram_stream2's lead()-window folds — needed where
    window functions are unavailable, i.e. on a STREAMING DataFrame; pass
    column names, not expressions — Catalyst's CollapseProject inlines
    expressions into every lambda reference. Docs shorter than k tokens
    yield an empty array."""
    acc3 = f"cast({TH.SEED3} as bigint)"
    acc4 = f"cast({TH.SEED4} as bigint)"
    for j in range(1, k + 1):
        acc3 = f"((({acc3}) * {TH.MULT3} + element_at({th1}, _i + {j})) % {TH.MOD3})"
        acc4 = f"((({acc4}) * {TH.MULT4} + element_at({th2}, _i + {j})) % {TH.MOD4})"
    return (
        f"case when size({th1}) >= {k} "
        f"then transform(sequence(0, size({th1}) - {k}), "
        f"_i -> struct({acc3} as s1, {acc4} as s2)) "
        f"else cast(array() as array<struct<s1:bigint,s2:bigint>>) end"
    )


def _span_stream_sql(id_col: str, text_col: str, table: str, k: int) -> str:
    """DuckDB mirror of _gram_stream2: (_id, _pos, _s, _s2) — parallel
    unnest zips the 0-based window position with the in-order two-column
    wide-fold identity pair, the exact integers Spark's lead()-window
    folds produce."""
    f3 = TH.fold_hash3(f"list_slice(_th, _i + 1, _i + {k})", "duckdb")
    f4 = TH.fold_hash4(f"list_slice(_t2, _i + 1, _i + {k})", "duckdb")
    rng = f"list_transform(range(greatest(len(_th) - {k - 1}, 0)), "
    grams = f"{rng}_i -> {f3})"
    grams2 = f"{rng}_i -> {f4})"
    toks = TH.tokens(text_col, "duckdb")
    h1m = TH.mix(TH.text_hash("_tok", "duckdb"), "duckdb")
    h2m = TH.mix(TH.text_hash2("_tok", "duckdb"), "duckdb", mod=TH.MOD2)
    return f"""
        SELECT _id, unnest(range(len(_g))) AS _pos,
               unnest(_g) AS _s, unnest(_g2) AS _s2
        FROM (SELECT _id, {grams} AS _g, {grams2} AS _g2
              FROM (SELECT {id_col}::BIGINT AS _id,
                           list_transform({toks}, _tok -> {h1m}) AS _th,
                           list_transform({toks}, _tok -> {h2m}) AS _t2
                    FROM {table}))
    """


def duplicated_spans_oracle(
    id_col: str,
    text_col: str,
    table: str,
    k: int = DEFAULT_SPAN_K,
    min_occurrences: int = 2,
) -> str:
    return f"""
        WITH _st AS ({_span_stream_sql(id_col, text_col, table, k)}),
        _dup AS (SELECT _s, _s2 FROM _st GROUP BY _s, _s2
                 HAVING count(*) >= {min_occurrences}),
        _isl AS (
          SELECT _id, _pos,
                 _pos - row_number() OVER (PARTITION BY _id ORDER BY _pos) AS _g
          FROM _st SEMI JOIN _dup USING (_s, _s2)
        )
        SELECT _id AS doc_id,
               min(_pos)::BIGINT AS span_start,
               (max(_pos) - min(_pos) + {k})::BIGINT AS span_toks,
               count(*)::BIGINT AS n_windows
        FROM _isl GROUP BY _id, _g
    """


def substring_dedup_clean(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_SPAN_K
) -> DataFrame:
    """Materialize the substring-deduplicated corpus: (doc_id, clean_text,
    n_toks, removed_toks). For every k-token window that occurs >= 2 times
    corpus-wide, exactly ONE occurrence survives — the lexicographically
    first by (doc_id, position) — and every other occurrence's token range
    is cut; adjacent cut windows coalesce into maximal remove-spans first,
    so overlapping duplicates are removed once, not k times. clean_text is
    the surviving tokens re-joined by single spaces (token-normalized, the
    same convention as the tokenizer that defined the windows).

    Preconditions, VALIDATED in-plan: integer doc ids with
    0 <= id < 2^32 and documents under 2^31 tokens — (id, pos) packs into
    one int64 keeper key at radix 2^31 so the arg-min survives a
    map-side-combined min() instead of a skew-prone per-key window sort.
    An out-of-range id would silently wrap the int64 pack negative and
    min(_enc) would crown wrong keepers, so the pack is guarded by a fused
    when/raise_error: a violating row fails the job loudly instead of
    corrupting the materialized corpus. The guard is one codegen'd
    comparison per window row (no extra job, can't be pruned because it
    gates the value itself).

    Scale: same linear window stream as duplicated_spans; the keeper
    choice is min(enc) — partial-aggregated, hot boilerplate windows cost
    one combiner cell per map task, not a single-task sort. Token text
    travels exactly once, to the final reassembly (the output contains it;
    unavoidable). Reference family: Lee et al.'s ExactSubstr removes all
    but one occurrence of each duplicated substring — this is that policy,
    shuffle-local."""
    in_range = (
        (F.col("_id") >= 0)
        & (F.col("_id") < F.lit(4_294_967_296))
        & (F.col("_pos") < F.lit(_POS_ENC))
    )
    stream = _gram_stream2(df, id_col, text_col, k).withColumn(
        "_enc",
        F.when(
            in_range, F.col("_id").cast("long") * F.lit(_POS_ENC) + F.col("_pos")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "substring_dedup_clean: doc_id/pos outside the int64 "
                        "keeper-key range (need 0 <= id < 2^32, pos < 2^31); "
                        "got id="
                    ),
                    F.col("_id").cast("string"),
                    F.lit(" pos="),
                    F.col("_pos").cast("string"),
                )
            ).cast("long")
        ),
    )
    kp = (
        stream.groupBy("_s", "_s2")
        .agg(F.count(F.lit(1)).alias("_occ"), F.min("_enc").alias("_keep"))
        .filter(F.col("_occ") >= F.lit(2))
        .select("_s", "_s2", "_keep")
    )
    rm = (
        stream.join(kp, ["_s", "_s2"])
        .filter(F.col("_enc") != F.col("_keep"))
        .select("_id", "_pos")
    )
    return _cut_window_positions(df, rm, id_col, text_col, k)


def _cut_window_positions(
    df: DataFrame, rm: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Shared cut machinery: given (_id, _pos) window START positions to
    remove, coalesce them into maximal spans, cut every covered token,
    and rebuild (doc_id, clean_text, n_toks, removed_toks). Used by
    substring_dedup_clean (rm = non-keeper duplicated occurrences) and
    decontaminate_clean (rm = every benchmark-hit occurrence)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("_id").orderBy("_pos")
    spans = (
        rm.withColumn("_isl", F.col("_pos") - F.row_number().over(w))
        .groupBy("_id", "_isl")
        .agg(F.min("_pos").alias("_a"), (F.max("_pos") + F.lit(k)).alias("_b"))
    )
    per_doc = spans.groupBy("_id").agg(
        F.collect_list(F.struct(F.col("_a").alias("s"), F.col("_b").alias("e"))).alias(
            "_spans"
        ),
    )
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.expr(TH.tokens(text_col, "spark")).alias("_toks"),
    )
    # null _spans (no cut window touches the doc) short-circuits the
    # exists() inside the lambda — a bare not(exists(null, ...)) is null,
    # which filter() would treat as drop-every-token
    kept = F.expr(
        "filter(_toks, (_t, _i) -> _spans is null or "
        "not exists(_spans, _sp -> _i >= _sp.s and _i < _sp.e))"
    )
    # removed_toks = tokens COVERED by the cut = n_toks - kept count.
    # NOT sum(span lengths): two islands of cut windows closer than k
    # produce OVERLAPPING token ranges (window positions {0} and {2,3} at
    # k=3 cover [0,3) and [2,6)), and summing lengths double-counts the
    # overlap — hypothesis model test caught exactly this against the
    # brute-force reference (and the oracle, which computes n - kept)
    return (
        base.join(per_doc, "_id", "left")
        .withColumn("_kept", kept)
        .select(
            F.col("_id").alias("doc_id"),
            F.array_join("_kept", " ").alias("clean_text"),
            F.size("_toks").cast("bigint").alias("n_toks"),
            (F.size("_toks") - F.size("_kept")).cast("bigint").alias("removed_toks"),
        )
    )


def substring_dedup_clean_oracle(
    id_col: str, text_col: str, table: str, k: int = DEFAULT_SPAN_K
) -> str:
    return f"""
        WITH _st AS (
          SELECT _id, _pos, _s, _s2, (_id * {_POS_ENC} + _pos) AS _enc
          FROM ({_span_stream_sql(id_col, text_col, table, k)})
        ),
        _kp AS (SELECT _s, _s2, min(_enc) AS _keep FROM _st
                GROUP BY _s, _s2 HAVING count(*) >= 2),
        _rm AS (SELECT t._id, t._pos FROM _st t JOIN _kp USING (_s, _s2)
                WHERE t._enc <> _kp._keep),
        _isl AS (
          SELECT _id, _pos,
                 _pos - row_number() OVER (PARTITION BY _id ORDER BY _pos) AS _g
          FROM _rm
        ),
        _sp AS (SELECT _id, min(_pos) AS _a, max(_pos) + {k} AS _b
                FROM _isl GROUP BY _id, _g),
        _tok AS (
          SELECT _id, unnest(range(len(_t))) AS _pos, unnest(_t) AS _tok
          FROM (SELECT {id_col}::BIGINT AS _id,
                       {TH.tokens(text_col, "duckdb")} AS _t
                FROM {table})
        ),
        _keep2 AS (
          SELECT t._id, t._pos, t._tok FROM _tok t
          WHERE NOT EXISTS (SELECT 1 FROM _sp p
                            WHERE p._id = t._id
                              AND t._pos >= p._a AND t._pos < p._b)
        ),
        _agg AS (SELECT _id, string_agg(_tok, ' ' ORDER BY _pos) AS clean_text,
                        count(*) AS _kept
                 FROM _keep2 GROUP BY _id),
        _n AS (SELECT _id, count(*) AS _n FROM _tok GROUP BY _id)
        SELECT b._id AS doc_id,
               coalesce(a.clean_text, '') AS clean_text,
               coalesce(n._n, 0)::BIGINT AS n_toks,
               (coalesce(n._n, 0) - coalesce(a._kept, 0))::BIGINT AS removed_toks
        FROM (SELECT {id_col}::BIGINT AS _id FROM {table}) b
        LEFT JOIN _agg a USING (_id) LEFT JOIN _n n USING (_id)
    """


def contaminated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    k: int = DEFAULT_SPAN_K,
) -> DataFrame:
    """Substring-grain benchmark decontamination — the other deployment of
    the ExactSubstr detector (the eval-decontamination pass of the GPT-3 /
    PaLM reports cuts verbatim benchmark overlap out of training text, not
    just whole contaminated documents): maximal token runs in corpus docs
    whose EVERY k-window occurs verbatim anywhere in ``benchmark``.
    Output (doc_id, span_start, span_toks, n_windows) — exact boundaries,
    ready for the same span-cut materialization as substring_dedup_clean
    (vs :func:`contamination`, which scores whole documents by n-gram
    containment and flags, never locates).

    Scale shape: the benchmark side is tiny (eval suites are MBs), so its
    distinct window identities BROADCAST and the corpus stream meets them
    in a map-side semi join — no corpus shuffle against the benchmark;
    the corpus pays only the window stream it already pays for dedup.
    Window identity is the mixed packed double hash (_gram_stream2)."""
    train = _gram_stream2(df, id_col, text_col, k)
    bench = (
        _gram_stream2(benchmark, id_col, text_col, k)
        .select("_s", "_s2")
        .distinct()
    )
    hits = train.join(F.broadcast(bench), ["_s", "_s2"], "leftsemi")
    return windows_to_spans(hits, k, id_col="_id", pos_col="_pos")


def contaminated_spans_oracle(
    id_col: str,
    text_col: str,
    table: str,
    bench_pred: str,
    doc_pred: str,
    k: int = DEFAULT_SPAN_K,
) -> str:
    train_t = f"(SELECT * FROM {table} WHERE {doc_pred})"
    bench_t = f"(SELECT * FROM {table} WHERE {bench_pred})"
    return f"""
        WITH _tr AS ({_span_stream_sql(id_col, text_col, train_t, k)}),
        _bs AS (SELECT DISTINCT _s, _s2
                FROM ({_span_stream_sql(id_col, text_col, bench_t, k)})),
        _isl AS (
          SELECT _id, _pos,
                 _pos - row_number() OVER (PARTITION BY _id ORDER BY _pos) AS _g
          FROM _tr SEMI JOIN _bs USING (_s, _s2)
        )
        SELECT _id AS doc_id,
               min(_pos)::BIGINT AS span_start,
               (max(_pos) - min(_pos) + {k})::BIGINT AS span_toks,
               count(*)::BIGINT AS n_windows
        FROM _isl GROUP BY _id, _g
    """


def decontaminate_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    k: int = DEFAULT_SPAN_K,
) -> DataFrame:
    """The decontamination ACTION: materialize corpus docs with every
    benchmark-overlap span cut out — (doc_id, clean_text, n_toks,
    removed_toks). Every occurrence of a benchmark-hit window is removed
    (no keeper: benchmark text must not survive in training data,
    anywhere), via the same coalesce-spans-then-cut machinery as
    substring_dedup_clean. Completes the contamination surface:
    contamination flags, contaminated_spans locates, this cuts.

    Scale: identical to contaminated_spans (broadcast benchmark windows,
    map-side semi join) plus the one text-bearing reassembly the output
    is."""
    train = _gram_stream2(df, id_col, text_col, k)
    bench = (
        _gram_stream2(benchmark, id_col, text_col, k)
        .select("_s", "_s2")
        .distinct()
    )
    rm = (
        train.join(F.broadcast(bench), ["_s", "_s2"], "leftsemi")
        .select("_id", "_pos")
    )
    return _cut_window_positions(df, rm, id_col, text_col, k)


def decontaminate_clean_oracle(
    id_col: str,
    text_col: str,
    table: str,
    bench_pred: str,
    doc_pred: str,
    k: int = DEFAULT_SPAN_K,
) -> str:
    train_t = f"(SELECT * FROM {table} WHERE {doc_pred})"
    bench_t = f"(SELECT * FROM {table} WHERE {bench_pred})"
    return f"""
        WITH _tr AS ({_span_stream_sql(id_col, text_col, train_t, k)}),
        _bs AS (SELECT DISTINCT _s, _s2
                FROM ({_span_stream_sql(id_col, text_col, bench_t, k)})),
        _rm AS (SELECT _id, _pos FROM _tr SEMI JOIN _bs USING (_s, _s2)),
        _isl AS (
          SELECT _id, _pos,
                 _pos - row_number() OVER (PARTITION BY _id ORDER BY _pos) AS _g
          FROM _rm
        ),
        _sp AS (SELECT _id, min(_pos) AS _a, max(_pos) + {k} AS _b
                FROM _isl GROUP BY _id, _g),
        _tok AS (
          SELECT _id, unnest(range(len(_t))) AS _pos, unnest(_t) AS _tok
          FROM (SELECT {id_col}::BIGINT AS _id,
                       {TH.tokens(text_col, "duckdb")} AS _t
                FROM {train_t})
        ),
        _keep2 AS (
          SELECT t._id, t._pos, t._tok FROM _tok t
          WHERE NOT EXISTS (SELECT 1 FROM _sp p
                            WHERE p._id = t._id
                              AND t._pos >= p._a AND t._pos < p._b)
        ),
        _agg AS (SELECT _id, string_agg(_tok, ' ' ORDER BY _pos) AS clean_text,
                        count(*) AS _kept
                 FROM _keep2 GROUP BY _id),
        _n AS (SELECT _id, count(*) AS _n FROM _tok GROUP BY _id)
        SELECT b._id AS doc_id,
               coalesce(a.clean_text, '') AS clean_text,
               coalesce(n._n, 0)::BIGINT AS n_toks,
               (coalesce(n._n, 0) - coalesce(a._kept, 0))::BIGINT AS removed_toks
        FROM (SELECT {id_col}::BIGINT AS _id FROM {train_t}) b
        LEFT JOIN _agg a USING (_id) LEFT JOIN _n n USING (_id)
    """
