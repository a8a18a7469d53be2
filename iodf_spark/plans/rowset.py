"""Row-set (bitmap) algebra — the Spark rendition of the reference's LBits
(utils/LBits.scala:12-75) and its set-algebra kernels (ioseq/IoBits.scala:
187-348, SURVEY.md section 2.4).

Representations, mirroring the reference's dense/sparse adaptivity
(utils/LBits.scala:107-114 picks DenseIoBits when f*256 > n, sparse id
arrays otherwise; dense kernels DenseIoBits.scala:149-326):

1. **Predicate path** (default): a row set IS a boolean Column over the data
   DataFrame. AND/OR/NOT are Column algebra; `f` (popcount, LBits.scala:18)
   is `filter(pred).count()`. Catalyst pushes predicates into the Parquet
   scan; Tungsten vectorizes. Used when no materialized index exists.

2. **Posting path** (:class:`PostingSet`): a row set is a DataFrame of
   per-bucket rows `(bucket: long, row_ids: array<long> | null,
   words: array<long> | null)` — exactly one of the two encodings non-null
   per row, chosen by the reference's density rule at build time:

   * *sparse*: sorted distinct row ids within the bucket — compact when
     f << bucket rows; kernels are array_intersect/union/except.
   * *dense*: bucket_size/64 packed 64-bit words (bit i of word w = row
     ``bucket*bucket_size + w*64 + i``) — 64x smaller than an id array at
     full density; kernels are zip_with bitwise ops + bit_count popcounts,
     the Spark expression analog of DenseIoBits' long-word loops.

   Mixed-encoding ops never materialize the big side: AND/ANDNOT against a
   dense bucket filter the sparse ids with an O(1) bit_get membership test;
   only OR/ANDNOT *into* a dense bucket scatter the (small) sparse side
   into words via one bit_or aggregation. Set algebra stays JVM-side and
   bucket-local; no row explosion, no driver collect; arrays are capped at
   bucket_size so giant posting lists stay distributed.

`merge` is **concatenation** of row spaces (offsets shifted), NOT logical OR
(ioseq/IoBits.scala:328-348 — see SURVEY.md B5): `a.merge(b)` has
n = a.n + b.n and b's ids shifted by a.n.

All representation combinations must agree; tests/test_rowset.py checks the
dense x sparse x adaptive matrix against a pure-Python ground truth
(mirroring BitsTest.scala:237-281's representation matrix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKET_SIZE = 1 << 16
WORD_BITS = 64
# the reference's adaptivity rule: dense when f * 2^8 > n
DENSITY_SHIFT = 8


def dense_preferred(f: int, n: int) -> bool:
    """utils/LBits.scala:107-114: pick the packed-words encoding when the
    set holds more than n/256 ids (a 64Ki bucket of packed words costs 8 KiB
    — the break-even vs 8-byte ids is f = bucket/256 exactly)."""
    return (f << DENSITY_SHIFT) > n


def _n_words(bucket_size: int) -> int:
    return -(-bucket_size // WORD_BITS)


def _member(x: str, words: str, bucket_size: int) -> str:
    """SQL: is global row id `x` set in the same-bucket dense `words`.
    Bit position is pos%64 of the WITHIN-BUCKET position (pos = x mod
    bucket_size) — for bucket sizes that are multiples of 64 this equals
    x mod 64, but the general form also handles tiny test buckets."""
    return (
        f"bit_get({words}[cast(pmod({x}, {bucket_size}) div {WORD_BITS} as int)], "
        f"cast(pmod(pmod({x}, {bucket_size}), {WORD_BITS}) as int)) = 1"
    )


_POPCOUNT = (
    "CASE WHEN words IS NOT NULL THEN aggregate(words, 0L, (_a, _w) -> _a + bit_count(_w)) "
    "ELSE cast(size(row_ids) as long) END"
)

_NONEMPTY = "coalesce(size(row_ids) > 0, exists(words, _w -> _w != 0))"


def _assemble_words(es: str, nw: int) -> str:
    """SQL: fixed-length words array from SORTED (word-index, word) entry
    structs — gap-filled with zero words by run-length concat. O(k + nw)
    per row with O(1) array subscripts. (A map + element_at gap fill is the
    obvious alternative, but element_at on a Spark map is a LINEAR scan —
    nw lookups x k entries made index materialization ~25x slower.)"""
    last = f"size({es}) - 1"
    return (
        f"concat("
        f"array_repeat(0L, element_at({es}, 1)._w), "
        f"flatten(transform(sequence(0, {last}), _i -> "
        f"concat(array(element_at({es}, _i + 1)._word), "
        f"array_repeat(0L, (CASE WHEN _i = {last} THEN {nw} "
        f"ELSE element_at({es}, _i + 2)._w END) - element_at({es}, _i + 1)._w - 1)))))"
    )


def _expand_words_ids(words: str, bucket: str, bucket_size: int) -> str:
    """SQL: dense words -> sorted global row-id array (per-row expression
    form of explode_posting's dense branch; used only on rare mixed or
    sub-word-bucket rows)."""
    wb = WORD_BITS
    return (
        f"flatten(transform(sequence(0, size({words}) - 1), _w -> "
        f"transform(filter(sequence(0, {wb - 1}), "
        f"_b -> bit_get(element_at({words}, _w + 1), cast(_b as int)) = 1), "
        f"_b -> {bucket} * {bucket_size}L + _w * {wb}L + _b)))"
    )


def _shift_word_expr(src: str, nw: int, base: str, sb: int) -> str:
    """SQL: target word _w of a words array shifted UP by (ws words + sb
    bits), reading source words (_w + {base}) and (_w + {base} - 1) with
    out-of-range reads as zero. Callers inline it under transform(sequence)
    with `base` an arithmetic expression in _w."""
    def at(i: str) -> str:
        return (
            f"(CASE WHEN ({i}) >= 0 AND ({i}) < {nw} "
            f"THEN element_at({src}, ({i}) + 1) ELSE 0L END)"
        )

    if sb == 0:
        return at(base)
    return (
        f"(shiftleft({at(base)}, {sb}) | "
        f"shiftrightunsigned({at(f'({base}) - 1')}, {WORD_BITS - sb}))"
    )


def shift_posting_contribs(
    df: DataFrame, key_cols: list[str], offset: int, bucket_size: int
) -> DataFrame:
    """Shift posting rows by +offset BUCKET-LOCALLY — no id explosion.

    Each source bucket's ids land in at most TWO target buckets, so every
    row yields a 'low' and 'high' contribution: sparse arrays are
    filter+transform'd in place; dense words arrays are shifted with
    word/bit-shift expressions (8 KiB stays 8 KiB — the explode
    alternative blows a full bucket up to bucket_size shuffle records,
    a 64-4000x record amplification this path avoids). Output schema:
    (*key_cols, bucket, _src, row_ids, words) where _src is the
    contribution's first global target position — sorting a target
    bucket's contributions by _src yields ascending id ranges, so the
    combine (``regroup_posting_contribs``) is a concat, not a sort-merge.

    Dense word-shift needs whole words (bucket_size % 64 == 0 — the
    production geometry); sub-word test buckets expand their (tiny) dense
    rows to ids first.
    """
    bs, wb = bucket_size, WORD_BITS
    q, r = divmod(offset, bs)
    keys = [F.col(k) for k in key_cols]
    if r == 0:
        return df.select(
            *keys,
            (F.col("bucket") + q).alias("bucket"),
            (F.col("bucket") * bs + offset).alias("_src"),
            F.expr(f"transform(row_ids, _x -> _x + {offset}L)").alias("row_ids"),
            "words",
        )
    nw = _n_words(bs)
    ws, sb = divmod(r, wb)
    if bs % wb != 0:
        # sub-word buckets (tests only): no whole-word shift exists — turn
        # dense rows sparse, then the sparse split below covers everything
        df = df.select(
            *keys,
            "bucket",
            F.expr(
                "CASE WHEN row_ids IS NOT NULL THEN row_ids ELSE "
                f"{_expand_words_ids('words', 'bucket', bs)} END"
            ).alias("row_ids"),
            F.lit(None).cast("array<long>").alias("words"),
        )
    low_ids = (
        f"transform(filter(row_ids, _x -> pmod(_x, {bs}) < {bs - r}), "
        f"_x -> _x + {offset}L)"
    )
    high_ids = (
        f"transform(filter(row_ids, _x -> pmod(_x, {bs}) >= {bs - r}), "
        f"_x -> _x + {offset}L)"
    )
    low_words = (
        f"transform(sequence(0, {nw - 1}), _w -> "
        f"{_shift_word_expr('words', nw, f'_w - {ws}', sb)})"
    )
    high_words = (
        f"transform(sequence(0, {nw - 1}), _w -> "
        f"{_shift_word_expr('words', nw, f'_w + {nw - ws}', sb)})"
    )
    both = df.select(
        *keys,
        F.explode(
            F.expr(
                f"array("
                f"named_struct("
                f"  'bucket', bucket + {q}L,"
                f"  '_src', bucket * {bs}L + {offset}L,"
                f"  'row_ids', CASE WHEN row_ids IS NULL THEN NULL ELSE {low_ids} END,"
                f"  'words', CASE WHEN words IS NULL THEN NULL ELSE {low_words} END),"
                f"named_struct("
                f"  'bucket', bucket + {q + 1}L,"
                f"  '_src', (bucket + {q + 1}L) * {bs}L,"
                f"  'row_ids', CASE WHEN row_ids IS NULL THEN NULL ELSE {high_ids} END,"
                f"  'words', CASE WHEN words IS NULL THEN NULL ELSE {high_words} END))"
            )
        ).alias("_c"),
    ).select(
        *keys,
        F.col("_c.bucket").alias("bucket"),
        F.col("_c._src").alias("_src"),
        F.col("_c.row_ids").alias("row_ids"),
        F.col("_c.words").alias("words"),
    )
    return both.filter(F.expr(_NONEMPTY))


def regroup_posting_contribs(
    contribs: DataFrame, key_cols: list[str], bucket_size: int
) -> DataFrame:
    """Combine shifted contributions into one posting row per (key, bucket).

    Contributions within a bucket are disjoint ascending position ranges
    (by _src order), so: all-sparse buckets concat via flatten (already
    sorted — no per-id sort); all-dense buckets fold with a word-OR; mixed
    buckets (adjacent source rows of different encodings — rare) expand
    their dense side and emit sorted sparse. One shuffle over posting ROWS.
    """
    nw = _n_words(bucket_size)
    grouped = contribs.groupBy(*key_cols, "bucket").agg(
        F.sort_array(F.collect_list(F.struct("_src", "row_ids", "words"))).alias("_cs")
    )
    expand = _expand_words_ids("_c.words", "bucket", bucket_size)
    all_sparse = "forall(_cs, _c -> _c.words IS NULL)"
    all_dense = "forall(_cs, _c -> _c.row_ids IS NULL)"
    sparse_out = "flatten(transform(_cs, _c -> _c.row_ids))"
    dense_out = (
        f"aggregate(_cs, array_repeat(0L, {nw}), "
        f"(_acc, _c) -> zip_with(_acc, _c.words, (_x, _y) -> _x | _y))"
    )
    mixed_out = (
        f"sort_array(flatten(transform(_cs, "
        f"_c -> coalesce(_c.row_ids, {expand}))))"
    )
    return grouped.select(
        *key_cols,
        "bucket",
        F.expr(
            f"CASE WHEN {all_dense} THEN NULL "
            f"WHEN {all_sparse} THEN {sparse_out} "
            f"ELSE {mixed_out} END"
        ).alias("row_ids"),
        F.expr(
            f"CASE WHEN {all_dense} THEN {dense_out} ELSE NULL END"
        ).alias("words"),
    )


def predicate_counts(df: DataFrame, pred_a: Column, pred_b: Column) -> DataFrame:
    """One-pass (n, fa, fb, fab) for two predicates — the predicate-path
    `f`/`fAnd` (LBits.scala:18, utils/LBits.scala:116-160) batched into a
    single aggregation (partial + final agg, one job, no shuffle beyond the
    final combine)."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(pred_a).alias("fa"),
        F.count_if(pred_b).alias("fb"),
        F.count_if(pred_a & pred_b).alias("fab"),
    )


def explode_posting(df: DataFrame, id_cols: list[str], bucket_size: int) -> DataFrame:
    """Dual-encoding `trues` scan: (id_cols..., bucket, row_ids|words) ->
    (id_cols..., row_id). Sparse rows explode their arrays; dense rows
    posexplode words, skip zero words, and expand set bits."""
    if "words" not in df.columns:
        return df.select(*id_cols, F.explode("row_ids").alias("row_id"))
    sparse = df.filter(F.col("row_ids").isNotNull()).select(
        *id_cols, F.explode("row_ids").alias("row_id")
    )
    dense = (
        df.filter(F.col("words").isNotNull())
        .select(*id_cols, "bucket", F.posexplode("words").alias("_w", "_word"))
        .filter(F.col("_word") != 0)
        .select(
            *id_cols,
            F.explode(
                F.expr(
                    f"transform(filter(sequence(0, {WORD_BITS - 1}), "
                    f"_b -> bit_get(_word, cast(_b as int)) = 1), "
                    f"_b -> bucket * {bucket_size}L + _w * {WORD_BITS}L + _b)"
                )
            ).alias("row_id"),
        )
    )
    return sparse.unionByName(dense)


class PostingSet:
    """Bucketed posting-list / packed-bitmap row set over ``n`` rows.

    df schema: (bucket: long, row_ids: array<long> | null, words:
    array<long> | null) — per row exactly one encoding non-null. Sparse
    arrays are sorted ascending, distinct, within the bucket's id range;
    dense words arrays have exactly bucket_size/64 elements. Buckets with
    no set bits may be absent.
    """

    BOTH = frozenset(("sparse", "dense"))

    def __init__(
        self,
        df: DataFrame,
        n: int,
        bucket_size: int = DEFAULT_BUCKET_SIZE,
        encodings: frozenset | None = None,
    ):
        self.df = self._with_dual(df)
        self.n = int(n)
        self.bucket_size = bucket_size
        # which physical encodings MAY appear among this set's rows — static
        # plan-time knowledge, like a join hint: constructors know it exactly,
        # probes of an adaptive index don't (both possible). Ops use it to
        # pick specialized single-expression kernels over the general dual
        # CASE kernels (and to skip the scatter sub-plan entirely when a
        # mixed bucket is statically impossible).
        self.encodings = frozenset(encodings) if encodings else self.BOTH

    @staticmethod
    def _with_dual(df: DataFrame) -> DataFrame:
        if "words" not in df.columns:
            df = df.withColumn("words", F.lit(None).cast("array<long>"))
        if "row_ids" not in df.columns:
            df = df.withColumn("row_ids", F.lit(None).cast("array<long>"))
        return df.select("bucket", "row_ids", "words")

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_predicate(
        cls,
        data: DataFrame,
        pred: Column,
        n: int,
        bucket_size: int = DEFAULT_BUCKET_SIZE,
        encoding: str = "sparse",
    ) -> "PostingSet":
        """Materialize a predicate into posting rows (index-build shape:
        Dfs.scala:357-366). One shuffle on bucket (map-side partial agg);
        `encoding` is "sparse" | "dense" | "adaptive" (the reference's
        f*256 > n rule; adaptive pays one count job to decide)."""
        return cls._from_ids(data.filter(pred).select("row_id"), n, bucket_size, encoding)

    @classmethod
    def from_row_ids(
        cls,
        ids: DataFrame,
        n: int,
        bucket_size: int = DEFAULT_BUCKET_SIZE,
        encoding: str = "sparse",
    ) -> "PostingSet":
        return cls._from_ids(ids, n, bucket_size, encoding)

    @classmethod
    def _from_ids(
        cls, ids: DataFrame, n: int, bucket_size: int, encoding: str
    ) -> "PostingSet":
        if encoding == "adaptive":
            f = ids.count()
            encoding = "dense" if dense_preferred(f, n) else "sparse"
        if encoding == "dense":
            return cls(
                cls._ids_to_words(ids, bucket_size), n, bucket_size, {"dense"}
            )
        df = (
            ids.select(
                (F.col("row_id") / bucket_size).cast("long").alias("bucket"), "row_id"
            )
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_set("row_id")).alias("row_ids"))
        )
        return cls(df, n, bucket_size, {"sparse"})

    @staticmethod
    def _ids_to_words(ids: DataFrame, bucket_size: int) -> DataFrame:
        """Distributed scatter (row_id) -> (bucket, words): bit_or partial
        aggregation per 64-bit word, then per-bucket gap-filled assembly —
        both stages codegen aggregates, one shuffle."""
        nw = _n_words(bucket_size)
        return (
            ids.select(
                (F.col("row_id") / bucket_size).cast("long").alias("bucket"),
                F.expr(
                    f"cast(pmod(row_id, {bucket_size}) div {WORD_BITS} as int)"
                ).alias("_w"),
                F.expr(
                    f"shiftleft(1L, cast(pmod(pmod(row_id, {bucket_size}), {WORD_BITS}) as int))"
                ).alias("_bit"),
            )
            .groupBy("bucket", "_w")
            .agg(F.expr("bit_or(_bit)").alias("_word"))
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_list(F.struct("_w", "_word"))).alias("_es"))
            .select("bucket", F.expr(_assemble_words("_es", nw)).alias("words"))
        )

    @classmethod
    def from_positions(
        cls,
        spark: SparkSession,
        positions: list[int],
        n: int,
        bucket_size: int = DEFAULT_BUCKET_SIZE,
        encoding: str = "sparse",
    ) -> "PostingSet":
        ids = spark.createDataFrame([(int(p),) for p in positions], "row_id long")
        return cls.from_row_ids(ids.distinct(), n, bucket_size, encoding)

    @classmethod
    def empty(
        cls, spark: SparkSession, n: int, bucket_size: int = DEFAULT_BUCKET_SIZE
    ) -> "PostingSet":
        return cls(
            spark.createDataFrame([], "bucket long, row_ids array<long>"),
            n,
            bucket_size,
            {"sparse"},
        )

    @classmethod
    def full(
        cls, spark: SparkSession, n: int, bucket_size: int = DEFAULT_BUCKET_SIZE
    ) -> "PostingSet":
        """All rows 0..n-1, generated distributively as packed words (a full
        set is maximally dense — DenseIoBits is the reference's encoding for
        it too)."""
        df = cls._universe_dual(spark, n, bucket_size).select(
            "bucket", F.col("u_words").alias("words")
        )
        return cls(df, n, bucket_size, {"dense"})

    @staticmethod
    def _universe_dual(spark: SparkSession, n: int, bucket_size: int) -> DataFrame:
        """Per-bucket universe in BOTH encodings (tail clipped to n). The
        unused encoding is only referenced under a CASE branch downstream,
        so it is never evaluated for rows that don't need it."""
        bs, wb = bucket_size, WORD_BITS
        nw = _n_words(bs)
        n_buckets = -(-n // bs)  # 0 buckets when n == 0
        # valid bits in word _w of this bucket: clip to BOTH the bucket size
        # and the row-space tail n
        valid = f"(least({bs}L, {n}L - id * {bs}) - _w * {wb})"
        return spark.range(n_buckets).select(
            F.col("id").alias("bucket"),
            F.expr(f"sequence(id * {bs}, least(id * {bs} + {bs}, {n}L) - 1)").alias(
                "u_ids"
            ),
            # low-k-bits mask as an UNSIGNED right shift of all-ones:
            # the textbook shiftleft(1, k) - 1 overflows under ANSI mode at
            # exactly k = 63 (1<<63 = Long.MIN, MIN - 1 throws) — hit by any
            # row space whose tail word holds 63 valid bits (hypothesis-
            # caught via bs=64, n=63)
            F.expr(
                f"transform(sequence(0, {nw - 1}), _w -> "
                f"CASE WHEN {valid} >= {wb} THEN -1L "
                f"WHEN {valid} <= 0 THEN 0L "
                f"ELSE shiftrightunsigned(-1L, cast({wb} - {valid} as int)) END)"
            ).alias("u_words"),
        )

    # -- algebra (bucket-local, JVM-side kernels) ---------------------------

    def _check(self, other: "PostingSet") -> None:
        if self.n != other.n or self.bucket_size != other.bucket_size:
            raise ValueError(
                f"row-space mismatch: ({self.n},{self.bucket_size}) vs "
                f"({other.n},{other.bucket_size})"
            )

    def _sides(self, other: "PostingSet") -> tuple[DataFrame, DataFrame]:
        a = self.df.select(
            "bucket",
            F.col("row_ids").alias("a_ids"),
            F.col("words").alias("a_words"),
        )
        b = other.df.select(
            "bucket",
            F.col("row_ids").alias("b_ids"),
            F.col("words").alias("b_words"),
        )
        return a, b

    def _pure(self, enc: str) -> bool:
        return self.encodings == frozenset((enc,))

    def __and__(self, other: "PostingSet") -> "PostingSet":
        """Materialized AND (ioseq/IoBits.scala:187-233; dense kernel
        DenseIoBits.scala:210-239). Inner join on bucket (co-partitioned) +
        per-row kernel: intersect (ss), word-AND (dd), or an O(sparse-side)
        bit_get membership filter (mixed — never expands the dense side).
        Statically-known encodings compile to the bare kernel instead of the
        general dual CASE."""
        self._check(other)
        bs = self.bucket_size
        a, b = self._sides(other)
        j = a.join(b, "bucket", "inner")
        if self._pure("sparse") and other._pure("sparse"):
            df = j.select(
                "bucket", F.array_intersect("a_ids", "b_ids").alias("row_ids")
            ).filter(F.size("row_ids") > 0)
            return PostingSet(df, self.n, bs, {"sparse"})
        if self._pure("dense") and other._pure("dense"):
            df = j.select(
                "bucket",
                F.expr("zip_with(a_words, b_words, (_x, _y) -> _x & _y)").alias("words"),
            ).filter(F.expr("exists(words, _w -> _w != 0)"))
            return PostingSet(df, self.n, bs, {"dense"})
        if self._pure("sparse") and other._pure("dense"):
            df = j.select(
                "bucket",
                F.expr(f"filter(a_ids, _x -> {_member('_x', 'b_words', bs)})").alias(
                    "row_ids"
                ),
            ).filter(F.size("row_ids") > 0)
            return PostingSet(df, self.n, bs, {"sparse"})
        if self._pure("dense") and other._pure("sparse"):
            df = j.select(
                "bucket",
                F.expr(f"filter(b_ids, _x -> {_member('_x', 'a_words', bs)})").alias(
                    "row_ids"
                ),
            ).filter(F.size("row_ids") > 0)
            return PostingSet(df, self.n, bs, {"sparse"})
        row_ids = F.expr(
            "CASE WHEN a_words IS NULL AND b_words IS NULL THEN array_intersect(a_ids, b_ids) "
            f"WHEN a_words IS NULL THEN filter(a_ids, _x -> {_member('_x', 'b_words', bs)}) "
            f"WHEN b_words IS NULL THEN filter(b_ids, _x -> {_member('_x', 'a_words', bs)}) "
            "ELSE NULL END"
        )
        words = F.expr(
            "CASE WHEN a_words IS NOT NULL AND b_words IS NOT NULL "
            "THEN zip_with(a_words, b_words, (_x, _y) -> _x & _y) ELSE NULL END"
        )
        df = (
            j.select("bucket", row_ids.alias("row_ids"), words.alias("words"))
            .filter(F.expr(_NONEMPTY))
        )
        return PostingSet(df, self.n, bs)

    def __or__(self, other: "PostingSet") -> "PostingSet":
        """Logical OR — absent in the reference (SURVEY.md B8) but free here.
        Full-outer join; ss/dd/one-sided buckets are single expressions;
        mixed buckets scatter the sparse side into words (bit_or agg over
        just those ids) and word-OR — the dense side is never exploded."""
        self._check(other)
        bs = self.bucket_size
        a, b = self._sides(other)
        j = a.join(b, "bucket", "full_outer")
        if self._pure("sparse") and other._pure("sparse"):
            df = j.select(
                "bucket",
                F.sort_array(
                    F.array_union(
                        F.coalesce("a_ids", F.array().cast("array<long>")),
                        F.coalesce("b_ids", F.array().cast("array<long>")),
                    )
                ).alias("row_ids"),
            )
            return PostingSet(df, self.n, bs, {"sparse"})
        if self._pure("dense") and other._pure("dense"):
            nw = _n_words(bs)
            df = j.select(
                "bucket",
                F.expr(
                    f"zip_with(coalesce(a_words, array_repeat(0L, {nw})), "
                    f"coalesce(b_words, array_repeat(0L, {nw})), (_x, _y) -> _x | _y)"
                ).alias("words"),
            )
            return PostingSet(df, self.n, bs, {"dense"})
        mixed = F.expr(
            "(a_words IS NOT NULL AND b_ids IS NOT NULL) OR "
            "(a_ids IS NOT NULL AND b_words IS NOT NULL)"
        )
        easy = j.filter(~mixed).select(
            "bucket",
            F.expr(
                "CASE WHEN a_ids IS NULL AND a_words IS NULL THEN b_ids "
                "WHEN b_ids IS NULL AND b_words IS NULL THEN a_ids "
                "WHEN a_ids IS NOT NULL AND b_ids IS NOT NULL "
                "THEN sort_array(array_union(a_ids, b_ids)) ELSE NULL END"
            ).alias("row_ids"),
            F.expr(
                "CASE WHEN a_ids IS NULL AND a_words IS NULL THEN b_words "
                "WHEN b_ids IS NULL AND b_words IS NULL THEN a_words "
                "WHEN a_words IS NOT NULL AND b_words IS NOT NULL "
                "THEN zip_with(a_words, b_words, (_x, _y) -> _x | _y) ELSE NULL END"
            ).alias("words"),
        )
        hard = j.filter(mixed).select(
            "bucket",
            F.coalesce("a_words", "b_words").alias("_dw"),
            F.coalesce("a_ids", "b_ids").alias("_si"),
        )
        scattered = self._ids_to_words(
            hard.select("bucket", F.explode("_si").alias("row_id")), bs
        ).withColumnRenamed("words", "_sw")
        # LEFT join + zero-words fallback: if a mixed bucket's sparse array
        # were empty (explode yields nothing, so `scattered` misses the
        # bucket), an inner join would silently drop the bucket's dense
        # words — the no-empty-arrays invariant is not enforced for
        # externally supplied DataFrames, so don't rely on it here.
        nw = _n_words(bs)
        merged = (
            hard.join(scattered, "bucket", "left_outer")
            .select(
                "bucket",
                F.lit(None).cast("array<long>").alias("row_ids"),
                F.expr(
                    f"zip_with(_dw, coalesce(_sw, array_repeat(0L, {nw})), "
                    "(_x, _y) -> _x | _y)"
                ).alias("words"),
            )
        )
        return PostingSet(easy.unionByName(merged), self.n, bs)

    def andnot(self, other: "PostingSet") -> "PostingSet":
        """A AND NOT B (ioseq/IoBits.scala:235-302). Left join; the only
        scatter is clearing a (small) sparse B out of a dense A."""
        self._check(other)
        bs = self.bucket_size
        a, b = self._sides(other)
        j = a.join(b, "bucket", "left_outer")
        if self._pure("sparse"):
            # result is a subset of a sparse A: never needs a scatter
            if other._pure("sparse"):
                expr = (
                    "CASE WHEN b_ids IS NULL THEN a_ids "
                    "ELSE array_except(a_ids, b_ids) END"
                )
            elif other._pure("dense"):
                expr = (
                    "CASE WHEN b_words IS NULL THEN a_ids "
                    f"ELSE filter(a_ids, _x -> NOT ({_member('_x', 'b_words', bs)})) END"
                )
            else:
                expr = (
                    "CASE WHEN b_ids IS NULL AND b_words IS NULL THEN a_ids "
                    "WHEN b_ids IS NOT NULL THEN array_except(a_ids, b_ids) "
                    f"ELSE filter(a_ids, _x -> NOT ({_member('_x', 'b_words', bs)})) END"
                )
            df = j.select("bucket", F.expr(expr).alias("row_ids")).filter(
                F.size("row_ids") > 0
            )
            return PostingSet(df, self.n, bs, {"sparse"})
        if self._pure("dense") and other._pure("dense"):
            nw = _n_words(bs)
            df = j.select(
                "bucket",
                F.expr(
                    f"zip_with(a_words, coalesce(b_words, array_repeat(0L, {nw})), "
                    "(_x, _y) -> _x & ~_y)"
                ).alias("words"),
            ).filter(F.expr("exists(words, _w -> _w != 0)"))
            return PostingSet(df, self.n, bs, {"dense"})
        hard_cond = F.expr("a_words IS NOT NULL AND b_ids IS NOT NULL")
        easy = j.filter(~hard_cond).select(
            "bucket",
            F.expr(
                "CASE WHEN a_ids IS NOT NULL AND b_ids IS NULL AND b_words IS NULL THEN a_ids "
                "WHEN a_ids IS NOT NULL AND b_ids IS NOT NULL THEN array_except(a_ids, b_ids) "
                f"WHEN a_ids IS NOT NULL THEN filter(a_ids, _x -> NOT ({_member('_x', 'b_words', bs)})) "
                "ELSE NULL END"
            ).alias("row_ids"),
            F.expr(
                "CASE WHEN a_words IS NOT NULL AND b_words IS NOT NULL "
                "THEN zip_with(a_words, b_words, (_x, _y) -> _x & ~_y) "
                "WHEN a_words IS NOT NULL THEN a_words ELSE NULL END"
            ).alias("words"),
        )
        hard = j.filter(hard_cond).select("bucket", "a_words", "b_ids")
        scattered = self._ids_to_words(
            hard.select("bucket", F.explode("b_ids").alias("row_id")), bs
        ).withColumnRenamed("words", "_sw")
        # LEFT join + zero-words fallback — see __or__: an empty sparse B
        # array must clear nothing, not drop the dense A bucket.
        nw = _n_words(bs)
        merged = (
            hard.join(scattered, "bucket", "left_outer")
            .select(
                "bucket",
                F.lit(None).cast("array<long>").alias("row_ids"),
                F.expr(
                    f"zip_with(a_words, coalesce(_sw, array_repeat(0L, {nw})), "
                    "(_x, _y) -> _x & ~_y)"
                ).alias("words"),
            )
        )
        df = easy.unionByName(merged).filter(F.expr(_NONEMPTY))
        return PostingSet(df, self.n, bs)

    def __invert__(self) -> "PostingSet":
        """Complement with tail masking (ioseq/IoBits.scala:304-326;
        DenseIoBits.scala:241-261): per-bucket universe joined left; sparse
        rows subtract ids, dense rows word-ANDNOT, absent buckets become
        full (dense) universe rows."""
        spark = self.df.sparkSession
        bs = self.bucket_size
        u = self._universe_dual(spark, self.n, bs)
        j = u.join(self.df, "bucket", "left_outer")
        if self._pure("sparse"):
            df = j.select(
                "bucket",
                F.expr(
                    "array_except(u_ids, coalesce(row_ids, array()))"
                ).alias("row_ids"),
            ).filter(F.size("row_ids") > 0)
            return PostingSet(df, self.n, bs, {"sparse"})
        if self._pure("dense"):
            nw = _n_words(bs)
            df = j.select(
                "bucket",
                F.expr(
                    f"zip_with(u_words, coalesce(words, array_repeat(0L, {nw})), "
                    "(_u, _x) -> _u & ~_x)"
                ).alias("words"),
            ).filter(F.expr("exists(words, _w -> _w != 0)"))
            return PostingSet(df, self.n, bs, {"dense"})
        df = j.select(
            "bucket",
            F.expr(
                "CASE WHEN row_ids IS NOT NULL THEN array_except(u_ids, row_ids) "
                "ELSE NULL END"
            ).alias("row_ids"),
            F.expr(
                "CASE WHEN row_ids IS NOT NULL THEN NULL "
                "WHEN words IS NOT NULL THEN zip_with(u_words, words, (_u, _x) -> _u & ~_x) "
                "ELSE u_words END"
            ).alias("words"),
        ).filter(F.expr(_NONEMPTY))
        return PostingSet(df, self.n, bs)

    def merge(self, other: "PostingSet") -> "PostingSet":
        """Concatenation of row spaces (NOT logical OR — ioseq/IoBits.scala:
        328-348, SURVEY.md B5): result has n = a.n + b.n, b's ids shifted by
        a.n. When a.n is bucket-aligned the shift is a pure bucket renumber
        for BOTH encodings (dense words don't change at all) and buckets are
        disjoint — a no-shuffle union. Otherwise b's rows shift
        BUCKET-LOCALLY (shift_posting_contribs: sparse arrays split in
        place, dense words word/bit-shift — never exploded to ids), the
        single straddling a-bucket joins them as one more contribution, and
        one posting-ROW shuffle regroups; a's other buckets pass through
        untouched."""
        if self.bucket_size != other.bucket_size:
            raise ValueError("bucket_size mismatch")
        bs = self.bucket_size
        offset = self.n
        if offset % bs == 0:
            shifted = other.df.select(
                (F.col("bucket") + offset // bs).alias("bucket"),
                F.expr(f"transform(row_ids, _x -> _x + {offset}L)").alias("row_ids"),
                "words",
            )
            return PostingSet(
                self.df.unionByName(shifted),
                self.n + other.n,
                bs,
                self.encodings | other.encodings,
            )
        sb = offset // bs  # the only a-bucket b's shifted ids can touch
        a_clean = self.df.filter(F.col("bucket") != sb)
        a_straddle = self.df.filter(F.col("bucket") == sb).select(
            "bucket",
            (F.col("bucket") * bs).alias("_src"),  # a precedes b at bucket sb
            "row_ids",
            "words",
        )
        contribs = a_straddle.unionByName(
            shift_posting_contribs(other.df, [], offset, bs)
        )
        combined = regroup_posting_contribs(contribs, [], bs)
        return PostingSet(
            a_clean.unionByName(combined), self.n + other.n, bs
        )

    def view(self, start: int, until: int) -> "PostingSet":
        """Row-range slice re-based to 0 (Df.scala:96-114, LBits view
        utils/LBits.scala:77-104): keep ids in [start, until), subtract
        start, re-bucket.

        Bucket-aligned fast path (the reference's view is O(1) lazy; this
        is the distributed equivalent): when start is a bucket multiple and
        until is too (or covers the tail), the slice is a pure bucket
        filter + renumber — dense words are byte-identical, sparse ids just
        shift, NO explode and NO shuffle. The general unaligned case falls
        back to id-level re-bucketing (one shuffle over the slice's ids)."""
        bs = self.bucket_size
        if start % bs == 0 and (until % bs == 0 or until >= self.n):
            b0, b1 = start // bs, -(-until // bs)
            df = self.df.filter(
                (F.col("bucket") >= b0) & (F.col("bucket") < b1)
            ).select(
                (F.col("bucket") - b0).alias("bucket"),
                F.expr(f"transform(row_ids, _x -> _x - {start}L)").alias("row_ids"),
                "words",
            )
            return PostingSet(df, min(until, self.n) - start, bs, self.encodings)
        ids = self.to_rows().filter(
            (F.col("row_id") >= start) & (F.col("row_id") < until)
        ).select((F.col("row_id") - start).alias("row_id"))
        # clamp like the aligned path: a view cannot extend past the row
        # space (Df.scala:104-107 composes views with min(a+d, b)) —
        # hypothesis-caught divergence: the unaligned path used to size the
        # result until-start, so view(1, n+1) grew n by 1
        return PostingSet.from_row_ids(
            ids, min(until, self.n) - start, self.bucket_size
        )

    # -- observations -------------------------------------------------------

    def f(self) -> int:
        """Popcount (LBits.scala:18; dense kernel DenseIoBits.scala:196-208
        = bit_count over words). Distributed sum of per-bucket cardinalities
        — no materialized AND needed for fAnd: (a & b).f() fuses into one
        join+agg job."""
        return int(self.f_col().collect()[0]["f"])

    def f_col(self) -> DataFrame:
        if self._pure("sparse"):
            pop = F.size("row_ids").cast("long")
        elif self._pure("dense"):
            pop = F.expr("aggregate(words, 0L, (_a, _w) -> _a + bit_count(_w))")
        else:
            pop = F.expr(_POPCOUNT)
        return self.df.agg(F.coalesce(F.sum(pop), F.lit(0)).cast("long").alias("f"))

    def to_rows(self) -> DataFrame:
        """Explode to a (row_id: long) DataFrame — the `trues` scanner
        equivalent (utils/MergeSortIterator.scala:34-36); in the DataFrame
        model a seekable cursor is just a filtered ordered scan."""
        if self._pure("sparse"):
            return self.df.select(F.explode("row_ids").alias("row_id"))
        return explode_posting(self.df, [], self.bucket_size)

    def trues_after(self, t: int, limit: int) -> DataFrame:
        """Seekable-cursor parity (B6): the first ``limit`` set ids >= ``t``,
        ascending — Scanner.seek semantics (utils/MergeSortIterator.scala:
        34-58; dense impl DenseIoBits.scala:254-307). The reference
        positions a cursor inside an mmap; the distributed rendition of
        "seek" is PRUNING plus top-k: only buckets >= t/bucket_size are
        decoded at all (the posting store is bucket-keyed, so the filter
        prunes before any explode), and sort+limit compiles to
        TakeOrderedAndProject — per-partition top-k, then a ``limit``-row
        driver merge; no global sort at any scale. Repeated calls with
        t = last_returned_id + 1 paginate the set exactly like the
        reference's cursor loop."""
        b0 = t // self.bucket_size
        pruned = PostingSet(
            self.df.filter(F.col("bucket") >= b0),
            self.n,
            self.bucket_size,
            self.encodings,
        )
        return (
            pruned.to_rows()
            .filter(F.col("row_id") >= t)
            .orderBy("row_id")
            .limit(limit)
        )

    def to_list(self) -> list[int]:
        """Driver-side sorted positions — TEST/debug only, never in the
        100 TB path."""
        return sorted(r["row_id"] for r in self.to_rows().collect())


# ---------------------------------------------------------------------------
# n-ary combinators: ONE shuffle regardless of arity


def _combine_and(bs: int) -> str:
    """SQL lambda body combining two posting duals under AND (same kernels
    as PostingSet.__and__, as a fold step). AND of any sparse side stays
    sparse; dense&dense stays dense."""
    null_arr = "CAST(NULL AS ARRAY<BIGINT>)"
    return (
        "CASE "
        "WHEN _acc.ids IS NOT NULL AND _it.ids IS NOT NULL THEN "
        f"named_struct('ids', array_intersect(_acc.ids, _it.ids), 'w', {null_arr}) "
        "WHEN _acc.ids IS NOT NULL THEN "
        f"named_struct('ids', filter(_acc.ids, _x -> {_member('_x', '_it.w', bs)}), 'w', {null_arr}) "
        "WHEN _it.ids IS NOT NULL THEN "
        f"named_struct('ids', filter(_it.ids, _x -> {_member('_x', '_acc.w', bs)}), 'w', {null_arr}) "
        f"ELSE named_struct('ids', {null_arr}, "
        "'w', zip_with(_acc.w, _it.w, (_p, _q) -> _p & _q)) END"
    )


def _scatter_or(ids: str, words: str, bs: int) -> str:
    """SQL: OR the (small, same-bucket) sparse `ids` into dense `words` —
    per-word pass over the id array, O(nw * |ids|) scalar bit ops, no
    explode and no extra job (the in-fold rendition of the binary OR's
    grouped scatter)."""
    wb = WORD_BITS
    return (
        f"transform({words}, (_wv, _wi) -> _wv | "
        f"aggregate({ids}, 0L, (_m, _x) -> IF("
        f"cast(pmod(_x, {bs}) div {wb} as int) = _wi, "
        f"_m | shiftleft(1L, cast(pmod(pmod(_x, {bs}), {wb}) as int)), _m)))"
    )


def _combine_or(bs: int) -> str:
    null_arr = "CAST(NULL AS ARRAY<BIGINT>)"
    return (
        "CASE "
        "WHEN _acc.ids IS NOT NULL AND _it.ids IS NOT NULL THEN "
        f"named_struct('ids', sort_array(array_union(_acc.ids, _it.ids)), 'w', {null_arr}) "
        "WHEN _acc.ids IS NOT NULL THEN "
        f"named_struct('ids', {null_arr}, 'w', {_scatter_or('_acc.ids', '_it.w', bs)}) "
        "WHEN _it.ids IS NOT NULL THEN "
        f"named_struct('ids', {null_arr}, 'w', {_scatter_or('_it.ids', '_acc.w', bs)}) "
        f"ELSE named_struct('ids', {null_arr}, "
        "'w', zip_with(_acc.w, _it.w, (_p, _q) -> _p | _q)) END"
    )


def _nary(sets: list["PostingSet"], combine: str, require_all: bool) -> "PostingSet":
    """Shared n-ary engine: tag-union all operands, ONE groupBy(bucket)
    shuffle, then fold the collected duals with the combine kernel. A
    k-long chain of binary ops plans k-1 SEQUENTIAL join stages (each a
    scheduling barrier; every operand still shuffles once); this is one
    wide aggregation stage at any arity — same shuffled volume, no
    serialized barrier chain, and no k-1 intermediate materializations.
    The shape the reference's fAnd chains (the coStats hot loop) want at
    100 TB.

    Fold-order independence: AND/OR are commutative+associative and both
    kernels preserve the sorted-ids invariant (array_intersect/filter keep
    the first argument's order; array_union is re-sorted), so the
    collect_list arrival order cannot change the result."""
    first = sets[0]
    for s in sets[1:]:
        first._check(s)
    if len(sets) == 1:
        return first
    k, bs = len(sets), first.bucket_size
    tagged = sets[0].df
    for s in sets[1:]:
        tagged = tagged.unionByName(s.df)
    grouped = tagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_k"),
        F.collect_list(
            F.struct(F.col("row_ids").alias("ids"), F.col("words").alias("w"))
        ).alias("_items"),
    )
    if require_all:
        grouped = grouped.filter(F.col("_k") == k)
    # NB: element_at/slice are 1-based while bare `arr[i]` subscripts are
    # 0-based in Spark SQL — mixing them here silently drops an operand
    folded = grouped.withColumn(
        "_r",
        F.expr(
            f"aggregate(slice(_items, 2, {k - 1}), element_at(_items, 1), "
            f"(_acc, _it) -> {combine})"
        ),
    )
    out = folded.select(
        "bucket",
        F.col("_r.ids").alias("row_ids"),
        F.col("_r.w").alias("words"),
    ).filter(F.expr(_NONEMPTY))
    encs = None
    if all(s._pure("dense") for s in sets):
        encs = {"dense"}
    elif require_all and any(s._pure("sparse") for s in sets):
        encs = {"sparse"}
    return PostingSet(out, first.n, bs, encs)


def intersect_all(sets: list["PostingSet"]) -> "PostingSet":
    """k-way AND in one stage (vs a k-1-deep binary join chain). Buckets absent from any operand are dropped by the _k == k gate before
    any kernel runs — the short-circuit the reference's fAnd loop gets from
    its sorted-bucket merge (ioseq/IoBits.scala:187-233)."""
    if not sets:
        raise ValueError("intersect_all: empty operand list")
    return _nary(sets, _combine_and(sets[0].bucket_size), require_all=True)


def union_all(sets: list["PostingSet"]) -> "PostingSet":
    """k-way OR in one stage. Mixed sparse/dense buckets scatter the
    sparse ids into words inside the fold (no explode, no extra job)."""
    if not sets:
        raise ValueError("union_all: empty operand list")
    return _nary(sets, _combine_or(sets[0].bucket_size), require_all=False)


def union_posting_rows(df: DataFrame, n: int, bucket_size: int) -> "PostingSet":
    """OR together ALL posting rows in ``df`` (any number of keys'
    contributions per bucket — the operand count is data-dependent, e.g.
    every index key matching a prefix) in ONE aggregation stage: the
    dynamic-arity sibling of :func:`union_all`, using size(_items) instead
    of a static k for the fold bounds."""
    combine = _combine_or(bucket_size)
    grouped = df.groupBy("bucket").agg(
        F.collect_list(
            F.struct(F.col("row_ids").alias("ids"), F.col("words").alias("w"))
        ).alias("_items")
    )
    folded = grouped.withColumn(
        "_r",
        F.expr(
            f"aggregate(slice(_items, 2, size(_items) - 1), "
            f"element_at(_items, 1), (_acc, _it) -> {combine})"
        ),
    )
    out = folded.select(
        "bucket",
        F.col("_r.ids").alias("row_ids"),
        F.col("_r.w").alias("words"),
    ).filter(F.expr(_NONEMPTY))
    return PostingSet(out, n, bucket_size)
