"""Deterministic sampling for training-data pipelines.

Spark's native sample()/sampleBy() draw from per-partition RNG streams —
reproducible only with identical partitioning, and not reproducible by an
external system at all. Corpus curation needs sampling decisions that are a
pure function of the ROW (so a re-run, a different cluster size, or an
auditing engine selects the exact same rows). These operators hash the key
with the shared integer polynomial hash (functions/texthash.py constants)
and keep a row iff hash mod 10000 falls under the rate — one narrow map,
no shuffle, pushdown-friendly, and the DuckDB oracle reproduces the exact
selection.

* :func:`deterministic_sample` — uniform rate over the whole table.
* :func:`stratified_sample` — per-class rates (e.g. downsample the
  dominant language, keep all of a rare class): rates come in as a small
  {class: rate} dict folded into a CASE expression — no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iodf_spark.functions.texthash import MOD, MULT, SEED

BUCKETS = 10_000  # rate resolution: 0.01%


def _bucket_expr(key: str) -> str:
    """Hash bucket in [0, BUCKETS) — identical text in both dialects (pure
    integer arithmetic on non-negative integral keys, so plain % works the
    same everywhere). The affine step (31x + 7 mod p) alone is a LATTICE in
    x: a contiguous id block maps to a contiguous bucket window, so a
    threshold keeps 0% or 100% of consecutive ids instead of ~rate
    (caught by the skewed-class rebalancing test). The quadratic mixing
    step (h² + h mod p) breaks the lattice; h < p ≈ 1e9 keeps h² + h well
    inside int64 in every engine."""
    affine = f"(({key} * {MULT} + {SEED}) % {MOD})"
    return f"(((({affine} * {affine}) + {affine}) % {MOD}) % {BUCKETS})"


def deterministic_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, decided per row by key hash — re-runnable and
    engine-independent."""
    threshold = int(rate * BUCKETS)
    return df.filter(F.expr(f"{_bucket_expr(key_col)} < {threshold}"))


def stratified_sample(
    df: DataFrame, key_col: str, class_col: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-class keep rates: the {class: rate} policy folds into one CASE
    threshold expression — a narrow filter, no join, no shuffle."""
    thr = _threshold_case(class_col, rates, default_rate)
    return df.filter(F.expr(f"{_bucket_expr(key_col)} < {thr}"))


def _threshold_case(class_col: str, rates: dict[str, float], default_rate: float) -> str:
    arms = " ".join(
        f"WHEN '{cls}' THEN {int(r * BUCKETS)}" for cls, r in sorted(rates.items())
    )
    return f"(CASE {class_col} {arms} ELSE {int(default_rate * BUCKETS)} END)"


def stratified_sample_oracle(
    table: str, key_col: str, class_col: str, rates: dict[str, float],
    default_rate: float = 0.0, select: str = "*",
) -> str:
    thr = _threshold_case(class_col, rates, default_rate)
    return f"""
        SELECT {select} FROM {table}
        WHERE {_bucket_expr(key_col)} < {thr}
    """


def source_cap(
    df: DataFrame, key_col: str, class_col: str, k: int, salts: int = 16
) -> DataFrame:
    """Hard per-class quota: keep AT MOST ``k`` rows per ``class_col`` value
    (cap every domain/source at K documents — the curation counterpart of
    rate-based sampling when a single crawl source must not dominate).
    Selection is deterministic: the k rows with the smallest (hash bucket,
    key) per class — re-runnable, engine-independent, same contract as the
    samplers.

    Exact distributed top-k per key WITHOUT a full per-class sort: pass 1
    ranks within (class, salt) shards — a hot class is split across
    ``salts`` bounded sorts — and keeps each shard's local top-k; pass 2
    ranks the ≤ salts*k survivors per class (tiny). The union of per-salt
    top-k provably contains the global top-k, so the result is identical
    to one global window. Both passes carry only (key, class, bucket)
    triples — document text never shuffles; the kept key set (≤ k*|classes|
    rows) broadcast-semi-joins back onto the data."""
    from pyspark.sql import Window

    keyed = df.select(key_col, class_col).withColumn(
        "_b", F.expr(_bucket_expr(key_col))
    )
    w1 = Window.partitionBy(class_col, F.pmod(F.col("_b"), F.lit(salts))).orderBy(
        "_b", key_col
    )
    w2 = Window.partitionBy(class_col).orderBy("_b", key_col)
    kept_keys = (
        keyed.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .select(key_col)
    )
    return df.join(F.broadcast(kept_keys), key_col, "left_semi")


def source_cap_oracle(
    table: str, key_col: str, class_col: str, k: int, select: str = "*"
) -> str:
    return f"""
        SELECT {select} FROM {table}
        QUALIFY row_number() OVER (
          PARTITION BY {class_col}
          ORDER BY {_bucket_expr(key_col)}, {key_col}
        ) <= {k}
    """


def token_budget_select(
    df: DataFrame, id_col: str, score_col: str, tokens_col: str, budget: int
) -> DataFrame:
    """Fill a token budget with the best documents: rank by (score DESC,
    id ASC) and keep rows while the inclusive running token total fits —
    the final assembly step of a training corpus ("top up to 1T tokens by
    quality"). Output = input + ``cum_tokens`` (inclusive prefix sum in
    quality order) + ``in_budget``.

    The prefix sum is distributed, NOT a single-task global window:
    range-partition on the sort key, sum tokens per partition (one tiny
    agg: #partitions rows), compute exclusive offsets on the driver,
    broadcast them back and window only WITHIN partitions — the same shape
    as sources/tables.with_row_id, valid at any partition count. The
    stamped partition id is pinned with localCheckpoint so the offset job
    and the output see the identical assignment."""
    from pyspark.sql import Window

    from iodf_spark.sources.tables import broadcast_offsets

    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    # global orderBy, not repartitionByRange(N): the sort's REQUIRED range
    # distribution is one AQE must preserve (adjacent-only coalescing — the
    # prefix-sum order survives), while sizing the shuffle to the data
    # instead of a pinned core count (see tables.with_row_id)
    stamped = (
        df.orderBy(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    off_df, _total = broadcast_offsets(stamped, F.col(tokens_col).cast("long"))
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        stamped.join(off_df, "_pid")
        .withColumn(
            "cum_tokens",
            (F.sum(F.col(tokens_col).cast("long")).over(w) + F.col("_offset")).cast(
                "long"
            ),
        )
        .withColumn("in_budget", F.col("cum_tokens") <= budget)
        .drop("_pid", "_offset")
    )


def token_budget_oracle(
    inner: str, id_col: str, score_col: str, tokens_col: str, budget: int
) -> str:
    """Oracle twin over an inner SELECT: one global window (fine at oracle
    scale; ROWS frame spelled explicitly so tie handling cannot differ)."""
    return f"""
        SELECT *,
               sum({tokens_col}::BIGINT) OVER (
                 ORDER BY {score_col} DESC, {id_col} ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )::BIGINT AS cum_tokens,
               (sum({tokens_col}::BIGINT) OVER (
                 ORDER BY {score_col} DESC, {id_col} ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) <= {budget}) AS in_budget
        FROM ({inner})
    """


# --------------------------------------------------------------------------
# Temperature-based mixture rebalancing (tau = 0.5)
#
# Training-data curation rarely wants fixed per-class rates: the standard
# move (multilingual/multi-source mixing) is temperature reweighting —
# target share of class i proportional to n_i^tau, tau < 1 flattening the
# mixture toward rare classes. tau is FIXED at 0.5 because sqrt is
# IEEE-754 correctly rounded in every engine (pow is not), which keeps the
# per-class keep-rate thresholds bit-identical between Spark and the
# DuckDB oracle. The only float reduction (sum of sqrt(n) over classes)
# folds over a SORTED class array in both dialects — float addition is
# order-dependent, so a fixed fold order is what makes the normalizer
# engine-exact.

TEMP_THR_FMT = (
    "floor({buckets} * least(1e0, {frac} * _total / (_s * sqrt(_n))))"
)


def temperature_sample(
    df: DataFrame, key_col: str, class_col: str, target_frac: str
) -> DataFrame:
    """Keep ~target_frac of all rows, redistributed across classes with
    sqrt-temperature: per-class rate = min(1, N_target / (S * sqrt(n_cls)))
    where S = sum over classes of sqrt(n) — rare classes keep (up to) all
    rows, dominant classes are squeezed. Decisions are the same per-row
    hash as the fixed-rate samplers, so the selection is reproducible by
    any engine. ``target_frac`` is a SQL literal string (e.g. '5e-1') so
    both dialects parse the identical number.

    Scale: one tiny class-count aggregate (map-side combined), one
    broadcast join of |classes| thresholds, then a narrow filter — no
    full-data shuffle at any corpus size.
    """
    cls = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("_n"))
    folded = cls.agg(
        F.sum("_n").alias("_total"),
        F.expr(
            f"aggregate(transform(array_sort(collect_list(struct({class_col}, _n))), "
            "_x -> sqrt(_x._n)), cast(0 as double), (_a, _v) -> _a + _v)"
        ).alias("_s"),
    )
    thr = (
        cls.crossJoin(F.broadcast(folded))
        .select(
            F.col(class_col),
            F.expr(TEMP_THR_FMT.format(buckets=BUCKETS, frac=target_frac)).alias("_thr"),
        )
    )
    return (
        df.join(F.broadcast(thr), class_col)
        .filter(F.expr(_bucket_expr(key_col)) < F.col("_thr"))
        .drop("_thr")
    )


def temperature_sample_oracle(
    table: str, key_col: str, class_col: str, target_frac: str, select: str = "*"
) -> str:
    thr = TEMP_THR_FMT.format(buckets=BUCKETS, frac=target_frac)
    return f"""
        WITH _c AS (SELECT {class_col} AS _cls, count(*)::BIGINT AS _n
                    FROM {table} GROUP BY 1),
        _t AS (SELECT sum(_n)::BIGINT AS _total,
                      list_reduce(
                        list_prepend(0e0,
                          list_transform(
                            list_sort(list(struct_pack(c := _cls, n := _n))),
                            _x -> sqrt(_x.n))),
                        (_a, _v) -> _a + _v) AS _s
               FROM _c),
        _thr AS (SELECT _cls, {thr} AS _thr FROM _c, _t)
        SELECT {select} FROM {table} _d
        JOIN _thr ON _d.{class_col} = _thr._cls
        WHERE {_bucket_expr(key_col)} < _thr
    """


# --------------------------------------------------------------------------
# Target-mixture resampling (DoReMi/Pile-style domain weights)
#
# The other standard curation move: the desired TRAINING MIXTURE is given
# explicitly — "40% web, 30% wiki, 20% code, 10% papers, by token mass" —
# and the corpus must be downsampled to match it. Without upsampling, the
# achievable total is capped by the BINDING domain (the one whose measured
# mass falls shortest of its target share): T* = min_d mass_d / w_d; every
# domain then keeps rate w_d * T* / mass_d (the binding domain keeps
# everything, over-represented domains are squeezed). Domains with no
# target weight are dropped. The per-row decision is the shared hash, so
# the exact document set is engine-reproducible; the only cross-domain
# float reduction is a MIN (order-independent), so no fold-order pinning
# is needed — weights arrive as SQL literal strings parsed identically by
# both dialects.
#
# Scale: one map-side-combined mass aggregate (|domains| rows), a 1-row
# broadcast of T*, a |domains|-row broadcast of thresholds, then a narrow
# filter — no full-data shuffle at any corpus size (same shape as
# temperature_sample).

MIX_THR_FMT = (
    "cast(least({buckets}, floor((({w}) * _tstar / _m) * {buckets})) as bigint)"
)


def _weight_case(class_col: str, weights: dict[str, str]) -> str:
    """Target-share CASE over SQL literal weight strings (e.g. '4e-1') —
    identical text in both dialects; unlisted classes weigh 0 (dropped)."""
    arms = " ".join(f"WHEN '{c}' THEN {w}" for c, w in sorted(weights.items()))
    return f"(CASE {class_col} {arms} ELSE cast(0 as double) END)"


def mixture_sample(
    df: DataFrame, key_col: str, class_col: str, weights: dict[str, str],
    mass_col: str,
) -> DataFrame:
    """Downsample so the kept corpus's ``mass_col`` mixture over
    ``class_col`` matches the target ``weights`` (class -> SQL literal
    share string), capped by the binding domain — no upsampling. Row
    decisions are the shared deterministic hash on ``key_col``."""
    wc = _weight_case(class_col, weights)
    cls = df.groupBy(class_col).agg(
        F.sum(F.col(mass_col)).cast("double").alias("_m")
    )
    folded = cls.agg(
        F.min(F.expr(f"CASE WHEN ({wc}) > 0e0 THEN _m / ({wc}) END")).alias("_tstar")
    )
    thr = cls.crossJoin(F.broadcast(folded)).select(
        F.col(class_col),
        F.expr(MIX_THR_FMT.format(buckets=BUCKETS, w=wc)).alias("_thr"),
    )
    return (
        df.join(F.broadcast(thr), class_col)
        .filter(F.expr(_bucket_expr(key_col)) < F.col("_thr"))
        .drop("_thr")
    )


def mixture_sample_oracle(
    table: str, key_col: str, class_col: str, weights: dict[str, str],
    mass_col: str, select: str = "*",
) -> str:
    wc = _weight_case(class_col, weights)
    thr = MIX_THR_FMT.format(buckets=BUCKETS, w=wc)
    return f"""
        WITH _c AS (SELECT {class_col}, sum({mass_col})::DOUBLE AS _m
                    FROM {table} GROUP BY 1),
        _t AS (SELECT min(CASE WHEN ({wc}) > 0e0 THEN _m / ({wc}) END) AS _tstar
               FROM _c),
        _thr AS (SELECT {class_col} AS _cls, {thr} AS _thr FROM _c, _t)
        SELECT {select} FROM {table} _d
        JOIN _thr ON _d.{class_col} = _thr._cls
        WHERE {_bucket_expr(key_col)} < _thr
    """
