"""Deterministic text hashing / shingling / sketching expressions, emitted
in two SQL dialects ('spark' and 'duckdb') from one definition — so every
hash-based operator (fingerprinting, MinHash LSH, SimHash) is EXACTLY
reproducible by the DuckDB oracle, not just statistically similar.

All hashes are engine-independent by construction: a polynomial rolling
hash over unicode codepoints, acc = (acc*31 + cp) mod (1e9+7), folded
left-to-right with a constant seed — no reliance on murmur3/xxhash, whose
implementations differ between engines.

The operators stay JVM-side in Spark (higher-order functions: transform/
aggregate/filter are codegen'd; no Python UDFs in the hot path).
"""

from __future__ import annotations

MOD = 1_000_000_007
MULT = 31
SEED = 7

# Tokenization whitespace. Java's \s is [ \t\n\x0B\f\r] but RE2's (DuckDB)
# lacks \x0B — a vertical tab in a document silently tokenizes differently
# between the engine and the oracle (hypothesis-caught divergence). One
# explicit set with LITERAL control characters: no backslashes, so Spark's
# escape-processing SQL literals and DuckDB's raw literals receive the
# identical pattern, pinned to the Java set. WS_CHARS is the bare char set
# for embedding inside larger character classes (punctuation/BPE regexes).
WS_CHARS = " \t\n\x0b\f\r"
WS_CLASS = f"[{WS_CHARS}]"


def _d(dialect: str) -> bool:
    if dialect not in ("spark", "duckdb"):
        raise ValueError(dialect)
    return dialect == "spark"


def chars(e: str, dialect: str) -> str:
    return f"split({e}, '')" if _d(dialect) else f"regexp_split_to_array({e}, '')"


def codepoints(e: str, dialect: str) -> str:
    """Unicode code points of a string expression. Empty elements from the
    char split are dropped BEFORE mapping: an empty string splits to ['']
    in both engines, but Spark's ascii('') is 0 while DuckDB's unicode('')
    is -1 — without the filter the two dialects hash '' differently
    (found by tests/test_texthash_dialects.py fuzz)."""
    c = chars(e, dialect)
    if _d(dialect):
        return f"transform(filter({c}, _ch -> _ch <> ''), _ch -> ascii(_ch))"
    return f"list_transform(list_filter({c}, _ch -> _ch <> ''), _ch -> unicode(_ch))"


def fold_hash(arr: str, dialect: str, seed: int = SEED) -> str:
    """Polynomial fold of an integer array."""
    if _d(dialect):
        return (
            f"aggregate({arr}, cast({seed} as bigint), "
            f"(_acc, _x) -> (_acc * {MULT} + _x) % {MOD})"
        )
    return (
        f"list_reduce(list_prepend({seed}::BIGINT, {arr}), "
        f"(_acc, _x) -> (_acc * {MULT} + _x) % {MOD})"
    )


def text_hash(e: str, dialect: str) -> str:
    """Deterministic 0..1e9+7 hash of a string expression."""
    return fold_hash(codepoints(e, dialect), dialect)


def tokens(e: str, dialect: str) -> str:
    """Whitespace tokens, empties dropped."""
    if _d(dialect):
        return f"filter(split({e}, '{WS_CLASS}+'), _t -> _t <> '')"
    return f"list_filter(string_split_regex({e}, '{WS_CLASS}+'), _t -> _t <> '')"


def token_hashes(e: str, dialect: str) -> str:
    """array<long> of per-token hashes."""
    t = tokens(e, dialect)
    if _d(dialect):
        inner = text_hash("_tok", dialect)
        return f"transform({t}, _tok -> {inner})"
    inner = text_hash("_tok", dialect)
    return f"list_transform({t}, _tok -> {inner})"


def shingle_hashes(th: str, dialect: str, n: int = 3, distinct: bool = True) -> str:
    """Hashes of word n-grams, folded from a PRE-COMPUTED token-hash
    array expression `th` (pass a column name — the expression is repeated,
    so keep it cheap). Documents shorter than n tokens yield an empty array.
    ``distinct=False`` keeps one hash per occurrence (in order) — needed by
    multiplicity-sensitive consumers like repetition scoring. The distinct
    variant is SORTED: array_distinct keeps first-occurrence order while
    DuckDB's list_distinct does not, so without a canonical order the two
    dialects return permutations of each other (fuzz-caught); every current
    consumer is set-valued, and sorted is the engine's posting convention."""
    if _d(dialect):
        # unrolled fold (same integers as fold_hash over the slice): direct
        # element_at chain, ~10x faster than per-shingle slice + aggregate
        acc = f"cast({SEED} as bigint)"
        for j in range(1, n + 1):
            acc = f"((({acc}) * {MULT} + element_at({th}, _i + {j})) % {MOD})"
        grams = (
            f"case when size({th}) >= {n} "
            f"then transform(sequence(0, size({th}) - {n}), _i -> {acc}) "
            f"else cast(array() as array<bigint>) end"
        )
        return f"array_sort(array_distinct({grams}))" if distinct else f"({grams})"
    gram_hash = fold_hash(f"list_slice({th}, _i + 1, _i + {n})", dialect)
    grams = (
        f"list_transform(range(greatest(len({th}) - {n - 1}, 0)), "
        f"_i -> {gram_hash})"
    )
    return f"list_sort(list_distinct({grams}))" if distinct else f"({grams})"


def minhash_sig(arr: str, dialect: str, i: int) -> str:
    """i-th MinHash of a hash-array expression: min over (a_i*x + b_i) mod P,
    a_i/b_i small deterministic odd constants. NULL (empty array) for empty
    inputs."""
    a, b = 2 * i + 3, 5 * i + 7
    if _d(dialect):
        return f"array_min(transform({arr}, _x -> (_x * {a} + {b}) % {MOD}))"
    return f"list_min(list_transform({arr}, _x -> (_x * {a} + {b}) % {MOD}))"


def band_hash(sig_cols: list[str], dialect: str) -> str:
    """Combine r signature columns into one band key (fixed-arity fold)."""
    acc = str(SEED)
    for c in sig_cols:
        acc = f"((({acc}) * {MULT} + ({c})) % {MOD})"
    return acc


def simhash32(e: str, dialect: str, src: str | None = None) -> str:
    """32-bit SimHash of the token-hash multiset: bit b set iff the sum of
    (+1/-1 per token, by bit b of its hash) is >= 0."""
    arr = src if src is not None else token_hashes(e, dialect)
    terms = []
    for b in range(32):
        if _d(dialect):
            s = (
                f"aggregate(transform({arr}, _x -> 2 * cast(shiftright(_x, {b}) & 1 as bigint) - 1), "
                f"cast(0 as bigint), (_a, _v) -> _a + _v)"
            )
        else:
            s = f"coalesce(list_sum(list_transform({arr}, _x -> 2 * ((_x >> {b}) & 1) - 1)), 0)"
        terms.append(f"(case when {s} >= 0 then cast({1 << b} as bigint) else 0 end)")
    return "(" + " + ".join(terms) + ")"


def hamming32(a: str, b: str, dialect: str) -> str:
    if _d(dialect):
        return f"bit_count({a} ^ {b})"
    return f"bit_count(xor({a}::BIGINT, {b}::BIGINT))"


# ---------------------------------------------------------------------------
# second independent hash family (round 10): substring-level dedup groups
# windows by hash with NO downstream pair verification (unlike the Jaccard
# candidates, which a full-set verify re-checks), so a single 1e9+7 space
# saturates at curation scale — at 1e13 windows every residue would hold
# ~1e4 unrelated windows. Packing two INDEPENDENT polynomial folds
# (different multiplier AND modulus — same-modulus/different-seed folds
# collide together whenever lengths match) widens window identity to
# ~1e18 while keeping the 8-byte shuffle key and exact DuckDB twinning.

MOD2 = 998_244_353  # NTT prime, coprime-free of MOD
MULT2 = 131
SEED2 = 13


def fold_hash2(arr: str, dialect: str, seed: int = SEED2) -> str:
    """Polynomial fold of an integer array in the SECOND hash family."""
    if _d(dialect):
        return (
            f"aggregate({arr}, cast({seed} as bigint), "
            f"(_acc, _x) -> (_acc * {MULT2} + _x) % {MOD2})"
        )
    return (
        f"list_reduce(list_prepend({seed}::BIGINT, {arr}), "
        f"(_acc, _x) -> (_acc * {MULT2} + _x) % {MOD2})"
    )


def text_hash2(e: str, dialect: str) -> str:
    """Second-family deterministic hash of a string expression."""
    return fold_hash2(codepoints(e, dialect), dialect)


def pack_hashes(h1: str, h2: str) -> str:
    """One int64 from a (family-1, family-2) hash pair: h1*MOD2 + h2 —
    max ~1e18, inside int64; injective over the pair, dialect-neutral
    arithmetic (emit into either engine)."""
    return f"(({h1}) * {MOD2} + ({h2}))"


# ---------------------------------------------------------------------------
# WIDE fold families for the two-column window identity (round 11):
# `duplicated_spans`' groupBy is CORPUS-wide, and the round-10 packed
# ~9.2e18 space expects ~5e6 false-duplicated windows at 1e13 windows
# (100 TB) — ppm-level erroneous cuts by the materialized substring cut.
# The fix keeps the round-10 COST SHAPE (exactly two unrolled fold chains
# per window — an isolated A/B of a 4-chain design measured 3.4-5.6x on
# the spans ladder, the chains dominate the window projection) but widens
# each fold's modulus from ~2^30 to ~2^56: the identity becomes the
# UNPACKED (fold3 over the mixed family-1 token hashes, fold4 over the
# mixed family-2 token hashes) pair — two int64 columns, 16 B/window on
# the shuffle, combined space MOD3*MOD4 ~ 4.2e33 ~ 2^112, expected
# corpus-wide false pairs at 1e13 windows = (1e13)^2/2 / 4.2e33 ~ 1.2e-8
# — no sharding caveat left. Distinct multiplier AND modulus per family;
# the texthash.mix nonlinearity (applied per token BEFORE the folds)
# blocks the engineered-delta relation that would cancel under every
# multiplier at once. Degenerate floor: two windows whose family-1 token
# streams collide ENTIRELY (probability ~1/MOD per differing token)
# rest on fold4's ~2^56 alone — the joint probability stays vanishing at
# corpus scale. int64 safety: (MOD3-1)*MULT3 + max_mixed_hash < 2^63
# (8.91e18 + 2^31 < 9.22e18), same margin for family 4; the narrow
# families 1/2 stay as-is for every OTHER consumer (minhash's (ax+b)%MOD
# affine maps and simhash's 32-bit windows assume ~2^30 values).

MOD3 = 65_000_000_000_000_011  # prime ~2^55.85
MULT3 = 137
SEED3 = 17
MOD4 = 64_000_000_000_000_079  # prime ~2^55.83, distinct from MOD3
MULT4 = 139
SEED4 = 19


def fold_hash3(arr: str, dialect: str, seed: int = SEED3) -> str:
    """WIDE polynomial fold of an integer array (window-identity column 1:
    inputs must be < 2^31 — mixed token hashes are)."""
    if _d(dialect):
        return (
            f"aggregate({arr}, cast({seed} as bigint), "
            f"(_acc, _x) -> (_acc * {MULT3} + _x) % {MOD3})"
        )
    return (
        f"list_reduce(list_prepend({seed}::BIGINT, {arr}), "
        f"(_acc, _x) -> (_acc * {MULT3} + _x) % {MOD3})"
    )


def fold_hash4(arr: str, dialect: str, seed: int = SEED4) -> str:
    """WIDE polynomial fold of an integer array (window-identity column 2:
    inputs must be < 2^31 — mixed token hashes are)."""
    if _d(dialect):
        return (
            f"aggregate({arr}, cast({seed} as bigint), "
            f"(_acc, _x) -> (_acc * {MULT4} + _x) % {MOD4})"
        )
    return (
        f"list_reduce(list_prepend({seed}::BIGINT, {arr}), "
        f"(_acc, _x) -> (_acc * {MULT4} + _x) % {MOD4})"
    )


def mix(h: str, dialect: str, mod: int = MOD) -> str:
    """Non-linear mix of a token hash BEFORE a window fold: (h*h + h) mod
    `mod`. A polynomial fold is affine in its inputs, so two windows
    whose token-hash deltas satisfy sum(delta_i * MULT^(k-i)) = 0 mod M
    collide — and because token hashes are themselves affine in
    codepoints, natural correlated edits hit that relation in BOTH
    families at once (hypothesis found ('p1','p0','u0x0') ==
    ('p0','p0','u1x0') at k=3: the +1 token delta times MULT^2 cancels
    the +MULT^2 codepoint delta, identically under every multiplier).
    Squaring makes each input's contribution depend on the hash VALUE,
    not just the edit delta, so the relation cannot be engineered by
    token choice. Max intermediate (M-1)^2 + M < 2^63: int64-safe in
    both engines. `dialect` is accepted for signature symmetry — the
    arithmetic is dialect-neutral."""
    _d(dialect)
    return f"((({h}) * ({h}) + ({h})) % {mod})"
