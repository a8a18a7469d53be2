"""Z-order (Morton) interleaving — the multi-dimensional data-layout key.

Zone maps prune on whatever the ingest happened to cluster; ordering by a
single column clusters ONE dimension and leaves range reads on every other
column unprunable. Interleaving the bits of k columns into one sort key
makes segments (and, inside them, Parquet row groups) cluster in ALL k
dimensions at once — a range predicate on ANY of the interleaved columns
prunes, at the cost of each dimension's runs being ~2^(bits lost/k)
coarser. This is the standard lakehouse OPTIMIZE ZORDER layout, expressed
as nothing more than an order_keys choice: the segment store's row_id =
ingest-order contract is untouched because the z-value is applied at
WRITE time like any other ordering.

Emitted in both SQL dialects (spark/duckdb) like every other shared
formula, so layouts are oracle-reproducible.
"""

from __future__ import annotations

DEFAULT_BITS = 21  # 2 cols x 21 bits = 42-bit z-value, well inside int64


def zorder_expr(cols: list[str], dialect: str, bits: int = DEFAULT_BITS) -> str:
    """SQL: Morton z-value interleaving the low ``bits`` bits of each of
    ``cols`` (long-typed, expected NON-NEGATIVE and rank-normalized by the
    caller — raw skewed values waste high bits; NULL in any column yields
    NULL, sorting last). Bit b of column i lands at position b*k + i, so
    k*bits must stay < 63."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(dialect)
    k = len(cols)
    if not cols:
        raise ValueError("zorder_expr: no columns")
    if k * bits >= 63:
        raise ValueError(f"{k} cols x {bits} bits overflows int64")
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            if dialect == "spark":
                terms.append(
                    f"shiftleft(shiftright(cast({c} as bigint), {b}) & 1, {b * k + i})"
                )
            else:
                terms.append(
                    f"((({c}::BIGINT >> {b}) & 1) << {b * k + i})"
                )
    return "(" + " + ".join(terms) + ")"


def zorder_key_expr(
    cols: list[str],
    mins: list[int],
    spans: list[int],
    dialect: str,
    bits: int = DEFAULT_BITS,
) -> str:
    """Morton key over REBASED integer columns: each col is 0-based by its
    literal ``min`` and right-shifted by its excess bits (so the
    interleave sees the TOP ``bits`` bits of the column's actual span —
    raw skewed values would waste the high bit positions). mins/spans are
    Python ints (taken from manifest zone maps, zero Spark jobs), so the
    embedded literals — and therefore every z-key — are identical in both
    dialects."""
    if len(cols) != len(mins) or len(cols) != len(spans):
        raise ValueError("cols/mins/spans length mismatch")
    rebased = []
    for c, mn, span in zip(cols, mins, spans):
        shift = max(0, int(span).bit_length() - bits)
        if dialect == "spark":
            base = f"(cast({c} as bigint) - {mn})"
            e = f"shiftright({base}, {shift})" if shift else base
        else:
            base = f"({c}::BIGINT - {mn})"
            e = f"({base} >> {shift})" if shift else base
        rebased.append(f"({e})")
    return zorder_expr(rebased, dialect, bits)
