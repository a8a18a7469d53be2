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
