"""Skew-mitigated joins: salting for hot keys.

A shuffle equi-join hashes rows by key; a hot key (one user with 10% of a
100 TB event table) lands its entire payload on ONE reducer — the
straggler that dominates job wall-clock no matter how many executors
exist. AQE's skew-join split handles moderate skew at runtime; salting is
the explicit, deterministic form that also works under AQE-less engines
and inside stateful stages.

``salted_join(left, right, on, n_salts)``:

* the (big, skewed) left side gets a deterministic salt in [0, n_salts)
  hashed from its OTHER columns — no RNG state, so retries and re-runs
  salt identically (the same determinism rule as the engine's sampling);
* the (smaller) right side is replicated once per salt value via one
  ``explode(sequence(...))`` — a narrow n_salts-fold expansion of the
  SMALL side only;
* the join key becomes (on..., _salt), so each hot key spreads over
  n_salts reducers; the salt column never escapes.

Result is row-for-row equal to the unsalted join (property-tested in
tests/test_plans.py). Cost model: right side ships n_salts copies, so pick
n_salts ~ (hot-key rows / target rows-per-task) and keep the right side
the smaller input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salts``
    reducers. ``on`` columns must exist on both sides; supported ``how``:
    inner / left / left_outer (the replicated side must be the preserved
    side's opposite, so right/full outer would double-count — rejected)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(outer-preserving the replicated side would duplicate rows)"
        )
    non_key = [c for c in left.columns if c not in on]
    # deterministic per-row salt: hash of the non-key payload (falls back
    # to the key itself for key-only frames — degenerate but still valid)
    salt_src = [F.col(c) for c in (non_key or on)]
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int")
    )
    # sequence of int literals is array<int> — explode (a generator) can't
    # nest inside a cast, so the element type must be right by construction
    replicated_right = right.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {int(n_salts) - 1})"))
    )
    out = salted_left.join(replicated_right, on + ["_salt"], how)
    return out.drop("_salt")
