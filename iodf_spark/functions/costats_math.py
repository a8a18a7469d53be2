"""Closed-form co-occurrence statistics (reference: CoStats.scala:7-47,
MathUtils.scala:3-48).

Given the 2x2 contingency counts of two boolean predicates A, B over n rows
(n, fA, fB, fAB), the reference derives Bayesian-smoothed probabilities,
entropies, per-state lifts, and mutual information:

* ``eP(f, n, priorP, priorW) = (f + priorP*priorW) / (n + priorW)``
  (MathUtils.scala:27-29) — with defaults priorW=2, priorA=priorB=0.5
  (CoStats.scala:7) so ``pA = (fA + 2) / (n + 4)``.
* ``h(p) = -p*log2(p) - (1-p)*log2(1-p)`` (MathUtils.scala:31-34).
* per joint state s in {FF, TF, FT, TT}: state count fS (MathUtils.scala:40-47),
  naive independence prob ``naive = pAs * pBs``, smoothed joint
  ``ps = (fS + priorW) / (n + priorW/naive)``, lift ``d = ps / naive``
  (CoStats.scala:21-30), and ``mi = sum_s ps * log2(d_s)`` (CoStats.scala:31-34).

This module is the single source of truth for the formulas, emitted three
ways: plain Python (ground truth for tests), Spark ``Column`` expressions,
and ANSI-SQL strings. The SQL strings are used verbatim both by Spark
(``F.expr``) and by the DuckDB oracle, so both engines evaluate the
identical formula text.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

PRIOR_W = 2.0

# Joint states in reference encoding: bit0 = A, bit1 = B (MathUtils.scala:36-38).
# s=0 -> (A=F,B=F), s=1 -> (T,F), s=2 -> (F,T), s=3 -> (T,T)
_STATES = [(False, False), (True, False), (False, True), (True, True)]
_STATE_NAMES = ["ff", "tf", "ft", "tt"]


def _state_count_py(s: int, n: int, fa: int, fb: int, fab: int) -> int:
    if s == 0:
        return n - fa - fb + fab
    if s == 1:
        return fa - fab
    if s == 2:
        return fb - fab
    return fab


def costats_py(n: int, fa: int, fb: int, fab: int, prior_w: float = PRIOR_W) -> dict:
    """Ground-truth Python mirror of CoStats (used by tests and the driver
    for scalar probes)."""

    def log2(v: float) -> float:
        return math.log(v) / math.log(2.0)

    def h(p: float) -> float:
        return p * -log2(p) + (1 - p) * -log2(1 - p)

    pa = (fa + 2e0) / (n + 4e0)
    pb = (fb + 2e0) / (n + 4e0)
    out = {"n": n, "fa": fa, "fb": fb, "fab": fab, "pa": pa, "pb": pb, "ha": h(pa), "hb": h(pb)}
    mi = 0.0
    for s, (a_true, b_true) in enumerate(_STATES):
        pas = pa if a_true else 1 - pa
        pbs = pb if b_true else 1 - pb
        naive = pas * pbs
        f_s = _state_count_py(s, n, fa, fb, fab)
        ps = (f_s + prior_w) / (n + prior_w / naive)
        d = ps / naive
        out[f"d_{_STATE_NAMES[s]}"] = d
        mi += ps * log2(d)
    out["mi"] = mi
    return out


def _sql_exprs(n: str, fa: str, fb: str, fab: str) -> dict[str, str]:
    """Formula text shared by Spark SQL and DuckDB. All inputs are count
    expressions (integer); output keys: pa pb ha hb d_ff d_tf d_ft d_tt mi."""
    pa = f"(({fa}) + 2e0) / (({n}) + 4e0)"
    pb = f"(({fb}) + 2e0) / (({n}) + 4e0)"

    def h(p: str) -> str:
        return f"(-({p}) * log2({p}) - (1e0 - ({p})) * log2(1e0 - ({p})))"

    out = {"pa": pa, "pb": pb, "ha": h(pa), "hb": h(pb)}
    state_counts = [
        f"(({n}) - ({fa}) - ({fb}) + ({fab}))",
        f"(({fa}) - ({fab}))",
        f"(({fb}) - ({fab}))",
        f"({fab})",
    ]
    mi_parts = []
    for s, (a_true, b_true) in enumerate(_STATES):
        pas = pa if a_true else f"(1e0 - {pa})"
        pbs = pb if b_true else f"(1e0 - {pb})"
        naive = f"(({pas}) * ({pbs}))"
        ps = f"((({state_counts[s]}) + 2e0) / (({n}) + 2e0 / {naive}))"
        d = f"({ps} / {naive})"
        out[f"d_{_STATE_NAMES[s]}"] = d
        mi_parts.append(f"({ps} * log2({d}))")
    out["mi"] = "(" + " + ".join(mi_parts) + ")"
    return out


def costats_sql_exprs(
    n: str = "n", fa: str = "fa", fb: str = "fb", fab: str = "fab", round_to: int | None = 9
) -> dict[str, str]:
    """ANSI-SQL expression strings for the derived stats, optionally rounded
    (rounding makes the Spark-vs-DuckDB value hash robust to last-ulp
    differences in the two engines' log implementations)."""
    exprs = _sql_exprs(n, fa, fb, fab)
    if round_to is not None:
        exprs = {k: f"round({v}, {round_to})" for k, v in exprs.items()}
    return exprs


def costats_columns(
    n: str = "n", fa: str = "fa", fb: str = "fb", fab: str = "fab", round_to: int | None = 9
) -> list[Column]:
    """Spark Columns (via F.expr over the shared formula text) for the
    derived stats, aliased pa/pb/ha/hb/d_ff/d_tf/d_ft/d_tt/mi."""
    return [F.expr(v).alias(k) for k, v in costats_sql_exprs(n, fa, fb, fab, round_to).items()]
