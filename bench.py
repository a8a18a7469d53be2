"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Framing vs BASELINE.md: the reference's numbers are per-op µs latencies on
warm mmaps; Spark adds fixed per-job overhead, so (as recorded in
BASELINE.md) the comparison is amortized batched throughput — e.g. the
reference's '1024 cofreq calculations' loop is one costats_sweep job here.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from iodf_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0
    spark = get_spark("iodf_spark_bench")

    # Warm the JVM before timing (JIT + codegen + shuffle machinery), so the
    # first timed query doesn't absorb ~5-10 s of one-time process startup.
    # BASELINE.md's reference numbers are warm-mmap latencies, so warm-JVM
    # timings are the apples-to-apples comparison; the warmup itself touches
    # no benchmark table and is excluded from every metric.
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    timings: dict[str, float] = {}
    arm_timings: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    # consolidated cells (segments_compact: 14 lifecycle arms, ann_topk: 6
    # ANN variants, index_probe_rows: 9 planner arms) are timed PER ARM —
    # a single cell total absorbs a one-arm regression that the 2x gate
    # should trip on. The cell's own timing becomes the sum of its arms
    # for that sweep (the arms partition the cell's work).
    arm_specs = getattr(entrymod, "bench_arms", dict)()

    # Per-query isolation: one failing query must not zero out the whole
    # round's bench evidence (round 3 shipped rc=1/no-data because a single
    # AnalysisException aborted the sweep). Failures are recorded per query
    # and the JSON line is ALWAYS emitted.

    # Noise control: the host shows bursty multi-second CPU interference
    # (identical sweeps measured 112 s .. 220 s totals), so each query is
    # timed in SWEEPS full passes and reported as the per-query MINIMUM —
    # the standard noise-robust estimator. The entry-module memo cache is
    # cleared between sweeps so every sweep does identical work (segment
    # stores / indexes are rebuilt, not reopened).
    # 3 sweeps: the host oscillates between ~1x and ~2x regimes (measured
    # 76 s..134 s for identical code); one extra pass materially tightens
    # the per-query minimum when a sweep lands in the slow regime
    sweeps = int(os.environ.get("SPARK_GRAFT_BENCH_SWEEPS", "3"))
    n = None
    for _sweep in range(sweeps):
        entrymod._cache.clear()

        # ingest + index build (BASELINE.md 'indexed ingest'): load lineitem,
        # assign row ids, build + materialize the inverted index
        t0 = time.perf_counter()
        try:
            ix, n = entrymod._lineitem_index(spark, sf_dir)
            dt = time.perf_counter() - t0
            timings["index_build"] = min(timings.get("index_build", dt), dt)
        except Exception as e:  # noqa: BLE001
            errors["index_build"] = f"{type(e).__name__}: {e}"[:500]

        for name, fn in entrymod.queries().items():
            if name in arm_specs:
                try:
                    cell = 0.0
                    sweep_arms: dict[str, float] = {}
                    for arm, thunk in arm_specs[name](spark, sf_dir):
                        t0 = time.perf_counter()
                        thunk().count()
                        dt = time.perf_counter() - t0
                        sweep_arms[arm] = dt
                        cell += dt
                    rec = arm_timings.setdefault(name, {})
                    for arm, dt in sweep_arms.items():
                        rec[arm] = min(rec.get(arm, dt), dt)
                    timings[name] = min(timings.get(name, cell), cell)
                except Exception as e:  # noqa: BLE001
                    errors[name] = f"{type(e).__name__}: {e}"[:500]
                continue
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.count()
                dt = time.perf_counter() - t0
                timings[name] = min(timings.get(name, dt), dt)
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:500]

    errors = {k: v for k, v in errors.items() if k not in timings}
    total = sum(timings.values())
    detail = {
        "metric": "bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "arms": {
            q: {a: round(v, 3) for a, v in arms.items()}
            for q, arms in arm_timings.items()
        },
        "sf": sf,
        "rows_lineitem": n,
        # epoch seconds: snapshots copied from this doc carry their own
        # recency key for regression_gate (mtime survives cp -p but not git)
        "taken_at": round(time.time(), 3),
    }
    if errors:
        detail["errors"] = errors
    gate = regression_gate(timings, errors, sf, arms=arm_timings)
    if gate is not None:
        detail["baseline_snapshot"], detail["regressions"] = gate
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "bench_last_run.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line still carries the verdict
    print(json.dumps(compact_line(detail), separators=(",", ":")))


# the driver records only the LAST ~2000 bytes of bench stdout; round 7's
# line (with 4 per-arm dicts folded in) outgrew that window and the driver
# recorded parsed:null — the whole round's bench was machine-unreadable.
# The final line must therefore stay comfortably under the window; the
# arms-rich document lives in tools/bench_last_run.json (and is what gets
# copied into tools/bench_snapshots/ as a committed baseline).
LINE_BUDGET = 1800


def compact_line(detail: dict, budget: int = LINE_BUDGET) -> dict:
    """Shrink the bench document to a driver-parseable single line.

    Keeps the contract fields (metric/value/unit/queries/sf) verbatim and
    summarizes the rest: regressions become a count + first few names,
    errors become a count + names. If the serialized form still exceeds
    ``budget``, optional fields are dropped in increasing order of value
    and query timings fall back to 2-decimal rounding. Never drops
    ``queries`` — that is the per-query evidence the driver archives."""
    out = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": detail["unit"],
        "queries": detail["queries"],
        "sf": detail["sf"],
        "rows_lineitem": detail.get("rows_lineitem"),
        "taken_at": detail.get("taken_at"),
        "detail": "tools/bench_last_run.json",
    }
    if "baseline_snapshot" in detail:
        out["baseline_snapshot"] = detail["baseline_snapshot"]
        regs = detail.get("regressions") or []
        out["n_regressions"] = len(regs)
        if regs:
            out["regressions"] = [r.split(":")[0] for r in regs[:8]]
    if detail.get("errors"):
        out["n_errors"] = len(detail["errors"])
        out["error_queries"] = sorted(detail["errors"])[:8]
    for drop in ("baseline_snapshot", "detail", "taken_at"):
        if len(json.dumps(out, separators=(",", ":"))) <= budget:
            break
        out.pop(drop, None)
    if len(json.dumps(out, separators=(",", ":"))) > budget:
        out["queries"] = {k: round(v, 2) for k, v in out["queries"].items()}
    # the rounding fallback is not guaranteed to fit either (enough query
    # entries outgrow any per-entry shrink) — re-check and, as the provable
    # last resort, keep only the slowest-N timings with an explicit marker
    # so the line can never reproduce the round-7 parsed:null failure
    while len(json.dumps(out, separators=(",", ":"))) > budget and out["queries"]:
        kept = sorted(out["queries"].items(), key=lambda kv: -kv[1])
        kept = kept[: max(len(kept) - 5, 0)]
        dropped = len(out["queries"]) - len(kept)
        out["queries"] = dict(sorted(kept))
        out["n_queries_dropped"] = out.get("n_queries_dropped", 0) + dropped
        if not kept:
            break
    return out


def regression_gate(
    timings: dict,
    errors: dict,
    sf: float,
    factor: float = 2.0,
    min_sec: float = 1.0,
    arms: dict | None = None,
    arm_min_sec: float = 0.5,
):
    """Self-reporting perf-regression gate (the reference fails its perf
    suite when an op exceeds 2x its recorded prior time,
    perf/BitsPerf.scala:44-49,177-196): compare this run against the newest
    committed snapshot in tools/bench_snapshots at the SAME sf and embed the
    verdict in the bench line itself, so a regressed round is self-evident
    from BENCH_r{N}.json alone. Sub-min_sec old timings are skipped (fixed
    per-job overhead dominates them; jitter is not signal). Never raises —
    the gate must not become a new way to lose the round's bench evidence.

    ``arms`` extends the same comparison one level down: consolidated
    cells report per-arm sub-timings, and a one-arm slowdown (which the
    cell total absorbs — one of segments_compact's 14 arms going 5x moves
    the cell total <40%) trips the gate as 'cell.arm: ...'. Arms use a
    lower min_sec floor since each is a fraction of its cell."""
    snap_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_snapshots")
    try:
        # newest = embedded 'taken_at' (epoch seconds), falling back to
        # file mtime for legacy snapshots — filename sort is NOT recency
        # ('...r5-mid' beats '...r5-end' lexicographically and would pin
        # the gate to a stale mid-round baseline). The two key kinds are
        # NOT comparable: a fresh git checkout stamps every file with
        # checkout-time mtime, which outranks any honest historical
        # taken_at and silently pins the gate to the OLDEST baselines —
        # so any snapshot carrying taken_at beats every mtime-only one.
        candidates = []
        for fname in os.listdir(snap_dir):
            path = os.path.join(snap_dir, fname)
            with open(path) as fh:
                snap = json.load(fh)
            if snap.get("sf") == sf and snap.get("queries"):
                # type-guard, not key-presence: a snapshot carrying
                # "taken_at": null would yield key (1, None), and
                # (1, None) vs (1, float) in max() raises TypeError,
                # silently disabling the gate for the whole run
                stamp = snap.get("taken_at")
                key = (
                    (1, stamp)
                    if isinstance(stamp, (int, float)) and not isinstance(stamp, bool)
                    else (0, os.path.getmtime(path))
                )
                candidates.append((key, fname, snap))
        if not candidates:
            return None
        _, fname, snap = max(candidates, key=lambda c: c[0])
        regressions = [
            f"{name}: {t_old:.2f}s -> {timings[name]:.2f}s ({timings[name] / t_old:.1f}x)"
            for name, t_old in snap["queries"].items()
            if name in timings and t_old >= min_sec and timings[name] > t_old * factor
        ]
        regressions += [
            f"{name}: errored (prior {t_old:.2f}s)"
            for name, t_old in snap["queries"].items()
            if name in errors
        ]
        for qname, old_arms in (snap.get("arms") or {}).items():
            cur_arms = (arms or {}).get(qname, {})
            regressions += [
                f"{qname}.{arm}: {t_old:.2f}s -> {cur_arms[arm]:.2f}s "
                f"({cur_arms[arm] / t_old:.1f}x)"
                for arm, t_old in old_arms.items()
                if arm in cur_arms
                and t_old >= arm_min_sec
                and cur_arms[arm] > t_old * factor
            ]
        return fname, regressions
    except Exception:  # noqa: BLE001 — gate is advisory, never fatal
        return None


if __name__ == "__main__":
    main()
