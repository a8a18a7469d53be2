"""Perf-regression gate: compare two bench JSON lines and flag slowdowns.

The reference fails its perf suite when an op gets >2x slower than the
recorded prior run (perf/BitsPerf.scala:44-49,177-196); this is the repo's
equivalent at bench-query grain. It also catches the round-3 failure mode
where a bench shipped with no data at all: a query present in the old run
but errored/absent in the new one is reported, and a new run with zero
timings is a hard failure.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--factor 2.0] [--min-sec 1.0]

Exit 0 = no regression; exit 1 = regressions found (listed on stdout).
Queries faster than --min-sec in the old run are ignored (fixed per-job
overhead dominates them; jitter is not signal).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read().strip()
    # whole-file JSON first (the driver's BENCH_r{N}.json wrapper is
    # PRETTY-PRINTED, so a line scan would stop on a nested '{' fragment)
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
        # log-polluted file: the bench line is the LAST json object
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                break
        if obj is None:
            raise SystemExit(f"{path}: no JSON line found")
    if not isinstance(obj, dict):
        raise SystemExit(f"{path}: top-level JSON is not an object")
    # unwrap the driver wrapper {..., parsed: {...}}
    if "queries" not in obj and isinstance(obj.get("parsed"), dict):
        obj = obj["parsed"]
    if not isinstance(obj, dict) or "queries" not in obj:
        raise SystemExit(f"{path}: no bench metrics found (parsed=null?)")
    return obj


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=1.0)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oldq, newq = old.get("queries") or {}, new.get("queries") or {}
    problems: list[str] = []

    if not newq:
        problems.append("new bench has NO timings (crashed run?)")
    for name, err in (new.get("errors") or {}).items():
        problems.append(f"{name}: errored in new run: {err[:120]}")
    for name, t_old in oldq.items():
        if name in (new.get("errors") or {}):
            continue  # already reported
        if name not in newq:
            problems.append(f"{name}: present in old run, missing from new")
            continue
        if t_old >= args.min_sec and newq[name] > t_old * args.factor:
            problems.append(
                f"{name}: {t_old:.2f}s -> {newq[name]:.2f}s "
                f"({newq[name] / t_old:.1f}x, threshold {args.factor}x)"
            )

    tot_old, tot_new = old.get("value"), new.get("value")
    print(
        f"total: {tot_old}s -> {tot_new}s; "
        f"{len(oldq)} old / {len(newq)} new queries"
    )
    if problems:
        print(f"{len(problems)} regression(s):")
        for p in problems:
            print(f"  REGRESSION {p}")
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
