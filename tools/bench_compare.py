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

# Machine-readable consolidation ledger: every bench-query rename or
# tagged-union absorption, old name -> the entry that carries its work now
# (prose history in BENCH_NOTES.md). An old name missing from the new run
# is ONLY excused when its mapped absorber is present — so a genuinely
# dropped capability can never hide behind "it was consolidated".
CONSOLIDATED: dict[str, str] = {
    # round-3 folds
    "index_f": "bitmap_ops",            # f_a column
    "merge_concat": "rowset_ops",       # 'merge' rows
    "view_slice": "rowset_ops",         # 'view' rows
    "costats_sweep": "costats",         # 'sweep' rows
    "knn_topk_filtered": "knn_topk",    # 'filtered' rows
    "write_open_seq": "typed_roundtrip",
    "have_segments": "segments_compact",  # 'have' arm
    "window_rank": "window_funcs",
    "window_running_sum": "window_funcs",
    "rollup": "grouping_sets",
    "cube": "grouping_sets",
    "asof_join_forward": "asof_join",   # both directions in one entry
    "index_text_tokens": "text_search",
    "multimodal_frames": "multimodal_meta",
    # late-r4 50-entry-cap folds
    "index_seek": "index_probe_rows",   # 'seek*' rows
    "embedding_clusters_ann": "embedding_clusters",  # 'ann' rows
    "text_repetition": "text_stats",    # rep_* columns
    "multimodal_features": "multimodal_meta",  # feat_* columns
    "ann_lsh": "ann_topk",              # 'lsh_single' rows
    "ann_lsh_mp": "ann_topk",           # 'lsh_multi' rows
    "ann_ivf": "ann_topk",              # 'ivf4' rows
    "ann_ivf64": "ann_topk",            # 'ivf64' rows
}


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
    ap.add_argument(
        "--arm-min-sec",
        type=float,
        default=0.5,
        help="min old per-arm time to compare (arms are cell fractions)",
    )
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
            absorber = CONSOLIDATED.get(name)
            if absorber is not None and absorber in newq:
                print(f"  consolidated: {name} -> {absorber} ({newq[absorber]:.2f}s)")
                continue
            if absorber is not None:
                problems.append(
                    f"{name}: consolidated into {absorber}, but {absorber} "
                    "is ALSO missing from the new run"
                )
            else:
                problems.append(f"{name}: present in old run, missing from new")
            continue
        # like-for-like baseline: an entry that ABSORBED consolidated
        # queries is expected to carry their work too, so credit it the
        # absorbed entries' old times (only those actually folded: present
        # in old, absent from new)
        absorbed = [
            o for o, a in CONSOLIDATED.items()
            if a == name and o in oldq and o not in newq
        ]
        t_base = t_old + sum(oldq[o] for o in absorbed)
        if t_base >= args.min_sec and newq[name] > t_base * args.factor:
            suffix = f" (incl. absorbed {'+'.join(absorbed)})" if absorbed else ""
            problems.append(
                f"{name}: {t_base:.2f}s -> {newq[name]:.2f}s "
                f"({newq[name] / t_base:.1f}x, threshold {args.factor}x){suffix}"
            )

    # per-arm comparison inside consolidated cells: the cell total absorbs
    # a one-arm slowdown (1 of segments_compact's 14 arms going 5x moves
    # the cell <40%), so arms are gated at their own grain when both runs
    # carry the arms sub-dict
    old_arms, new_arms = old.get("arms") or {}, new.get("arms") or {}
    for qname, oarms in old_arms.items():
        narms = new_arms.get(qname) or {}
        for arm, t_old in oarms.items():
            if (
                arm in narms
                and t_old >= args.arm_min_sec
                and narms[arm] > t_old * args.factor
            ):
                problems.append(
                    f"{qname}.{arm}: {t_old:.2f}s -> {narms[arm]:.2f}s "
                    f"({narms[arm] / t_old:.1f}x, threshold {args.factor}x)"
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
