"""Perf-regression gate pins (bench.regression_gate): the bench line must
self-report >2x slowdowns and errored queries vs the last committed snapshot
(the reference's perf-suite contract, perf/BitsPerf.scala:44-49,177-196),
and must never raise — round 3 proved a bench that dies ships no evidence.
Pure-python: no SparkSession needed."""

import bench


def test_gate_flags_regressions_and_errors():
    got = bench.regression_gate(
        {"dedup_minhash": 1e6}, {"text_search": "boom"}, 0.1
    )
    assert got is not None
    snap, regs = got
    assert snap.endswith(".json")
    assert any(r.startswith("dedup_minhash:") for r in regs)
    assert any("text_search: errored" in r for r in regs)


def test_gate_clean_when_fast():
    got = bench.regression_gate({"dedup_minhash": 0.01}, {}, 0.1)
    assert got is not None
    _, regs = got
    assert regs == []


def test_gate_none_without_matching_sf_snapshot():
    assert bench.regression_gate({"q": 1.0}, {}, 123.456) is None


def test_gate_never_raises(tmp_path, monkeypatch):
    # point the snapshot dir somewhere broken: gate degrades to None
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path / "nope")
    )
    assert bench.regression_gate({"q": 1.0}, {}, 0.1) is None


def test_gate_picks_newest_snapshot_by_mtime(tmp_path, monkeypatch):
    """Recency = taken_at/mtime, NOT filename sort: '...z-mid.json' written
    AFTER '...a-end.json' must win despite sorting last alphabetically."""
    import json
    import os
    import time

    snap_dir = tmp_path / "tools" / "bench_snapshots"
    snap_dir.mkdir(parents=True)
    stale = {"sf": 0.1, "queries": {"q": 100.0}}
    fresh = {"sf": 0.1, "queries": {"q": 1.0}}
    # alphabetically LAST file is the stale one
    (snap_dir / "z-stale.json").write_text(json.dumps(stale))
    time.sleep(0.05)
    (snap_dir / "a-fresh.json").write_text(json.dumps(fresh))
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    got = bench.regression_gate({"q": 3.0}, {}, 0.1)
    assert got is not None
    snap, regs = got
    assert snap == "a-fresh.json"  # mtime-newest, not lexicographic
    assert regs and regs[0].startswith("q:")  # 3x vs fresh 1.0s baseline
    # explicit taken_at overrides mtime
    older_but_stamped = {"sf": 0.1, "queries": {"q": 50.0},
                         "taken_at": time.time() + 1000}
    (snap_dir / "m-stamped.json").write_text(json.dumps(older_but_stamped))
    snap2, regs2 = bench.regression_gate({"q": 3.0}, {}, 0.1)
    assert snap2 == "m-stamped.json"
    assert regs2 == []


def test_gate_prefers_stamped_snapshot_over_fresh_checkout_mtime(
    tmp_path, monkeypatch
):
    """A fresh git checkout stamps every file with checkout-time mtime, so
    a legacy (taken_at-less) snapshot's mtime outranks ANY honest embedded
    epoch — the gate must still pick the stamped snapshot, else it pins to
    the oldest baseline in the dir after every clone."""
    import json
    import time

    snap_dir = tmp_path / "tools" / "bench_snapshots"
    snap_dir.mkdir(parents=True)
    # stamped snapshot taken an hour ago...
    stamped = {"sf": 0.1, "queries": {"q": 1.0}, "taken_at": time.time() - 3600}
    (snap_dir / "new-stamped.json").write_text(json.dumps(stamped))
    time.sleep(0.05)
    # ...but the legacy snapshot's FILE is younger (the checkout effect)
    legacy = {"sf": 0.1, "queries": {"q": 100.0}}
    (snap_dir / "old-legacy.json").write_text(json.dumps(legacy))
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    got = bench.regression_gate({"q": 3.0}, {}, 0.1)
    assert got is not None
    snap, regs = got
    assert snap == "new-stamped.json"
    assert regs and regs[0].startswith("q:")  # 3x vs the stamped 1.0s


def test_bench_compare_consolidation_ledger():
    """An old query name missing from the new run is excused ONLY when its
    CONSOLIDATED absorber is present; a truly-dropped name (or a dropped
    absorber) exits nonzero. Absorbers are compared against their own old
    time PLUS the absorbed entries' old times (like-for-like)."""
    import json
    import subprocess
    import sys
    import tempfile

    old = {"value": 10.0, "sf": 0.1,
           "queries": {"ann_lsh": 4.0, "ann_ivf": 4.0, "ann_topk": 2.0,
                       "never_existed": 1.5}}
    new_ok = {"value": 9.0, "sf": 0.1, "queries": {"ann_topk": 9.0}}

    def run(o, n):
        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f1, \
             tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f2:
            json.dump(o, f1); json.dump(n, f2)
        p = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_compare.py", f1.name, f2.name],
            capture_output=True, text=True,
        )
        return p.returncode, p.stdout

    rc, out = run(old, new_ok)
    # never_existed is a real drop -> nonzero; the consolidated ann_* are
    # excused; ann_topk at 9.0 vs credited 2+4+4=10 is NOT a regression
    assert rc == 1
    assert "never_existed: present in old run, missing from new" in out
    assert "ann_lsh" not in [l.split(":")[0].strip().replace("REGRESSION ", "")
                             for l in out.splitlines() if "REGRESSION" in l]
    assert "ann_topk:" not in out.replace("consolidated", "")
    # drop the absorber too -> every consolidated name becomes a failure
    rc2, out2 = run({"value": 10.0, "sf": 0.1,
                     "queries": {"ann_lsh": 4.0, "ann_topk": 2.0}},
                    {"value": 1.0, "sf": 0.1, "queries": {"q1": 1.0}})
    assert rc2 == 1
    assert "ann_lsh: consolidated into ann_topk, but ann_topk is ALSO missing" in out2


def test_gate_trips_on_single_arm_slowdown(tmp_path, monkeypatch):
    """A one-arm regression inside a consolidated cell must trip the gate
    even when the CELL total stays under the 2x threshold — the exact
    blindness per-arm sub-timings exist to cure."""
    import json

    snap_dir = tmp_path / "tools" / "bench_snapshots"
    snap_dir.mkdir(parents=True)
    snap = {
        "sf": 0.1,
        "queries": {"segments_compact": 10.0},
        "arms": {"segments_compact": {"compact": 1.0, "purge": 1.0, "cdf": 8.0}},
    }
    (snap_dir / "snap.json").write_text(json.dumps(snap))
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    # cell 10.0 -> 14.0 (1.4x: under the gate) but 'purge' went 1.0 -> 5.0
    got = bench.regression_gate(
        {"segments_compact": 14.0},
        {},
        0.1,
        arms={"segments_compact": {"compact": 1.0, "purge": 5.0, "cdf": 8.0}},
    )
    assert got is not None
    _, regs = got
    assert regs == ["segments_compact.purge: 1.00s -> 5.00s (5.0x)"]
    # sub-floor arms are jitter, not signal: 0.2s -> 0.45s stays silent
    got2 = bench.regression_gate(
        {"segments_compact": 10.0},
        {},
        0.1,
        arms={"segments_compact": {"compact": 1.0, "purge": 1.0, "cdf": 8.0,
                                   "tiny": 0.45}},
    )
    assert got2 is not None and got2[1] == []


def test_bench_compare_arm_grain():
    """bench_compare gates per-arm sub-timings the same way."""
    import json
    import subprocess
    import sys
    import tempfile

    old = {
        "value": 10.0, "sf": 0.1, "queries": {"ann_topk": 10.0},
        "arms": {"ann_topk": {"brute": 5.0, "ivf4": 1.0}},
    }
    new = {
        "value": 11.0, "sf": 0.1, "queries": {"ann_topk": 11.0},
        "arms": {"ann_topk": {"brute": 5.0, "ivf4": 6.0}},
    }

    def run(o, n):
        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f1, \
             tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f2:
            json.dump(o, f1); json.dump(n, f2)
        p = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_compare.py", f1.name, f2.name],
            capture_output=True, text=True,
        )
        return p.returncode, p.stdout

    rc, out = run(old, new)
    assert rc == 1
    assert "ann_topk.ivf4: 1.00s -> 6.00s" in out
    # same totals, healthy arms -> clean
    new_ok = {
        "value": 11.0, "sf": 0.1, "queries": {"ann_topk": 11.0},
        "arms": {"ann_topk": {"brute": 5.5, "ivf4": 1.2}},
    }
    rc2, _ = run(old, new_ok)
    assert rc2 == 0


def test_gate_survives_null_taken_at(tmp_path, monkeypatch):
    """A snapshot with "taken_at": null must not disable the gate: key
    (1, None) vs (1, float) in max() raises TypeError, which the advisory
    outer except swallows — the regression gate would silently go blind for
    the whole run. Null/garbage stamps fall back to file mtime."""
    import json
    import time

    snap_dir = tmp_path / "tools" / "bench_snapshots"
    snap_dir.mkdir(parents=True)
    (snap_dir / "null-stamp.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 50.0}, "taken_at": None})
    )
    (snap_dir / "str-stamp.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 60.0}, "taken_at": "yesterday"})
    )
    good = {"sf": 0.1, "queries": {"q": 1.0}, "taken_at": time.time()}
    (snap_dir / "good.json").write_text(json.dumps(good))
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    got = bench.regression_gate({"q": 3.0}, {}, 0.1)
    assert got is not None
    snap, regs = got
    assert snap == "good.json"  # typed stamp beats mtime-keyed fallbacks
    assert regs and regs[0].startswith("q:")


def test_compact_line_fits_driver_window():
    """The driver records only the last ~2000 bytes of bench stdout; round
    7's arms-rich line outgrew that and BENCH_r07.json recorded parsed:null.
    The compact line must stay under budget even with 60 queries, a pile of
    regressions, and errors — and must never drop the queries dict."""
    import json

    detail = {
        "metric": "bench_total",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"query_name_{i:02d}": 1.234 for i in range(60)},
        "arms": {f"cell{i}": {f"arm{j}": 0.5 for j in range(20)} for i in range(6)},
        "sf": 0.1,
        "rows_lineitem": 600000,
        "taken_at": 1786774482.599,
        "baseline_snapshot": "2026-08-15-r7-arms.json",
        "regressions": [f"cell{i}.arm{i}: 1.00s -> 9.00s (9.0x)" for i in range(20)],
        "errors": {f"query_name_{i:02d}": "Boom: " + "x" * 400 for i in range(10)},
    }
    line = json.dumps(bench.compact_line(detail), separators=(",", ":"))
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "bench_total"
    assert len(parsed["queries"]) == 60
    assert "arms" not in parsed  # arms live in tools/bench_last_run.json
    assert parsed["n_regressions"] == 20
    assert parsed["n_errors"] == 10


def test_compact_line_keeps_contract_fields_when_small():
    got = bench.compact_line(
        {
            "metric": "bench_total",
            "value": 1.0,
            "unit": "sec",
            "queries": {"q1": 1.0},
            "sf": 0.01,
            "rows_lineitem": 60000,
            "taken_at": 123.0,
        }
    )
    assert got["queries"] == {"q1": 1.0}
    assert got["sf"] == 0.01
    assert got["taken_at"] == 123.0
    assert got["detail"] == "tools/bench_last_run.json"


def test_compact_line_provably_under_budget_with_many_queries():
    # round-8 ADVICE: the 2-decimal rounding fallback was not re-checked
    # against the budget — with enough entries the line could outgrow the
    # driver's ~2000-byte stdout window again. The last-resort path must
    # truncate to the slowest queries WITH an explicit marker.
    import json as _json

    detail = {
        "metric": "bench_total", "value": 1.0, "unit": "sec", "sf": 0.1,
        "queries": {f"very_long_query_name_{i:04d}": i / 1000 for i in range(400)},
    }
    out = bench.compact_line(detail)
    line = _json.dumps(out, separators=(",", ":"))
    assert len(line) <= bench.LINE_BUDGET
    assert out["n_queries_dropped"] > 0
    # the kept entries are the slowest ones
    kept_vals = sorted(out["queries"].values())
    assert min(kept_vals) >= 0.2


def test_compact_line_small_dict_untouched():
    detail = {
        "metric": "bench_total", "value": 1.0, "unit": "sec", "sf": 0.1,
        "queries": {"q1": 0.123456, "q2": 0.5},
    }
    out = bench.compact_line(detail)
    assert out["queries"] == {"q1": 0.123456, "q2": 0.5}
    assert "n_queries_dropped" not in out
