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
