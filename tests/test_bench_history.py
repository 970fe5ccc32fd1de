"""Per-sf bench regression history (round-13 verdict, What's wrong #2).

Round 13's committed BENCH_FULL.json carried ``prev_queries: {}``
because a mid-round 10x profiling run overwrote the single-slot prev
map, making ``watch_regressions`` vacuous.  The fix keys history by sf
in a sidecar; these tests pin that a foreign-sf run cannot wipe the
same-sf comparison base.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(HERE, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_foreign_sf_run_does_not_wipe_same_sf_base(tmp_path):
    bench = _bench()
    root = str(tmp_path)
    # round N: a real sf0.1 run establishes the base
    prev, watch = bench._regression_watch(root, 0.1, {"q1": 1.0, "q2": 0.2})
    assert prev == {} and watch == []
    # mid-round: a 10x profiling run at sf1.0 (the round-13 wipe vector)
    prev, watch = bench._regression_watch(root, 1.0, {"q1": 9.0})
    assert prev == {}
    # round N close: the sf0.1 base SURVIVED and regressions are caught
    prev, watch = bench._regression_watch(root, 0.1, {"q1": 2.0, "q2": 0.21})
    assert prev == {"q1": 1.0, "q2": 0.2}
    assert watch == ["q1"]  # 2x and +1.0s; q2's +0.01s is sub-floor
    hist = json.loads((tmp_path / "BENCH_HISTORY.json").read_text())
    assert set(hist) == {"0.1", "1.0"}


def test_bench_full_is_fallback_when_sidecar_absent(tmp_path):
    bench = _bench()
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q1": 1.0}})
    )
    prev, watch = bench._regression_watch(str(tmp_path), 0.1, {"q1": 1.6})
    assert prev == {"q1": 1.0}
    assert watch == ["q1"]
    # but a DIFFERENT-sf BENCH_FULL is never used as a base
    prev, watch = bench._regression_watch(str(tmp_path), 1.0, {"q1": 50.0})
    assert prev == {} and watch == []


def test_watched_regression_does_not_ratchet_base(tmp_path):
    """A run that FIRES the watch must not raise the comparison base
    (r14 advice): the next run at the old speed would otherwise read as
    'recovered' against a base the transient slow run itself set."""
    bench = _bench()
    root = str(tmp_path)
    bench._regression_watch(root, 0.1, {"q1": 1.0})
    # transient 3x slow run fires the watch...
    prev, watch = bench._regression_watch(root, 0.1, {"q1": 3.0})
    assert watch == ["q1"]
    # ...and the base KEPT the previous value, so a still-slow run
    # fires again instead of reading as recovered
    prev, watch = bench._regression_watch(root, 0.1, {"q1": 2.9})
    assert prev == {"q1": 1.0} and watch == ["q1"]


def test_explicit_repin_accepts_a_slowdown(tmp_path, monkeypatch):
    bench = _bench()
    root = str(tmp_path)
    bench._regression_watch(root, 0.1, {"q1": 1.0})
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPIN", "1")
    prev, watch = bench._regression_watch(root, 0.1, {"q1": 3.0})
    assert watch == ["q1"]  # still reported...
    monkeypatch.delenv("SPARK_GRAFT_BENCH_REPIN")
    # ...but the base was re-pinned to the accepted 3.0
    prev, watch = bench._regression_watch(root, 0.1, {"q1": 3.0})
    assert prev == {"q1": 3.0} and watch == []


def test_vs_latest_close_self_report(tmp_path):
    """bench self-reports vs the latest close snapshot (r15): the field
    survives BENCH_FULL.json overwrites because every run recomputes it."""
    import json as _json

    bench = _bench()
    root = str(tmp_path)
    assert bench._vs_latest_close(root, 0.1, {"q1": 1.0})["close_round"] is None
    (tmp_path / "BENCH_FULL_r14.json").write_text(
        _json.dumps({"sf": 0.1, "queries": {"q1": 2.0, "q2": 2.0}})
    )
    (tmp_path / "BENCH_FULL_r9.json").write_text(
        _json.dumps({"sf": 0.1, "queries": {"q1": 50.0}})
    )
    v = bench._vs_latest_close(root, 0.1, {"q1": 1.0, "q3": 9.0})
    assert v["close_round"] == 14  # latest by round number, not r9
    assert v["common_queries"] == 1 and v["ratio"] == 0.5
    # sf mismatch degrades to a note
    v = bench._vs_latest_close(root, 0.01, {"q1": 1.0})
    assert "note" in v and "ratio" not in v


def test_calibration_ratio_best_of_start_end(tmp_path):
    bench = _bench()
    # min(start,end) on each side; 0.5 vs 0.4 -> 0.8
    assert bench.calibration_ratio(
        {"start_s": 0.6, "end_s": 0.5}, {"start_s": 0.4, "end_s": 0.9}
    ) == 0.8
    # missing either side -> None (pre-r16 snapshots carry none)
    assert bench.calibration_ratio(None, {"start_s": 0.4}) is None
    assert bench.calibration_ratio({"start_s": 0.5}, {}) is None
    assert bench.calibration_ratio({"start_s": 0.0}, {"start_s": 0.4}) is None


def test_vs_latest_close_carries_calibration_ratio(tmp_path):
    bench = _bench()
    root = str(tmp_path)
    with open(os.path.join(root, "BENCH_FULL_r15.json"), "w") as fh:
        json.dump(
            {"sf": 0.1, "queries": {"a": 1.0}, "calibration": {"start_s": 1.0, "end_s": 1.2}},
            fh,
        )
    out = bench._vs_latest_close(root, 0.1, {"a": 0.9}, {"start_s": 1.1, "end_s": 1.3})
    assert out["ratio"] == 0.9
    assert out["calibration_ratio"] == 1.1
    # no calibration passed (or in snapshot) -> field simply absent
    out = bench._vs_latest_close(root, 0.1, {"a": 0.9})
    assert "calibration_ratio" not in out


def test_latest_close_snapshot_discovery(tmp_path):
    bench = _bench()
    root = str(tmp_path)
    for n in (9, 15, 12):
        with open(os.path.join(root, f"BENCH_FULL_r{n}.json"), "w") as fh:
            fh.write("{}")
    assert bench.latest_close_snapshot(root) == (15, os.path.join(root, "BENCH_FULL_r15.json"))
    # `below` restricts to earlier rounds (round_close's stamp base)
    assert bench.latest_close_snapshot(root, below=15)[0] == 12
    assert bench.latest_close_snapshot(str(tmp_path / "empty")) == (-1, None)


def test_calibration_ratio_ignores_error_markers(tmp_path):
    """A failed calibration records {'error': ...} instead of a float
    (it must never kill the bench run); the ratio helper treats that
    side as absent."""
    bench = _bench()
    err = {"start_s": {"error": "boom"}, "end_s": {"error": "boom"}}
    assert bench.calibration_ratio(err, {"start_s": 0.4}) is None
    assert bench.calibration_ratio({"start_s": 0.4}, err) is None


def test_calibration_ratio_io_kind(tmp_path):
    """r17: kind='io' reads the I/O twin's fields and is absent until
    BOTH sides carry them (pre-r17 snapshots never do)."""
    bench = _bench()
    prev = {"start_s": 1.0, "end_s": 1.2, "io_start_s": 2.0, "io_end_s": 2.5}
    cur = {"start_s": 0.5, "io_start_s": 1.0, "io_end_s": 3.0}
    assert bench.calibration_ratio(prev, cur, kind="io") == 0.5
    # cpu default unchanged by the io fields
    assert bench.calibration_ratio(prev, cur) == 0.5
    # either side missing io fields (or carrying an error marker) -> None
    assert bench.calibration_ratio({"start_s": 1.0}, cur, kind="io") is None
    assert bench.calibration_ratio(prev, {"io_start_s": {"error": "x"}}, kind="io") is None


def test_vs_latest_close_carries_io_ratio_when_both_sides_have_it(tmp_path):
    bench = _bench()
    root = str(tmp_path)
    with open(os.path.join(root, "BENCH_FULL_r16.json"), "w") as fh:
        json.dump(
            {"sf": 0.1, "queries": {"a": 1.0},
             "calibration": {"start_s": 1.0, "io_start_s": 2.0}},
            fh,
        )
    out = bench._vs_latest_close(
        root, 0.1, {"a": 0.9}, {"start_s": 1.1, "io_start_s": 1.0}
    )
    assert out["calibration_ratio"] == 1.1
    assert out["calibration_io_ratio"] == 0.5
    # prev without io fields -> io ratio simply absent
    with open(os.path.join(root, "BENCH_FULL_r16.json"), "w") as fh:
        json.dump(
            {"sf": 0.1, "queries": {"a": 1.0}, "calibration": {"start_s": 1.0}}, fh
        )
    out = bench._vs_latest_close(
        root, 0.1, {"a": 0.9}, {"start_s": 1.1, "io_start_s": 1.0}
    )
    assert "calibration_io_ratio" not in out


def test_sidecar_is_append_minimal_bests(tmp_path):
    """r17 verdict task 5: the sidecar holds all-time per-query bests —
    a run that beats nothing leaves the file byte-identical (no commit
    churn), and a run that beats one query rewrites only that entry."""
    bench = _bench()
    root = str(tmp_path)
    bench._regression_watch(root, 0.1, {"q1": 1.0, "q2": 2.0})
    sidecar = tmp_path / "BENCH_HISTORY.json"
    before = sidecar.read_bytes()
    mtime = os.path.getmtime(sidecar)
    # slower-but-sub-watch run: nothing beaten -> file untouched
    prev, watch = bench._regression_watch(root, 0.1, {"q1": 1.2, "q2": 2.1})
    assert watch == [] and prev == {"q1": 1.0, "q2": 2.0}
    assert sidecar.read_bytes() == before
    assert os.path.getmtime(sidecar) == mtime
    # one query beaten -> only that entry changes
    bench._regression_watch(root, 0.1, {"q1": 0.8, "q2": 2.5})
    hist = json.loads(sidecar.read_text())
    assert hist["0.1"] == {"q1": 0.8, "q2": 2.0}


def test_sidecar_keeps_best_for_new_and_removed_queries(tmp_path):
    """New queries seed their best; removed queries keep their stale
    best until an explicit repin (the cleanup valve) drops them."""
    bench = _bench()
    root = str(tmp_path)
    bench._regression_watch(root, 0.1, {"q1": 1.0, "gone": 5.0})
    bench._regression_watch(root, 0.1, {"q1": 1.5, "new": 0.5})
    hist = json.loads((tmp_path / "BENCH_HISTORY.json").read_text())
    assert hist["0.1"] == {"q1": 1.0, "gone": 5.0, "new": 0.5}
    os.environ["SPARK_GRAFT_BENCH_REPIN"] = "1"
    try:
        bench._regression_watch(root, 0.1, {"q1": 1.5, "new": 0.6})
    finally:
        del os.environ["SPARK_GRAFT_BENCH_REPIN"]
    hist = json.loads((tmp_path / "BENCH_HISTORY.json").read_text())
    assert hist["0.1"] == {"q1": 1.5, "new": 0.6}
