"""tools/round_close.py — the un-skippable end-of-round sequence.

These tests inject a stub runner so no Spark/bench work runs; they pin
the tool's CONTRACT: step order, artifact freshness enforcement, the
no-skip-flags usage surface, and the fail-open (run-everything,
report-everything) error accounting.
"""

from __future__ import annotations

import os
import time
import types

from tools import round_close


def _stub_runner(effects):
    """A subprocess.run stand-in: effects[name] = (rc, [artifact paths to touch])."""
    calls = []

    def run(argv, env=None, cwd=None):
        name = next(
            (s["name"] for s in round_close.steps_for("r99") if s["argv"] == argv),
            os.path.basename(argv[-1]),
        )
        calls.append(name)
        rc, artifacts = effects.get(name, (0, []))
        for rel in artifacts:
            p = os.path.join(round_close.ROOT, rel)
            with open(p, "w") as fh:
                fh.write("{}")
        return types.SimpleNamespace(returncode=rc)

    run.calls = calls
    return run


def _ident(head="H1", dirty=False):
    """Injectable git_identity stand-in: a clean tree at ``head``."""
    return lambda: {"head": head, "dirty": dirty}


def test_usage_rejects_missing_or_malformed_round():
    assert round_close.main([], runner=_stub_runner({})) == 2
    assert round_close.main(["13"], runner=_stub_runner({})) == 2
    assert round_close.main(["r13", "--skip-bench"], runner=_stub_runner({})) == 2


def test_green_close_requires_every_step_and_fresh_artifacts(tmp_path, monkeypatch):
    tag = "r99"
    # all steps succeed and write their artifacts fresh
    effects = {
        s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)
    }
    # BENCH_FULL.json is a real repo artifact — write it to a temp ROOT
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    runner = _stub_runner(effects)
    assert round_close.main([tag], runner=runner) == 0
    # step ORDER is the contract: bench -> verify -> probe -> guard
    assert runner.calls == ["bench", "verify_local", "scale_probe", "pytest", "coverage_guard"]


def test_red_step_fails_close_but_still_runs_remaining_steps(tmp_path, monkeypatch):
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    effects["verify_local"] = (1, effects["verify_local"][1])
    runner = _stub_runner(effects)
    assert round_close.main([tag], runner=runner) == 1
    # fail-open: the probe and guard still ran so the report is complete
    assert runner.calls == ["bench", "verify_local", "scale_probe", "pytest", "coverage_guard"]


def test_missing_artifact_fails_even_when_rc_is_zero(tmp_path, monkeypatch):
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    effects["scale_probe"] = (0, [])  # exits 0 but writes nothing
    assert round_close.main([tag], runner=_stub_runner(effects)) == 1


def test_stale_artifact_from_previous_round_is_rejected(tmp_path, monkeypatch):
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    ver = f"VERIFY_LOCAL_{tag}.json"
    # pre-existing artifact, older than the close run
    p = tmp_path / ver
    p.write_text("{}")
    old = time.time() - 3600
    os.utime(p, (old, old))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    effects["verify_local"] = (0, [])  # step "succeeds" without rewriting it
    assert round_close.main([tag], runner=_stub_runner(effects)) == 1


def test_check_artifacts_freshness_boundary(tmp_path, monkeypatch):
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    (tmp_path / "a.json").write_text("{}")
    assert round_close.check_artifacts(["a.json"], not_before=0.0) == []
    bad = round_close.check_artifacts(["a.json", "b.json"], not_before=time.time() + 60)
    assert any("stale" in b for b in bad) and any("missing" in b for b in bad)


def test_check_artifacts_tolerates_1s_mtime_granularity(tmp_path, monkeypatch):
    """An artifact written in the same second the run starts can get an
    mtime truncated just below t_start on coarse filesystems; the
    epsilon must absorb that without admitting genuinely old files."""
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    p = tmp_path / "a.json"
    p.write_text("{}")
    now = time.time()
    os.utime(p, (now - 1.0, now - 1.0))  # truncated-by-granularity case
    assert round_close.check_artifacts(["a.json"], not_before=now) == []
    os.utime(p, (now - 10.0, now - 10.0))  # genuinely stale
    assert round_close.check_artifacts(["a.json"], not_before=now) != []


def test_resume_skips_only_completed_steps_when_tree_unchanged(tmp_path, monkeypatch):
    """A killed close re-run completes only the missing steps (r13
    verdict task 4): bench + verify completed in run 1, run 2 must skip
    them and execute scale_probe + coverage_guard only."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    # run 1: scale_probe dies (rc 1, no artifact) -> close fails
    broken = dict(effects)
    broken["scale_probe"] = (1, [])
    r1 = _stub_runner(broken)
    assert round_close.main([tag], runner=r1, hash_fn=lambda: "T1", ident_fn=_ident()) == 1
    assert r1.calls == ["bench", "verify_local", "scale_probe", "pytest", "coverage_guard"]
    # run 2, same tree: bench/verify_local/pytest resume from receipts
    r2 = _stub_runner(effects)
    assert round_close.main([tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    assert r2.calls == ["scale_probe", "coverage_guard"]


def test_resume_reruns_everything_when_source_tree_changed(tmp_path, monkeypatch):
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    r1 = _stub_runner(effects)
    assert round_close.main([tag], runner=r1, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    # code changed after the green close -> every step re-runs
    r2 = _stub_runner(effects)
    assert round_close.main([tag], runner=r2, hash_fn=lambda: "T2", ident_fn=_ident()) == 0
    assert r2.calls == ["bench", "verify_local", "scale_probe", "pytest", "coverage_guard"]


def test_resume_reruns_step_whose_artifact_was_deleted(tmp_path, monkeypatch):
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    r1 = _stub_runner(effects)
    assert round_close.main([tag], runner=r1, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    os.unlink(tmp_path / f"VERIFY_LOCAL_{tag}.json")
    r2 = _stub_runner(effects)
    assert round_close.main([tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    # verify_local re-ran; bench and scale_probe resumed
    assert r2.calls == ["verify_local", "coverage_guard"]


def test_git_failure_disables_resume_not_the_close(tmp_path, monkeypatch):
    """tree_hash outside a git repo returns a unique token each call,
    so resume silently degrades to run-everything."""
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    h1, h2 = round_close.tree_hash(), round_close.tree_hash()
    assert h1 != h2 and h1.startswith("no-resume-")


def test_green_close_stamps_vs_prev_round_and_snapshot(tmp_path, monkeypatch):
    """A green close writes the round-tagged BENCH_FULL snapshot with a
    vs_prev_round field (r14 verdict task 6) — even when there is no
    prior snapshot to compare against."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    assert round_close.main([tag], runner=_stub_runner(effects)) == 0
    import json

    snap = json.loads((tmp_path / f"BENCH_FULL_{tag}.json").read_text())
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert snap == full
    assert full["vs_prev_round"]["prev_round"] is None  # bootstrap case


def test_stamp_like_for_like_ratio_over_common_queries(tmp_path, monkeypatch):
    import json

    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    (tmp_path / "BENCH_FULL_r98.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 1.0, "b": 2.0, "gone": 5.0}})
    )
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 0.5, "b": 1.0, "new": 9.0}})
    )
    round_close._stamp_like_for_like("r99")
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    v = full["vs_prev_round"]
    assert v["prev_round"] == 98
    assert v["common_queries"] == 2
    assert v["prev_common_total_s"] == 3.0 and v["cur_common_total_s"] == 1.5
    assert v["ratio"] == 0.5
    assert v["new_queries"] == ["new"] and v["removed_queries"] == ["gone"]
    # snapshot written and identical
    assert json.loads((tmp_path / "BENCH_FULL_r99.json").read_text()) == full


def test_stamp_like_for_like_sf_mismatch_has_no_ratio(tmp_path, monkeypatch):
    import json

    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    (tmp_path / "BENCH_FULL_r98.json").write_text(
        json.dumps({"sf": 0.01, "queries": {"a": 1.0}})
    )
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 0.5}})
    )
    round_close._stamp_like_for_like("r99")
    v = json.loads((tmp_path / "BENCH_FULL.json").read_text())["vs_prev_round"]
    assert v["prev_round"] == 98 and "ratio" not in v and "mismatch" in v["note"]


def test_stamp_like_for_like_picks_latest_prior_round_only(tmp_path, monkeypatch):
    """r101 must compare against r100, never r99 — and never a FUTURE
    snapshot left by a re-run."""
    import json

    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    for n, t in (("r99", 8.0), ("r100", 4.0), ("r102", 1.0)):
        (tmp_path / f"BENCH_FULL_{n}.json").write_text(
            json.dumps({"sf": 0.1, "queries": {"a": t}})
        )
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 2.0}})
    )
    round_close._stamp_like_for_like("r101")
    v = json.loads((tmp_path / "BENCH_FULL.json").read_text())["vs_prev_round"]
    assert v["prev_round"] == 100 and v["ratio"] == 0.5


def test_resume_record_without_started_at_reruns_the_step(tmp_path, monkeypatch):
    """A state record missing started_at is non-resumable (r14 advice):
    defaulting the freshness floor to 0.0 would let ANY pre-existing
    artifact, however stale, satisfy the check."""
    import json

    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    r1 = _stub_runner(effects)
    assert round_close.main([tag], runner=r1, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    state_p = tmp_path / f".round_close_{tag}.state.json"
    st = json.loads(state_p.read_text())
    del st["verify_local"]["started_at"]  # corrupt / hand-edited record
    state_p.write_text(json.dumps(st))
    r2 = _stub_runner(effects)
    assert round_close.main([tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    assert "verify_local" in r2.calls  # re-ran despite rc=0 receipt


def test_stamp_write_failure_fails_the_close(tmp_path, monkeypatch):
    """r15 residual 2: a close that cannot write the stamp/snapshot must
    exit nonzero — a disk-full close may not print green while leaving
    the next round's ratio base missing."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}

    real_open = open

    def failing_open(path, mode="r", *a, **kw):
        if "w" in mode and f"BENCH_FULL_{tag}.json" in str(path):
            raise OSError(28, "No space left on device")
        return real_open(path, mode, *a, **kw)

    import builtins

    monkeypatch.setattr(builtins, "open", failing_open)
    assert round_close.main([tag], runner=_stub_runner(effects)) == 1


def test_stamp_unreadable_bench_full_fails_the_close(tmp_path, monkeypatch):
    """The read side of the same contract: no BENCH_FULL.json at stamp
    time (bench step lied about its artifact) -> nonzero."""
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))  # empty dir
    out = round_close._stamp_like_for_like("r99")
    assert out and "cannot read BENCH_FULL.json" in out[0]


def test_fully_resumed_reentry_does_not_restamp(tmp_path, monkeypatch):
    """r15 ADVICE item 2: green close, then a standalone bench run
    overwrites BENCH_FULL.json, then an idempotent re-entry where every
    step SKIPs — the round-tagged snapshot must keep the CLOSE run's
    numbers, not be re-stamped from the standalone run's."""
    import json

    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    assert round_close.main([tag], runner=_stub_runner(effects), hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    snap_before = (tmp_path / f"BENCH_FULL_{tag}.json").read_text()
    # standalone bench run after the close
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 99.0}, "value": 99.0})
    )
    r2 = _stub_runner(effects)
    assert round_close.main([tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    assert r2.calls == ["coverage_guard"]  # everything else resumed
    assert (tmp_path / f"BENCH_FULL_{tag}.json").read_text() == snap_before


def test_partially_resumed_reentry_restamps(tmp_path, monkeypatch):
    """If any step actually re-ran (e.g. source changed), the stamp must
    refresh: the re-run bench wrote a NEW BENCH_FULL.json and the
    snapshot has to match it."""
    import json

    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    assert round_close.main([tag], runner=_stub_runner(effects), hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    # tree changed -> full re-run; stub writes "{}" artifacts again
    assert round_close.main([tag], runner=_stub_runner(effects), hash_fn=lambda: "T2", ident_fn=_ident()) == 0
    snap = json.loads((tmp_path / f"BENCH_FULL_{tag}.json").read_text())
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert snap == full


def test_stamp_carries_calibration_ratio(tmp_path, monkeypatch):
    """r15 verdict task 7: the close stamp reports the fixed-workload
    calibration ratio next to the like-for-like ratio, so regime-vs-
    plans is a receipt in the artifact itself."""
    import json

    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    (tmp_path / "BENCH_FULL_r98.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 1.0},
                    "calibration": {"start_s": 1.0, "end_s": 1.1}})
    )
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 1.2},
                    "calibration": {"start_s": 1.25, "end_s": 1.3}})
    )
    assert round_close._stamp_like_for_like("r99") == []
    v = json.loads((tmp_path / "BENCH_FULL.json").read_text())["vs_prev_round"]
    assert v["ratio"] == 1.2 and v["calibration_ratio"] == 1.25


def test_overwritten_bench_full_before_stamp_reruns_bench(tmp_path, monkeypatch):
    """r16 ADVICE item 1: a close that dies AFTER the bench step but
    BEFORE stamping (no BENCH_FULL_r{N}.json yet), followed by a
    standalone bench run overwriting BENCH_FULL.json — the re-entry
    must RE-RUN bench, not resume it, or the stamp would certify the
    standalone run's numbers as the round's close receipt."""
    import json

    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    # run 1: scale_probe dies -> bench completed, close red, NO snapshot
    broken = dict(effects)
    broken["scale_probe"] = (1, [])
    assert round_close.main([tag], runner=_stub_runner(broken), hash_fn=lambda: "T1", ident_fn=_ident()) == 1
    assert not (tmp_path / f"BENCH_FULL_{tag}.json").exists()
    # standalone bench run overwrites BENCH_FULL.json (newer mtime)
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 99.0}, "value": 99.0})
    )
    os.utime(tmp_path / "BENCH_FULL.json", (time.time() + 5, time.time() + 5))
    # run 2, same tree: bench must re-run (mtime identity broken), and the
    # stamp then snapshots the RE-RUN's numbers, not the standalone run's
    r2 = _stub_runner(effects)
    assert round_close.main([tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    assert "bench" in r2.calls
    snap = json.loads((tmp_path / f"BENCH_FULL_{tag}.json").read_text())
    assert "value" not in snap or snap.get("value") != 99.0


def test_overwritten_verify_artifact_reruns_verify(tmp_path, monkeypatch):
    """The mtime-identity rule covers every resumable step: a verify
    receipt overwritten after the step completed (however fresh) must
    force the step to re-run on re-entry."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    broken = dict(effects)
    broken["coverage_guard"] = (1, [])
    assert round_close.main([tag], runner=_stub_runner(broken), hash_fn=lambda: "T1", ident_fn=_ident()) == 1
    ver = tmp_path / f"VERIFY_LOCAL_{tag}.json"
    ver.write_text('{"foreign": true}')
    os.utime(ver, (time.time() + 5, time.time() + 5))
    r2 = _stub_runner(effects)
    assert round_close.main([tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident()) == 0
    assert "verify_local" in r2.calls


def test_stamp_carries_io_calibration_ratio_when_present(tmp_path, monkeypatch):
    """r17: the close stamp records the I/O calibration twin's ratio
    next to the CPU one whenever both rounds carry the io fields."""
    import json

    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    (tmp_path / "BENCH_FULL_r98.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 1.0},
                    "calibration": {"start_s": 1.0, "io_start_s": 2.0}})
    )
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 1.2},
                    "calibration": {"start_s": 1.25, "io_start_s": 1.5}})
    )
    assert round_close._stamp_like_for_like("r99") == []
    v = json.loads((tmp_path / "BENCH_FULL.json").read_text())["vs_prev_round"]
    assert v["calibration_ratio"] == 1.25 and v["calibration_io_ratio"] == 0.75


def test_dirty_tree_marks_receipt_non_resumable(tmp_path, monkeypatch):
    """r17 verdict task 1: a receipt produced on a source-dirty tree
    cannot be bound to a commit, so a later re-entry re-runs every
    step even when the tree hash never changed."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    r1 = _stub_runner(effects)
    assert round_close.main(
        [tag], runner=r1, hash_fn=lambda: "T1", ident_fn=_ident(dirty=True)
    ) == 0
    # re-entry on the now-clean tree at the same commit: nothing resumes
    r2 = _stub_runner(effects)
    assert round_close.main(
        [tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident(dirty=False)
    ) == 0
    assert r2.calls == ["bench", "verify_local", "scale_probe", "pytest", "coverage_guard"]


def test_currently_dirty_tree_disables_resume(tmp_path, monkeypatch):
    """The other direction: clean-tree receipts exist, but the RE-ENTRY
    runs on a dirty tree — steps re-run (fail toward re-running)."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    assert round_close.main(
        [tag], runner=_stub_runner(effects), hash_fn=lambda: "T1", ident_fn=_ident()
    ) == 0
    r2 = _stub_runner(effects)
    assert round_close.main(
        [tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident(dirty=True)
    ) == 0
    assert "bench" in r2.calls and "verify_local" in r2.calls


def test_commit_mismatch_marks_receipt_non_resumable(tmp_path, monkeypatch):
    """Receipts name the commit they ran on; a re-entry at a different
    HEAD re-runs every step even if the tree hash matched (e.g. a
    commit --amend that left source bytes identical)."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    assert round_close.main(
        [tag], runner=_stub_runner(effects), hash_fn=lambda: "T1", ident_fn=_ident("H1")
    ) == 0
    r2 = _stub_runner(effects)
    assert round_close.main(
        [tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident("H2")
    ) == 0
    assert "bench" in r2.calls and "verify_local" in r2.calls


def test_missing_git_identity_disables_resume(tmp_path, monkeypatch):
    """No git (or git failure) -> identity is {None, None} -> receipts
    are written but never resumable."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    no_git = lambda: {"head": None, "dirty": None}  # noqa: E731
    assert round_close.main(
        [tag], runner=_stub_runner(effects), hash_fn=lambda: "T1", ident_fn=no_git
    ) == 0
    r2 = _stub_runner(effects)
    assert round_close.main(
        [tag], runner=r2, hash_fn=lambda: "T1", ident_fn=no_git
    ) == 0
    assert "bench" in r2.calls


def test_state_and_stamp_carry_git_identity(tmp_path, monkeypatch):
    """r17 verdict task 1 'done' criterion: both the state file and the
    round-tagged bench snapshot name the commit + dirty flag, so the
    judge can equate receipts with a git identity."""
    import json

    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    assert round_close.main(
        [tag], runner=_stub_runner(effects), hash_fn=lambda: "T1",
        ident_fn=_ident("CAFE123"),
    ) == 0
    st = json.loads((tmp_path / f".round_close_{tag}.state.json").read_text())
    for name in ("bench", "verify_local", "scale_probe", "pytest"):
        assert st[name]["git_head"] == "CAFE123" and st[name]["git_dirty"] is False
    snap = json.loads((tmp_path / f"BENCH_FULL_{tag}.json").read_text())
    assert snap["git"] == {"head": "CAFE123", "dirty": False}


def test_mtime_preserving_overwrite_reruns_step(tmp_path, monkeypatch):
    """r17 ADVICE item 2: an overwrite that preserves the artifact's
    mtime (or lands in the same coarse-granularity second) but changes
    its size must break resume — identity is mtime AND size."""
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    broken = dict(effects)
    broken["coverage_guard"] = (1, [])
    assert round_close.main(
        [tag], runner=_stub_runner(broken), hash_fn=lambda: "T1", ident_fn=_ident()
    ) == 1
    ver = tmp_path / f"VERIFY_LOCAL_{tag}.json"
    old_mtime = os.path.getmtime(ver)
    ver.write_text('{"foreign": true, "padded": "x"}')  # different size
    os.utime(ver, (old_mtime, old_mtime))  # mtime restored exactly
    r2 = _stub_runner(effects)
    assert round_close.main(
        [tag], runner=r2, hash_fn=lambda: "T1", ident_fn=_ident()
    ) == 0
    assert "verify_local" in r2.calls


def test_degraded_regime_close_reruns_bench_once_and_flags_stamp(tmp_path, monkeypatch):
    """r19 (verdict task 8): a close whose bench ran inside a >1.5x
    in-run calibration swing re-runs the bench ONCE (not a loop), and a
    persistent swing is flagged in the stamp as close_regime.degraded
    instead of silently certifying excursion numbers."""
    import json

    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    base = _stub_runner(effects)

    def runner(argv, env=None, cwd=None):
        res = base(argv, env=env, cwd=cwd)
        if base.calls[-1] == "bench":  # every bench run lands in a swing
            (tmp_path / "BENCH_FULL.json").write_text(
                json.dumps(
                    {
                        "sf": 0.1,
                        "queries": {"a": 1.0},
                        "calibration": {"start_s": 1.0, "end_s": 2.0},
                    }
                )
            )
        return res

    assert round_close.main([tag], runner=runner) == 0
    assert base.calls.count("bench") == 2  # exactly one retry
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert full["close_regime"] == {"inrun_calibration_swing": 2.0, "degraded": True}
    # and a steady close is NOT flagged degraded
    assert round_close._calibration_inrun_swing({"start_s": 1.0, "end_s": 1.2}) == 1.2


def test_close_verify_step_is_full_catalog_at_both_sfs():
    """r17 verdict task 7: the driver's correctness sample has been the
    same 50 rows for rounds — verify_local inside the close is the ONLY
    complete gate.  Pin that the close's verify step runs the FULL
    catalog (no query-subset args) at BOTH catalog sfs, and that the
    probe step likewise names no subset — a future 'fast close' cannot
    quietly thin the gate."""
    steps = {s["name"]: s for s in round_close.steps_for("r99")}
    v = steps["verify_local"]["argv"]
    # argv shape: [python, .../verify_local.py, "<sf0.01>,<sf0.1>"] —
    # anything after the sf list would be a query subset
    assert len(v) == 3 and v[2] == round_close.SF_BOTH
    assert "sf0.01" in round_close.SF_BOTH and "sf0.1" in round_close.SF_BOTH
    p = steps["scale_probe"]["argv"]
    # [python, .../scale_probe.py, out_json] — extra args would subset
    # PROBE_QUERIES
    assert len(p) == 3 and p[2].startswith("VERIFY_LOCAL_sf1_")
    # and pytest runs the whole tests/ tree, unfiltered
    t = steps["pytest"]["argv"]
    assert t[-2:] == [os.path.join(round_close.ROOT, "tests"), "-q"]
