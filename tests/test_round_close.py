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
    assert runner.calls == ["bench", "verify_local", "scale_probe", "coverage_guard"]


def test_red_step_fails_close_but_still_runs_remaining_steps(tmp_path, monkeypatch):
    tag = "r99"
    monkeypatch.setattr(round_close, "ROOT", str(tmp_path))
    effects = {s["name"]: (0, s["artifacts"]) for s in round_close.steps_for(tag)}
    effects["verify_local"] = (1, effects["verify_local"][1])
    runner = _stub_runner(effects)
    assert round_close.main([tag], runner=runner) == 1
    # fail-open: the probe and guard still ran so the report is complete
    assert runner.calls == ["bench", "verify_local", "scale_probe", "coverage_guard"]


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
