"""The ONLY sanctioned way to end a round (round-12 verdict, task 3).

Round 12 shipped judge-verified-correct code with a red coverage guard
because the end-of-round verify was a checklist item someone had to
remember.  This tool makes the close sequence un-skippable: it runs

    1. bench.py                         -> BENCH_FULL.json (+ JSON line)
    2. tools/verify_local.py            -> VERIFY_LOCAL_r{N}.json
       (sf0.01 AND sf0.1, full catalog)
    3. tools/scale_probe.py             -> VERIFY_LOCAL_sf1_r{N}.json
    4. tools/coverage_guard.py r{N}     -> full-catalog coverage check

and refuses to exit 0 unless every step succeeded AND every expected
artifact exists with an mtime newer than the step's start (a stale
artifact from a previous round cannot masquerade as this round's
receipt).  A green close additionally stamps the round-over-round
like-for-like ratio into BENCH_FULL.json (``vs_prev_round``) and
snapshots it as BENCH_FULL_r{N}.json — the base for the next round.  There are no skip flags by design; if a step is genuinely
impossible in some environment, that environment cannot close a round.

Re-entry is idempotent (round-13 verdict, task 4): a close killed by
the time-box can be re-run and will redo ONLY the steps that never
completed — provided the source tree is byte-identical to what the
completed steps ran against (see ``main``).  That is not a skip flag:
nothing the operator types can suppress a step; only a matching
completion receipt can.

Usage: python tools/round_close.py r13
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_BOTH = "/root/testdata/sf0.01,/root/testdata/sf0.1"


def steps_for(round_tag: str) -> list[dict]:
    """The close sequence as data: (name, argv, env-extra, artifacts).

    Artifacts are repo-root-relative paths that must exist and be FRESH
    (mtime >= tool start) after the step runs.
    """
    ver = f"VERIFY_LOCAL_{round_tag}.json"
    sf1 = f"VERIFY_LOCAL_sf1_{round_tag}.json"
    return [
        {
            "name": "bench",
            "argv": [sys.executable, os.path.join(ROOT, "bench.py")],
            "env": {},
            "artifacts": ["BENCH_FULL.json"],
        },
        {
            "name": "verify_local",
            "argv": [sys.executable, os.path.join(ROOT, "tools", "verify_local.py"), SF_BOTH],
            "env": {"VERIFY_LOCAL_JSON": ver},
            "artifacts": [ver],
        },
        {
            "name": "scale_probe",
            "argv": [sys.executable, os.path.join(ROOT, "tools", "scale_probe.py"), sf1],
            "env": {},
            "artifacts": [sf1],
        },
        # the suite runs AFTER verify: tests/test_coverage_guard.py needs
        # this round's verify artifact to exist, and rounds 12-13 both
        # ended red precisely because the suite was a separate checklist
        # item — a round whose tests fail cannot close
        {
            "name": "pytest",
            "argv": [sys.executable, "-m", "pytest", os.path.join(ROOT, "tests"), "-q"],
            "env": {},
            "artifacts": [],
        },
        {
            "name": "coverage_guard",
            "argv": [sys.executable, os.path.join(ROOT, "tools", "coverage_guard.py"), round_tag],
            "env": {},
            "artifacts": [],
        },
    ]


# Filesystems with 1-second mtime granularity can truncate an artifact
# written in the same second the tool starts to just below t_start; a
# 2 s epsilon absorbs that without admitting genuinely stale files.
MTIME_EPSILON = 2.0

# Paths whose content defines "the code under close".  Artifacts at the
# repo root (*.json receipts) and the driver-owned PROGRESS.jsonl are
# deliberately OUTSIDE this set: re-entering after a close wrote its
# own receipts must not look like a source change.
SOURCE_PATHS = [
    "tg_reporting_etl_spark",
    "tools",
    "tests",
    "bench.py",
    "__spark_entry__.py",
]


def check_artifacts(paths: list[str], not_before: float) -> list[str]:
    """Names of artifacts that are missing or staler than ``not_before``.

    ``not_before`` is compared with a small epsilon (MTIME_EPSILON) so
    1 s-granularity filesystems can't falsely flag an artifact written
    in the same second the run started.
    """
    bad = []
    for rel in paths:
        p = os.path.join(ROOT, rel)
        if not os.path.exists(p):
            bad.append(f"{rel}: missing")
        elif os.path.getmtime(p) < not_before - MTIME_EPSILON:
            bad.append(f"{rel}: stale (predates this close run)")
    return bad


def _artifact_mtimes(paths: list[str]) -> dict[str, list[float]]:
    """Current [mtime, size] of each artifact that exists
    (repo-root-relative).  Size rides along (r17 ADVICE item 2): on a
    1 s-granularity filesystem an overwrite landing in the same second
    as the step's own write — or any mtime-preserving overwrite —
    passes an mtime-only identity check; mtime AND size must both
    match for the step to resume."""
    out: dict[str, list[float]] = {}
    for rel in paths:
        try:
            st = os.stat(os.path.join(ROOT, rel))
            out[rel] = [st.st_mtime, float(st.st_size)]
        except OSError:
            pass
    return out


def _artifacts_unmodified(paths: list[str], recorded) -> bool:
    """True only when ``recorded`` — the [mtime, size] map captured at
    the step's completion — covers every artifact and each file's
    mtime AND size are byte-for-byte what the step left behind.

    This closes the r16 ADVICE hazard the freshness floor alone cannot:
    ``check_artifacts`` accepts any mtime NEWER than the step's start,
    so a standalone bench run that overwrote BENCH_FULL.json between a
    died close and its re-entry would let the bench step resume and the
    stamp then certify the standalone run's numbers as the round's
    close receipt.  Requiring mtime+size IDENTITY (not mere freshness)
    makes any post-step overwrite re-run the step.  Records without the
    map, with a pre-r18 mtime-only record, or with a missing file fail
    toward re-running.
    """
    if not isinstance(recorded, dict):
        return False
    for rel in paths:
        try:
            st = os.stat(os.path.join(ROOT, rel))
        except OSError:
            return False
        prev = recorded.get(rel)
        if not (isinstance(prev, (list, tuple)) and len(prev) == 2):
            return False
        pm, ps = prev
        if not isinstance(pm, (int, float)) or not isinstance(ps, (int, float)):
            return False
        if abs(st.st_mtime - float(pm)) > 1e-6 or st.st_size != int(ps):
            return False
    return True


def tree_hash() -> str:
    """Fingerprint of the SOURCE tree (HEAD + dirty diff + untracked).

    Resume is only safe while the code under close is byte-identical to
    the code a completed step actually ran, so the hash covers the
    committed HEAD, the working-tree diff over SOURCE_PATHS, and the
    path/size/mtime of untracked source files.  Any git failure returns
    a unique token, which simply disables resume for this invocation —
    fail toward re-running, never toward skipping.
    """
    import hashlib

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True, check=True
        ).stdout.strip()
        diff = subprocess.run(
            ["git", "diff", "HEAD", "--", *SOURCE_PATHS],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
        untracked = subprocess.run(
            ["git", "ls-files", "--others", "--exclude-standard", "--", *SOURCE_PATHS],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.splitlines()
    except (subprocess.SubprocessError, OSError):
        return f"no-resume-{time.time()}"
    h = hashlib.sha256()
    h.update(head.encode())
    h.update(diff.encode())
    for rel in sorted(untracked):
        p = os.path.join(ROOT, rel)
        try:
            st = os.stat(p)
            h.update(f"{rel}:{st.st_size}:{st.st_mtime}".encode())
        except OSError:
            h.update(f"{rel}:gone".encode())
    return h.hexdigest()


def git_identity() -> dict:
    """{"head": <commit sha or None>, "dirty": <bool or None>} — the git
    identity the close receipts bind to (r17 verdict task 1).

    ``dirty`` covers SOURCE_PATHS only (like ``tree_hash``): the close
    itself rewrites root-level receipt artifacts and the driver appends
    to PROGRESS.jsonl, and neither changes the code under close.  Any
    git failure returns {None, None}, which disables resume (the
    receipt cannot be bound to an identity) but never blocks a run —
    fail toward re-running, never toward skipping.
    """
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True, check=True
        ).stdout.strip()
        diff = subprocess.run(
            ["git", "status", "--porcelain", "--", *SOURCE_PATHS],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except (subprocess.SubprocessError, OSError):
        return {"head": None, "dirty": None}
    return {"head": head or None, "dirty": bool(diff.strip())}


def _stamp_like_for_like(round_tag: str, git_ident: dict | None = None) -> list[str]:
    """Write the round-over-round like-for-like ratio INTO the bench
    receipt (round-14 verdict, task 6): the judge was computing "r(N)
    vs r(N-1) over common queries" by hand from two artifacts; now a
    green close records it in BENCH_FULL.json under ``vs_prev_round``
    and snapshots the full per-query report as BENCH_FULL_r{N}.json —
    the committed round-tagged base the NEXT round's close compares
    against (the driver's BENCH_r{N}.json truncates to the 5 slowest
    queries, so it cannot serve as the base).

    Returns failure strings instead of swallowing them (r15 residual
    2): a close that cannot read the bench receipt or cannot write the
    stamp/snapshot must NOT print green — the next round's ratio base
    would silently be missing or stale.
    """
    import json

    from bench import calibration_ratio, common_query_totals, latest_close_snapshot

    n = int(round_tag[1:])
    full_path = os.path.join(ROOT, "BENCH_FULL.json")
    try:
        with open(full_path) as fh:
            cur = json.load(fh)
    except (OSError, ValueError) as e:
        return [f"stamp: cannot read BENCH_FULL.json: {e}"]
    best_n, best_path = latest_close_snapshot(ROOT, below=n)
    field: dict = {"prev_round": None, "note": "no prior BENCH_FULL_r*.json snapshot"}
    if best_path:
        try:
            with open(best_path) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = {}
        pq, cq = prev.get("queries") or {}, cur.get("queries") or {}
        n_common, pt, ct, ratio = common_query_totals(pq, cq)
        if prev.get("sf") != cur.get("sf"):
            field = {
                "prev_round": best_n,
                "note": f"sf mismatch (prev {prev.get('sf')} vs cur {cur.get('sf')})",
            }
        elif n_common:
            field = {
                "prev_round": best_n,
                "common_queries": n_common,
                "prev_common_total_s": pt,
                "cur_common_total_s": ct,
                "ratio": ratio,
                "new_queries": sorted(set(cq) - set(pq)),
                "removed_queries": sorted(set(pq) - set(cq)),
            }
            # regime receipt (r15 verdict task 7): the fixed-workload
            # calibration ratio alongside the like-for-like ratio —
            # when both move together the machine moved, not the plans
            cal = calibration_ratio(prev.get("calibration"), cur.get("calibration"))
            if cal is not None:
                field["calibration_ratio"] = cal
            # r17: the I/O twin — absent until both rounds carry it
            cal_io = calibration_ratio(
                prev.get("calibration"), cur.get("calibration"), kind="io"
            )
            if cal_io is not None:
                field["calibration_io_ratio"] = cal_io
        else:
            field = {"prev_round": best_n, "note": "no common queries"}
    cur["vs_prev_round"] = field
    # r19 (verdict task 8): the receipt itself states whether the close
    # bench ran inside a regime excursion — an explicit degraded flag
    # beats an adjudication paragraph re-litigating the watch rows.
    swing = _calibration_inrun_swing(cur.get("calibration"))
    if swing is not None:
        cur["close_regime"] = {
            "inrun_calibration_swing": swing,
            "degraded": swing > REGIME_SWING_MAX,
        }
    # bind the receipt to a git identity (r17 verdict task 1): the
    # judge verifies "receipts certify HEAD" by comparing this field to
    # the end-of-round snapshot commit's parent, instead of arguing
    # from a hand-checked diff
    cur["git"] = git_ident if git_ident is not None else git_identity()
    failures: list[str] = []
    for p in (full_path, os.path.join(ROOT, f"BENCH_FULL_{round_tag}.json")):
        try:
            with open(p, "w") as fh:
                json.dump(cur, fh, indent=1)
                fh.write("\n")
        except OSError as e:
            failures.append(f"stamp: cannot write {os.path.basename(p)}: {e}")
    return failures


def _calibration_inrun_swing(cal: dict | None) -> float | None:
    """max/min of a bench run's OWN calibration pairs (cpu start/end and
    io start/end) — the in-run regime swing.  r19 (verdict task 8): the
    r18 final close benched inside a 2.3x in-run excursion and fired 17
    watch rows the next round had to re-litigate; the close now re-runs
    the bench once when this exceeds 1.5x and flags a persistent swing
    in the stamp.  None when the pairs are absent/unreadable."""
    swings = []
    for a, b in (("start_s", "end_s"), ("io_start_s", "io_end_s")):
        x, y = (cal or {}).get(a), (cal or {}).get(b)
        if isinstance(x, (int, float)) and isinstance(y, (int, float)) and x > 0 and y > 0:
            swings.append(max(x, y) / min(x, y))
    return round(max(swings), 4) if swings else None


def _bench_inrun_swing() -> float | None:
    """In-run calibration swing of the BENCH_FULL.json on disk."""
    import json

    try:
        with open(os.path.join(ROOT, "BENCH_FULL.json")) as fh:
            return _calibration_inrun_swing(json.load(fh).get("calibration"))
    except (OSError, ValueError):
        return None


REGIME_SWING_MAX = 1.5


def _state_path(round_tag: str) -> str:
    return os.path.join(ROOT, f".round_close_{round_tag}.state.json")


def _load_state(round_tag: str) -> dict:
    import json

    try:
        with open(_state_path(round_tag)) as fh:
            st = json.load(fh)
        return st if isinstance(st, dict) else {}
    except (OSError, ValueError):
        return {}


def _save_state(round_tag: str, state: dict) -> None:
    import json

    try:
        with open(_state_path(round_tag), "w") as fh:
            json.dump(state, fh, indent=1, sort_keys=True)
    except OSError:
        pass


def main(
    argv: list[str] | None = None,
    runner=subprocess.run,
    hash_fn=tree_hash,
    ident_fn=git_identity,
) -> int:
    """Run (or idempotently RESUME) the close sequence for ``round_tag``.

    Resume (round-13 verdict, task 4): rounds 12 and 13 both died at
    the time-box with the close unrun, so a killed close must be cheap
    to re-enter.  There are still NO skip flags; instead the tool
    remembers, per round tag, which steps completed (exit 0, artifacts
    fresh) and the exact source tree they ran against.  On re-entry a
    step is skipped only when ALL of: (a) a prior completion record
    exists for this tag, (b) the source tree hash is unchanged since
    that run, and (c) every artifact of the step still exists with an
    mtime no older than that run's start.  Any code change, missing
    artifact, or prior failure re-runs the step.  ``coverage_guard``
    always re-runs — it is seconds-cheap and its verdict depends on the
    artifacts the other steps wrote.
    """
    args = sys.argv[1:] if argv is None else argv
    if len(args) != 1 or not re.fullmatch(r"r\d+", args[0]):
        print("usage: python tools/round_close.py r<N>   (e.g. r13)")
        return 2
    round_tag = args[0]
    t_start = time.time()
    current_hash = hash_fn()
    # Receipt-to-HEAD binding (r17 verdict task 1): every step record and
    # the bench stamp carry the commit id and a source-dirty flag.  A
    # receipt is resumable only when it was produced on a CLEAN tree at
    # the SAME commit the re-entry runs on — a dirty tree (either run)
    # or a commit mismatch re-runs the step, because such a receipt
    # cannot be bound to a git identity.  tree_hash alone already caught
    # content drift; this makes the binding an identity, not an argument.
    current_git = ident_fn()
    clean_identity = bool(current_git.get("head")) and current_git.get("dirty") is False
    if not clean_identity:
        print(
            f"== git identity: head={current_git.get('head')} dirty={current_git.get('dirty')}"
            " — receipts will not be resumable (commit source changes first)"
        )
    state = _load_state(round_tag)
    failures: list[str] = []
    bench_ran = False
    snapshot = os.path.join(ROOT, f"BENCH_FULL_{round_tag}.json")
    for step in steps_for(round_tag):
        rec = state.get(step["name"])
        resumable = step["name"] != "coverage_guard"
        # A record without a positive numeric started_at is non-resumable:
        # defaulting the freshness floor to 0.0 would let ANY pre-existing
        # artifact (however stale) satisfy check_artifacts.
        rec_started = rec.get("started_at") if isinstance(rec, dict) else None
        # mtime IDENTITY (r16 ADVICE 1): the artifacts must be EXACTLY the
        # files the completed step wrote, or the step re-runs — except
        # bench after a fully STAMPED close (round snapshot exists): there
        # a later standalone overwrite of BENCH_FULL.json is harmless,
        # because the stamp below will SKIP and the snapshot stays the
        # round's receipt (the pinned r15 re-entry contract).  Without the
        # snapshot, a freshness-only check would let the stamp certify a
        # standalone run's numbers as the close receipt.
        unmodified = isinstance(rec, dict) and _artifacts_unmodified(
            step["artifacts"], rec.get("artifact_mtimes")
        )
        if step["name"] == "bench" and not unmodified and os.path.exists(snapshot):
            unmodified = True
        if (
            resumable
            and isinstance(rec, dict)
            and rec.get("rc") == 0
            and rec.get("tree_hash") == current_hash
            # identity binding: the record must name the SAME commit this
            # re-entry runs on, and BOTH runs must be source-clean
            and clean_identity
            and rec.get("git_head") == current_git["head"]
            and rec.get("git_dirty") is False
            and isinstance(rec_started, (int, float))
            and rec_started > 0
            and not check_artifacts(step["artifacts"], float(rec_started))
            and unmodified
        ):
            print(f"== {step['name']}: SKIP (completed at {rec.get('finished_at')}, source tree unchanged, artifacts fresh)")
            continue
        env = {**os.environ, **step["env"]}
        bench_ran = bench_ran or step["name"] == "bench"
        t0 = time.time()
        print(f"== {step['name']}: {' '.join(step['argv'])}" + (f"  (env {step['env']})" if step["env"] else ""))
        proc = runner(step["argv"], env=env, cwd=ROOT)
        dt = time.time() - t0
        rc = proc.returncode
        print(f"== {step['name']}: rc={rc} in {dt:.0f}s")
        # r19 (verdict task 8): a close benched inside a regime excursion
        # fires spurious watch rows the next round must re-litigate (r18:
        # 2.3x in-run swing, 17 watch rows).  When the bench's OWN
        # calibration pair moved >1.5x within the run, re-run it ONCE;
        # if the swing persists, _stamp_like_for_like flags the receipt
        # as degraded-regime instead of silently certifying it.
        if step["name"] == "bench" and rc == 0:
            swing = _bench_inrun_swing()
            if swing is not None and swing > REGIME_SWING_MAX:
                print(
                    f"== bench: in-run calibration swing {swing}x > {REGIME_SWING_MAX}x"
                    " — re-running the bench once (degraded regime)"
                )
                t0 = time.time()
                proc = runner(step["argv"], env=env, cwd=ROOT)
                rc = proc.returncode
                print(f"== bench: retry rc={rc} in {time.time() - t0:.0f}s"
                      f" (in-run swing now {_bench_inrun_swing()})")
        if rc != 0:
            failures.append(f"{step['name']}: exit {rc}")
            # keep going: a later artifact may still be produced, and
            # the full failure list beats fail-fast for a close report
        missing = check_artifacts(step["artifacts"], t0)
        failures.extend(f"{step['name']}: {why}" for why in missing)
        if rc == 0 and not missing and resumable:
            state[step["name"]] = {
                "rc": 0,
                "started_at": t0,
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "tree_hash": current_hash,
                # git identity the step ran on (r17 verdict task 1)
                "git_head": current_git["head"],
                "git_dirty": current_git["dirty"],
                # mtime+size identity map: resume requires the artifacts to
                # be EXACTLY the files this step wrote (see _artifacts_unmodified)
                "artifact_mtimes": _artifact_mtimes(step["artifacts"]),
            }
            _save_state(round_tag, state)
    if failures:
        print("\nROUND CLOSE FAILED:")
        for f in failures:
            print(f"  {f}")
        return 1
    # Only a GREEN close gets to define the round's bench receipt and
    # the round-tagged base the next round compares against.  When the
    # BENCH step itself was resumed (not re-run) and the snapshot
    # already exists, do NOT re-stamp: BENCH_FULL.json may since have
    # been overwritten by a standalone bench run, and re-stamping would
    # replace the round-tagged base with a non-close run's numbers
    # (r15 ADVICE item 2).
    if not bench_ran and os.path.exists(snapshot):
        print(f"== stamp: SKIP (bench step resumed, {os.path.basename(snapshot)} already exists)")
    else:
        stamp_failures = _stamp_like_for_like(round_tag, git_ident=current_git)
        if stamp_failures:
            print("\nROUND CLOSE FAILED:")
            for f in stamp_failures:
                print(f"  {f}")
            return 1
    print(f"\nround {round_tag} close: all steps green, artifacts fresh — commit them")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
