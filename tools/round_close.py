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
artifact exists with an mtime newer than the tool's start (a stale
artifact from a previous round cannot masquerade as this round's
receipt).  There are no skip flags by design; if a step is genuinely
impossible in some environment, that environment cannot close a round.

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
        {
            "name": "coverage_guard",
            "argv": [sys.executable, os.path.join(ROOT, "tools", "coverage_guard.py"), round_tag],
            "env": {},
            "artifacts": [],
        },
    ]


def check_artifacts(paths: list[str], not_before: float) -> list[str]:
    """Names of artifacts that are missing or staler than ``not_before``."""
    bad = []
    for rel in paths:
        p = os.path.join(ROOT, rel)
        if not os.path.exists(p):
            bad.append(f"{rel}: missing")
        elif os.path.getmtime(p) < not_before:
            bad.append(f"{rel}: stale (predates this close run)")
    return bad


def main(argv: list[str] | None = None, runner=subprocess.run) -> int:
    args = sys.argv[1:] if argv is None else argv
    if len(args) != 1 or not re.fullmatch(r"r\d+", args[0]):
        print("usage: python tools/round_close.py r<N>   (e.g. r13)")
        return 2
    round_tag = args[0]
    t_start = time.time()
    failures: list[str] = []
    for step in steps_for(round_tag):
        env = {**os.environ, **step["env"]}
        t0 = time.time()
        print(f"== {step['name']}: {' '.join(step['argv'])}" + (f"  (env {step['env']})" if step["env"] else ""))
        proc = runner(step["argv"], env=env, cwd=ROOT)
        dt = time.time() - t0
        rc = proc.returncode
        print(f"== {step['name']}: rc={rc} in {dt:.0f}s")
        if rc != 0:
            failures.append(f"{step['name']}: exit {rc}")
            # keep going: a later artifact may still be produced, and
            # the full failure list beats fail-fast for a close report
        failures.extend(
            f"{step['name']}: {why}" for why in check_artifacts(step["artifacts"], t_start)
        )
    if failures:
        print("\nROUND CLOSE FAILED:")
        for f in failures:
            print(f"  {f}")
        return 1
    print(f"\nround {round_tag} close: all steps green, artifacts fresh — commit them")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
