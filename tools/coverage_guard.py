"""Driver-sample drift guard (round-10 task 8).

The driver's per-round CORRECTNESS_rN.json samples ~50 of the catalog's
queries; tools/verify_local.py covers the rest in the committed
VERIFY_LOCAL_rN.json.  This guard asserts the UNION covers every
registered query, so a round can never ship a catalog row no harness
checked.  Run it at round end, after the verify artifact is written:

    python tools/coverage_guard.py            # uses latest artifacts
    python tools/coverage_guard.py r10        # pin a round suffix

Exit 0 = full coverage; exit 1 prints the unchecked names.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _latest(pattern: str) -> str | None:
    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    hits = sorted(glob.glob(os.path.join(ROOT, pattern)), key=round_no)
    return hits[-1] if hits else None


def _names(path: str | None) -> set[str]:
    if path is None or not os.path.exists(path):
        return set()
    with open(path) as fh:
        d = json.load(fh)
    if "sfs" in d:  # VERIFY_LOCAL shape: {"sfs": {sf_dir: {"queries": {...}}}}
        out: set[str] = set()
        for sf in d["sfs"].values():
            out |= set(sf.get("queries", {}))
        return out
    qs = d.get("queries", d)  # driver artifact is flat; probe nests under "queries"
    return set(qs) if isinstance(qs, dict) else set()


def main(argv: list[str] | None = None) -> int:
    args = sys.argv[1:] if argv is None else argv
    suffix = args[0] if args else None
    corr = (
        os.path.join(ROOT, f"CORRECTNESS_{suffix}.json")
        if suffix
        else _latest("CORRECTNESS_r*.json")
    )
    ver = (
        os.path.join(ROOT, f"VERIFY_LOCAL_{suffix}.json")
        if suffix
        else _latest("VERIFY_LOCAL_r*.json")
    )
    checked = _names(corr) | _names(ver)

    import __spark_entry__ as em

    registered = set(em.queries())
    unchecked = sorted(registered - checked)
    print(
        f"catalog={len(registered)} driver_sample={len(_names(corr))} "
        f"verify_artifact={len(_names(ver))} union={len(checked & registered)}"
    )
    if unchecked:
        print("UNCHECKED (in no harness artifact):")
        for n in unchecked:
            print(f"  {n}")
        return 1
    print("full coverage: every catalog query appears in driver sample | verify artifact")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
