"""Round-11 task: the coverage guard is a TEST, not a round-end script
someone has to remember.

Red when a catalog query appears in NO harness artifact (driver
CORRECTNESS sample ∪ latest committed VERIFY_LOCAL) — i.e. when a new
query ships without `tools/verify_local.py` having been re-run to
re-certify the full catalog.  The fix for a red run is always the same:

    VERIFY_LOCAL_JSON=VERIFY_LOCAL_r<N>.json \
        python tools/verify_local.py /root/testdata/sf0.01,/root/testdata/sf0.1
"""


def test_every_catalog_query_is_harness_checked(capsys):
    from tools import coverage_guard

    rc = coverage_guard.main(argv=[])  # explicit: pytest's own argv must not leak in
    out = capsys.readouterr().out
    assert rc == 0, f"coverage guard failed:\n{out}"
