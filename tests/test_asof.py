"""AS-OF backward join (functions/asof.py): tie/tolerance/no-match
semantics and the no-join plan shape.  Cross-engine parity runs
through the events_asof_attribution oracle (DuckDB native ASOF)."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

from tg_reporting_etl_spark.functions.asof import asof_join_backward

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(mins):
    return T0 + dt.timedelta(minutes=mins)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(10)), (2, 100, _t(5)), (3, 200, _t(10)), (4, 300, _t(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _t(4), 91.0), (100, _t(10), 92.0), (200, _t(11), 93.0)],
        "user_id long, ts timestamp, px double",
    )
    return left, right


def _run(spark, **kw):
    left, right = _frames(spark)
    return {
        r.event_id: r
        for r in asof_join_backward(left, right, "user_id", right_prefix="q_", **kw).collect()
    }


def test_backward_semantics(spark):
    out = _run(spark)
    # user 100 @10: right rows at 4 and 10 -> equal-ts row wins (inclusive <=)
    assert (out[1].q_px, out[1].q_ts) == (92.0, _t(10))
    # user 100 @5: only the @4 row is at-or-before
    assert (out[2].q_px, out[2].q_ts) == (91.0, _t(4))
    # user 200 @10: the only right row is LATER -> no match
    assert out[3].q_px is None and out[3].q_ts is None
    # user 300: no right rows at all
    assert out[4].q_px is None
    # every left row survives exactly once (left-join cardinality)
    assert len(out) == 4


def test_tolerance_boundary_inclusive(spark):
    got = _run(spark, tolerance_seconds=60)
    assert got[2].q_px == 91.0  # exactly 60s back -> inclusive
    assert got[1].q_px == 92.0  # 0s back
    got59 = _run(spark, tolerance_seconds=59)
    assert got59[2].q_px is None  # 60s > 59 -> suppressed
    assert got59[1].q_px == 92.0


def test_plan_has_no_join(spark):
    """The whole point: one exchange + sort, zero join operators."""
    left, right = _frames(spark)
    df = asof_join_backward(left, right, "user_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # union sides feed ONE window shuffle


def test_asof_random_sweep_vs_python_model(spark):
    """Directed random sweep (repo idiom: seeded cases, one Spark job
    each — not hypothesis, whose adaptive engine multiplies Spark
    jobs): random keys/timestamps incl. collisions, checked against an
    O(n^2) pure-Python reference model."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rights = [
            (rng.randint(1, 4), _t(rng.randint(0, 120)), float(i))
            for i in range(25)
        ]
        # unique (key, ts): keep max val like the catalog query's dedup
        dedup = {}
        for k, ts, v in rights:
            dedup[(k, ts)] = max(dedup.get((k, ts), v), v)
        rights = [(k, ts, v) for (k, ts), v in dedup.items()]
        lefts = [
            (i, rng.randint(1, 4), _t(rng.randint(0, 120))) for i in range(25)
        ]

        def model(key, ts):
            cands = [(rts, v) for k, rts, v in rights if k == key and rts <= ts]
            return max(cands)[1] if cands else None

        left_df = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
        right_df = spark.createDataFrame(rights, "user_id long, ts timestamp, px double")
        got = {
            r.event_id: r.q_px
            for r in asof_join_backward(
                left_df, right_df, "user_id", right_prefix="q_"
            ).collect()
        }
        want = {i: model(k, ts) for i, k, ts in lefts}
        assert got == want, seed


def test_forward_direction(spark):
    out = _run(spark, direction="forward")
    # user 100 @10: rights at 4 and 10 -> equal-ts wins (inclusive)
    assert (out[1].q_px, out[1].q_ts) == (92.0, _t(10))
    # user 100 @5: earliest right at-or-after is @10
    assert (out[2].q_px, out[2].q_ts) == (92.0, _t(10))
    # user 200 @10: the @11 right is ahead -> matches forward
    assert (out[3].q_px, out[3].q_ts) == (93.0, _t(11))
    assert out[4].q_px is None  # no rights at all


def test_forward_tolerance(spark):
    got = _run(spark, direction="forward", tolerance_seconds=60)
    assert got[3].q_px == 93.0  # 60s ahead -> inclusive
    got59 = _run(spark, direction="forward", tolerance_seconds=59)
    assert got59[3].q_px is None
    # backward matches are unaffected by the forward flag
    assert got[2].q_px is None  # nearest forward right is 300s ahead


def test_forward_random_sweep_vs_python_model(spark):
    import random

    for seed in (7, 8):
        rng = random.Random(seed)
        rights = {}
        for i in range(20):
            k, ts = rng.randint(1, 3), _t(rng.randint(0, 90))
            rights[(k, ts)] = max(rights.get((k, ts), float(i)), float(i))
        rights = [(k, ts, v) for (k, ts), v in rights.items()]
        lefts = [(i, rng.randint(1, 3), _t(rng.randint(0, 90))) for i in range(20)]

        def model(key, ts):
            cands = [(rts, v) for k, rts, v in rights if k == key and rts >= ts]
            return min(cands)[1] if cands else None

        got = {
            r.event_id: r.q_px
            for r in asof_join_backward(
                spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp"),
                spark.createDataFrame(rights, "user_id long, ts timestamp, px double"),
                "user_id",
                right_prefix="q_",
                direction="forward",
            ).collect()
        }
        assert got == {i: model(k, ts) for i, k, ts in lefts}, seed
