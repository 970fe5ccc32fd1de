"""End-to-end pipeline: mint tasks -> execute cascade -> verify tables.

The golden test of SURVEY §5.2-5.3: materialized tier tables written by
the executor equal direct aggregation from raw, and re-running the whole
board is a no-op (idempotent overwrite)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.runner.board import LEVELS
from tg_reporting_etl_spark.runner.executor import (
    LeaderboardFamily,
    NewRegisterFamily,
    PlayerSummaryFamily,
    RiskCtrlGameFamily,
    RiskCtrlPlayerFamily,
    RiskCtrlRtpFamily,
    TransSummaryFamily,
    execute_board,
)
from tg_reporting_etl_spark.runner.timeslice import expand_timeslices

G0, L0 = "2024-01-02 00:00:00", "2024-01-04 00:00:00"
NOW = "2024-02-01 00:00:00"


@pytest.fixture(scope="module")
def executed(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tables"))
    meta = spark.createDataFrame(
        [
            (G0, L0, "ALL", "ALL", "ALL", "trans_summary", f"trans_summary_{s}", f, LEVELS[f])
            for f, s in (("5min", "5min"), ("1H", "1h"), ("1D", "1d"))
        ],
        "gte_time string, lt_time string, platform string, site_code string, game_code string, "
        "report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    board = expand_timeslices(meta).withColumn("done", F.lit(0))
    family = TransSummaryFamily(td.player_value_log(spark, sf_dir), out)
    records = execute_board(spark, board, family, NOW)
    return {"family": family, "records": records, "board": board}


def test_all_closed_tasks_done(executed):
    assert executed["records"]
    assert all(r["done"] == 1 for r in executed["records"])
    assert all(r["runtime_second"] > 0 for r in executed["records"])


def test_materialized_1d_equals_direct(executed, spark, sf_dir):
    """Cascade through materialized parquet == one-shot day aggregation."""
    got = (
        executed["family"]
        .read_tier(spark, "1d")
        .groupBy("summary_date")
        .agg(
            F.round(F.sum("trans_in_amount"), 4).alias("in_amt"),
            F.sum("trans_in_count").alias("in_cnt"),
        )
    )
    pvl = td.player_value_log(spark, sf_dir)
    want = (
        pvl.filter(
            (pvl.trade_status == "SUCCESS") & (pvl.trade_time >= G0) & (pvl.trade_time < L0)
        )
        .groupBy((F.year("trade_time") * 10000 + F.month("trade_time") * 100 + F.dayofmonth("trade_time")).alias("summary_date"))
        .agg(
            F.round(F.sum(F.when(F.col("trade_type") == "IN", F.col("value")).otherwise(0.0)), 4).alias("in_amt"),
            F.sum(F.when(F.col("trade_type") == "IN", 1).otherwise(0)).alias("in_cnt"),
        )
    )
    g = {r.summary_date: (r.in_amt, r.in_cnt) for r in got.collect()}
    w = {r.summary_date: (r.in_amt, r.in_cnt) for r in want.collect()}
    assert g == w and len(g) == 2  # two full days


def test_rerun_is_idempotent(executed, spark):
    family = executed["family"]
    before = {t: family.read_tier(spark, t).count() for t in ("5min", "1h", "1d")}
    execute_board(spark, executed["board"], family, NOW)
    after = {t: family.read_tier(spark, t).count() for t in ("5min", "1h", "1d")}
    assert before == after


# the profit log (player family + downstream risk/register/ranking)
# spans 1995-2001; the wallet log spans 2024-01 — see TESTDATA.md
PG0, PL0 = "1996-06-14 00:00:00", "1996-06-16 00:00:00"


@pytest.fixture(scope="module")
def executed_all(spark, sf_dir, tmp_path_factory):
    """One board run across every report family the reference executes."""
    out = str(tmp_path_factory.mktemp("all_tables"))
    rows = [
        (G0, L0, "trans_summary", f, s)
        for f, s in (("5min", "5min"), ("1H", "1h"), ("1D", "1d"))
    ]
    rows += [
        (PG0, PL0, "player_summary", f, s)
        for f, s in (("5min", "5min"), ("1H", "1h"), ("1D", "1d"))
    ]
    rows += [
        (PG0, PL0, "new_register_summary", "1D", "1d"),
        (PG0, PL0, "risk_ctrl_player", "1D", "1d"),
        (PG0, PL0, "risk_ctrl_game", "1D", "1d"),
        (PG0, PL0, "risk_ctrl_rtp", "1D", "1d"),
        (PG0, PL0, "player_ranking", "1D", "1d"),
    ]
    meta = spark.createDataFrame(
        [
            (g, l, "ALL", "ALL", "ALL", rc_, f"{rc_}_{s}", f, LEVELS[f])
            for g, l, rc_, f, s in rows
        ],
        "gte_time string, lt_time string, platform string, site_code string, game_code string, "
        "report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    board = expand_timeslices(meta).withColumn("done", F.lit(0))

    trans = TransSummaryFamily(td.player_value_log(spark, sf_dir), out)
    player = PlayerSummaryFamily(
        td.player_profit_log(spark, sf_dir), td.game_sites(spark, sf_dir), out
    )
    families = [
        trans,
        player,
        NewRegisterFamily(player, td.player(spark, sf_dir), out),
        RiskCtrlPlayerFamily(player, trans, out),
        RiskCtrlGameFamily(player, out),
        RiskCtrlRtpFamily(player, out),
        LeaderboardFamily(td.player(spark, sf_dir), td.player_daily_ranking(spark, sf_dir), out),
    ]
    records = execute_board(spark, board, families, NOW)
    return {"families": families, "records": records, "board": board}


def test_all_families_materialize(executed_all, spark):
    recs = executed_all["records"]
    assert {r["report_class"] for r in recs} == {
        "trans_summary",
        "player_summary",
        "new_register_summary",
        "risk_ctrl_player",
        "risk_ctrl_game",
        "risk_ctrl_rtp",
        "player_ranking",
    }
    assert all(r["done"] == 1 for r in recs)
    written = {}
    for r in recs:
        key = (r["report_class"], r["freq_type"])
        written[key] = max(written.get(key, 0), r["rows_written"])
    for (rclass, freq), n in written.items():
        fam = next(f for f in executed_all["families"] if f.report_class == rclass)
        tier = {"5min": "5min", "1H": "1h", "1D": "1d", "1M": "1m"}[freq]
        if n:
            assert fam.read_tier(spark, tier).count() == n, (rclass, tier)
    # every family except new_register (no reg-day/activity overlap at
    # sf0.001 — it has rows at sf0.01, see CORRECTNESS new_register row)
    # must have produced data
    assert all(
        n > 0 for (rclass, _), n in written.items() if rclass != "new_register_summary"
    ), written


def test_cascade_equals_direct_per_family(executed_all, spark, sf_dir):
    """Materialized cascade == direct one-shot aggregation, per family.

    The reference computes every family off materialized upstream tables;
    this is the golden equivalence for the whole dependency graph."""
    from tg_reporting_etl_spark.operators import new_register as nr
    from tg_reporting_etl_spark.operators import player_summary as ps
    from tg_reporting_etl_spark.operators import risk_ctrl as rc

    fams = {f.report_class: f for f in executed_all["families"]}

    p5 = ps.player_summary_5min(
        td.player_profit_log(spark, sf_dir), td.game_sites(spark, sf_dir), PG0, PL0
    ).cache()
    p1h = ps.player_summary_1h(p5).cache()
    p1d = ps.player_summary_1d(p1h).cache()
    t1h = fams["trans_summary"].read_tier(spark, "1h")
    t1d = fams["trans_summary"].read_tier(spark, "1d")

    def same(got, want):
        assert got.count() == want.count()
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    same(fams["player_summary"].read_tier(spark, "1d"), p1d)
    # new_register is empty at sf0.001 (no reg-day activity overlap);
    # the direct computation must agree it is empty
    nr_direct = nr.new_register_summary_1d(p5, td.player(spark, sf_dir))
    nr_rec = [
        r for r in executed_all["records"] if r["report_class"] == "new_register_summary"
    ]
    assert nr_rec and nr_rec[0]["rows_written"] == nr_direct.count()
    if nr_rec[0]["rows_written"]:
        same(fams["new_register_summary"].read_tier(spark, "1d"), nr_direct)
    same(
        fams["risk_ctrl_player"].read_tier(spark, "1d").filter(F.col("summary_date") == 19960615),
        rc.risk_ctrl_player_1d(p1h, p1d, t1h, t1d, 19960615, 19960607),
    )
    same(
        fams["risk_ctrl_game"].read_tier(spark, "1d").filter(F.col("summary_date") == 19960615),
        rc.risk_ctrl_game_1d(p1h, p1d, 19960615, 19960607),
    )
    for df in (p5, p1h, p1d):
        df.unpersist()


def test_rerun_all_families_is_noop(executed_all, spark):
    import os

    counts = lambda: {  # noqa: E731
        (f.report_class, t): f.read_tier(spark, t).count()
        for f in executed_all["families"]
        for t in f.tiers
        if t != "1m" and os.path.exists(f.table_path(t))
    }
    before = counts()
    execute_board(spark, executed_all["board"], executed_all["families"], NOW)
    assert before == counts()


def test_rtp_state_carries_across_board_runs(spark, tmp_path):
    """rtp dispatched off the board keeps alert state between runs.

    Reference: the same risk_ctrl task list drives rtp each cron tick
    and the report reads back its own snapshot (risk_ctrl_rtp_1d.py:
    122-194): run 1 initializes (no throttle), run 2 alerts risky rows,
    run 3 inside the 1-minute throttle window mutes them."""
    import datetime as dt

    out = str(tmp_path / "tables")
    day, nxt = "1996-06-14 00:00:00", "1996-06-15 00:00:00"
    # synthetic player 1h tier: one clearly risky player (profit >=
    # profit_unconditional), one quiet player
    p1h = spark.createDataFrame(
        [
            ("P1", "S1", "whale", "G1", "TW", 19960614, 100.0, 60_000.0),
            ("P1", "S1", "minnow", "G1", "TW", 19960614, 100.0, 1.0),
        ],
        "platform string, site_code string, player_name string, game_code string, "
        "country string, summary_date int, b_amount double, profit_amount double",
    )
    player = PlayerSummaryFamily(None, None, out)
    p1h.write.parquet(player.table_path("1h"))

    meta = spark.createDataFrame(
        [(day, nxt, "ALL", "ALL", "ALL", "risk_ctrl_rtp", "risk_ctrl_rtp_1d", "1D", LEVELS["1D"])],
        "gte_time string, lt_time string, platform string, site_code string, game_code string, "
        "report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    board = expand_timeslices(meta).withColumn("done", F.lit(0))

    clocks = [
        dt.datetime(1996, 6, 14, 10, 0, 0),
        dt.datetime(1996, 6, 14, 11, 0, 0),
        dt.datetime(1996, 6, 14, 11, 0, 30),  # 30s later: inside throttle
    ]
    fam = RiskCtrlRtpFamily(player, out, clock=lambda: clocks[0])

    def snap():
        return {
            r.player_name: r
            for r in fam.read_tier(spark, "1d").collect()
        }

    execute_board(spark, board, fam, NOW)
    s1 = snap()
    assert s1["whale"].is_risky == 1 and s1["whale"].alert_count == 0  # init run
    assert s1["minnow"].is_risky == 0

    fam.clock = lambda: clocks[1]
    execute_board(spark, board, fam, NOW)
    s2 = snap()
    assert s2["whale"].send_alert == 1 and s2["whale"].alert_count == 1
    assert s2["whale"].last_alert_time == clocks[1]
    assert s2["whale"].create_time == s1["whale"].create_time  # state carried
    assert s2["minnow"].alert_count == 0

    fam.clock = lambda: clocks[2]
    execute_board(spark, board, fam, NOW)
    s3 = snap()
    # throttled: still risky but muted, count/stamp unchanged
    assert s3["whale"].is_risky == 1 and s3["whale"].send_alert == 0
    assert s3["whale"].alert_count == 1 and s3["whale"].last_alert_time == clocks[1]


def test_intraday_incremental_preserves_earlier_windows(spark, sf_dir, tmp_path):
    """Steady-state case: two half-day runs == one full-day run.

    The 5min tier is partitioned at (summary_date, hours, mins), so the
    afternoon run's dynamic overwrite must NOT wipe the morning windows;
    and the 1h rollup's date bound must include the run day even when
    lt has a time-of-day component (lt-1s, inclusive)."""
    out = str(tmp_path / "tables")
    family = TransSummaryFamily(td.player_value_log(spark, sf_dir), out)
    day, noon, nxt = "2024-01-02 00:00:00", "2024-01-02 12:00:00", "2024-01-03 00:00:00"

    family.run_tier(spark, "5min", day, noon)
    morning = family.read_tier(spark, "5min").count()
    assert morning > 0
    n_1h_am = family.run_tier(spark, "1h", day, noon)
    assert n_1h_am > 0  # old exclusive bound made this 0 rows

    family.run_tier(spark, "5min", noon, nxt)
    family.run_tier(spark, "1h", noon, nxt)
    assert family.read_tier(spark, "5min").count() > morning  # morning survived

    # equivalence against a one-shot full-day run
    out2 = str(tmp_path / "tables_fullday")
    full = TransSummaryFamily(td.player_value_log(spark, sf_dir), out2)
    full.run_tier(spark, "5min", day, nxt)
    full.run_tier(spark, "1h", day, nxt)
    for tier in ("5min", "1h"):
        a = family.read_tier(spark, tier)
        b = full.read_tier(spark, tier)
        assert a.count() == b.count()
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


# ----------------------------------------------------- month boundary


@pytest.fixture(scope="module")
def executed_month(spark, sf_dir, tmp_path_factory):
    """All seven families driven over windows that SPAN a month
    boundary, with a mid-month 1M gte so the month normalization
    (months whose month-END falls in [gte, lt-1day]; gte -> its month
    start; reference task-producer/utils/TaskUtils.py:72-89) is what
    produces the executed windows."""
    out = str(tmp_path_factory.mktemp("month_tables"))
    # player-side: June/July 1996 both carry profit-log data
    PM_G, PM_L = "1996-06-01 00:00:00", "1996-08-01 00:00:00"
    # trans-side: wallet data lives in 2024-01 only; December is empty
    TM_G, TM_L = "2023-12-01 00:00:00", "2024-02-01 00:00:00"
    # 1d-only families: a short range straddling the player boundary
    RD_G, RD_L = "1996-06-28 00:00:00", "1996-07-03 00:00:00"

    rows = [
        (TM_G, TM_L, "trans_summary", f, s)
        for f, s in (("5min", "5min"), ("1H", "1h"), ("1D", "1d"))
    ] + [("2023-12-15 00:00:00", "2024-02-01 00:00:00", "trans_summary", "1M", "1m")]
    rows += [
        (PM_G, PM_L, "player_summary", f, s)
        for f, s in (("5min", "5min"), ("1H", "1h"), ("1D", "1d"))
    ] + [("1996-06-15 00:00:00", "1996-08-01 00:00:00", "player_summary", "1M", "1m")]
    rows += [
        (RD_G, RD_L, "new_register_summary", "1D", "1d"),
        (RD_G, RD_L, "risk_ctrl_player", "1D", "1d"),
        (RD_G, RD_L, "risk_ctrl_game", "1D", "1d"),
        (RD_G, RD_L, "risk_ctrl_rtp", "1D", "1d"),
        (RD_G, RD_L, "player_ranking", "1D", "1d"),
    ]
    meta = spark.createDataFrame(
        [
            (g, l, "ALL", "ALL", "ALL", rc_, f"{rc_}_{s}", f, LEVELS[f])
            for g, l, rc_, f, s in rows
        ],
        "gte_time string, lt_time string, platform string, site_code string, game_code string, "
        "report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    board = expand_timeslices(meta).withColumn("done", F.lit(0))

    trans = TransSummaryFamily(td.player_value_log(spark, sf_dir), out)
    player = PlayerSummaryFamily(
        td.player_profit_log(spark, sf_dir), td.game_sites(spark, sf_dir), out
    )
    families = [
        trans,
        player,
        NewRegisterFamily(player, td.player(spark, sf_dir), out),
        RiskCtrlPlayerFamily(player, trans, out),
        RiskCtrlGameFamily(player, out),
        RiskCtrlRtpFamily(player, out),
        LeaderboardFamily(td.player(spark, sf_dir), td.player_daily_ranking(spark, sf_dir), out),
    ]
    records = execute_board(spark, board, families, NOW)
    return {"families": families, "records": records, "board": board}


def test_month_windows_split_at_boundary(executed_month, spark):
    """Mid-month 1M bounds normalize to whole calendar-month windows."""
    import datetime as dt

    b = executed_month["board"]
    months = {
        rc_: sorted(
            (r.gte_time, r.lt_time)
            for r in b.filter(F.col("freq_type") == "1M").filter(
                F.col("report_class") == rc_
            ).collect()
        )
        for rc_ in ("trans_summary", "player_summary")
    }
    assert months["player_summary"] == [
        (dt.datetime(1996, 6, 1), dt.datetime(1996, 7, 1)),
        (dt.datetime(1996, 7, 1), dt.datetime(1996, 8, 1)),
    ]
    assert months["trans_summary"] == [
        (dt.datetime(2023, 12, 1), dt.datetime(2024, 1, 1)),
        (dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)),
    ]
    assert all(r["done"] == 1 for r in executed_month["records"])


def _same(got, want, round_doubles: int | None = None):
    if round_doubles is not None:
        # double sums accumulate in different orders between the
        # materialized cascade and the in-memory direct plan
        def rnd(df):
            for c, t in df.dtypes:
                if t == "double":
                    df = df.withColumn(c, F.round(F.col(c), round_doubles))
            return df

        got, want = rnd(got), rnd(want)
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_month_tier_equals_direct_aggregation(executed_month, spark, sf_dir):
    """The materialized 1m tier (rolled up through the cascade across
    the month boundary) equals direct one-shot aggregation from raw for
    BOTH months — the least-exercised date path in the engine."""
    from tg_reporting_etl_spark.operators import player_summary as ps
    from tg_reporting_etl_spark.operators import trans_summary as ts

    fams = {f.report_class: f for f in executed_month["families"]}

    p5 = ps.player_summary_5min(
        td.player_profit_log(spark, sf_dir),
        td.game_sites(spark, sf_dir),
        "1996-06-01 00:00:00",
        "1996-08-01 00:00:00",
    )
    want_p1m = ps.player_summary_1m(ps.player_summary_1d(ps.player_summary_1h(p5)))
    got_p1m = fams["player_summary"].read_tier(spark, "1m")
    _same(got_p1m, want_p1m, round_doubles=4)
    # both months actually materialized
    assert {
        r.summary_month for r in got_p1m.select("summary_month").distinct().collect()
    } == {199606, 199607}

    t5 = ts.trans_summary_5min(
        td.player_value_log(spark, sf_dir),
        "2023-12-01 00:00:00",
        "2024-02-01 00:00:00",
    )
    want_t1m = ts.trans_summary_1m(ts.trans_summary_1d(ts.trans_summary_1h(t5)))
    got_t1m = fams["trans_summary"].read_tier(spark, "1m")
    _same(got_t1m, want_t1m, round_doubles=4)
    # December is empty in the wallet log; the 1m tier must agree
    assert {
        r.summary_month for r in got_t1m.select("summary_month").distinct().collect()
    } == {202401}


def test_month_boundary_risk_days_equal_direct(executed_month, spark, sf_dir):
    """risk_ctrl 1d rows on each side of the boundary equal the direct
    single-day operator (the 8-day lookback reaches back across it)."""
    from tg_reporting_etl_spark.operators import player_summary as ps
    from tg_reporting_etl_spark.operators import risk_ctrl as rc

    fams = {f.report_class: f for f in executed_month["families"]}
    p1h = fams["player_summary"].read_tier(spark, "1h")
    p1d = fams["player_summary"].read_tier(spark, "1d")
    t1h = fams["trans_summary"].read_tier(spark, "1h")
    t1d = fams["trans_summary"].read_tier(spark, "1d")

    for dk, lb in ((19960630, 19960622), (19960701, 19960623), (19960702, 19960624)):
        _same(
            fams["risk_ctrl_player"].read_tier(spark, "1d").filter(
                F.col("summary_date") == dk
            ),
            rc.risk_ctrl_player_1d(p1h, p1d, t1h, t1d, dk, lb),
        )
        _same(
            fams["risk_ctrl_game"].read_tier(spark, "1d").filter(
                F.col("summary_date") == dk
            ),
            rc.risk_ctrl_game_1d(p1h, p1d, dk, lb),
        )
