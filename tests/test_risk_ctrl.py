"""risk_ctrl: floor rules (bug-compatible), sigma semantics, on synthetic frames."""

from __future__ import annotations

import pytest

from tg_reporting_etl_spark.config import RISK_CTRL_1D
from tg_reporting_etl_spark.operators.risk_ctrl import risk_ctrl_player_1d

D, G = 20230110, 20230102


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def result(spark):
    keys = ["platform", "site_code", "player_name", "country"]
    p1h = _mk(
        spark,
        [
            ("UFA", "TG", "p1", "THB", D, 600_000.0, 400_000.0),
            ("UFA", "TG", "p2", "VND2", D, 100.0, -50.0),
        ],
        [*keys, "summary_date", "b_amount", "profit_amount"],
    )
    # trailing days: small values -> every wma/wmasd below floor
    p1d = _mk(
        spark,
        [("UFA", "TG", "p1", "THB", G + i, 1000.0 * (i + 1), 10.0 * i) for i in range(8)],
        [*keys, "summary_date", "b_amount", "profit_amount"],
    )
    t1h = _mk(
        spark,
        [("UFA", "TG", "p1", "THB", D, 500_000.0, 100.0)],
        [*keys, "summary_date", "trans_out_amount", "trans_in_amount"],
    )
    t1d = _mk(
        spark,
        [("UFA", "TG", "p1", "THB", G, 10.0, 5.0)],
        [*keys, "summary_date", "trans_out_amount", "trans_in_amount"],
    )
    out = risk_ctrl_player_1d(p1h, p1d, t1h, t1d, D, G).collect()
    return {r.player_name: r for r in out}


def test_floors_apply_country_rate(result):
    """All trailing stats below default -> sigma denominators are the
    defaults scaled by country_rate; THB rate is 0.05
    (risk_ctrl_player_1d.py:178-202, report_config.py:35-40)."""
    r = result["p1"]
    cfg = RISK_CTRL_1D["default_value_player"]
    rate = RISK_CTRL_1D["country_rate"]["THB"]
    # b_cur=600k >= floored b_wma (5M*0.05=250k) -> sigma=(600k-250k)/250k=1.4
    assert r.b_sigma == pytest.approx(
        (600_000 - cfg["def_b_wma"] * rate) / (cfg["def_b_wmasd"] * rate)
    )
    # output carries the UN-floored wma (raw trailing mean), not the floor
    assert r.b_wma == pytest.approx(sum(1000.0 * (i + 1) for i in range(8)) / 7)


def test_negative_profit_zero_sigma(result):
    """p_cur <= 0 -> p_sigma = 0 regardless of bands
    (risk_ctrl_player_1d.py:210)."""
    r = result["p2"]
    assert r.p_sigma == 0.0
    assert r.p_trans_multi == 0.0  # no transfers for p2 -> net 0 -> 0


def test_p_trans_multi_ratio(result):
    r = result["p1"]
    net = 500_000.0 - 100.0
    assert r.net_trans_cur == pytest.approx(net)
    assert r.p_trans_multi == pytest.approx(net / r.p_cur)


def test_risk_score_weights(result):
    r = result["p1"]
    w = RISK_CTRL_1D["risk_score_multi"]
    assert r.risk_score == pytest.approx(
        r.b_sigma * w["b"] + r.p_sigma * w["wl"] + r.trans_sigma * w["trans"] + r.p_trans_multi * w["p_trans_multi"]
    )


def test_multi_day_equals_per_day_union(spark):
    """risk_ctrl_*_days (one windowed plan for a whole backfill range)
    must reproduce the per-day operator exactly, including days with no
    trailing history (floor regime) and keys that appear on only some
    days."""
    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.operators.risk_ctrl import (
        risk_ctrl_game_1d,
        risk_ctrl_game_days,
        risk_ctrl_player_days,
    )

    keys = ["platform", "site_code", "player_name", "country"]
    gkeys = ["platform", "site_code", "game_code", "country"]
    days = [20230110, 20230111, 20230112]

    p1h_rows = []
    p1d_rows = []
    for i, d in enumerate(days):
        p1h_rows += [
            ("UFA", "TG", "p1", "THB", d, 600_000.0 + i, 400_000.0 - i),
            ("UFA", "TG", f"only{i}", "VND2", d, 50.0 * (i + 1), 5.0),
        ]
    # trailing history: p1 has rich history before day0; only1 none
    p1d_rows += [
        ("UFA", "TG", "p1", "THB", 20230102 + i, 1000.0 * (i + 1), 10.0 * i)
        for i in range(10)
    ]
    p1h = _mk(spark, p1h_rows, [*keys, "summary_date", "b_amount", "profit_amount"])
    p1d = _mk(spark, p1d_rows, [*keys, "summary_date", "b_amount", "profit_amount"])
    t1h = _mk(
        spark,
        [("UFA", "TG", "p1", "THB", d, 500_000.0, 100.0) for d in days],
        [*keys, "summary_date", "trans_out_amount", "trans_in_amount"],
    )
    t1d = _mk(
        spark,
        [("UFA", "TG", "p1", "THB", 20230102 + i, 10.0 * i, 5.0) for i in range(10)],
        [*keys, "summary_date", "trans_out_amount", "trans_in_amount"],
    )

    def key_of(r, kcols):
        return (r.summary_date, *[getattr(r, k) for k in kcols])

    def vals(r, cols):
        return tuple(round(getattr(r, c), 9) if getattr(r, c) is not None else None for c in cols)

    from tg_reporting_etl_spark.operators.risk_ctrl import _lookback_key_of

    vcols = ["b_cur", "p_cur", "rtp_cur", "b_sigma", "p_sigma", "trans_sigma", "risk_score"]
    per_day = {}
    for d in days:
        out = risk_ctrl_player_1d(p1h, p1d, t1h, t1d, d, _lookback_key_of(d)).collect()
        per_day.update({key_of(r, keys): vals(r, vcols) for r in out})
    multi = {
        key_of(r, keys): vals(r, vcols)
        for r in risk_ctrl_player_days(p1h, p1d, t1h, t1d, days).collect()
    }
    assert multi == per_day and len(multi) == 6

    # game grain (reuse player frames with game_code in place of player_name)
    g1h = p1h.withColumnRenamed("player_name", "game_code")
    g1d = p1d.withColumnRenamed("player_name", "game_code")
    gcols = ["b_cur", "p_cur", "rtp_cur", "b_sigma", "p_sigma", "risk_score"]
    per_day_g = {}
    for d in days:
        out = risk_ctrl_game_1d(g1h, g1d, d, _lookback_key_of(d)).collect()
        per_day_g.update({key_of(r, gkeys): vals(r, gcols) for r in out})
    multi_g = {
        key_of(r, gkeys): vals(r, gcols)
        for r in risk_ctrl_game_days(g1h, g1d, days).collect()
    }
    assert multi_g == per_day_g and len(multi_g) == 6


def test_division_sites_survive_ansi_zero_divisors(spark):
    """Spark 4 runs ANSI by default (x/0 raises for every numeric
    type); the engine's division sites must yield the documented
    ÷0->0 instead.  Fixture forces every risky divisor to zero:
    p_cur = 0 with net_trans_cur > 0 (the sf0.1 crash), zero floored
    deviation, zero bet sum."""
    import pyspark.sql.functions as F
    from decimal import Decimal

    from tg_reporting_etl_spark.functions.core import safe_div

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    # safe_div on decimal AND double zero divisors
    row = spark.createDataFrame(
        [(Decimal("1.00"), Decimal("0.00"), 1.0, 0.0)],
        "dn decimal(10,2), dd decimal(10,2), fn double, fd double",
    ).select(
        safe_div(F.col("dn"), F.col("dd")).alias("dec"),
        safe_div(F.col("fn"), F.col("fd")).alias("dbl"),
    ).collect()[0]
    assert row.dec == 0.0 and row.dbl == 0.0

    # the sigma/p_trans expressions via the public scoring path
    from tg_reporting_etl_spark.operators.risk_ctrl import _upper_sigma

    sig = spark.createDataFrame([(5.0, 1.0, 0.0)], "cur double, wma double, sd double").select(
        _upper_sigma(F.col("cur"), F.col("wma"), F.col("sd")).alias("s")
    ).collect()[0]
    assert sig.s == 0.0  # zero deviation floor -> 0, not DIVIDE_BY_ZERO


def test_grid5_cross_engine_determinism(spark):
    """r15 residual 1 + the r16 floor lesson: the wma/wmasd 5-decimal
    surface needs BOTH properties, and each retired scheme lacked one.

    P1 (same input -> same output on both engines): ROUND(x,5) fails —
    Spark rounds the double's exact decimal expansion (BigDecimal
    HALF_UP), DuckDB rounds x*1e5 computed in FP, and they split on
    witnesses like 23.410574999999998.

    P2 (±ulp input noise -> same output): plain FLOOR(x*1e5)/1e5 fails —
    its boundaries sit ON exact grid values, which sum/7 of cent-grain
    data reaches (sf0.1 caught b_wma = exactly 80028.35000 flooring to
    different sides under per-engine summation noise).

    floor(x*1e5 + 0.5)/1e5 run as the identical IEEE op sequence on
    both engines has P1 by construction and P2 by the parity proof in
    _grid5's docstring (boundaries = half-points, unreachable by
    sum/7 or stddev of <=5-decimal-grain data).
    """
    import math

    import duckdb
    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.operators.risk_ctrl import _grid5

    # -- P1 sweep: known ROUND witnesses, half-points, grid points,
    # negatives, zeros — each with ±2 ulp perturbations.
    witnesses = [23.410574999999998, 17.195835, 14.585915,
                 99.06820499999999, 5.3322449999999995]
    vals = list(witnesses)
    # reachable rationals for P2: exact grid values M/1e5 (= 7M/7e5,
    # so sum/7 CAN produce them — incl. the sf0.1 incident value) and
    # sum/7 of cent data like 560198.45/7
    reachable = [80028.35, 1.0 / 100000.0, 12.34567, 999.99999,
                 123456.78 / 7.0, -80028.35, 0.0]
    for base in [x / 200000.0 for x in (1, 3, 2468013579, 19999999999)] + [
        x / 100000.0 for x in (1, 7, 1234567, 99999999)
    ]:
        vals.extend((base, -base))
    neighborhoods: dict[float, list[float]] = {}
    for x in reachable:
        lo = math.nextafter(math.nextafter(x, -math.inf), -math.inf)
        hi = math.nextafter(math.nextafter(x, math.inf), math.inf)
        nb = sorted({lo, math.nextafter(x, -math.inf), x,
                     math.nextafter(x, math.inf), hi})
        neighborhoods[x] = nb
        vals.extend(nb)
    vals.extend([0.0, -0.0])
    vals = sorted(set(vals))

    sdf = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.col("x"), _grid5(F.col("x")).alias("g"), F.round("x", 5).alias("r")
    )
    srows = {r.x: (r.g, r.r) for r in sdf.collect()}
    con = duckdb.connect()
    grid = {}
    mismatched_round = 0
    for v in vals:
        dg, dr = con.execute(
            # the oracle's _GRID5 shape, incl. the -0.0 -> +0.0 normalizer
            # (Spark's FLOOR returns a long, so its zero is always +0.0)
            "SELECT FLOOR(?::DOUBLE * 100000.0 + 0.5) / 100000.0 + 0.0, ROUND(?::DOUBLE, 5)",
            [v, v],
        ).fetchone()
        sg, sr = srows[v]
        # P1: bit-identical on every adversarial input
        assert sg == dg and math.copysign(1.0, sg) == math.copysign(1.0, dg), (
            f"_grid5 split on {v!r}: spark={sg!r} duck={dg!r}"
        )
        grid[v] = sg
        if sr != dr:
            mismatched_round += 1
    con.close()
    # P1 witness: ROUND(x,5) provably CAN split (the retired flake class)
    assert mismatched_round >= 1, "expected ROUND(x,5) witness to disagree"
    # P2: every ±2-ulp neighborhood of a reachable rational snaps to ONE
    # grid value — cross-engine summation noise cannot flip it (plain
    # floor demonstrably fails this at 80028.35)
    for x, nb in neighborhoods.items():
        outs = {grid[v] for v in nb}
        assert len(outs) == 1, f"noise flips grid at {x!r}: {outs}"
        floor_outs = {math.floor(v * 100000.0) / 100000.0 for v in nb}
        if x == 80028.35:
            assert len(floor_outs) > 1  # the bug this test exists to pin
