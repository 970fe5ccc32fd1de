"""risk_ctrl 1d family — Bollinger-band-style risk scoring.

Reference: task-executor/risk_ctrl/{risk_ctrl_player_1d,risk_ctrl_game_1d}.py.
For a target day D: current-day aggregates (from the 1h tier) are
compared against 8-day trailing statistics (from the 1d tier,
``[D-8, D)`` — the reference calls it 7-day but the window is 8 days
wide, SURVEY §4 delta 5) and scored as sigma distances weighted into a
risk_score (risk_ctrl_player_1d.py:157-234).

Bug-compatible floors (SURVEY §4 delta 6, preserved literally):
the p/trans floor *conditions* compare against the **b** defaults while
the replacement values use their own defaults
(risk_ctrl_player_1d.py:193-202) — e.g.
``p_wma < def_b_wma  ->  p_wma := def_p_wma * country_rate``.

Everything is pure column expressions over two chained groupBys + three
left joins — no UDFs, fully codegen'd; the trailing stats are a
re-aggregation exactly like the reference (not a window function) so the
oracle can mirror it CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.config import RISK_CTRL_1D
from tg_reporting_etl_spark.functions.core import safe_div

PLAYER_KEYS = ["platform", "site_code", "player_name", "country"]
GAME_KEYS = ["platform", "site_code", "game_code", "country"]


def _country_rate() -> Column:
    """country -> currency-rate literal map (report_config.py:35-40);
    a 4-entry map literal, the map-side-join reading of SURVEY §2.3 J7."""
    pairs: list[Column] = []
    for k, v in RISK_CTRL_1D["country_rate"].items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)[F.col("country")]


def _floored(col: str, cond_floor: float, value_floor: float, rate: Column) -> Column:
    """reference floor rule: ``col < cond_floor -> value_floor * rate``
    (risk_ctrl_player_1d.py:185-202)."""
    return F.when(F.col(col) < cond_floor, F.lit(value_floor) * rate).otherwise(F.col(col))


def _upper_sigma(cur: Column, wma: Column, wmasd: Column) -> Column:
    """abs(cur-wma)/wmasd when cur >= wma else 0; inf/NaN -> 0
    (risk_ctrl_player_1d.py:206-214).  try_divide: a zero floored
    deviation would RAISE under default-ANSI sessions, not reach the
    coalesce."""
    return F.coalesce(
        F.when(cur >= wma, F.try_divide(F.abs(cur - wma), wmasd)).otherwise(F.lit(0.0)),
        F.lit(0.0),
    )


def _grid5(c: Column) -> Column:
    """5-decimal grid snap: ``floor(x*1e5 + 0.5) / 1e5`` — one IEEE-754
    multiply, one add, an exact ``floor``, one divide.  The oracle runs
    the literally identical operation sequence (register_risk_plans
    ``_GRID5``), so the same double in gives the same double out on
    BOTH engines by construction — ``ROUND(x,5)`` could not promise
    that (Spark: BigDecimal HALF_UP on the exact expansion; DuckDB: C
    round on ``x*1e5`` computed in FP; they split on e.g.
    23.410574999999998).

    Why the ``+ 0.5`` shift is load-bearing (r16, caught by the sf0.1
    full-hash): the snap must also be stable under the ~1e-12
    summation-order noise that differs BETWEEN engines, so its
    discontinuities must be unreachable by the true values being
    snapped.  Those values are ``sum/7`` and ``stddev_pop`` of
    decimal-grain amounts (grain 10^-d, d <= 5).  Plain
    ``floor(x*1e5)`` has boundaries at exact grid points M/1e5, which
    ``sum/7`` HITS whenever 7 divides the integer amount-sum — at sf0.1
    one game group's b_wma was exactly 80028.35000 and the two engines
    floored to different sides.  With the half-step shift the
    boundaries are the half-points (2M-1)/2e5, and a parity argument
    makes them unreachable: sum/7 = N/(7*10^d) on a boundary needs
    2*10^(5-d)*N = 7*(2M-1) — even = odd, impossible; stddev_pop =
    sqrt(K)/(7*10^d) on one needs 2*10^(5-d)*sqrt(K) = 7*(2M-1), and
    when sqrt(K) is rational it is an integer q giving even = odd
    again (irrational sqrt(K) sits a generic distance away).  Minimum
    boundary distance is 1/(14*10^5) ~ 7e-7, five orders above the
    noise.  tests/test_risk_ctrl.py::test_grid5_cross_engine_determinism
    pins both properties (same-input identity across engines, and
    ±2-ulp noise immunity at reachable rationals incl. the 80028.35
    witness).  NULL propagates.

    Safe magnitude (r16 ADVICE 2): the half-point clearance is a fixed
    1/14 of a grid step in ``x*1e5`` space, but the ``x*100000.0``
    multiply's own rounding error (<= ulp(x*1e5)/2) grows with
    magnitude and crosses that clearance near ``|x| ~ 3e9`` — far
    below the 2^63/1e5 ~ 9.2e13 integer-overflow bound — so the
    noise-immunity claim is honest only for ``|x| <~ 1e9`` (where the
    multiply error stays well under the clearance).  The snapped
    values are per-(keys, day) trailing sums/7 and stddevs of report
    amounts — orders of magnitude under 1e9; the premise (amount grain
    <= 5 decimals AND daily-sum magnitude < 1e9) is a standing check:
    :func:`amount_grain` + tests/test_grain_premise.py (r16 verdict
    task 1).
    """
    return F.floor(c * F.lit(100000.0) + F.lit(0.5)) / F.lit(100000.0)


def amount_grain(df: DataFrame, cols: list[str], max_d: int = 6) -> dict[str, int | None]:
    """Measured decimal grain of each amount column: the smallest
    ``d <= max_d`` such that every value is — within FP representation
    tolerance — an integer multiple of ``10^-d``; ``None`` when even
    ``max_d`` decimals cannot explain some value.

    This is the standing enforcement of :func:`_grid5`'s premise (r16
    verdict task 1): the boundary-unreachability parity proof requires
    every aggregated amount to be a rational with <= 5-decimal grain,
    which was previously a one-off sf0.1 measurement recorded in SURVEY
    §6.  tests/test_grain_premise.py runs this over the fixture columns
    that feed the wma/wmasd sums at every shipped sf and goes red if
    any grain exceeds 5 (mutation-tested with an injected 6-decimal
    value).

    Detection is FP-honest: fixture amounts are COMPUTED doubles
    (``profit = win - bet + ...`` cancels two ~1e4-magnitude terms), so
    a true d-decimal rational arrives with absolute error up to a few
    ulps of the INTERMEDIATE magnitudes (~5e-12 for 1e4-scale chains),
    not of the result.  Per (col, d) the x-space residual
    ``|x - round(x, d)|`` is therefore compared against an absolute
    floor of 1e-7 (with a ``|x| * 1e-13`` relative term for large
    magnitudes): four-plus orders above any legitimate chain error at
    fixture magnitudes (<= ~1e6, where ulp <= 1.2e-10), and one-plus
    orders below the >= ~1e-6 residual a genuine extra decimal digit
    leaves.  The floor is honest only while |x| <~ 1e8 (ulp(1e8) =
    1.5e-8 starts approaching it) — comfortably above the ~1e6 fixture
    amounts and consistent with :func:`_grid5`'s own ~1e9 magnitude
    bound.  All (col, d) residual ratios are computed in ONE
    aggregation pass over the data.
    """
    aggs = []
    for c in cols:
        for d in range(max_d + 1):
            x = F.col(c).cast("double")
            ratio = F.abs(x - F.round(x, d)) / F.greatest(
                F.abs(x) * F.lit(1e-13), F.lit(1e-7)
            )
            aggs.append(F.max(ratio).alias(f"{c}__{d}"))
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, int | None] = {}
    for c in cols:
        out[c] = next(
            (
                d
                for d in range(max_d + 1)
                if row[f"{c}__{d}"] is None or row[f"{c}__{d}"] <= 1.0
            ),
            None,
        )
    return out


def _trailing_stats(tier_1d: DataFrame, keys: list[str], gte_key: int, lt_key: int, prefix_map: dict[str, str]) -> DataFrame:
    """Two-level trailing aggregation (A5): per-day sums re-aggregated to
    SUM/7 means and population stddevs (risk_ctrl_player_1d.py:97-130;
    MySQL STDDEV is population -> stddev_pop, SURVEY §4 delta 2).

    ``prefix_map`` maps source measure -> output prefix, e.g.
    {"b_amount": "b", "profit_amount": "p"}.
    """
    daily = (
        tier_1d.filter((F.col("summary_date") >= gte_key) & (F.col("summary_date") < lt_key))
        .groupBy("summary_date", *keys)
        .agg(*[F.sum(src).alias(f"_daily_{pfx}") for src, pfx in prefix_map.items()])
    )
    # wma/wmasd snap to a 5-decimal grid BEFORE the floor/sigma/score
    # arithmetic: sum/stddev_pop merge order differs between engines at
    # the 1e-12 level, and the sigma division amplifies that past the
    # output's 6-decimal grid at 10x row counts (r14 probe: one row
    # passed only via 1e-6 tolerance).  An order-stable surface makes
    # the downstream chain bit-deterministic; oracle mirrors _grid5
    # operation-for-operation (register_risk_plans._GRID5).
    aggs = []
    for pfx in prefix_map.values():
        aggs.append(_grid5(F.sum(f"_daily_{pfx}") / 7).alias(f"{pfx}_wma"))
        aggs.append(_grid5(F.stddev_pop(f"_daily_{pfx}")).alias(f"{pfx}_wmasd"))
    return daily.groupBy(*keys).agg(*aggs)


def _current_day(tier_1h: DataFrame, keys: list[str], date_key: int) -> DataFrame:
    """Current-day b/p/rtp from the 1h tier (risk_ctrl_player_1d.py:71-84)."""
    return (
        tier_1h.filter(F.col("summary_date") == date_key)
        .groupBy(*keys)
        .agg(F.sum("b_amount").alias("b_cur"), F.sum("profit_amount").alias("p_cur"))
        .withColumn("rtp_cur", safe_div(F.col("p_cur"), F.col("b_cur")))
    )


def _ud() -> Column:
    """summary_date int key -> unix day ordinal (for range windows)."""
    return F.unix_date(F.to_date(F.col("summary_date").cast("string"), "yyyyMMdd"))


def _trailing_stats_for_anchors(
    tier_1d: DataFrame,
    keys: list[str],
    anchors: DataFrame,
    prefix_map: dict[str, str],
    lo_key: int,
    hi_key: int,
    lookback_days: int = 8,
) -> DataFrame:
    """Multi-day :func:`_trailing_stats`: per-anchor trailing stats via
    ONE range window instead of a re-aggregation per target day.

    ``anchors`` holds the (summary_date, keys) rows that need stats.
    Daily sums (pruned to [lo_key, hi_key]) union with null-measure
    anchor rows; a ``rangeBetween(-lookback, -1)`` frame over the unix
    day ordinal then reproduces each day's ``[D-lookback, D)``
    re-aggregation exactly — sum/stddev_pop ignore the null anchor
    measures, and an anchor with no trailing rows gets NULL stats, just
    like the groupBy version's missing row before the caller's
    ``na.fill(0.0)``.  One shuffle for the whole backfill where the
    per-day loop paid one per day.
    """
    from pyspark.sql import Window

    daily = (
        tier_1d.filter((F.col("summary_date") >= lo_key) & (F.col("summary_date") <= hi_key))
        .groupBy("summary_date", *keys)
        .agg(*[F.sum(src).alias(f"_daily_{pfx}") for src, pfx in prefix_map.items()])
        .withColumn("_anchor", F.lit(0))
    )
    a = anchors.select(
        "summary_date",
        *keys,
        *[F.lit(None).cast("double").alias(f"_daily_{pfx}") for pfx in prefix_map.values()],
        F.lit(1).alias("_anchor"),
    )
    u = daily.unionByName(a).withColumn("_ud", _ud())
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ud")
        .rangeBetween(-lookback_days, -1)
    )
    stats = u
    # same 5-decimal order-stable surface as _trailing_stats (the
    # per-day/multi-day equivalence pytest holds because both _grid5)
    for pfx in prefix_map.values():
        stats = stats.withColumn(f"{pfx}_wma", _grid5(F.sum(f"_daily_{pfx}").over(w) / 7))
        stats = stats.withColumn(f"{pfx}_wmasd", _grid5(F.stddev_pop(f"_daily_{pfx}").over(w)))
    out_cols = [c for pfx in prefix_map.values() for c in (f"{pfx}_wma", f"{pfx}_wmasd")]
    return stats.filter(F.col("_anchor") == 1).select("summary_date", *keys, *out_cols)


def risk_ctrl_player_1d(
    player_1h: DataFrame,
    player_1d: DataFrame,
    trans_1h: DataFrame,
    trans_1d: DataFrame,
    date_key: int,
    lookback_gte_key: int,
) -> DataFrame:
    """Player-grain risk report for day ``date_key``.

    ``lookback_gte_key`` is the int date key of D-8 (the caller owns
    calendar arithmetic so the operator stays a pure table transform).
    """
    cur = _current_day(player_1h, PLAYER_KEYS, date_key)
    cur_trans = (
        trans_1h.filter(F.col("summary_date") == date_key)
        .groupBy(*PLAYER_KEYS)
        .agg(F.sum(F.col("trans_out_amount") - F.col("trans_in_amount")).alias("net_trans_cur"))
    )
    p_wma = _trailing_stats(
        player_1d, PLAYER_KEYS, lookback_gte_key, date_key, {"b_amount": "b", "profit_amount": "p"}
    )
    # the 1d tier is already day grain, so the "sum" over net_trans is the
    # identity — matches the reference's non-aggregated inner select
    # (risk_ctrl_player_1d.py:120-130)
    trans_net = trans_1d.withColumn(
        "net_trans_amount", F.col("trans_out_amount") - F.col("trans_in_amount")
    )
    t_wma = _trailing_stats(
        trans_net,
        PLAYER_KEYS,
        lookback_gte_key,
        date_key,
        {"net_trans_amount": "net_trans"},
    )
    meta = (
        cur.join(cur_trans, PLAYER_KEYS, "left")
        .join(p_wma, PLAYER_KEYS, "left")
        .join(t_wma, PLAYER_KEYS, "left")
        .na.fill(0.0)
    )
    return _score_player(meta).withColumn("summary_date", F.lit(date_key).cast("int"))


def _score_player(meta: DataFrame) -> DataFrame:
    """Player-grain floors + sigma scoring (risk_ctrl_player_1d.py:157-234);
    shared by the single-day and multi-day plans."""
    cfg = RISK_CTRL_1D["default_value_player"]
    rate = _country_rate()
    b_wma_f = _floored("b_wma", cfg["def_b_wma"], cfg["def_b_wma"], rate)
    b_wmasd_f = _floored("b_wmasd", cfg["def_b_wmasd"], cfg["def_b_wmasd"], rate)
    # bug-compatible: p/trans conditions use the b defaults (see module doc)
    p_wma_f = _floored("p_wma", cfg["def_b_wma"], cfg["def_p_wma"], rate)
    p_wmasd_f = _floored("p_wmasd", cfg["def_b_wmasd"], cfg["def_p_wmasd"], rate)
    nt_wma_f = _floored("net_trans_wma", cfg["def_b_wma"], cfg["def_p_wma"], rate)
    nt_wmasd_f = _floored("net_trans_wmasd", cfg["def_b_wmasd"], cfg["def_p_wmasd"], rate)

    b_sigma = _upper_sigma(F.col("b_cur"), b_wma_f, b_wmasd_f)
    p_sigma = F.when(F.col("p_cur") <= 0, 0.0).otherwise(
        _upper_sigma(F.col("p_cur"), p_wma_f, p_wmasd_f)
    )
    trans_sigma = F.when(F.col("net_trans_cur") <= 0, 0.0).otherwise(
        _upper_sigma(F.col("net_trans_cur"), nt_wma_f, nt_wmasd_f)
    )
    p_trans_multi = F.coalesce(
        # try_divide: p_cur is a DECIMAL sum that CAN be zero while
        # net_trans_cur > 0 (first hit at sf0.1) — plain / raises
        # DIVIDE_BY_ZERO under default-ANSI sessions before the outer
        # coalesce can see the NULL
        F.when(
            F.col("net_trans_cur") > 0,
            F.try_divide(F.col("net_trans_cur"), F.col("p_cur")),
        ).otherwise(0.0),
        F.lit(0.0),
    )
    w = RISK_CTRL_1D["risk_score_multi"]
    return (
        meta.withColumn("b_sigma", b_sigma)
        .withColumn("p_sigma", p_sigma)
        .withColumn("trans_sigma", trans_sigma)
        .withColumn("p_trans_multi", p_trans_multi)
    ).withColumn(
        "risk_score",
        F.col("b_sigma") * w["b"]
        + F.col("p_sigma") * w["wl"]
        + F.col("trans_sigma") * w["trans"]
        + F.col("p_trans_multi") * w["p_trans_multi"],
    )


def _lookback_key_of(date_key: int, lookback_days: int = 8) -> int:
    import datetime as _dt

    d = _dt.datetime.strptime(str(int(date_key)), "%Y%m%d") - _dt.timedelta(days=lookback_days)
    return int(d.strftime("%Y%m%d"))


def risk_ctrl_player_days(
    player_1h: DataFrame,
    player_1d: DataFrame,
    trans_1h: DataFrame,
    trans_1d: DataFrame,
    date_keys: list[int],
    lookback_days: int = 8,
) -> DataFrame:
    """Player-grain risk report for a WHOLE day range in one plan.

    Identical per-day semantics to :func:`risk_ctrl_player_1d` (proven
    by equivalence test), but the trailing statistics come from one
    range window over the span instead of a re-aggregation per day —
    a month backfill pays a constant number of shuffles, not 30×."""
    days = sorted(int(d) for d in date_keys)
    lo = _lookback_key_of(days[0], lookback_days)
    cur = (
        player_1h.filter(F.col("summary_date").isin(days))
        .groupBy("summary_date", *PLAYER_KEYS)
        .agg(F.sum("b_amount").alias("b_cur"), F.sum("profit_amount").alias("p_cur"))
        .withColumn("rtp_cur", safe_div(F.col("p_cur"), F.col("b_cur")))
    )
    cur_trans = (
        trans_1h.filter(F.col("summary_date").isin(days))
        .groupBy("summary_date", *PLAYER_KEYS)
        .agg(F.sum(F.col("trans_out_amount") - F.col("trans_in_amount")).alias("net_trans_cur"))
    )
    anchors = cur.select("summary_date", *PLAYER_KEYS)
    p_wma = _trailing_stats_for_anchors(
        player_1d, PLAYER_KEYS, anchors,
        {"b_amount": "b", "profit_amount": "p"}, lo, days[-1], lookback_days,
    )
    trans_net = trans_1d.withColumn(
        "net_trans_amount", F.col("trans_out_amount") - F.col("trans_in_amount")
    )
    t_wma = _trailing_stats_for_anchors(
        trans_net, PLAYER_KEYS, anchors,
        {"net_trans_amount": "net_trans"}, lo, days[-1], lookback_days,
    )
    jk = ["summary_date", *PLAYER_KEYS]
    meta = (
        cur.join(cur_trans, jk, "left")
        .join(p_wma, jk, "left")
        .join(t_wma, jk, "left")
        .na.fill(0.0)
    )
    scored = _score_player(meta)
    # single-day column order: summary_date last (schema-stable sinks)
    return scored.select(*[c for c in scored.columns if c != "summary_date"], "summary_date")


def risk_ctrl_game_days(
    player_1h: DataFrame,
    player_1d: DataFrame,
    date_keys: list[int],
    lookback_days: int = 8,
) -> DataFrame:
    """Game-grain :func:`risk_ctrl_player_days` twin (b/p only)."""
    days = sorted(int(d) for d in date_keys)
    lo = _lookback_key_of(days[0], lookback_days)
    cur = (
        player_1h.filter(F.col("summary_date").isin(days))
        .groupBy("summary_date", *GAME_KEYS)
        .agg(F.sum("b_amount").alias("b_cur"), F.sum("profit_amount").alias("p_cur"))
        .withColumn("rtp_cur", safe_div(F.col("p_cur"), F.col("b_cur")))
    )
    anchors = cur.select("summary_date", *GAME_KEYS)
    p_wma = _trailing_stats_for_anchors(
        player_1d, GAME_KEYS, anchors,
        {"b_amount": "b", "profit_amount": "p"}, lo, days[-1], lookback_days,
    )
    meta = cur.join(p_wma, ["summary_date", *GAME_KEYS], "left").na.fill(0.0)
    scored = _score_game(meta)
    return scored.select(*[c for c in scored.columns if c != "summary_date"], "summary_date")


def risk_ctrl_game_1d(
    player_1h: DataFrame,
    player_1d: DataFrame,
    date_key: int,
    lookback_gte_key: int,
) -> DataFrame:
    """Game-grain risk report (risk_ctrl_game_1d.py:55-180): b/p only, no
    transfer component, game defaults."""
    cur = _current_day(player_1h, GAME_KEYS, date_key)
    p_wma = _trailing_stats(
        player_1d, GAME_KEYS, lookback_gte_key, date_key, {"b_amount": "b", "profit_amount": "p"}
    )
    meta = cur.join(p_wma, GAME_KEYS, "left").na.fill(0.0)
    return _score_game(meta).withColumn("summary_date", F.lit(date_key).cast("int"))


def _score_game(meta: DataFrame) -> DataFrame:
    """Game-grain floors + sigma scoring (risk_ctrl_game_1d.py:55-180);
    shared by the single-day and multi-day plans."""
    cfg = RISK_CTRL_1D["default_value_game"]
    rate = _country_rate()
    b_wma_f = _floored("b_wma", cfg["def_b_wma"], cfg["def_b_wma"], rate)
    b_wmasd_f = _floored("b_wmasd", cfg["def_b_wmasd"], cfg["def_b_wmasd"], rate)
    p_wma_f = _floored("p_wma", cfg["def_b_wma"], cfg["def_p_wma"], rate)
    p_wmasd_f = _floored("p_wmasd", cfg["def_b_wmasd"], cfg["def_p_wmasd"], rate)

    w = RISK_CTRL_1D["risk_score_multi"]
    return (
        meta.withColumn("b_sigma", _upper_sigma(F.col("b_cur"), b_wma_f, b_wmasd_f))
        .withColumn(
            "p_sigma",
            F.when(F.col("p_cur") <= 0, 0.0).otherwise(
                _upper_sigma(F.col("p_cur"), p_wma_f, p_wmasd_f)
            ),
        )
        .withColumn("risk_score", F.col("b_sigma") * w["b"] + F.col("p_sigma") * w["wl"])
    )
