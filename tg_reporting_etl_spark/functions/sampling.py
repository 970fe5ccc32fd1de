"""Deterministic sampling operators for training-data mixing.

A 100 TB corpus pipeline mixes sources by weight ("60% web, 30% code,
10% books") and draws fixed-size per-stratum subsets.  Both operators
here are DETERMINISTIC — membership derives from an md5 hash uniform
keyed by row identity, so results are identical across partitionings,
retries, engines (the DuckDB oracle replays the same expression), and
runs; re-sampling with a different ``salt`` draws an independent
sample.  Contrast with ``df.sample()``/``sampleBy()``, whose output
depends on partitioning and seed plumbing.

Scale notes: fraction sampling is a pure narrow filter (no shuffle, no
state — prunes at scan speed).  Quota sampling shuffles once on the
stratum key and ranks within each stratum; stratum count is
config-bounded, and rank='first' truncation makes the result the
hash-minimal ``n`` rows per stratum — stable under growth of the
corpus except at the quota boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in (0, 1): first 8 md5 hex chars of
    ``key|salt`` as a 32-bit int, midpoint-offset (cross-engine)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1, 8), 16, 10
    ).cast("long")
    return (h + F.lit(0.5)) / F.lit(4294967296.0)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each row iff its hash uniform < its stratum's fraction.

    The Bernoulli mixing step of a data pipeline: expected per-stratum
    keep-rate equals the configured weight, membership is a pure
    function of (key, salt) — no shuffle, no driver state.
    """
    frac = F.lit(float(default_fraction))
    for value, p in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(float(p))).otherwise(frac)
    return df.filter(hash_uniform(F.col(key_col), salt) < frac)


def quota_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum: the hash-minimal
    ``n`` keys, ranked by the same deterministic uniform (md5-order
    row_number — the engine's O4 sampling idiom)."""
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            hash_uniform(F.col(key_col), salt).asc(), F.col(key_col).asc()
        )
    )
    return df.withColumn("_rn", rn).filter(F.col("_rn") <= n_per_stratum).drop("_rn")


def mixture_fractions(
    df: DataFrame, strata_col: str, weights: dict[str, float]
) -> DataFrame:
    """(stratum, budget, fraction) achieving the LARGEST total sample
    with composition ``weights`` that the per-stratum budgets support.

    T = min_s(budget_s / w_s) is the feasible total; fraction_s =
    w_s * T / budget_s (== 1.0 for the binding stratum, < 1 elsewhere).
    Strata not in ``weights`` are excluded.  Everything here is
    bounded-size: one count per stratum, a one-row min, a broadcastable
    fractions table — the corpus itself is never shuffled.
    """
    wt = F.lit(0.0)
    for value, p in weights.items():
        wt = F.when(F.col(strata_col) == value, F.lit(float(p))).otherwise(wt)
    budgets = (
        df.groupBy(strata_col)
        .agg(F.count("*").cast("long").alias("budget"))
        .withColumn("wt", wt)
        .filter(F.col("wt") > 0)
    )
    t = budgets.agg(F.min(F.col("budget") / F.col("wt")).alias("T"))
    return budgets.crossJoin(F.broadcast(t)).select(
        strata_col,
        "budget",
        F.least(F.lit(1.0), F.col("wt") * F.col("T") / F.col("budget")).alias("fraction"),
    )


def temperature_plan(
    df: DataFrame, strata_col: str, temperature: float = 2.0
) -> DataFrame:
    """(stratum, budget, weight, fraction): temperature-scaled source
    mixing (the UniMax / multilingual-LLM recipe) — target composition
    w_s ∝ n_s^(1/T), flattening the natural distribution toward uniform
    as T grows, then the feasible-total plan of
    :func:`mixture_fractions` (fraction = 1.0 for the binding stratum).

    Cross-engine determinism: the only libm call is ``sqrt`` (T = 2.0,
    the common choice — IEEE-exact in every engine, unlike ``pow``),
    and the un-normalized weights are quantized to integer micro-units
    BEFORE summation, so the normalizing total is an exact integer sum
    (immune to float add-order) and every downstream double derives
    identically in both engines.  Other temperatures use ``pow`` and
    carry a documented last-ulp risk at fraction boundaries.

    Everything is bounded-size: one count per stratum, one integer sum,
    a broadcastable plan table.
    """
    budgets = df.groupBy(strata_col).agg(F.count("*").cast("long").alias("budget"))
    if temperature == 2.0:
        pw = F.sqrt(F.col("budget"))
    else:
        pw = F.pow(F.col("budget"), F.lit(1.0 / float(temperature)))
    scaled = budgets.withColumn("pw", F.floor(pw * 1_000_000).cast("long"))
    tot = scaled.agg(F.sum("pw").cast("long").alias("tot"))
    weighted = scaled.crossJoin(F.broadcast(tot)).select(
        strata_col, "budget", (F.col("pw") / F.col("tot")).alias("weight")
    )
    t = weighted.agg(F.min(F.col("budget") / F.col("weight")).alias("T"))
    return weighted.crossJoin(F.broadcast(t)).select(
        strata_col,
        "budget",
        "weight",
        F.least(F.lit(1.0), F.col("weight") * F.col("T") / F.col("budget")).alias("fraction"),
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    temperature: float = 2.0,
    key_col: str = "doc_id",
    salt: str = "temp",
    plan: DataFrame | None = None,
) -> DataFrame:
    """Deterministic draw realizing the :func:`temperature_plan`
    composition — plan table broadcast onto the scan, membership by the
    md5 uniform against the 6-place-rounded fraction (rounded in BOTH
    engines, so a last-ulp fraction difference can never flip a row).
    Pass a precomputed (ideally persisted) ``plan`` to share the
    planning aggregates with other consumers."""
    if plan is None:
        plan = temperature_plan(df, strata_col, temperature)
    plan = plan.select(strata_col, F.round("fraction", 6).alias("_frac"))
    return (
        df.join(F.broadcast(plan), strata_col)
        .filter(hash_uniform(F.col(key_col), salt) < F.col("_frac"))
        .drop("_frac")
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic sample whose EXPECTED composition matches
    ``weights``, sized to the largest feasible total (the binding
    stratum is consumed whole).  The data-mixing planner + Bernoulli
    draw in one operator: fractions from :func:`mixture_fractions`
    broadcast onto the corpus scan, membership by the same md5 uniform
    as :func:`stratified_sample` — a pure narrow filter over the scan.
    """
    fr = mixture_fractions(df, strata_col, weights).select(strata_col, "fraction")
    return df.join(F.broadcast(fr), strata_col).filter(
        hash_uniform(F.col(key_col), salt) < F.col("fraction")
    )


def token_mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    strata_col: str = "source",
) -> DataFrame:
    """TOKEN-budget mixture plan with shortfall accounting — the data-
    mixing planning step of a pre-training run: "I want ``token_budget``
    training tokens at composition ``weights``; what sampling rate does
    each source get, and where does the corpus fall short?"

    Differs from :func:`mixture_fractions` (doc-count feasible-total) on
    both axes real runs care about: accounting is in TOKENS (whitespace
    tokens here; any per-doc token expression works), and the budget is
    FIXED — a source that cannot supply its share reports a shortfall
    (rate pinned at 1.0) instead of silently shrinking the total.  The
    mix designer then re-weights or up-samples deliberately (epochs over
    a small source are a policy choice, never an implicit one).

    Per source: avail_tokens (exact int sum), target_tokens =
    floor(weight·budget) (exact int), sampling_rate =
    round(min(1, target/avail), 6), shortfall_tokens =
    max(0, target - avail).  Sources outside ``weights`` are excluded
    (weight 0).  The WEIGHTS drive the output, not the corpus: a
    weighted source with zero documents (or only NULL text) still gets
    its row — avail_tokens 0, sampling_rate 1.0, shortfall_tokens ==
    target_tokens — because the absent-source case is the maximal
    shortfall and must never be the one case that emits no signal.
    All outputs are integers except the two rounded doubles, so the
    frame is engine-parity-safe.  Bounded size: one token-count agg per
    source (map-side partial over the scan), then literal arithmetic on
    a weights-sized table.
    """
    spark = docs.sparkSession
    wdim = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{strata_col} string, target_weight double",
    ).filter(F.col("target_weight") > 0)
    avail = (
        docs.filter(F.col("text").isNotNull())
        .groupBy(strata_col)
        .agg(F.sum(F.size(F.split("text", " "))).cast("long").alias("avail_tokens"))
    )
    joined = wdim.join(avail, strata_col, "left").withColumn(
        "avail_tokens", F.coalesce("avail_tokens", F.lit(0)).cast("long")
    )
    target = F.floor(F.col("target_weight") * F.lit(int(token_budget))).cast("long")
    return joined.select(
        strata_col,
        "avail_tokens",
        F.round("target_weight", 6).alias("target_weight"),
        target.alias("target_tokens"),
        # try_divide: avail 0 -> NULL -> rate 1.0 (take all there is)
        F.round(
            F.least(F.lit(1.0), F.coalesce(F.try_divide(target, F.col("avail_tokens")), F.lit(1.0))),
            6,
        ).alias("sampling_rate"),
        F.greatest(F.lit(0).cast("long"), target - F.col("avail_tokens")).alias(
            "shortfall_tokens"
        ),
    )
