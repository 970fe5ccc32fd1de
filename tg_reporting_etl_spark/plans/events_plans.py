"""Event-stream utility queries: JSON prop extraction, distinct users.

The reference touches JSON only config-side; a real event pipeline
parses payload columns in-engine, so the engine exposes it as a
first-class (JVM-side, no UDF) operator with an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.plans.catalog import register
from tg_reporting_etl_spark.sources.readers import load_table

_JSON_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(max(k) AS BIGINT) AS k_max,
       ROUND(avg(value), 6) + 0.0 AS avg_value
FROM (
  SELECT event_type, value,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type"""


@register("events_json_stats", _JSON_ORACLE, survey_ids="JSON payload extraction (engine extension)")
def q_events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("k_sum"),
        F.max("k").cast("long").alias("k_max"),
        (F.round(F.avg("value"), 6) + F.lit(0.0)).alias("avg_value"),
    )


_DISTINCT_ORACLE = """
SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT) AS summary_date,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1"""


@register("daily_distinct_users", _DISTINCT_ORACLE, survey_ids="A9 countDistinct (exact dedup aggregate)")
def q_daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (F.year("ts") * 10000 + F.month("ts") * 100 + F.dayofmonth("ts")).cast("int")
    return ev.groupBy(day.alias("summary_date")).agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


# Data-quality gate over the events table: one scan, every rule a
# conditional-sum measure (functions/validate.py).  value_range is
# deliberately tighter than the data (100.0) so the report proves it
# counts REAL violations, not just zeros.
_QUALITY_RULES = dict(
    not_null=["event_id", "user_id", "ts"],
    in_set={"event_type": ["click", "error", "purchase", "signup", "view"]},
    ranges={"value": (0.0, 100.0)},
    unique=["event_id"],
)

_DQ_ORACLE = """
SELECT 'event_id_not_null' AS rule,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM events
UNION ALL SELECT 'user_id_not_null',
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL SELECT 'ts_not_null',
       CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL SELECT 'event_type_in_set',
       CAST(SUM(CASE WHEN event_type IS NULL
                     OR event_type NOT IN ('click','error','purchase','signup','view')
                THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL SELECT 'value_range',
       CAST(SUM(CASE WHEN value IS NULL OR value < 0.0 OR value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL SELECT 'event_id_unique',
       CAST(count(*) - count(DISTINCT CAST(event_id AS VARCHAR)) AS BIGINT) FROM events"""


@register(
    "events_quality_report",
    _DQ_ORACLE,
    survey_ids="data-quality gate: declarative rules -> single-scan violation report",
)
def q_events_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """functions/validate.py:quality_report — every rule folded into one
    partial-aggregable agg pass, unpivoted to (rule, n_violations)."""
    from tg_reporting_etl_spark.functions.validate import quality_report

    return quality_report(load_table(spark, sf_dir, "events"), **_QUALITY_RULES)


_SALTED_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(sum(value), 4) + 0.0 AS total_value
FROM events GROUP BY 1"""


@register(
    "events_user_salted_agg",
    _SALTED_ORACLE,
    survey_ids="A1 skew path: two-stage salted aggregation (functions/skew.py)",
)
def q_events_user_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-resilient twin of a plain per-user rollup: stage 1
    aggregates on (user_id, salt) so a whale key spreads across N
    reducers, stage 2 merges the partials — values provably identical
    to the direct groupBy (the oracle IS the direct groupBy).  At
    100 TB this is the shape that keeps one hot user from pinning a
    single reducer; here the oracle gate certifies the rewrite is
    value-preserving."""
    from tg_reporting_etl_spark.functions.skew import salted_agg
    from tg_reporting_etl_spark.plans.util import round_doubles

    ev = load_table(spark, sf_dir, "events").select("user_id", F.col("value").cast("double").alias("value"))
    out = salted_agg(ev, ["user_id"], ["value"], count_col="n_events")
    return round_doubles(
        out.select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value").alias("total_value"),
        ),
        places=4,
    )


_SKEW_PROFILE_ORACLE = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
t AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM c)
SELECT c.user_id, c.cnt,
       ROUND(c.cnt / t.total, 6) + 0.0 AS share,
       ROUND(c.cnt / (t.total * 1.0 / t.n_keys), 6) + 0.0 AS skew_ratio
FROM c, t
ORDER BY c.cnt DESC, c.user_id
LIMIT 20"""


@register(
    "events_key_skew_profile",
    _SKEW_PROFILE_ORACLE,
    survey_ids="skew diagnostics: heavy-hitter profile for a prospective shuffle key (functions/skew.py)",
)
def q_events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hottest user_id keys with row share and skew ratio — the
    pre-flight answer to "does this shuffle key need salting?".  One
    data-sized shuffle; totals broadcast back; top-N via TakeOrdered."""
    from tg_reporting_etl_spark.functions.skew import key_skew_profile

    ev = load_table(spark, sf_dir, "events").select("user_id")
    return key_skew_profile(ev, ["user_id"], top_n=20)


_ASOF_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS click_ts, c.event_id AS click_event_id,
       CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS secs_since_click
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"""


@register(
    "events_asof_attribution",
    _ASOF_ORACLE,
    survey_ids="custom operator: AS-OF backward temporal join (union+window plan vs native ASOF oracle)",
)
def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute each purchase to the user's most recent click at or
    before it — the point-in-time lookup (functions/asof.py).  The
    oracle is DuckDB's NATIVE ASOF JOIN, so the union+window plan is
    checked against an independent first-class implementation of the
    operator, not a rephrasing of our own SQL."""
    from tg_reporting_etl_spark.functions.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join_backward(purchases, clicks, key="user_id", ts="ts", right_prefix="click_")
    return out.select(
        "event_id", "user_id", "ts", "click_ts", "click_event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("click_ts")).cast("long").alias("secs_since_click"),
    )


_RANGE_ORACLE = """
WITH inc AS (
  SELECT event_id AS incident_id, ts AS start_ts,
         ts + INTERVAL 5 MINUTE AS end_ts
  FROM events WHERE event_type = 'error'
),
hits AS (
  SELECT i.incident_id, CAST(count(*) AS BIGINT) AS n_events
  FROM inc i JOIN events e ON e.ts >= i.start_ts AND e.ts < i.end_ts
  GROUP BY 1
)
SELECT i.incident_id, COALESCE(h.n_events, 0) AS n_events
FROM inc i LEFT JOIN hits h USING (incident_id)"""


@register(
    "events_incident_range_join",
    _RANGE_ORACLE,
    survey_ids="custom operator: keyless point-in-interval range join (bucketed equi plan vs native IEJoin oracle)",
)
def q_events_incident_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every error event opens a 5-minute incident window; count ALL
    events (any user, any type — no equi key) landing in each window.
    functions/rangejoin.py turns the bare range predicate into a
    bucketed equi join; the oracle is DuckDB's native inequality-join
    path, an independent implementation of the operator."""
    from tg_reporting_etl_spark.functions.rangejoin import bucketed_range_join

    ev = load_table(spark, sf_dir, "events")
    inc = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    hits = (
        bucketed_range_join(ev.select("ts"), inc)
        .groupBy("incident_id")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    return inc.select("incident_id").join(hits, "incident_id", "left").select(
        "incident_id", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events")
    )


_ASOF_FWD_ORACLE = """
WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
p AS (SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT s.event_id, s.user_id, s.ts,
       p.ts AS purchase_ts, p.event_id AS purchase_event_id,
       CAST(floor(epoch(p.ts)) - floor(epoch(s.ts)) AS BIGINT) AS secs_to_purchase
FROM s ASOF LEFT JOIN p ON s.user_id = p.user_id AND s.ts <= p.ts"""


@register(
    "events_signup_conversion_lag",
    _ASOF_FWD_ORACLE,
    survey_ids="custom operator: AS-OF forward temporal join (activation latency vs native ASOF oracle)",
)
def q_events_signup_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each signup joined to the user's FIRST purchase at or after it
    — activation-latency analytics via the forward direction of
    functions/asof.py (same union+window plan over the reversed sort).
    Oracle: DuckDB's native ASOF with the inequality flipped."""
    from tg_reporting_etl_spark.functions.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join_backward(
        signups, purchases, key="user_id", ts="ts",
        right_prefix="purchase_", direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts", "purchase_ts", "purchase_event_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("ts")).cast("long").alias("secs_to_purchase"),
    )
