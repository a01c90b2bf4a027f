"""Round-4 batch 6: two additional Structured-Streaming registry ops —
the stream-stream funnel join (the one streaming join shape the
registry lacked) and a chained-stateful daily-downtime aggregation —
plus the SRE error-budget burn table their batch consumers read.

Lives in its own module (NOT streaming/events.py) purely for registry
ordering: new keys must rank after every previously-registered
unverified key so rounds 4/5's grading windows stay intact; the
streaming machinery is imported from streaming/events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.streaming.events import read_events_stream, run_to_memory

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. stream-stream funnel join
# ---------------------------------------------------------------------------
def stream_funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversions as a STREAM-STREAM self-join: the
    signup branch joins the purchase branch on user within a 24 h
    event-time bound, watermarks on both sides sizing the join state —
    the interval-join shape (user did X then Y within T) that only
    stream-stream joins express incrementally. The joined pairs emit in
    append mode; the per-signup-day rollup is a batch aggregate over
    the sink (chaining a second stateful agg would also work on Spark
    4; the join IS the op under test). Oracle: the identical
    time-bounded SQL join."""
    ev = read_events_stream(spark, sf_dir)
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .selectExpr("user_id AS s_user", "ts AS s_ts")
        .withWatermark("s_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .selectExpr("user_id AS p_user", "ts AS p_ts")
        .withWatermark("p_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        F.expr(
            "s_user = p_user AND p_ts >= s_ts"
            " AND p_ts <= s_ts + INTERVAL 24 HOURS"
        ),
    )
    out = run_to_memory(joined, mode="append")
    return (
        out.selectExpr("CAST(date_trunc('day', s_ts) AS timestamp_ntz) AS d")
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_conversion_pairs"))
        .orderBy("d")
    )


QUERIES["stream_funnel_conversions"] = stream_funnel_conversions

ORACLES["stream_funnel_conversions"] = """
    WITH s AS (
        SELECT user_id, ts FROM events WHERE event_type = 'signup'
    ),
    p AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(date_trunc('day', s.ts) AS TIMESTAMP) AS d,
           COUNT(*) AS n_conversion_pairs
    FROM s JOIN p ON s.user_id = p.user_id
       AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
    GROUP BY date_trunc('day', s.ts)
    ORDER BY d
"""


# ---------------------------------------------------------------------------
# 2. streaming daily downtime (chained dedup -> aggregate)
# ---------------------------------------------------------------------------
def stream_daily_downtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily down-minutes, incrementally: error events dedup to one row
    per minute (watermarked dropDuplicates — bounded state), then a
    second stateful aggregate counts minutes per day — the chained
    dedup→agg shape proven by stream_daily_active_users, pointed at the
    ops metric ev_uptime_sla reads. Emits only days that saw at least
    one error minute (a streaming job cannot invent rows for silent
    days; the batch twin closes that gap with its calendar join)."""
    ev = read_events_stream(spark, sf_dir)
    per_minute = (
        ev.filter(F.col("event_type") == "error")
        .withColumn("minute", F.date_trunc("minute", "ts"))
        .withWatermark("minute", "1 hour")
        .dropDuplicates(["minute"])
    )
    daily = (
        per_minute
        .groupBy(F.window("minute", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("down_minutes"))
    )
    out = run_to_memory(daily, mode="complete")
    return (
        out.selectExpr(
            "CAST(w.start AS timestamp_ntz) AS d", "down_minutes"
        )
        .orderBy("d")
    )


QUERIES["stream_daily_downtime"] = stream_daily_downtime

ORACLES["stream_daily_downtime"] = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           COUNT(DISTINCT date_trunc('minute', ts)) AS down_minutes
    FROM events WHERE event_type = 'error'
    GROUP BY date_trunc('day', ts)
    ORDER BY d
"""


# ---------------------------------------------------------------------------
# 3. error-budget burn
# ---------------------------------------------------------------------------
_BUDGET_PPM = 10000  # 1% error budget


def ev_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget accounting: with a 1% monthly error budget,
    track per day the cumulative error rate, the budget consumed so
    far (cum errors vs 1% of cum events, in ppm of budget), and the
    breach flag — the burn-down chart behind every SLO review. Two
    cumulative windows over the bounded daily series; exact integers
    (cum_err·1e8 stays far from 2^63 at any realistic volume)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(
                "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"
            )).alias("n_errors"),
        )
    )
    wcum = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return (
        daily.select(
            "d", "n_events", "n_errors",
            F.sum("n_events").over(wcum).alias("cum_events"),
            F.sum("n_errors").over(wcum).alias("cum_errors"),
        )
        .selectExpr(
            "d", "n_events", "n_errors",
            "cum_errors * 1000000 DIV cum_events AS cum_error_ppm",
            # budget consumed: cum_errors / (budget_ppm/1e6 * cum_events)
            f"cum_errors * 100000000 DIV (cum_events * {_BUDGET_PPM})"
            " AS budget_burn_pct_x100",
            f"CAST(CASE WHEN cum_errors * 1000000 > cum_events * {_BUDGET_PPM}"
            " THEN 1 ELSE 0 END AS INT) AS budget_breached",
        )
        .orderBy("d")
    )


QUERIES["ev_error_budget_burn"] = ev_error_budget_burn

ORACLES["ev_error_budget_burn"] = f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               COUNT(*) AS n_events,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS n_errors
        FROM events GROUP BY date_trunc('day', ts)
    ),
    cums AS (
        SELECT d, n_events,
               CAST(n_errors AS BIGINT) AS n_errors,
               SUM(n_events) OVER w AS cum_events,
               SUM(n_errors) OVER w AS cum_errors
        FROM daily
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT d, n_events, n_errors,
           CAST(cum_errors * 1000000 // cum_events AS BIGINT)
               AS cum_error_ppm,
           CAST(cum_errors * 100000000 // (cum_events * {_BUDGET_PPM})
                AS BIGINT) AS budget_burn_pct_x100,
           CAST(CASE WHEN cum_errors * 1000000 > cum_events * {_BUDGET_PPM}
                THEN 1 ELSE 0 END AS INT) AS budget_breached
    FROM cums
    ORDER BY d
"""
