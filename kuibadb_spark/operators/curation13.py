"""Round-4 batch 8 (final): three window-analytics classics — running
maximum drawdown, longest activity streaks, and Bollinger-band
breakout detection.

Registered after curation12 in registry._MODULES (rounds 4/5 grading
windows undisturbed; gradable from round 6). Determinism rules are
curation5-12's: exact integers, bounded windows, cross-multiplied
comparisons instead of float thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. running maximum drawdown
# ---------------------------------------------------------------------------
def w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily purchase revenue per event
    'portfolio' (here: per event type over its daily value series) —
    the risk metric pair to the MA crossover: drawdown(d) = peak-to-date
    − cum(d), reported as the worst absolute dip and its basis points
    of the peak. Two chained windows (cumsum, then running max) on the
    bounded daily series; exact cents throughout."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.expr("CAST(SUM(round(value * 100)) AS BIGINT)").alias("v"))
    )
    wcum = (
        W.partitionBy("event_type").orderBy("d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    curve = daily.select(
        "event_type", "d",
        # daily net flow: alternate sign by day parity to synthesize a
        # rising-falling equity curve from always-positive revenue
        # (drawdown of a monotone series is trivially zero)
        F.expr("CASE WHEN day(d) % 2 = 0 THEN v ELSE -v END").alias("flow"),
    ).select(
        "event_type", "d",
        F.sum("flow").over(wcum).alias("cum"),
    ).select(
        "event_type", "d", "cum",
        F.max("cum").over(wcum).alias("peak"),
    )
    return (
        curve.selectExpr("event_type", "peak - cum AS dd", "peak")
        .groupBy("event_type")
        .agg(
            F.max("dd").alias("max_drawdown_cents"),
            F.max("peak").alias("peak_cents"),
        )
        .selectExpr(
            "event_type", "max_drawdown_cents", "peak_cents",
            "CASE WHEN peak_cents <= 0 THEN NULL"
            " ELSE max_drawdown_cents * 10000 DIV peak_cents END"
            " AS drawdown_bp_of_peak",
        )
        .orderBy("event_type")
    )


QUERIES["w_max_drawdown"] = w_max_drawdown

ORACLES["w_max_drawdown"] = """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(SUM(round(value * 100)) AS BIGINT) AS v
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    curve AS (
        SELECT event_type, d,
               SUM(CASE WHEN day(d) % 2 = 0 THEN v ELSE -v END)
                   OVER w AS cum
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    dd AS (
        SELECT event_type,
               MAX(cum) OVER w - cum AS dd,
               MAX(cum) OVER w AS peak
        FROM curve
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(CASE WHEN MAX(peak) <= 0 THEN NULL
                ELSE MAX(dd) * 10000 // MAX(peak) END AS BIGINT)
               AS drawdown_bp_of_peak
    FROM dd
    GROUP BY event_type
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 2. longest activity streaks
# ---------------------------------------------------------------------------
def ev_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, top 20 — the
    engagement leaderboard (and the classic gaps-and-islands exercise):
    island id = day rank − day index, streak = island size. One
    per-user window over DISTINCT active days (bounded by the calendar,
    not event volume)."""
    days = (
        load(spark, sf_dir, "events")
        .selectExpr("user_id", "date_trunc('day', ts) AS d")
        .distinct()
    )
    wseq = W.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id", "d",
        F.expr(
            "datediff(d, TIMESTAMP '1970-01-01')"
        ).alias("epoch_d"),
        F.row_number().over(wseq).alias("rn"),
    ).selectExpr("user_id", "d", "epoch_d - rn AS island")
    streaks = (
        islands.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"),
             F.min("d").alias("start_d"))
    )
    wbest = W.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("start_d"))
    best = (
        streaks.withColumn("rn", F.row_number().over(wbest))
        .filter("rn = 1")
        .select("user_id", F.col("len").alias("longest_streak"),
                F.col("start_d").alias("streak_start"))
    )
    top = best.orderBy(
        F.desc("longest_streak"), F.asc("user_id")
    ).limit(20)
    wr = W.orderBy(F.desc("longest_streak"), F.asc("user_id"))
    return (
        top.withColumn("rank", F.row_number().over(wr).cast("int"))
        .select("rank", "user_id", "longest_streak", "streak_start")
        .orderBy("rank")
    )


QUERIES["ev_activity_streaks"] = ev_activity_streaks

ORACLES["ev_activity_streaks"] = """
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        FROM events
    ),
    islands AS (
        SELECT user_id, d,
               datediff('day', TIMESTAMP '1970-01-01', d)
               - row_number() OVER (PARTITION BY user_id ORDER BY d)
                   AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, COUNT(*) AS len, MIN(d) AS start_d
        FROM islands GROUP BY user_id, island
    ),
    best AS (
        SELECT user_id, len AS longest_streak, start_d AS streak_start
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY len DESC, start_d ASC) AS rn
            FROM streaks
        ) WHERE rn = 1
    )
    SELECT CAST(rn AS INT) AS rank, user_id,
           CAST(longest_streak AS BIGINT) AS longest_streak, streak_start
    FROM (
        SELECT *, row_number() OVER (
            ORDER BY longest_streak DESC, user_id ASC) AS rn
        FROM best
    ) WHERE rn <= 20
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 3. Bollinger-band breakouts
# ---------------------------------------------------------------------------
_BB_WIN = 7  # trailing days


def ts_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout days per event type: a day whose volume
    leaves the trailing-7-day mean ± 2σ band. The band test is fully
    cross-multiplied into exact integers — (n·x − S)² > 4·(n·Σx² − S²)
    ⇔ |x − μ| > 2σ — so no float mean/stddev ever materializes and
    both engines agree bit-for-bit. Trailing windows EXCLUDE the
    current day (the signal compares today against the preceding week);
    days without full history are skipped."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wtrail = (
        W.partitionBy("event_type").orderBy("d")
        .rowsBetween(-_BB_WIN, -1)
    )
    wn = W.partitionBy("event_type").orderBy("d")
    stats = daily.select(
        "event_type", "d", "x",
        F.sum("x").over(wtrail).alias("s"),
        F.sum(F.expr("x * x")).over(wtrail).alias("ss"),
        F.count(F.lit(1)).over(wtrail).alias("n"),
        F.row_number().over(wn).alias("rn"),
    ).filter(f"rn > {_BB_WIN}")
    return (
        stats.selectExpr(
            "event_type", "d", "x",
            "s DIV n AS trailing_mean",
            "CASE WHEN (n * x - s) * (n * x - s) > 4 * (n * ss - s * s)"
            " THEN CASE WHEN n * x > s THEN 'above' ELSE 'below' END"
            " END AS breakout",
        )
        .filter("breakout IS NOT NULL")
        .orderBy("event_type", "d")
    )


QUERIES["ts_bollinger_breakouts"] = ts_bollinger_breakouts

ORACLES["ts_bollinger_breakouts"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               COUNT(*) AS x
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    stats AS (
        SELECT event_type, d, x,
               SUM(x) OVER wt AS s,
               SUM(x * x) OVER wt AS ss,
               COUNT(*) OVER wt AS n,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
        WINDOW wt AS (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN {_BB_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, d, x,
           CAST(s // n AS BIGINT) AS trailing_mean,
           CASE WHEN (n * x - s) * (n * x - s) > 4 * (n * ss - s * s)
                THEN CASE WHEN n * x > s THEN 'above' ELSE 'below' END
           END AS breakout
    FROM stats
    WHERE rn > {_BB_WIN}
      AND (n * x - s) * (n * x - s) > 4 * (n * ss - s * s)
    ORDER BY event_type, d
"""
