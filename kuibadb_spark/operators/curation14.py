"""Round-4 batch 9 (final): market-concentration and mix-shift
reporting — the Herfindahl-Hirschman index, period-over-period share
shift, and weekday/weekend lift.

Registered after curation13 in registry._MODULES (rounds 4/5 grading
windows undisturbed; gradable from round 6). Determinism rules are
curation5-13's: ppm-integer shares before any cross-row arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. Herfindahl-Hirschman concentration index
# ---------------------------------------------------------------------------
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI per region: the sum of squared nation revenue shares — the
    antitrust-standard concentration scalar (10000 = monopoly, <1500 =
    competitive). Shares quantize to basis points FIRST (integer cents
    revenue, bp = rev·10000 // regional total), so the squared-share
    sum is exact in both engines; the two-level groupBy is the
    canonical partial-aggregated rollup."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.expr("CAST(SUM(round(o_totalprice * 100)) AS BIGINT)")
             .alias("rev_c"))
    )
    wreg = W.partitionBy("r_name").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    return (
        nat.withColumn("tot_c", F.sum("rev_c").over(wreg))
        .selectExpr("r_name", "rev_c * 10000 DIV tot_c AS share_bp")
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum(F.expr("share_bp * share_bp DIV 10000")).alias("hhi"),
            F.max("share_bp").alias("top_share_bp"),
        )
        .orderBy("r_name")
    )


QUERIES["agg_hhi_concentration"] = agg_hhi_concentration

ORACLES["agg_hhi_concentration"] = """
    WITH nat AS (
        SELECT r.r_name, n.n_name,
               CAST(SUM(round(o.o_totalprice * 100)) AS BIGINT) AS rev_c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    ),
    shares AS (
        SELECT r_name,
               rev_c * 10000 // (SUM(rev_c) OVER (PARTITION BY r_name))
                   AS share_bp
        FROM nat
    )
    SELECT r_name, COUNT(*) AS n_nations,
           CAST(SUM(share_bp * share_bp // 10000) AS BIGINT) AS hhi,
           CAST(MAX(share_bp) AS BIGINT) AS top_share_bp
    FROM shares
    GROUP BY r_name
    ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# 2. period-over-period mix shift
# ---------------------------------------------------------------------------
def ev_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic mix shift between the observation month's halves: each
    event type's share of total volume in half 1 vs half 2 and the
    ppm delta — the mix-shift table that explains 'the blended metric
    moved because the MIX moved, not the segments' (the denominator
    behind every Simpson's-paradox incident). Exact ppm integers from
    one groupBy + two window totals."""
    counts = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CASE WHEN day(ts) <= 15 THEN 1 ELSE 2 END AS half",
        )
        .groupBy("event_type", "half")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wh = W.partitionBy("half").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    shares = counts.withColumn("tot", F.sum("c").over(wh)).selectExpr(
        "event_type", "half", "c * 1000000 DIV tot AS share_ppm"
    )
    h1 = shares.filter("half = 1").selectExpr(
        "event_type", "share_ppm AS share_h1_ppm")
    h2 = shares.filter("half = 2").selectExpr(
        "event_type", "share_ppm AS share_h2_ppm")
    return (
        h1.join(h2, "event_type", "full")
        .selectExpr(
            "event_type",
            "COALESCE(share_h1_ppm, 0) AS share_h1_ppm",
            "COALESCE(share_h2_ppm, 0) AS share_h2_ppm",
            "COALESCE(share_h2_ppm, 0) - COALESCE(share_h1_ppm, 0)"
            " AS shift_ppm",
        )
        .orderBy("event_type")
    )


QUERIES["ev_mix_shift"] = ev_mix_shift

ORACLES["ev_mix_shift"] = """
    WITH counts AS (
        SELECT event_type,
               CASE WHEN day(ts) <= 15 THEN 1 ELSE 2 END AS half,
               COUNT(*) AS c
        FROM events
        GROUP BY event_type, CASE WHEN day(ts) <= 15 THEN 1 ELSE 2 END
    ),
    shares AS (
        SELECT event_type, half,
               CAST(c * 1000000 // (SUM(c) OVER (PARTITION BY half))
                    AS BIGINT) AS share_ppm
        FROM counts
    ),
    h1 AS (SELECT event_type, share_ppm AS share_h1_ppm
           FROM shares WHERE half = 1),
    h2 AS (SELECT event_type, share_ppm AS share_h2_ppm
           FROM shares WHERE half = 2)
    SELECT event_type,
           COALESCE(h1.share_h1_ppm, 0) AS share_h1_ppm,
           COALESCE(h2.share_h2_ppm, 0) AS share_h2_ppm,
           COALESCE(h2.share_h2_ppm, 0) - COALESCE(h1.share_h1_ppm, 0)
               AS shift_ppm
    FROM h1 FULL JOIN h2 USING (event_type)
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 3. weekday/weekend lift
# ---------------------------------------------------------------------------
def ts_weekday_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type weekday-vs-weekend demand profile: average daily volume
    on weekdays vs weekend days and the lift in ppm — the seasonality
    scalar behind staffing/capacity plans (and the sanity anchor for
    ts_periodogram_peak's weekly-cycle detection). Day-count
    normalization keeps it calendar-exact: integer event counts over
    integer distinct-day counts, one final ratio each."""
    daily = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "date_trunc('day', ts) AS d",
            # align to DuckDB: Sunday=0..Saturday=6; weekend = {0, 6}
            "dayofweek(ts) - 1 AS dow",
        )
        .groupBy("event_type", "d", "dow")
        .agg(F.count(F.lit(1)).alias("c"))
        .selectExpr(
            "event_type", "c",
            "CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END AS is_weekend",
        )
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.sum(F.expr("CASE WHEN is_weekend = 0 THEN c ELSE 0 END"))
            .alias("wd_events"),
            F.sum(F.expr("CASE WHEN is_weekend = 0 THEN 1 ELSE 0 END"))
            .alias("wd_days"),
            F.sum(F.expr("CASE WHEN is_weekend = 1 THEN c ELSE 0 END"))
            .alias("we_events"),
            F.sum(F.expr("CASE WHEN is_weekend = 1 THEN 1 ELSE 0 END"))
            .alias("we_days"),
        )
        .selectExpr(
            "event_type", "wd_events", "wd_days", "we_events", "we_days",
            # lift of weekday daily-average over weekend daily-average.
            # Guard BOTH zero factors of the denominator: weekend-only
            # activity gives wd_days = 0, and Spark's DIV would return
            # NULL while DuckDB's // raises division-by-zero — the guard
            # must short-circuit identically in both engines.
            "CASE WHEN we_events = 0 OR wd_days = 0 THEN NULL"
            " ELSE wd_events * we_days * 1000000 DIV (we_events * wd_days)"
            " END AS weekday_lift_ppm",
        )
        .orderBy("event_type")
    )


QUERIES["ts_weekday_weekend_lift"] = ts_weekday_weekend_lift

ORACLES["ts_weekday_weekend_lift"] = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                   AS is_weekend,
               COUNT(*) AS c
        FROM events
        GROUP BY event_type, date_trunc('day', ts),
                 CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN is_weekend = 0 THEN c ELSE 0 END) AS BIGINT)
               AS wd_events,
           CAST(SUM(CASE WHEN is_weekend = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS wd_days,
           CAST(SUM(CASE WHEN is_weekend = 1 THEN c ELSE 0 END) AS BIGINT)
               AS we_events,
           CAST(SUM(CASE WHEN is_weekend = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS we_days,
           CAST(CASE WHEN SUM(CASE WHEN is_weekend = 1 THEN c ELSE 0 END) = 0
                     OR SUM(CASE WHEN is_weekend = 0 THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE SUM(CASE WHEN is_weekend = 0 THEN c ELSE 0 END)
                     * SUM(CASE WHEN is_weekend = 1 THEN 1 ELSE 0 END)
                     * 1000000
                     // (SUM(CASE WHEN is_weekend = 1 THEN c ELSE 0 END)
                     * SUM(CASE WHEN is_weekend = 0 THEN 1 ELSE 0 END))
                END AS BIGINT) AS weekday_lift_ppm
    FROM daily
    GROUP BY event_type
    ORDER BY event_type
"""
