"""Temporal operators: the date/time scalar family, as-of join, range
join via bucketization, and multi-granularity (hypertable-style) rollups.

The reference has no time types at all (SURVEY.md §1.2 — no
timestamp/interval); this is target surface required by the fixtures
(events.ts, l_shipdate, o_orderdate).

As-of join is the canonical "operator Spark lacks": implemented as the
scalable union-tag-window composition (tag both streams, one shuffle on
the key, last-non-null carry-forward over event time) — not a pairwise
join. The oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, which pins the
semantics independently of our construction.

Range join: the scalable form is bucketization (floor(value/width) →
equi-join / direct group) while the oracle states the naive inequality
join — same answer, different asymptotics; .explain shows no
BroadcastNestedLoop in ours.

Cross-engine notes: dayofweek conventions differ (Spark Sunday=1,
DuckDB Sunday=0) — adjusted explicitly; date formatting uses
date_format↔strftime pattern pairs that agree.

Scale notes: as-of = one shuffle on (key) + per-partition ordered scan;
rollup = grouping-sets over precomputed truncations (one shuffle);
bucketized range join has no inequality predicates anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# date/time scalar family over orders/lineitem timestamps
# --------------------------------------------------------------------------
def time_scalar_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.selectExpr(
            "o_orderkey",
            "o_orderdate",
            "year(o_orderdate) AS y",
            "month(o_orderdate) AS m",
            "day(o_orderdate) AS d",
            "hour(o_orderdate) AS h",
            "quarter(o_orderdate) AS q",
            "dayofweek(o_orderdate) - 1 AS dow",  # align to DuckDB Sunday=0
            "dayofyear(o_orderdate) AS doy",
            "date_trunc('MONTH', o_orderdate) AS month_start",
            "date_trunc('WEEK', o_orderdate) AS week_start",
            "o_orderdate + INTERVAL 90 DAY AS due_date",
            "o_orderdate - INTERVAL 1 MONTH AS prev_month",
            "datediff(DATE '2002-01-01', CAST(o_orderdate AS DATE)) AS days_to_2002",
            "date_format(o_orderdate, 'yyyy-MM-dd') AS iso_day",
            "CAST(o_orderdate AS DATE) AS just_date",
        )
        .filter(F.col("o_orderkey") < 300)
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# as-of join: each purchase matched to the user's latest prior view
# --------------------------------------------------------------------------
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("ts"), F.col("value").alias("view_value"),
        F.lit(0).alias("tag"), F.col("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("double").alias("view_value"),
        F.lit(1).alias("tag"), "event_id",
    )
    merged = views.unionAll(purchases)
    # views sort before purchases at equal ts (tag asc) so an exact-tie view
    # is visible to the purchase — matching ASOF's >= semantics
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "last_view_value", F.last("view_value", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("tag") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "last_view_value",
        )
        .orderBy("user_id", "purchase_ts", "purchase_id")
    )


# --------------------------------------------------------------------------
# range join via bucketization: event values into fixed price bands
# --------------------------------------------------------------------------
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # scalable form: derive the band key directly — an equi-group, not an
    # inequality join (oracle states the naive BETWEEN join)
    return (
        e.withColumn("band_id", F.floor(F.col("value") / 50.0).cast("int"))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("min_v"),
            F.round(F.max("value"), 2).alias("max_v"),
        )
        .withColumn("band_lo", (F.col("band_id") * 50.0))
        .withColumn("band_hi", (F.col("band_id") * 50.0 + 50.0))
        .select("band_id", "band_lo", "band_hi", "n", "min_v", "max_v")
        .orderBy("band_id")
    )


# --------------------------------------------------------------------------
# hypertable-style multi-granularity rollup (hour/day/month in one pass)
# --------------------------------------------------------------------------
def rollup_multigranularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("ks_events_rollup")
    return spark.sql(
        """
        WITH base AS (
            SELECT date_trunc('HOUR', ts)  AS h,
                   date_trunc('DAY', ts)   AS d,
                   date_trunc('MONTH', ts) AS mo,
                   value
            FROM ks_events_rollup
        )
        SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                    WHEN grouping(d) = 0 THEN 'day'
                    ELSE 'month' END AS granularity,
               coalesce(h, d, mo) AS bucket,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM base
        GROUP BY GROUPING SETS ((h), (d), (mo))
        ORDER BY granularity, bucket
        """
    )


# --------------------------------------------------------------------------
# gap fill + LOCF: dense hourly spine per event_type, carry last observation
# forward into empty hours (the TimescaleDB time_bucket_gapfill/locf shape)
# --------------------------------------------------------------------------
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-type hourly series: hours with no events get the previous
    hour's value (LOCF), leading gaps get 0. Integer-cents sums — float
    sum order differs across engines.

    Scale shape: the hourly aggregate is ONE shuffle of events; the spine
    is sequence() over a two-row global min/max (broadcast), exploded per
    event_type — spine size = types × hours, metadata-scale no matter the
    event count. The LOCF window shuffles only the dense spine, not the
    raw events."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.col("event_type"), F.date_trunc("HOUR", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))

    bounds = e.agg(
        F.date_trunc("HOUR", F.min("ts")).alias("lo"),
        F.date_trunc("HOUR", F.max("ts")).alias("hi"),
    )
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            (F.col("cents").isNull()).alias("filled"),
            F.coalesce(
                F.last("cents", ignorenulls=True).over(w), F.lit(0)
            ).alias("cents_locf"),
        )
        .orderBy("event_type", "h")
    )


QUERIES = {
    "time_scalar_family": time_scalar_family,
    "asof_purchase_last_view": asof_purchase_last_view,
    "range_join_value_bands": range_join_value_bands,
    "rollup_multigranularity": rollup_multigranularity,
    "ts_gap_fill_locf": ts_gap_fill_locf,
}

ORACLES = {
    "time_scalar_family": """
        SELECT o_orderkey, o_orderdate,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS d,
               CAST(hour(o_orderdate) AS INTEGER) AS h,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
               o_orderdate + INTERVAL 90 DAY AS due_date,
               o_orderdate - INTERVAL 1 MONTH AS prev_month,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                    AS INTEGER) AS days_to_2002,
               strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
               CAST(o_orderdate AS DATE) AS just_date
        FROM orders
        WHERE o_orderkey < 300
        ORDER BY o_orderkey
    """,
    "asof_purchase_last_view": """
        WITH views AS (
            SELECT user_id, ts, value AS view_value FROM events
            WHERE event_type = 'view'
        ), purchases AS (
            SELECT user_id, event_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.user_id,
               p.event_id AS purchase_id,
               p.ts AS purchase_ts,
               v.view_value AS last_view_value
        FROM purchases p
        ASOF LEFT JOIN views v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.user_id, purchase_ts, purchase_id
    """,
    "range_join_value_bands": """
        WITH bands AS (
            SELECT band_id, CAST(band_id * 50.0 AS DOUBLE) AS band_lo,
                   CAST(band_id * 50.0 + 50.0 AS DOUBLE) AS band_hi
            FROM (SELECT CAST(unnest(generate_series(0, 99)) AS INTEGER) AS band_id)
        )
        SELECT band_id, band_lo, band_hi,
               count(*) AS n,
               round(min(value), 2) AS min_v,
               round(max(value), 2) AS max_v
        FROM events JOIN bands
          ON value >= band_lo AND value < band_hi
        GROUP BY band_id, band_lo, band_hi
        ORDER BY band_id
    """,
    "rollup_multigranularity": """
        WITH base AS (
            SELECT date_trunc('hour', ts)  AS h,
                   date_trunc('day', ts)   AS d,
                   date_trunc('month', ts) AS mo,
                   value
            FROM events
        )
        SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                    WHEN grouping(d) = 0 THEN 'day'
                    ELSE 'month' END AS granularity,
               coalesce(h, d, mo) AS bucket,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM base
        GROUP BY GROUPING SETS ((h), (d), (mo))
        ORDER BY granularity, bucket
    """,
    "ts_gap_fill_locf": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        ),
        bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ),
        spine AS (
            SELECT t.event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM (SELECT DISTINCT event_type FROM events) t, bounds
        )
        SELECT s.event_type, s.h,
               cents IS NULL AS filled,
               CAST(coalesce(
                   last_value(cents IGNORE NULLS) OVER (
                       PARTITION BY s.event_type ORDER BY s.h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   0) AS BIGINT) AS cents_locf
        FROM spine s LEFT JOIN hourly USING (event_type, h)
        ORDER BY s.event_type, s.h
    """,
}


# --------------------------------------------------------------------------
# SCD2 dimension build: per-user state history with validity intervals
# --------------------------------------------------------------------------
def ev_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event log: each user's
    event_type stream is compressed to its change points (consecutive
    repeats collapse — gaps-and-islands), then every state row gets
    [valid_from, valid_to) via lead(), an is_current flag, and a version
    number — the standard CDC→warehouse dimension materialization.

    One shuffle on user_id; both windows (change detection, lead) share
    that partitioning, so Catalyst plans a single exchange + one sort.
    At 100 TB this is the canonical 'rebuild the dimension from the
    log' batch: linear, key-partitioned, no self-join (the naive SCD2
    spelling is an inequality self-join — quadratic per user)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "ts", "event_id", F.col("event_type").alias("state"))
        .withColumn("prev_state", F.lag("state").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("state") != F.col("prev_state"))
        )
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.withColumn("version", F.row_number().over(w2))
        .withColumn("valid_to", F.lead("ts").over(w2))
        .select(
            "user_id",
            "version",
            "state",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


QUERIES["ev_scd2_user_state"] = ev_scd2_user_state

ORACLES["ev_scd2_user_state"] = """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type AS state,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ),
    changes AS (
        SELECT user_id, ts, event_id, state FROM ordered
        WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id,
           CAST(row_number() OVER w AS INTEGER) AS version,
           state,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version
"""


# --------------------------------------------------------------------------
# interval merge: union of overlapping per-user activity intervals
# --------------------------------------------------------------------------
def ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping intervals (each event spans [ts, ts+5min)):
    the island detection runs on exact integer microseconds — a new
    island starts where an event's start exceeds the running max end of
    all earlier intervals (cummax window), island ids are a running sum
    of those breaks, and each merged interval aggregates its members.
    The calendar/uptime/coverage primitive; one user_id shuffle, two
    windows sharing its sort, then a groupBy."""
    e = load(spark, sf_dir, "events")
    iv = e.selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS s",
        "unix_micros(CAST(ts AS TIMESTAMP)) + 300000000 AS e",
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_end = F.max("e").over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("s") > prev_max_end), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        islands.groupBy("user_id", "island")
        .agg(
            F.min("s").alias("start_us"),
            F.max("e").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .selectExpr(
            "user_id",
            "island",
            "start_us",
            "end_us",
            "(end_us - start_us) div 1000000 AS duration_s",
            "n_events",
        )
        .orderBy("user_id", "island")
    )


QUERIES["ts_interval_merge"] = ts_interval_merge

ORACLES["ts_interval_merge"] = """
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e,
               event_id
        FROM events
    ),
    flagged AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                    OR s > max(e) OVER (PARTITION BY user_id
                        ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           min(s) AS start_us, max(e) AS end_us,
           (max(e) - min(s)) // 1000000 AS duration_s,
           count(*) AS n_events
    FROM islands
    GROUP BY user_id, island
    ORDER BY user_id, island
"""


# --------------------------------------------------------------------------
# gap fill by LINEAR INTERPOLATION (the LOCF op's numeric sibling)
# --------------------------------------------------------------------------
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-type hourly series where missing hours take the linear
    interpolation between the surrounding observed hours (leading gaps
    take the next value, trailing the previous). Same metadata-scale
    spine as ts_gap_fill_locf; the interpolation is integer-cents
    cross-multiplication with truncating div (Spark `div` == DuckDB `//`
    on negatives too — probed rule, functions/scalar.py header), so the
    filled values are bit-identical across engines — a float slope would
    not be."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.col("event_type"), F.date_trunc("HOUR", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    bounds = e.agg(
        F.date_trunc("HOUR", F.min("ts")).alias("lo"),
        F.date_trunc("HOUR", F.max("ts")).alias("hi"),
    )
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    wp = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    hep = F.expr("CAST(unix_timestamp(h) div 3600 AS BIGINT)")
    obs_h = F.when(F.col("cents").isNotNull(), hep)
    dense = (
        spine.join(hourly, ["event_type", "h"], "left")
        .withColumn("hep", hep)
        .withColumn("pc", F.last("cents", ignorenulls=True).over(wp))
        .withColumn("ph", F.last(obs_h, ignorenulls=True).over(wp))
        .withColumn("nc", F.first("cents", ignorenulls=True).over(wn))
        .withColumn("nh", F.first(obs_h, ignorenulls=True).over(wn))
    )
    interp = (
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .when(F.col("pc").isNull(), F.coalesce(F.col("nc"), F.lit(0)))
        .when(F.col("nc").isNull(), F.col("pc"))
        .otherwise(
            F.col("pc")
            + F.expr("(nc - pc) * (hep - ph) div (nh - ph)")
        )
    )
    return (
        dense.select(
            "event_type",
            "h",
            F.col("cents").isNull().alias("filled"),
            interp.cast("bigint").alias("cents_interp"),
        )
        .orderBy("event_type", "h")
    )


QUERIES["ts_gap_fill_interpolate"] = ts_gap_fill_interpolate

ORACLES["ts_gap_fill_interpolate"] = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events
        GROUP BY event_type, h
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM (SELECT DISTINCT event_type FROM events) t, bounds
    ),
    dense AS (
        SELECT s.event_type, s.h, cents,
               epoch_us(s.h) // 3600000000 AS hep,
               last_value(cents IGNORE NULLS) OVER wp AS pc,
               last_value(CASE WHEN cents IS NOT NULL
                               THEN epoch_us(s.h) // 3600000000 END IGNORE NULLS)
                   OVER wp AS ph,
               first_value(cents IGNORE NULLS) OVER wn AS nc,
               first_value(CASE WHEN cents IS NOT NULL
                                THEN epoch_us(s.h) // 3600000000 END IGNORE NULLS)
                   OVER wn AS nh
        FROM spine s LEFT JOIN hourly USING (event_type, h)
        WINDOW wp AS (PARTITION BY s.event_type ORDER BY s.h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY s.event_type ORDER BY s.h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h,
           cents IS NULL AS filled,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
                     WHEN pc IS NULL THEN coalesce(nc, 0)
                     WHEN nc IS NULL THEN pc
                     ELSE pc + (nc - pc) * (hep - ph) // (nh - ph)
                END AS BIGINT) AS cents_interp
    FROM dense
    ORDER BY event_type, h
"""


# --------------------------------------------------------------------------
# forward as-of join: each purchase matched to the user's NEXT view
# --------------------------------------------------------------------------
def asof_purchase_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forward direction of the as-of join (asof_purchase_last_view
    mirrors backward): each purchase paired with the user's first view
    AT OR AFTER it, plus the wait in whole seconds — the time-to-next-
    touch metric behind abandonment/attribution models. Same scalable
    union-tag-window composition, with the carry running over the
    FOLLOWING frame; the wait is exact integer microseconds divided to
    seconds (truncating div, engine-identical)."""
    e = load(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "value AS view_value",
        "0 AS tag",
        "event_id",
    )
    purchases = e.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(NULL AS DOUBLE) AS view_value",
        "1 AS tag",
        "event_id",
    )
    merged = views.unionAll(purchases)
    # views sort AFTER purchases at equal us (tag desc in a forward scan
    # means: ordering asc by (us, -tag) puts the purchase first, so an
    # exact-tie view is visible to it — ASOF's >= mirrored)
    w = (
        W.partitionBy("user_id")
        .orderBy("us", F.desc("tag"), "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = merged.withColumn(
        "next_view_value", F.first("view_value", ignorenulls=True).over(w)
    ).withColumn(
        "next_view_us",
        F.first(
            F.when(F.col("view_value").isNotNull(), F.col("us")), ignorenulls=True
        ).over(w),
    )
    return (
        carried.filter(F.col("tag") == 1)
        .selectExpr(
            "user_id",
            "event_id AS purchase_id",
            "next_view_value",
            "CAST((next_view_us - us) div 1000000 AS BIGINT) AS wait_s",
        )
        .orderBy("user_id", "purchase_id")
    )


QUERIES["asof_purchase_next_view"] = asof_purchase_next_view

ORACLES["asof_purchase_next_view"] = """
    WITH merged AS (
        SELECT user_id, epoch_us(ts) AS us, value AS view_value,
               0 AS tag, event_id
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, epoch_us(ts), NULL, 1, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    carried AS (
        SELECT user_id, us, tag, event_id,
               first_value(view_value IGNORE NULLS) OVER w
                   AS next_view_value,
               first_value(CASE WHEN view_value IS NOT NULL THEN us END
                           IGNORE NULLS) OVER w AS next_view_us
        FROM merged
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY us, tag DESC, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id AS purchase_id, next_view_value,
           CAST((next_view_us - us) // 1000000 AS BIGINT) AS wait_s
    FROM carried WHERE tag = 1
    ORDER BY user_id, purchase_id
"""


# ---------------------------------------------------------------------------
# seasonal decomposition (STL-lite): trend + day-of-week seasonal + residual
# ---------------------------------------------------------------------------
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily order-count series —
    the STL shape with exact integer arithmetic so both engines agree
    bit-for-bit: trend = centered 7-day moving SUM ×1e6 div 7 (emitted
    only for FULL windows, the standard edge rule), seasonal = per
    day-of-week mean deviation from trend (×1e6, integer div), residual
    = value×1e6 − trend − seasonal. The decomposition every forecasting
    pipeline starts from, as three window/groupBy passes.

    Scale shape: the series is one row per DAY (bounded by calendar, not
    order volume) after one partial-agg groupBy; the moving window and
    the day-of-week means run on that compact frame. At 100 TB the only
    fact-proportional stage is the first groupBy."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("DAY", "o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w7 = W.orderBy("d").rowsBetween(-3, 3)
    trended = (
        daily.withColumn("wn", F.count(F.lit(1)).over(w7))
        .withColumn("wsum", F.sum("n").over(w7))
        .filter(F.col("wn") == 7)
        .selectExpr("d", "n", "(wsum * 1000000) div 7 AS trend_e6")
    )
    dev = trended.withColumn(
        "dow", F.dayofweek("d")
    ).withColumn("dev_e6", F.expr("n * 1000000 - trend_e6"))
    seasonal = dev.groupBy("dow").agg(
        F.expr("sum(dev_e6) div count(1)").alias("seasonal_e6")
    )
    return (
        dev.join(F.broadcast(seasonal), "dow")
        .selectExpr(
            "d",
            "n",
            "trend_e6",
            "seasonal_e6",
            "n * 1000000 - trend_e6 - seasonal_e6 AS residual_e6",
        )
        .orderBy("d")
    )


QUERIES["ts_seasonal_decompose"] = ts_seasonal_decompose

ORACLES["ts_seasonal_decompose"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
               count(*) AS n
        FROM orders GROUP BY 1
    ),
    trended AS (
        SELECT d, n, (wsum * 1000000) // 7 AS trend_e6 FROM (
            SELECT d, n,
                   count(*) OVER (ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn,
                   sum(n) OVER (ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wsum
            FROM daily
        ) WHERE wn = 7
    ),
    dev AS (
        SELECT d, n, trend_e6, dayofweek(d) + 1 AS dow,
               n * 1000000 - trend_e6 AS dev_e6
        FROM trended
    ),
    seasonal AS (
        SELECT dow, CAST(sum(dev_e6) // count(*) AS BIGINT) AS seasonal_e6
        FROM dev GROUP BY dow
    )
    SELECT dev.d, dev.n,
           CAST(dev.trend_e6 AS BIGINT) AS trend_e6,
           seasonal.seasonal_e6,
           CAST(dev.n * 1000000 - dev.trend_e6 - seasonal.seasonal_e6
                AS BIGINT) AS residual_e6
    FROM dev JOIN seasonal USING (dow)
    ORDER BY d
"""


# ---------------------------------------------------------------------------
# nearest as-of join: min |Δt| across both directions (merge_asof 'nearest')
# ---------------------------------------------------------------------------
def asof_purchase_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third merge_asof direction ('nearest', completing
    backward/forward): each purchase pairs with the view minimizing
    |ts_view − ts_purchase|, distance ties resolved backward (the
    pandas rule). One union scan + TWO window passes over the same
    (user, ts, tag, id) exchange — the carried struct keeps the view's
    ts/value/id together so the pick is a row-local integer-microsecond
    comparison; no join ever forms, same as the other as-of spellings.
    Within-timestamp view ties are pinned by event_id (backward carries
    the highest, forward the lowest) so the answer is fully
    deterministic in both engines."""
    e = load(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts",
        F.struct(
            F.col("ts").alias("vts"),
            F.col("value").alias("vv"),
            F.col("event_id").alias("vid"),
        ).alias("vs"),
        F.lit(0).alias("tag"), F.col("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(None).cast("struct<vts:timestamp_ntz,vv:double,vid:bigint>").alias(
            "vs"
        ),
        F.lit(1).alias("tag"), "event_id",
    )
    merged = views.unionAll(purchases)
    order = [F.col("ts"), F.col("tag"), F.col("event_id")]
    w_b = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_f = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = merged.withColumn(
        "b", F.last("vs", ignorenulls=True).over(w_b)
    ).withColumn("f", F.first("vs", ignorenulls=True).over(w_f))
    return (
        carried.filter(F.col("tag") == 1)
        .selectExpr(
            "user_id",
            "event_id AS purchase_id",
            "ts AS purchase_ts",
            "CASE WHEN b IS NULL THEN f"
            " WHEN f IS NULL THEN b"
            " WHEN unix_micros(CAST(ts AS TIMESTAMP))"
            "      - unix_micros(CAST(b.vts AS TIMESTAMP))"
            "      <= unix_micros(CAST(f.vts AS TIMESTAMP))"
            "      - unix_micros(CAST(ts AS TIMESTAMP)) THEN b"
            " ELSE f END AS nv",
        )
        .selectExpr(
            "user_id",
            "purchase_id",
            "purchase_ts",
            "nv.vv AS nearest_view_value",
            "nv.vid AS nearest_view_id",
            "abs(unix_micros(CAST(nv.vts AS TIMESTAMP))"
            " - unix_micros(CAST(purchase_ts AS TIMESTAMP))) AS dist_us",
        )
        .orderBy("user_id", "purchase_ts", "purchase_id")
    )


QUERIES["asof_purchase_nearest_view"] = asof_purchase_nearest_view

ORACLES["asof_purchase_nearest_view"] = """
    WITH merged AS (
        SELECT user_id, ts, ts AS vts, value AS vv, event_id AS vid,
               0 AS tag, event_id
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts, NULL, NULL, NULL, 1, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    carried AS (
        SELECT user_id, ts, tag, event_id,
               last_value(vts IGNORE NULLS) OVER wb AS b_vts,
               last_value(vv IGNORE NULLS) OVER wb AS b_vv,
               last_value(vid IGNORE NULLS) OVER wb AS b_vid,
               first_value(vts IGNORE NULLS) OVER wf AS f_vts,
               first_value(vv IGNORE NULLS) OVER wf AS f_vv,
               first_value(vid IGNORE NULLS) OVER wf AS f_vid
        FROM merged
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, tag, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts, tag, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    picked AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               CASE WHEN b_vts IS NULL THEN f_vv
                    WHEN f_vts IS NULL THEN b_vv
                    WHEN epoch_us(ts) - epoch_us(b_vts)
                         <= epoch_us(f_vts) - epoch_us(ts) THEN b_vv
                    ELSE f_vv END AS nearest_view_value,
               CASE WHEN b_vts IS NULL THEN f_vid
                    WHEN f_vts IS NULL THEN b_vid
                    WHEN epoch_us(ts) - epoch_us(b_vts)
                         <= epoch_us(f_vts) - epoch_us(ts) THEN b_vid
                    ELSE f_vid END AS nearest_view_id,
               CASE WHEN b_vts IS NULL THEN f_vts
                    WHEN f_vts IS NULL THEN b_vts
                    WHEN epoch_us(ts) - epoch_us(b_vts)
                         <= epoch_us(f_vts) - epoch_us(ts) THEN b_vts
                    ELSE f_vts END AS nearest_vts
        FROM carried WHERE tag = 1
    )
    SELECT user_id, purchase_id, purchase_ts,
           nearest_view_value, nearest_view_id,
           CAST(abs(epoch_us(nearest_vts) - epoch_us(purchase_ts))
                AS BIGINT) AS dist_us
    FROM picked
    ORDER BY user_id, purchase_ts, purchase_id
"""
