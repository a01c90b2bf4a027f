"""Event/time-series operators over the `events` table (FIXTURES.md):
JSON property extraction, tumbling/sliding/session time windows, and
exact stream dedup — the batch expressions of the streaming surface
(streaming/events.py runs the same logic incrementally).

The reference has no streams (SURVEY.md §1.4); this is target surface
(BASELINE.json north star). Semantics: Spark's window()/session_window()
are used in batch mode; oracles express the identical window algebra in
SQL (date_trunc / time_bucket / gaps-and-islands), which pins the
semantics engine-independently.

Scale notes: all window assignment is per-row expression work (no
shuffle); the aggregations shuffle on (window, key) — at 100 TB the
watermark/window grouping keys are high-cardinality so AQE handles
placement; sessionization shuffles once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# JSON property extraction (events.props is a JSON string — FIXTURES.md)
# --------------------------------------------------------------------------
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_big_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# tumbling window: window(ts, 1 hour) ≡ date_trunc('hour', ts)
# --------------------------------------------------------------------------
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("ws", "event_type")
    )


# --------------------------------------------------------------------------
# sliding window: 1 hour every 30 minutes (each event in 2 windows)
# --------------------------------------------------------------------------
def ev_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # integer-exact average: float round() at an exact half (e.g.
    # 73.91375) differs between engines (decimal-string vs float-multiply
    # rounding), so the average is emitted as truncated 1e-4 units via
    # integer floor division — order-independent and boundary-free
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("(sum(CAST(round(value * 100) AS BIGINT)) * 100)"
                   " div count(1)").alias("avg_value_e4"),
        )
        .select(F.col("w.start").alias("ws"), "n", "avg_value_e4")
        .orderBy("ws")
    )


# --------------------------------------------------------------------------
# session windows: gap-based sessionization (10-minute inactivity gap)
# --------------------------------------------------------------------------
def ev_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


# --------------------------------------------------------------------------
# exact dedup of an event stream (duplicate delivery → distinct rows)
# --------------------------------------------------------------------------
def ev_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dup = e.unionAll(e).unionAll(e.filter(F.col("event_id") % 3 == 0))
    return (
        dup.dropDuplicates()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_distinct_rows"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# anomaly detection: hourly counts per type vs the type's own z-score
# --------------------------------------------------------------------------
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flags hours whose event count deviates ≥1.5σ from that event
    type's hourly mean. mu/sigma use the integer-exact moment formula
    (sum, sum-of-squares are exact BIGINTs; var = E[n²] − mu², all
    remaining ops are single IEEE operations) — deterministic across
    engines, unlike stddev_pop whose partial-merge order varies.

    Scale: two partial-aggregated shuffles (hour×type, then type); the
    per-type stats table is tiny → broadcast back onto the hourly counts."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count(F.lit(1)).alias("cnt"),
    )
    mu = F.col("s1") / F.col("cnt")
    var = F.col("s2") / F.col("cnt") - mu * mu
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .withColumn("mu", F.round(mu, 4))
        .withColumn("z", F.round((F.col("n") - mu) / F.sqrt(var), 4))
        .filter(F.abs(F.col("z")) >= 1.5)
        .select("event_type", "hr", "n", "mu", "z")
        .orderBy("event_type", "hr")
    )


QUERIES = {
    "ev_json_extract": ev_json_extract,
    "ev_tumbling_hourly": ev_tumbling_hourly,
    "ev_sliding_hourly": ev_sliding_hourly,
    "ev_session_windows": ev_session_windows,
    "ev_dedup_exact": ev_dedup_exact,
    "ev_anomaly_zscore": ev_anomaly_zscore,
}

_SESSION_GAI = """
    WITH ordered AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
"""

ORACLES = {
    "ev_json_extract": """
        SELECT event_type, count(*) AS n,
               min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
               CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_big_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "ev_tumbling_hourly": """
        SELECT date_trunc('hour', ts) AS ws, event_type,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM events
        GROUP BY ws, event_type
        ORDER BY ws, event_type
    """,
    "ev_sliding_hourly": """
        SELECT ws, count(*) AS n,
               CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 100)
                    // count(*) AS BIGINT) AS avg_value_e4
        FROM (
            SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts)
                               - INTERVAL 30 MINUTE]) AS ws
                 , value
            FROM events
        )
        GROUP BY ws
        ORDER BY ws
    """,
    "ev_anomaly_zscore": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n
            FROM events GROUP BY hr, event_type
        ),
        stats AS (
            SELECT event_type, sum(n) AS s1, sum(n * n) AS s2,
                   count(*) AS cnt
            FROM hourly GROUP BY event_type
        )
        SELECT event_type, hr, n,
               round(s1 / cnt, 4) AS mu,
               round((n - s1 / cnt)
                     / sqrt(s2 / cnt - (s1 / cnt) * (s1 / cnt)), 4) AS z
        FROM hourly JOIN stats USING (event_type)
        WHERE abs(round((n - s1 / cnt)
                  / sqrt(s2 / cnt - (s1 / cnt) * (s1 / cnt)), 4)) >= 1.5
        ORDER BY event_type, hr
    """,
    "ev_session_windows": _SESSION_GAI,
    "ev_dedup_exact": """
        SELECT event_type, count(*) AS n_distinct_rows
        FROM (
            SELECT DISTINCT * FROM (
                SELECT * FROM events
                UNION ALL SELECT * FROM events
                UNION ALL SELECT * FROM events WHERE event_id % 3 = 0
            )
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
}


# --------------------------------------------------------------------------
# trending: hour-over-hour rank movement per event type (lag over rank)
# --------------------------------------------------------------------------
def ev_trending_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types are rising or falling hour over hour: rank types
    by count within each hour, then diff against the type's previous
    hour's rank (window-over-window composition). Integer-only outputs.

    Scale: both windows partition on high-cardinality keys (hour;
    event_type) — no single-reducer stage; the hourly pre-aggregation
    is a partial-agged groupBy that shrinks data before any window."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hr"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w_rank = Window.partitionBy("hr").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    w_prev = Window.partitionBy("event_type").orderBy("hr")
    return (
        hourly.withColumn("rnk", F.row_number().over(w_rank))
        .withColumn("prev_rnk", F.lag("rnk").over(w_prev))
        .withColumn("delta", F.coalesce(F.col("prev_rnk") - F.col("rnk"),
                                        F.lit(0)))
        .select("hr", "event_type", "n", "rnk", "prev_rnk", "delta")
        .orderBy("hr", "rnk")
    )


QUERIES["ev_trending_types"] = ev_trending_types
ORACLES["ev_trending_types"] = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY hr, event_type
    ),
    ranked AS (
        SELECT hr, event_type, n,
               CAST(row_number() OVER (PARTITION BY hr
                    ORDER BY n DESC, event_type ASC) AS INTEGER) AS rnk
        FROM hourly
    )
    SELECT hr, event_type, n, rnk,
           CAST(lag(rnk) OVER (PARTITION BY event_type ORDER BY hr)
                AS INTEGER) AS prev_rnk,
           CAST(coalesce(lag(rnk) OVER (PARTITION BY event_type
                ORDER BY hr) - rnk, 0) AS INTEGER) AS delta
    FROM ranked
    ORDER BY hr, rnk
"""


# --------------------------------------------------------------------------
# per-user state-transition (Markov) counts over the event stream
# --------------------------------------------------------------------------
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix of user behavior: consecutive
    event_type pairs per user (lag over the user's time-ordered stream),
    counted globally, with the per-source-state transition share in
    exact 1e-6 units (integer cross-multiplied div — no float division
    drift). The row-pattern-mining primitive behind funnel/churn models.

    One shuffle on user_id for the lag window; the transition count is a
    map-side-combined groupBy on a 2-string key; the per-source total
    rides a second window over from_state sharing nothing wider than the
    count rows."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("from_state", F.lag("event_type").over(w))
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", F.col("event_type").alias("to_state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = W.partitionBy("from_state")
    return (
        trans.withColumn("src_total", F.sum("n").over(w_src))
        .selectExpr(
            "from_state",
            "to_state",
            "n",
            "(1000000 * n) div src_total AS share_e6",
        )
        .orderBy("from_state", "to_state")
    )


QUERIES["ev_markov_transitions"] = ev_markov_transitions

ORACLES["ev_markov_transitions"] = """
    WITH trans AS (
        SELECT from_state, event_type AS to_state, count(*) AS n
        FROM (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS from_state
            FROM events
        )
        WHERE from_state IS NOT NULL
        GROUP BY from_state, to_state
    )
    SELECT from_state, to_state, n,
           CAST((1000000 * n) // sum(n) OVER (PARTITION BY from_state)
                AS BIGINT) AS share_e6
    FROM trans
    ORDER BY from_state, to_state
"""


# --------------------------------------------------------------------------
# sequential pattern matching (MATCH_RECOGNIZE analog): view→click→purchase
# --------------------------------------------------------------------------
def ev_pattern_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching Spark has no native operator for
    (SQL:2016 MATCH_RECOGNIZE): count 'conversion' clicks per user — a
    click with a view at most 24 hours BEFORE it and a purchase at
    most 24 hours AFTER it (the fixture's per-user event cadence is
    hours, so a sub-hour window would never fire — verified 240
    conversions at sf0.01 with this window, 0 with 30 minutes). Each user's stream is collected into one
    time-ordered array (deterministic: sorted on (epoch_us, event_id)
    structs) and the pattern is scanned ROW-LOCALLY with exists()
    lambdas — zero joins, O(events²) only within one collected array.

    SESSIONIZE-FIRST (the 100 TB form): sequences are assembled per
    (user, session) with a gap sessionizer whose gap equals the
    pattern window (24 h), not per user — semantics-preserving because
    the pattern window cannot span a session boundary (a split implies
    some consecutive gap > the window between the two events, so their
    distance already exceeds it). The collected array is therefore bounded by session
    length even for a pathological always-on user, and the quadratic
    scan never crosses a session. Cost: the sessionizer's lag/sum
    window and both groupBys hash on user_id-prefixed keys, so all
    three land on one user_id exchange (AQE reuses it)."""
    e = load(spark, sf_dir, "events")
    day = 24 * 3600 * 1_000_000
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    sess = (
        e.selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
            "event_id",
            "event_type AS et",
        )
        .withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > day),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w))
    )
    seq = (
        sess.selectExpr(
            "user_id", "sid",
            "named_struct('us', us, 'event_id', event_id, 'et', et) AS ev",
        )
        .groupBy("user_id", "sid")
        .agg(F.expr("array_sort(collect_list(ev))").alias("s"))
    )
    conv = (
        "aggregate(transform(s, c -> CASE WHEN c.et = 'click'"
        f" AND exists(s, v -> v.et = 'view' AND v.us <= c.us"
        f" AND c.us - v.us <= {day})"
        f" AND exists(s, p -> p.et = 'purchase' AND p.us >= c.us"
        f" AND p.us - c.us <= {day})"
        " THEN 1 ELSE 0 END), 0, (a, x) -> a + x)"
    )
    return (
        seq.selectExpr(
            "user_id", "size(s) AS ns", f"{conv} AS cs"
        )
        .groupBy("user_id")
        .agg(
            F.sum("ns").cast("int").alias("n_events"),
            F.sum("cs").cast("int").alias("n_conversions"),
        )
        .filter(F.col("n_conversions") > 0)
        .orderBy("user_id")
    )


QUERIES["ev_pattern_conversions"] = ev_pattern_conversions

ORACLES["ev_pattern_conversions"] = """
    WITH seq AS (
        SELECT user_id,
               list(struct_pack(us := epoch_us(ts), event_id := event_id,
                                et := event_type)
                    ORDER BY ts, event_id) AS s
        FROM events
        GROUP BY user_id
    ),
    scored AS (
        SELECT user_id,
               CAST(len(s) AS INTEGER) AS n_events,
               CAST(list_sum(list_transform(s, c ->
                   CASE WHEN c.et = 'click'
                        AND len(list_filter(s, v -> v.et = 'view'
                            AND v.us <= c.us
                            AND c.us - v.us <= 86400000000)) > 0
                        AND len(list_filter(s, p -> p.et = 'purchase'
                            AND p.us >= c.us
                            AND p.us - c.us <= 86400000000)) > 0
                   THEN 1 ELSE 0 END)) AS INTEGER) AS n_conversions
        FROM seq
    )
    SELECT user_id, n_events, n_conversions
    FROM scored
    WHERE n_conversions > 0
    ORDER BY user_id
"""


# --------------------------------------------------------------------------
# activity heatmap: day-of-week × hour matrix
# --------------------------------------------------------------------------
def ev_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix (the dashboard heatmap
    reduction): ISO weekday rows, 24 hour columns via pivot, integer
    counts — output cardinality fixed at 7×24 regardless of input size.
    One partial-aggregated groupBy; the pivot is a projection of the
    168-cell aggregate, not a second pass."""
    e = load(spark, sf_dir, "events")
    cells = e.selectExpr(
        "(dayofweek(ts) + 5) % 7 + 1 AS isodow",
        "hour(ts) AS hr",
    )
    return (
        cells.groupBy("isodow")
        .pivot("hr", list(range(24)))
        .count()
        .na.fill(0)
        .toDF("isodow", *[f"h{h}" for h in range(24)])
        .orderBy("isodow")
    )


QUERIES["ev_heatmap_dow_hour"] = ev_heatmap_dow_hour

ORACLES["ev_heatmap_dow_hour"] = (
    "SELECT CAST(isodow(ts) AS INT) AS isodow, "
    + ", ".join(
        f"CAST(count(*) FILTER (WHERE hour(ts) = {h}) AS BIGINT) AS h{h}"
        for h in range(24)
    )
    + " FROM events GROUP BY isodow ORDER BY isodow"
)


# --------------------------------------------------------------------------
# latest record per key (CDC compaction primitive)
# --------------------------------------------------------------------------
def ev_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-row retrieval: each user's single most recent event with
    its full payload — the CDC log-compaction primitive (the reduce that
    turns an append log into current state). One aggregation via
    max_by on the (ts, event_id) struct (associative, partial-aggregable
    — no window sort, no shuffle beyond the groupBy), deterministic
    under timestamp ties via the event_id tiebreak."""
    e = load(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return (
        e.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "ts", "event_type", "value"), key
            ).alias("last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_type").alias("last_type"),
            F.col("last.value").alias("last_value"),
            "n_events",
        )
        .orderBy("user_id")
    )


QUERIES["ev_latest_per_user"] = ev_latest_per_user

ORACLES["ev_latest_per_user"] = """
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type AS last_type, value AS last_value, n_events
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               count(*) OVER (PARTITION BY user_id) AS n_events,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
"""


# --------------------------------------------------------------------------
# burst detection: rule-based abuse flagging per user-minute
# --------------------------------------------------------------------------
def ev_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit / bot-detection rule: users with any hour containing
    more than 1 event, with their worst-hour stats — the abuse-flagging
    reduction every event pipeline runs. Two narrow aggregates
    (user-hour counts, then per-user max via struct-max with hour as
    tiebreak); thresholds are integers, no windows needed. Granularity
    is hourly because the fixture's per-user cadence is hours — the
    minute-grain variant returned 0 rows at every SF, a trivially-green
    oracle (round-2 sweep)."""
    e = load(spark, sf_dir, "events")
    per_hr = (
        e.withColumn("hr", F.date_trunc("hour", "ts").cast("timestamp_ntz"))
        .groupBy("user_id", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_hr.groupBy("user_id")
        .agg(
            F.max(F.struct("n", "hr")).alias("worst"),
            F.count(F.lit(1)).alias("n_active_hours"),
        )
        .filter(F.col("worst.n") > 1)
        .select(
            "user_id",
            F.col("worst.n").alias("worst_hour_events"),
            F.col("worst.hr").alias("worst_hour"),
            "n_active_hours",
        )
        .orderBy("user_id")
    )


QUERIES["ev_burst_detection"] = ev_burst_detection

ORACLES["ev_burst_detection"] = """
    WITH per_hr AS (
        SELECT user_id, date_trunc('hour', ts) AS hr, count(*) AS n
        FROM events
        GROUP BY user_id, hr
    ),
    ranked AS (
        SELECT user_id, n, hr,
               count(*) OVER (PARTITION BY user_id) AS n_active_hours,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, hr DESC) AS rn
        FROM per_hr
    )
    SELECT user_id, n AS worst_hour_events, hr AS worst_hour,
           n_active_hours
    FROM ranked
    WHERE rn = 1 AND n > 1
    ORDER BY user_id
"""


# --------------------------------------------------------------------------
# top-k per window: hourly heavy hitters
# --------------------------------------------------------------------------
def ev_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per hour by event count — the windowed-heavy-hitter
    reduction behind every 'trending now' panel. groupBy(hour, user)
    partial-aggregates before the shuffle; the per-hour rank window
    rides the hour partitioning; ties break on user_id so the top set
    is stable. Output is hours × 3 regardless of input size."""
    e = load(spark, sf_dir, "events")
    counts = (
        e.withColumn("hr", F.date_trunc("hour", "ts").cast("timestamp_ntz"))
        .groupBy("hr", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("hr").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("hr", "rnk", "user_id", "n")
        .orderBy("hr", "rnk")
    )


QUERIES["ev_topk_per_window"] = ev_topk_per_window

ORACLES["ev_topk_per_window"] = """
    SELECT hr, rnk, user_id, n
    FROM (
        SELECT date_trunc('hour', ts) AS hr, user_id, count(*) AS n,
               CAST(row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                  ORDER BY count(*) DESC, user_id)
                    AS INTEGER) AS rnk
        FROM events
        GROUP BY hr, user_id
    )
    WHERE rnk <= 3
    ORDER BY hr, rnk
"""


# --------------------------------------------------------------------------
# cumulative distinct: daily new vs cumulative unique users
# --------------------------------------------------------------------------
def ev_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user and cumulative-unique-user curve WITHOUT a
    quadratic running COUNT(DISTINCT): each user contributes only their
    FIRST-occurrence day (one min() aggregate), daily news are counted,
    and the cumulative curve is a running sum over days — turning a
    running-distinct into two narrow aggregates + a tiny window. The
    growth-dashboard primitive at any scale."""
    e = load(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        # DATE, not truncated timestamp: DuckDB's date_trunc('day') yields
        # DATE and the hash is typed
        F.to_date(F.min("ts")).alias("day")
    )
    daily = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        daily.withColumn("n_cumulative_users", F.sum("n_new_users").over(w))
        .orderBy("day")
    )


QUERIES["ev_cumulative_unique_users"] = ev_cumulative_unique_users

ORACLES["ev_cumulative_unique_users"] = """
    WITH first_day AS (
        SELECT user_id, date_trunc('day', min(ts)) AS day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT day, count(*) AS n_new_users FROM first_day GROUP BY day
    )
    SELECT day, n_new_users,
           CAST(sum(n_new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_cumulative_users
    FROM daily
    ORDER BY day
"""


# --------------------------------------------------------------------------
# error-rate timeline: hourly error share in exact 1e-6 units
# --------------------------------------------------------------------------
def ev_error_rate_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational SLO timeline: per-hour error share as an exact
    integer ppm (count_if cross-multiplied — no float division), with
    total and error counts alongside. One partial-aggregated groupBy on
    the hour bucket; output cardinality = hours, independent of input
    size."""
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("hr", F.date_trunc("hour", "ts").cast("timestamp_ntz"))
        .groupBy("hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
        )
        .selectExpr(
            "hr",
            "n_events",
            "n_errors",
            "(1000000 * n_errors) div n_events AS error_ppm",
        )
        .orderBy("hr")
    )


QUERIES["ev_error_rate_timeline"] = ev_error_rate_timeline

ORACLES["ev_error_rate_timeline"] = """
    SELECT date_trunc('hour', ts) AS hr,
           count(*) AS n_events,
           CAST(count_if(event_type = 'error') AS BIGINT) AS n_errors,
           CAST((1000000 * count_if(event_type = 'error')) // count(*)
                AS BIGINT) AS error_ppm
    FROM events
    GROUP BY hr
    ORDER BY hr
"""


# --------------------------------------------------------------------------
# interval-overlap self-join: concurrent sessions of different users
# --------------------------------------------------------------------------
# Banded-interval-join bucket width (seconds) for ev_concurrent_sessions;
# module-level so tools/sweep scripts can probe alternatives without
# editing the operator. 600 s measured optimal at sf0.1 (round-4 sweep).
_CS_BAND_S = 600
# Top concurrent partners kept per user in the bounded headline form.
_CS_TOP_K = 5


def _cs_pairs(spark: SparkSession, sf_dir: str):
    """Shared candidate pipeline for the concurrent-session family:
    sessionize per user (10-minute gap; session = [first event, last
    event + 10 min]), then emit every cross-user session pair whose
    intervals overlap, with the exact overlap in integer microseconds.

    Scale shape — the banded interval join: sessions explode to the
    10-minute bands they cover (bounded fan-out: session length is
    gap-bounded), candidates come from an equi-join on the band, the
    exact overlap predicate re-filters, and the start-bucket rule
    (count a pair only in the band where its overlap starts) removes
    multi-bucket duplicates without a wide distinct. No inequality
    join ever reaches the planner (the oracles state the naive theta
    join — same answer, quadratic asymptotics). All interval math is
    exact integer microseconds."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = 10 * 60 * 1_000_000
    sess = (
        e.selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
            "event_id",
        )
        .withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > gap),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("s"),
            (F.max("us") + gap).alias("e"),
        )
    )
    band = _CS_BAND_S * 1_000_000  # 10-minute buckets: sessions are
    # gap-bounded (10-min inactivity), so a session spans few bands while
    # each band holds ~6x fewer sessions than an hour bucket — candidate
    # pairs drop quadratically per bucket (7.0 s with hour buckets + wide
    # distinct -> 3.4 s at sf0.1). Round-4 sweep at sf0.1 confirmed 600 s
    # is the flat optimum (see DESIGN.md): halving/doubling the band
    # trades band fan-out against per-bucket pair count symmetrically.
    b = sess.selectExpr(
        "user_id", "sid", "s", "e",
        f"explode(sequence(s div {band}, e div {band})) AS hb",
    )
    # SHUFFLE_HASH on the band self-join (round-11; guide §3.1 "pick the
    # strategy deliberately"). Both join inputs are the SAME banded
    # session subtree `b`, which makes the planner's default choices
    # backfire at every scale:
    #   - sf0.1: auto-broadcast builds the hash relation from one copy
    #     of `b` and streams the other — the sessionize window pipeline
    #     runs TWICE (a broadcast build can't reuse the streamed side's
    #     exchange). With SHJ both sides hash-partition on hb and the
    #     second side is a ReusedExchange: one sessionize pass total.
    #   - ×10: the broadcast flips to sort-merge, which pays two
    #     O(n log n) sorts of ~25M banded rows that the hash join
    #     simply doesn't need (the per-partition build side fits
    #     comfortably: sessions are ~40B rows).
    # Same-epoch A/B, fresh process per variant, full bounded query:
    # sf0.1 best-of-3 3.07 s (SMJ) / 1.76 s (SHJ); ×10 best-of-2
    # 84.9 s (SMJ) / 29.2 s (SHJ); hinting BOTH sides loses (43.1 s ×10
    # — the planner then builds from the left/larger stream mix). The
    # hint is join-local: no other query's plan changes (the round-10
    # global preferSortMergeJoin=false experiment damaged the
    # exchange-reuse family and stays rejected, OPTIMIZATION_r10.md
    # §2.6). Join strategy never changes results, only the plan.
    return (
        b.alias("a")
        .join(b.alias("b").hint("shuffle_hash"), "hb")
        .filter(
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e"))
            # count each overlapping pair EXACTLY once: only in the
            # bucket where the overlap starts — removes the wide
            # multi-bucket DISTINCT entirely
            & (F.col("hb") == F.expr(f"greatest(a.s, b.s) div {band}"))
        )
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("b.user_id").alias("u2"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("ov_us"),
        )
    )


def _cs_per_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the scored overlaps per canonical (u1 < u2) user pair —
    the family's one pair-scale exchange, shaped for ~1-row-per-group
    cardinality (round-9 judge ask #1: at ×10 density this aggregate,
    not the banded scoring, dominated — 97 M groups from 226 M scored
    rows, so the map-side combine builds a groups-sized hash table per
    task, overflows to the sort fallback, and reduces almost nothing).

    Two deliberate deviations from a plain groupBy(u1, u2):

    1. PACKED PAIR KEY: the canonical pair rides one BIGINT
       (u1·2³² + u2) through the exchange — one 8-byte key instead of
       two, one hash/compare per probe instead of a struct walk, and
       the exchange row narrows to (pk, ov_us) = 16 bytes. Precondition
       (stated, not silent): user ids in [0, 2³¹) — the packing is a
       bijection there; ids beyond 31 bits would need a 128-bit pack.
    2. REPARTITION-FIRST: an explicit repartition on pk moves the
       exchange BELOW the aggregate, so the map side ships raw 16-byte
       rows with ZERO hash-table work (~1 row/group means partial agg
       cannot shrink the shuffle — it only burns memory + spill), and
       the partial+final HashAggregates run back-to-back on co-located
       rows, each table bounded by groups/partitions. The width is NOT
       pinned: repartition(col) takes spark.sql.shuffle.partitions as
       its initial width and stays AQE-coalescible, so small inputs
       collapse to few fat partitions while a deployment sizes the
       conf (or adaptive.coalescePartitions.initialPartitionNum) to
       its cluster. A pinned `repartition(8·parallelism, pk)` was
       measured first (×10 sweep: 37.4 s at 32 partitions, 34.5 at
       128, 31.3 at 256 — wider wins at ×10 because groups ≈ rows
       makes the per-partition hash tables the footprint) but costs
       2× at the driver's own bench scale where 256 pinned tasks are
       pure scheduling overhead that AQE is forbidden to coalesce
       (sf0.1 full query best-of-3: 6.7 s pinned-256 vs 3.3 s
       repartition(col) vs 3.5 s plain groupBy) — the round-10 rule:
       scale constants live in conf, not in the plan.

    Measured on the true ×10 fixture (local[32], best-of-2 noop):
    aggregate standalone 36.1 s (plain groupBy) → 31.3 s (pinned 256;
    the conf-width form reads within the band at the conf's width).
    The 600 s band was re-swept at ×10 density and stays the flat
    optimum (pair-gen best-of-2: 19.4 s at 150 s bands, 15.7 at 300,
    14.6 at 600, 25.7 at 1200).

    Spark exposes no skip-partial-aggregate conf (checked SQLConf
    4.1.2), so the repartition IS the spelling of that intent."""
    pk = _cs_pairs(spark, sf_dir).selectExpr(
        "shiftleft(u1, 32) + u2 AS pk", "ov_us"
    )
    return (
        pk.repartition(F.col("pk"))
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n_session_pairs"),
            F.sum("ov_us").alias("ov_us_total"),
        )
        .selectExpr(
            "shiftright(pk, 32) AS u1",
            "pk & 4294967295 AS u2",
            "n_session_pairs",
            "ov_us_total",
        )
    )


def ev_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who shares the most online time with each user: the TOP-5
    concurrent partners per user by total overlapping session seconds
    (+ how many session pairs contributed), from the shared banded
    interval join (_cs_pairs).

    BOUNDED headline form (round-9 judge ask #1): the full
    every-overlapping-pair listing emits ~O(n²) rows on dense traffic
    by SPEC — ×100 output rows for ×10 users in the same time span,
    measured 972 k → 97.3 M pairs at ×100 — so at 100 TB the OUTPUT,
    not the plan, was 41% of the sf1 bench. This form bounds output at
    users × 5 rows: candidate pairs still flow through the same banded
    equi-join (that part is inherent to knowing each user's top
    partners and stays sub-output-linear), but the per-user top-k
    window collapses to a WindowGroupLimit — only ≤5 rows per user
    survive the rank exchange, and the final sort is entity-, not
    pair-, scale. The full listing remains available as the documented
    opt-in `ev_concurrent_sessions_all_pairs`.

    Determinism: partners rank by exact integer (Σ overlap_us DESC,
    partner_id ASC) — a total order, no float ever compared. Shuffle
    order matters at this volume: aggregate the CANONICAL (u1 < u2)
    pairs FIRST via the packed-key repartition-first shape
    (_cs_per_pair — one pair-scale exchange at half the row count and
    half the group cardinality, 16-byte rows, no dead map-side
    combine), then symmetrize the AGGREGATED pair rows ROW-LOCALLY
    (explode of the two directions — never a union of two join
    branches, which would embed the heavy candidate pipeline twice in
    the plan); both directions of a user pair carry identical totals,
    so rank inputs are complete either way. Measured at the true ×10
    fixture: 85 s (symmetrize-then-aggregate) → 67 s
    (aggregate-then-symmetrize, round 8) → see _cs_per_pair for the
    round-10 aggregate reshape."""
    per = _cs_per_pair(spark, sf_dir).select(
        F.explode(
            F.expr(
                "array(struct(u1 AS user_id, u2 AS partner_id,"
                " n_session_pairs, ov_us_total),"
                " struct(u2 AS user_id, u1 AS partner_id,"
                " n_session_pairs, ov_us_total))"
            )
        ).alias("p")
    ).select("p.*")
    w = W.partitionBy("user_id").orderBy(
        F.desc("ov_us_total"), F.asc("partner_id")
    )
    return (
        per.withColumn("partner_rank", F.row_number().over(w))
        .filter(F.col("partner_rank") <= _CS_TOP_K)
        .selectExpr(
            "user_id",
            "partner_rank",
            "partner_id",
            "n_session_pairs",
            "CAST(ov_us_total div 1000000 AS BIGINT) AS overlap_s",
        )
        .orderBy("user_id", "partner_rank")
    )


QUERIES["ev_concurrent_sessions"] = ev_concurrent_sessions


def ev_concurrent_sessions_all_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FULL overlapping-pair listing: every cross-user pair with
    ≥1 overlapping session, aggregated per pair (count + total overlap
    seconds). OPT-IN: output is ~O(n²) rows on dense traffic by SPEC
    (×100 pairs for ×10 users in the same span), so this is not the
    headline form and not benched at scale — run it when the complete
    pair ledger is the deliverable (e.g. collusion-graph builds that
    consume every edge); for the dashboard read use the bounded
    `ev_concurrent_sessions` (top-5 partners per user) or the linear
    `ev_peak_concurrency` count twin."""
    return (
        _cs_per_pair(spark, sf_dir)
        .selectExpr(
            "u1",
            "u2",
            "n_session_pairs",
            "CAST(ov_us_total div 1000000 AS BIGINT) AS overlap_s",
        )
        .orderBy("u1", "u2")
    )


QUERIES["ev_concurrent_sessions_all_pairs"] = ev_concurrent_sessions_all_pairs

ORACLES["ev_concurrent_sessions_all_pairs"] = """
    WITH ordered AS (
        SELECT user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    sess AS (
        SELECT user_id, sid, min(us) AS s, max(us) + 600000000 AS e
        FROM numbered GROUP BY user_id, sid
    ),
    pairs AS (
        SELECT a.user_id AS u1, b.user_id AS u2,
               least(a.e, b.e) - greatest(a.s, b.s) AS ov_us
        FROM sess a JOIN sess b
          ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
    )
    SELECT u1, u2,
           CAST(count(*) AS BIGINT) AS n_session_pairs,
           CAST(sum(ov_us) // 1000000 AS BIGINT) AS overlap_s
    FROM pairs
    GROUP BY u1, u2
    ORDER BY u1, u2
"""

ORACLES["ev_concurrent_sessions"] = """
    WITH ordered AS (
        SELECT user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    sess AS (
        SELECT user_id, sid, min(us) AS s, max(us) + 600000000 AS e
        FROM numbered GROUP BY user_id, sid
    ),
    pairs AS (
        SELECT a.user_id AS u1, b.user_id AS u2,
               least(a.e, b.e) - greatest(a.s, b.s) AS ov_us
        FROM sess a JOIN sess b
          ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
    ),
    sym AS (
        SELECT u1 AS user_id, u2 AS partner_id, ov_us FROM pairs
        UNION ALL
        SELECT u2 AS user_id, u1 AS partner_id, ov_us FROM pairs
    ),
    per AS (
        SELECT user_id, partner_id,
               count(*) AS n_session_pairs,
               sum(ov_us) AS ov_us_total
        FROM sym GROUP BY user_id, partner_id
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ov_us_total DESC, partner_id) AS partner_rank
        FROM per
    )
    SELECT user_id,
           -- Spark row_number is i32, DuckDB's is i64 — cast here
           CAST(partner_rank AS INT) AS partner_rank,
           partner_id,
           CAST(n_session_pairs AS BIGINT) AS n_session_pairs,
           CAST(ov_us_total // 1000000 AS BIGINT) AS overlap_s
    FROM ranked
    WHERE partner_rank <= 5
    ORDER BY user_id, partner_rank
"""


# --------------------------------------------------------------------------
# hourly P50/P95/P99 as EXACT order statistics (the latency dashboard)
# --------------------------------------------------------------------------
def ev_latency_percentiles_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour P50/P95/P99 of the value distribution — the ops-latency
    dashboard reduction. Percentiles are EXACT order statistics (the
    rank-⌈q·n⌉ element under a total (value, event_id) order, values in
    integer cents), not interpolated: interpolation formulas differ
    across engines (and approx sketches differ by design), while the
    k-th order statistic is bit-identical everywhere.

    Plan: one rank window and the count ride the same hour exchange as
    the final aggregate — one shuffle total; output cardinality = hours."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("hr").orderBy("cents", "event_id")
    ranked = (
        e.selectExpr(
            "date_trunc('hour', ts) AS hr",
            "CAST(round(value * 100) AS BIGINT) AS cents",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("hr")))
    )
    def pick(q: str, alias: str):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("cents"))
        ).alias(alias)
    return (
        ranked.groupBy("hr")
        .agg(
            F.max("n").alias("n"),
            pick(0.50, "p50_cents"),
            pick(0.95, "p95_cents"),
            pick(0.99, "p99_cents"),
        )
        .orderBy("hr")
    )


QUERIES["ev_latency_percentiles_hourly"] = ev_latency_percentiles_hourly

ORACLES["ev_latency_percentiles_hourly"] = """
    WITH ranked AS (
        SELECT date_trunc('hour', ts) AS hr,
               CAST(round(value * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                  ORDER BY CAST(round(value * 100, 0) AS BIGINT),
                                           event_id) AS rn,
               count(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
        FROM events
    )
    SELECT hr,
           CAST(max(n) AS BIGINT) AS n,
           max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN cents END)
               AS p50_cents,
           max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN cents END)
               AS p95_cents,
           max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN cents END)
               AS p99_cents
    FROM ranked
    GROUP BY hr
    ORDER BY hr
"""


# --------------------------------------------------------------------------
# DAU / WAU / MAU: exact rolling distinct actives via calendar expansion
# --------------------------------------------------------------------------
def ev_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth dashboard's staple triple. A rolling COUNT(DISTINCT)
    window is quadratic; the scalable exact form is CALENDAR EXPANSION:
    each (user, active-day) pair contributes that user to the 7-day
    window of the next 7 days (and 30 for MAU), so the whole computation
    is a bounded row multiplier (7x / 30x — linear) + per-day distinct
    counts. Only days observed in the data are emitted.

    Scale: the user-day table is one distinct over (user, date) — far
    smaller than events; expansions are row-local explodes; each metric
    is one partial-aggregated distinct count on the day key."""
    e = load(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count_distinct("user_id").alias("dau"))

    def rolling(window: int, alias: str) -> DataFrame:
        return (
            ud.selectExpr(
                "user_id",
                f"explode(sequence(0, {window - 1})) AS i",
                "d",
            )
            .selectExpr("user_id", "date_add(d, i) AS day")
            .groupBy("day")
            .agg(F.count_distinct("user_id").alias(alias))
        )

    wau = rolling(7, "wau")
    mau = rolling(30, "mau")
    return (
        dau.withColumnRenamed("d", "day")
        .join(wau, "day")
        .join(mau, "day")
        .select("day", "dau", "wau", "mau")
        .orderBy("day")
    )


QUERIES["ev_dau_wau_mau"] = ev_dau_wau_mau

ORACLES["ev_dau_wau_mau"] = """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    dau AS (
        SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM ud GROUP BY d
    ),
    wexp AS (
        SELECT user_id, d + CAST(i AS INTEGER) AS day
        FROM ud, unnest(range(0, 7)) AS u(i)
    ),
    wau AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM wexp GROUP BY day
    ),
    mexp AS (
        SELECT user_id, d + CAST(i AS INTEGER) AS day
        FROM ud, unnest(range(0, 30)) AS u(i)
    ),
    mau AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        FROM mexp GROUP BY day
    )
    SELECT day, dau, wau, mau
    FROM dau JOIN wau USING (day) JOIN mau USING (day)
    ORDER BY day
"""
