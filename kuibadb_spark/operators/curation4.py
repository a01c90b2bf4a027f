"""Round-4 batch 2: observability, sketch algebra, and classic analytics
operators a production lakehouse runs alongside the curation pipeline —
KMV distinct sketches (the mergeable theta-sketch family), histogram
quantile estimation (the mergeable-quantile scale path), association
rules (market-basket support/confidence/lift), bot detection, CUSUM
changepoint detection via the prefix-min identity, seasonal-naive
forecast backtesting, k-core graph decomposition, a Bloom-filter ingest
prefilter with measured false-positive rate, period-over-period revenue
deltas, and per-user behavioral entropy.

Registered after curation3 in registry._MODULES: these keys must rank
behind the nine round-5-window stragglers (curation2 tail) and behind
curation3's round-4 batch so they cannot displace already-planned
grading slots (the round-3 discipline; see registry.py).

Cross-engine determinism rules (DESIGN.md #23-25) used throughout:
- quantize to integers FIRST; cross-row sums are then exact in either
  engine regardless of accumulation order;
- ratios become basis points via integer multiply-then-divide on
  positive operands (div and // agree there), or a double division
  spelled with the identical operand/op order on both sides;
- the only cross-engine hash is md5; ln/exp are libm-level (identical,
  the scalar.py rule) and any double SUM of ln terms accumulates in an
  ORDERED window frame so both engines add in the same sequence;
- no ARRAY/MAP/BINARY/STRUCT in any final schema (driver canonicalizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. KMV (k-minimum-values) distinct sketch — the theta-sketch family
# ---------------------------------------------------------------------------
_KMV_K = 64


def agg_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (Beyer et al., "On Synopses for
    Distinct-Value Estimation Under Multiset Operations", SIGMOD'07 —
    the estimator inside Apache DataSketches' theta sketch): hash every
    user to a 32-bit value, keep the k=64 smallest per event_type, and
    estimate distinct users as (k-1)·2^32 / h_(k); a sketch with fewer
    than k values is exact by construction. A final 'ALL' row merges the
    per-type sketches (union of min-sets, re-take min-k) — the
    mergeability that makes KMV a one-pass, fixed-memory distinct
    count at 100 TB where count(DISTINCT) needs a full shuffle of every
    key. The exact count runs beside it ONLY as the eval harness
    (sim_ann_recall_eval precedent): the sketch is the production path.

    Determinism: md5 → first 8 hex chars → [0, 2^32) integers; the k-th
    smallest via row_number over (hash, user_id) — total order, no ties
    ambiguity; the estimate is one integer multiply-then-divide.
    Scale shape: one groupBy(event_type, hash-distinct) aggregation;
    the min-k step is a per-type top-k (window over ≤ |types| × k rows
    after the per-partition partial)."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
        ).alias("h"),
    )
    # distinct (type, h) — the sketch state; 'ALL' merges every type
    per_type = e.select("event_type", "h").distinct()
    merged = e.select(F.lit("ALL").alias("event_type"), "h").distinct()
    sk = per_type.unionAll(merged)
    rn = sk.withColumn(
        "rn", F.row_number().over(W.partitionBy("event_type").orderBy("h"))
    )
    est = rn.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
    ).selectExpr(
        "event_type",
        f"CASE WHEN n_hashes < {_KMV_K} THEN n_hashes"
        f" ELSE ({_KMV_K} - 1) * 4294967296L div hk END AS kmv_est",
    )
    ex_t = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    ex_all = (
        load(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
        .select(F.lit("ALL").alias("event_type"), "exact_distinct")
    )
    exact = ex_t.unionAll(ex_all)
    return (
        est.join(exact, "event_type")
        .selectExpr(
            "event_type",
            "kmv_est",
            "exact_distinct",
            "round(abs(kmv_est - exact_distinct) * 100.0D"
            " / exact_distinct, 4) AS rel_err_pct4",
        )
        .orderBy("event_type")
    )


QUERIES["agg_kmv_distinct_sketch"] = agg_kmv_distinct_sketch

ORACLES["agg_kmv_distinct_sketch"] = f"""
    WITH h AS (
        SELECT event_type, user_id,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS h
        FROM events
    ),
    sk AS (
        SELECT DISTINCT event_type, h FROM h
        UNION ALL
        SELECT DISTINCT 'ALL' AS event_type, h FROM h
    ),
    rn AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM sk
    ),
    est AS (
        SELECT event_type,
               count(*) AS n_hashes,
               max(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
        FROM rn GROUP BY event_type
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'ALL', count(DISTINCT user_id) FROM events
    )
    SELECT est.event_type,
           CAST(CASE WHEN n_hashes < {_KMV_K} THEN n_hashes
                ELSE ({_KMV_K} - 1) * 4294967296 // hk END AS BIGINT)
               AS kmv_est,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           round(abs(CAST(CASE WHEN n_hashes < {_KMV_K} THEN n_hashes
                     ELSE ({_KMV_K} - 1) * 4294967296 // hk END AS BIGINT)
                     - exact_distinct) * 100.0
                 / exact_distinct, 4) AS rel_err_pct4
    FROM est JOIN ex ON est.event_type = ex.event_type
    ORDER BY est.event_type
"""


# ---------------------------------------------------------------------------
# 2. Mergeable histogram quantile sketch vs exact quantiles
# ---------------------------------------------------------------------------
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile estimation over order totals: 100
    fixed bins between the global min/max, quantile estimated as the
    lower bound of the first bin whose cumulative count reaches
    ceil(q·n) — the fixed-memory, one-pass, MERGEABLE quantile scheme
    (each partition's bin counts just add), i.e. the shape a 100 TB
    engine actually ships for p50/p90/p99 dashboards where an exact
    quantile needs a global sort. The exact rank value is computed
    beside it as the eval harness (group-by-value + cumulative window;
    fine at fixture scale, and the docstringed trade-off is the point).

    Determinism: prices quantized to integer cents (floor(x·100+0.5));
    bin ids, ranks, targets ceil(q·n) = (n·q_bp + 9999) div 10000, and
    both quantile values are pure int64 arithmetic — no doubles anywhere
    in the output."""
    o = load(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)"
        ).alias("cents")
    )
    glob = o.agg(
        F.min("cents").alias("minc"),
        F.max("cents").alias("maxc"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        o.crossJoin(F.broadcast(glob))
        .selectExpr(
            "minc", "maxc", "n",
            "least(99L, (cents - minc) * 100 div (maxc - minc + 1)) AS bin",
        )
        .groupBy("bin", "minc", "maxc", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(W.orderBy("bin")))
    )
    targets = spark.range(1).selectExpr(
        "explode(array(5000L, 9000L, 9900L)) AS q_bp"
    )
    est = (
        binned.crossJoin(F.broadcast(targets))
        .withColumn(
            "target_rank", F.expr("(n * q_bp + 9999) div 10000")
        )
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy("q_bp")
        .agg(
            F.max("n").alias("n_rows"),
            F.max("target_rank").alias("target_rank"),
            F.min(
                F.expr("minc + bin * (maxc - minc + 1) div 100")
            ).alias("est_cents"),
        )
    )
    exact_cum = (
        o.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(W.orderBy("cents")))
    )
    exact = (
        exact_cum.crossJoin(F.broadcast(est.select("q_bp", "target_rank")))
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy("q_bp")
        .agg(F.min("cents").alias("exact_cents"))
    )
    return (
        est.join(exact, "q_bp")
        .selectExpr(
            "q_bp", "n_rows", "target_rank", "est_cents", "exact_cents",
            "abs(est_cents - exact_cents) AS err_cents",
        )
        .orderBy("q_bp")
    )


QUERIES["agg_histogram_quantiles"] = agg_histogram_quantiles

ORACLES["agg_histogram_quantiles"] = """
    WITH o AS (
        SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    g0 AS (
        SELECT min(cents) AS minc, max(cents) AS maxc,
               count(*) AS n
        FROM o
    ),
    binned AS (
        SELECT least(99, (cents - minc) * 100 // (maxc - minc + 1)) AS bin,
               minc, maxc, n, count(*) AS cnt
        FROM o CROSS JOIN g0
        GROUP BY 1, 2, 3, 4
    ),
    cumb AS (
        SELECT *, sum(cnt) OVER (ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM binned
    ),
    targets AS (
        SELECT unnest([5000, 9000, 9900]) AS q_bp
    ),
    est AS (
        SELECT q_bp,
               max(n) AS n_rows,
               max((n * q_bp + 9999) // 10000) AS target_rank,
               min(minc + bin * (maxc - minc + 1) // 100) AS est_cents
        FROM cumb CROSS JOIN targets
        WHERE cum >= (n * q_bp + 9999) // 10000
        GROUP BY q_bp
    ),
    exact_cum AS (
        SELECT cents, sum(cnt) OVER (ORDER BY cents
                                     ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT cents, count(*) AS cnt FROM o GROUP BY cents)
    ),
    exact AS (
        SELECT q_bp, min(cents) AS exact_cents
        FROM exact_cum CROSS JOIN est
        WHERE cum >= target_rank
        GROUP BY q_bp
    )
    SELECT CAST(est.q_bp AS BIGINT) AS q_bp,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(target_rank AS BIGINT) AS target_rank,
           CAST(est_cents AS BIGINT) AS est_cents,
           CAST(exact_cents AS BIGINT) AS exact_cents,
           CAST(abs(est_cents - exact_cents) AS BIGINT) AS err_cents
    FROM est JOIN exact ON est.q_bp = exact.q_bp
    ORDER BY q_bp
"""


# ---------------------------------------------------------------------------
# 3. Association rules (market basket: support / confidence / lift)
# ---------------------------------------------------------------------------
def ev_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over user-day event baskets
    (Agrawal & Srikant's support/confidence framing, the degenerate
    1-item antecedent case — which is what event analytics ships): a
    basket is the DISTINCT event types one user produced in one day;
    rules a→b are emitted for pairs whose joint support clears 5% of
    all baskets, with confidence P(b|a) and lift P(ab)/(P(a)P(b)).

    Scale shape: baskets via one groupBy(user, day); pair counts via a
    self-equi-join on the basket key (items per basket ≤ |event types|,
    so the per-basket pair fan-out is a small constant — the classic
    a-priori candidate bound); supports via one more groupBy, joined
    back broadcast (|types| rows). The 5%-of-baskets threshold is
    scale-invariant. Confidence/lift are double divisions spelled
    identically in both engines from exact integer counts."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        "event_type",
    )
    items = e.distinct()
    n_baskets = items.select("user_id", "d").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    sup = items.groupBy("event_type").agg(F.count(F.lit(1)).alias("sup"))
    a = items.selectExpr("user_id", "d", "event_type AS ante")
    b = items.selectExpr("user_id", "d", "event_type AS cons")
    pairs = (
        a.join(b, ["user_id", "d"])
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    return (
        pairs.join(
            F.broadcast(sup.selectExpr("event_type AS ante", "sup AS sup_a")),
            "ante",
        )
        .join(
            F.broadcast(sup.selectExpr("event_type AS cons", "sup AS sup_b")),
            "cons",
        )
        .crossJoin(F.broadcast(n_baskets))
        .filter(F.col("pair_cnt") * 100 >= F.col("n_baskets") * 5)
        .selectExpr(
            "ante",
            "cons",
            "pair_cnt",
            "round(CAST(pair_cnt AS DOUBLE) / sup_a, 4) AS conf4",
            "round((CAST(pair_cnt AS DOUBLE) * n_baskets)"
            " / (CAST(sup_a AS DOUBLE) * sup_b), 4) AS lift4",
        )
        .orderBy("ante", "cons")
    )


QUERIES["ev_association_rules"] = ev_association_rules

ORACLES["ev_association_rules"] = """
    WITH items AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
        FROM events
    ),
    nb AS (
        SELECT count(*) AS n_baskets
        FROM (SELECT DISTINCT user_id, d FROM items)
    ),
    sup AS (
        SELECT event_type, count(*) AS sup FROM items GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS ante, b.event_type AS cons,
               count(*) AS pair_cnt
        FROM items a JOIN items b
          ON a.user_id = b.user_id AND a.d = b.d
         AND a.event_type <> b.event_type
        GROUP BY 1, 2
    )
    SELECT ante, cons, CAST(pair_cnt AS BIGINT) AS pair_cnt,
           round(CAST(pair_cnt AS DOUBLE) / sa.sup, 4) AS conf4,
           round((CAST(pair_cnt AS DOUBLE) * n_baskets)
                 / (CAST(sa.sup AS DOUBLE) * sb.sup), 4) AS lift4
    FROM pairs
    JOIN sup sa ON sa.event_type = ante
    JOIN sup sb ON sb.event_type = cons
    CROSS JOIN nb
    WHERE pair_cnt * 100 >= n_baskets * 5
    ORDER BY ante, cons
"""


# ---------------------------------------------------------------------------
# 4. Bot / automation detection: rate + inter-event-gap regularity
# ---------------------------------------------------------------------------
def ev_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation signals: event volume, events-per-active-day,
    and the VARIANCE of inter-event gaps (a scripted client fires on a
    timer → near-zero gap variance; a human's gaps are heavy-tailed).
    The bot verdict is volume ≥ 50 AND rate ≥ 100/day AND gap variance
    ≤ 4 min² — the standard rule-stack shape (each signal cheap, the
    conjunction precise).

    Determinism: gaps quantized to whole minutes; the variance is the
    exact integer numerator n·Σg² − (Σg)² divided in scaled-integer
    space (×10000, truncating div — positive by Cauchy-Schwarz), so the
    output is all ints/bools. Bounds: gaps ≤ 44640 min (31 days), so
    n·Σg² ≤ 1e4·2e13 < 2^63 at any per-user volume this fixture family
    reaches; the per-user event count is shard-invariant in the ×10/×100
    sweeps. Scale shape: one window (lag per user) + one groupBy(user)."""
    e = load(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    g = e.withColumn(
        "gap_min",
        F.expr("(us - lag(us) OVER (PARTITION BY user_id"
               " ORDER BY us, event_id)) div 60000000"),
    )
    per_user = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("d").alias("active_days"),
        F.count("gap_min").alias("n_gaps"),
        F.sum("gap_min").alias("sumg"),
        F.sum(F.expr("gap_min * gap_min")).alias("sumg2"),
    )
    _ = w  # window spelled in SQL above for exact cross-engine parity
    return per_user.selectExpr(
        "user_id",
        "n_events",
        "active_days",
        "n_events * 100 div active_days AS epd_x100",
        "CASE WHEN n_gaps >= 2 THEN"
        " (n_gaps * sumg2 - sumg * sumg) * 10000 div (n_gaps * n_gaps)"
        " END AS gap_var_x10000",
        "CASE WHEN n_gaps >= 2 THEN"
        " n_events >= 50 AND n_events * 100 div active_days >= 10000"
        " AND (n_gaps * sumg2 - sumg * sumg) * 10000"
        "     div (n_gaps * n_gaps) <= 40000"
        " ELSE false END AS is_bot",
    ).orderBy("user_id")


QUERIES["ev_bot_detection"] = ev_bot_detection

ORACLES["ev_bot_detection"] = """
    WITH e AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS d
        FROM events
    ),
    g AS (
        SELECT user_id, d,
               (us - lag(us) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id)) // 60000000
                   AS gap_min
        FROM e
    ),
    per_user AS (
        SELECT user_id,
               count(*) AS n_events,
               count(DISTINCT d) AS active_days,
               count(gap_min) AS n_gaps,
               CAST(sum(gap_min) AS BIGINT) AS sumg,
               CAST(sum(gap_min * gap_min) AS BIGINT) AS sumg2
        FROM g GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(active_days AS BIGINT) AS active_days,
           CAST(n_events * 100 // active_days AS BIGINT) AS epd_x100,
           CAST(CASE WHEN n_gaps >= 2 THEN
                (n_gaps * sumg2 - sumg * sumg) * 10000
                    // (n_gaps * n_gaps)
                END AS BIGINT) AS gap_var_x10000,
           CASE WHEN n_gaps >= 2 THEN
                n_events >= 50 AND n_events * 100 // active_days >= 10000
                AND (n_gaps * sumg2 - sumg * sumg) * 10000
                    // (n_gaps * n_gaps) <= 40000
           ELSE false END AS is_bot
    FROM per_user
    ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 5. CUSUM changepoint detection via the prefix-min identity
# ---------------------------------------------------------------------------
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint scores over the hourly event-count
    series (Page 1954): S+_t = max_{j<=t} sum_{i=j..t}(x_i - mean) has
    the closed form P_t - min(0, min_{j<=t} P_j) where P is the prefix
    sum of deviations — so the classic RECURRENCE becomes two ordered
    window aggregates (running sum + running min/max), no iteration and
    no recursion; this identity is what makes CUSUM shippable on a BSP
    engine. Returns the top-10 hours by either-direction score — the
    "when did the level shift" dashboard.

    Determinism: deviations are scaled by n (d_i = n*x_i - sum(x), all
    int64 — no mean rounding), so scores are exact integers; the top-10
    order is (score DESC, hour) — total. Scale shape: the series is
    hour-grain (bounded, metadata-scale single-partition windows — the
    ev_survival_km precedent); everything before it is one groupBy."""
    e = load(spark, sf_dir, "events").selectExpr(
        "(unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) * 3600"
        " AS hour_unix"
    )
    hourly = e.groupBy("hour_unix").agg(F.count(F.lit(1)).alias("x"))
    glob = hourly.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    w = W.orderBy("hour_unix").rowsBetween(W.unboundedPreceding, 0)
    p = (
        hourly.crossJoin(F.broadcast(glob))
        .selectExpr("hour_unix", "n * x - sx AS dvi")
        .withColumn("p", F.sum("dvi").over(w))
    )
    scored = (
        p.withColumn("minp", F.min("p").over(w))
        .withColumn("maxp", F.max("p").over(w))
        .selectExpr(
            "hour_unix",
            "p - least(minp, 0L) AS cusum_pos",
            "greatest(maxp, 0L) - p AS cusum_neg",
        )
    )
    return (
        scored.orderBy(
            F.expr("greatest(cusum_pos, cusum_neg)").desc(), "hour_unix"
        )
        .limit(10)
    )


QUERIES["ts_changepoint_cusum"] = ts_changepoint_cusum

ORACLES["ts_changepoint_cusum"] = """
    WITH hourly AS (
        SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600
                   AS hour_unix,
               count(*) AS x
        FROM events GROUP BY 1
    ),
    g0 AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM hourly),
    p AS (
        SELECT hour_unix,
               sum(n * x - sx) OVER (ORDER BY hour_unix
                                     ROWS UNBOUNDED PRECEDING) AS p
        FROM hourly CROSS JOIN g0
    ),
    scored AS (
        SELECT hour_unix,
               CAST(p - least(min(p) OVER w, 0) AS BIGINT) AS cusum_pos,
               CAST(greatest(max(p) OVER w, 0) - p AS BIGINT) AS cusum_neg
        FROM p
        WINDOW w AS (ORDER BY hour_unix ROWS UNBOUNDED PRECEDING)
    )
    SELECT hour_unix, cusum_pos, cusum_neg
    FROM scored
    ORDER BY greatest(cusum_pos, cusum_neg) DESC, hour_unix
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# 6. Seasonal-naive forecast backtest (MAPE in basis points)
# ---------------------------------------------------------------------------
def ev_forecast_snaive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality backtest of the seasonal-naive baseline
    (forecast(d) = actual(d-7), the model every real forecasting system
    must beat — Hyndman & Athanasopoulos, "Forecasting: Principles and
    Practice", the benchmark-model chapter): per event type, MAPE over
    all days with a d-7 counterpart plus the single worst day. The
    d-7 lookup is an equi-join on (type, date-7), NOT a row-offset lag,
    so gap days never misalign the forecast.

    Determinism: APE in integer basis points (|act-fc|*10000 div act —
    act >= 1 by construction), MAPE as the truncating integer mean;
    worst-day argmax totalized by (ape DESC, day). All-int output plus
    one DATE column (driver canonicalizer handles dates)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    f = daily.selectExpr("event_type AS f_et", "d AS fd", "cnt AS fc")
    joined = daily.join(
        f,
        (F.col("event_type") == F.col("f_et"))
        & (F.col("fd") == F.date_sub(F.col("d"), 7)),
    ).select(
        "event_type",
        "d",
        F.expr("abs(cnt - fc) * 10000 div cnt").alias("ape_bp"),
    )
    rn = joined.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.desc("ape_bp"), "d")
        ),
    )
    stats = rn.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval_days"),
        F.expr("sum(ape_bp) div count(1)").alias("mape_bp"),
        F.max(F.when(F.col("rn") == 1, F.col("d"))).alias("worst_day"),
        F.max(F.when(F.col("rn") == 1, F.col("ape_bp"))).alias(
            "worst_ape_bp"
        ),
    )
    return stats.orderBy("event_type")


QUERIES["ev_forecast_snaive_eval"] = ev_forecast_snaive_eval

ORACLES["ev_forecast_snaive_eval"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    joined AS (
        SELECT a.event_type, a.d,
               abs(a.cnt - f.cnt) * 10000 // a.cnt AS ape_bp
        FROM daily a JOIN daily f
          ON a.event_type = f.event_type AND f.d = a.d - 7
    ),
    rn AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY ape_bp DESC, d) AS rn
        FROM joined
    )
    SELECT event_type,
           count(*) AS n_eval_days,
           CAST(CAST(sum(ape_bp) AS BIGINT) // count(*) AS BIGINT)
               AS mape_bp,
           max(CASE WHEN rn = 1 THEN d END) AS worst_day,
           CAST(max(CASE WHEN rn = 1 THEN ape_bp END) AS BIGINT)
               AS worst_ape_bp
    FROM rn
    GROUP BY event_type
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 7. k-core decomposition of the near-duplicate graph
# ---------------------------------------------------------------------------
_KC_TAU = 0.4   # looser than the 0.6 dedup edge: denser structure
_KC_K = 3
_KC_ROUNDS = 6  # fixture converges in <= 3; extra rounds are no-ops


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (Seidman 1983) of the near-dup similarity
    graph at Jaccard >= 0.4: repeatedly delete nodes of degree < k=3
    until fixpoint — the surviving 3-core is the "dense boilerplate
    cluster" signal (a hub template family), stronger than connected
    components which a single chance edge can chain together. The
    DuckDB oracle runs a fixed _KC_ROUNDS=6 unroll; the Spark loop
    caps at the same _KC_ROUNDS but EARLY-EXITS at the detected
    fixpoint (see the inline comment below) — converged rounds are
    identity maps, so the two are provably identical (the pagerank
    fixed-rounds precedent, graph.py:141).

    Scale shape: each round is degree-count groupBy + two semi-joins on
    the shrinking edge set — the standard BSP peeling. Each round ends
    in localCheckpoint(eager), NOT persist(): persist caches data but
    keeps the logical plan, and every peel round embeds the prior
    round's plan three times (sym + keep(sym) twice), so analysis cost
    grows 3^r — measured 2 s/round for rounds 0-2 then 95 s and 161 s
    for rounds 4-5 at sf0.001 before the checkpoint truncation (the CC
    precedent, graph.py:51; the Spark-side twin of the DuckDB
    MATERIALIZED fix in this operator's oracle). Edges reuse
    _pair_stats' inverted-postings candidate builder (capped hot
    shingles, dedup.py:150) — never an all-pairs join."""
    from kuibadb_spark.operators.dedup import (
        _doc_shingles, _dup_corpus, _pair_stats,
    )

    pairs = _pair_stats(_doc_shingles(_dup_corpus(spark, sf_dir)))
    edges = pairs.filter(
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        >= _KC_TAU
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # Early-exit at the peel fixpoint (round-10 optimization): if a round
    # deletes no edge, degrees are unchanged, so every later round is an
    # identity map — the fixed-count unroll just re-materializes the same
    # edge set, and the exit is provably result-identical to running all
    # _KC_ROUNDS. The check is deferred until the round where the graph
    # class converges (<= 3 peels on every fixture sweep): an
    # every-round count was measured NET-NEGATIVE at bench scale (each
    # count over the checkpointed frame is a ~0.3 s job; warm builder
    # 6.2 s with 6 blind rounds vs 8.6 s with 7 counts), so rounds 0-2
    # run unchecked and only the tail — where a skipped round is a full
    # groupBy + two joins over the surviving edges for provably zero
    # change — pays a count (warm builder 5.3 s: 4 rounds + 2 counts).
    _KC_CHECK_FROM = 2  # 0-based round index after which counts start
    n_edges = None
    for i in range(_KC_ROUNDS):
        keep = (
            sym.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= _KC_K)
            .select("src")
        )
        sym = (
            sym.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint()
        )
        if i >= _KC_CHECK_FROM:
            n_prev, n_edges = n_edges, sym.count()
            if n_edges == n_prev:
                break
    out = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .selectExpr("src AS node", "degree")
        .orderBy("node")
    )
    return out


QUERIES["graph_kcore"] = graph_kcore


def _kcore_oracle() -> str:
    from kuibadb_spark.operators.dedup import (
        _DUP_CORPUS_DUCK, _SHINGLES_DUCK,
    )

    parts = [f"""WITH {_DUP_CORPUS_DUCK},
    {_SHINGLES_DUCK},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
        SELECT src, dst FROM inter
        JOIN sizes sa ON sa.doc_id = src
        JOIN sizes sb ON sb.doc_id = dst
        WHERE i / (sa.sz + sb.sz - i) >= {_KC_TAU}
    ),
    sym0 AS MATERIALIZED (
        SELECT src, dst FROM edges
        UNION ALL SELECT dst, src FROM edges
    )"""]
    # Every sym{r} is AS MATERIALIZED: without it DuckDB inlines each
    # CTE at every reference site, and sym{r} references sym{r-1} three
    # times (directly + twice via keep{r}) — 3^6 = 729 inlined copies of
    # the base shingle self-join, measured as minutes-at-sf0.001 of
    # single-core grind. Materialization makes each round O(edges), the
    # same cost model as the Spark side's per-round persist.
    for r in range(1, _KC_ROUNDS + 1):
        parts.append(f""",
    keep{r} AS MATERIALIZED (
        SELECT src FROM sym{r - 1} GROUP BY src
        HAVING count(*) >= {_KC_K}
    ),
    sym{r} AS MATERIALIZED (
        SELECT s.src, s.dst FROM sym{r - 1} s
        JOIN keep{r} a ON s.src = a.src
        JOIN keep{r} b ON s.dst = b.src
    )""")
    parts.append(f"""
    SELECT src AS node, count(*) AS degree
    FROM sym{_KC_ROUNDS}
    GROUP BY src
    ORDER BY node""")
    return "".join(parts)


ORACLES["graph_kcore"] = _kcore_oracle()


# ---------------------------------------------------------------------------
# 8. Bloom-filter ingest prefilter with measured false-positive rate
# ---------------------------------------------------------------------------
_BLOOM_M = 16384  # bits
_BLOOM_SALTS = ("b0:", "b1:", "b2:")  # j=3 hash functions


def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-screen for incremental ingest (Bloom 1970; the
    Broder-Mitzenmacher network-survey framing): the already-ingested
    corpus partition (doc_id % 3 = 0) publishes a 16 Kbit filter (3
    salted md5 positions per doc); the incoming batch probes it and
    only 'maybe duplicate' docs pay the exact md5-equality join. The
    measured false-positive rate is the operator's own quality metric —
    the number that sizes m for a production filter (expected
    (1-e^{-jn/m})^j).

    Scale shape: the filter is a <= m-row distinct-positions table,
    broadcast to the probe side (in production it compacts to m/8 bytes
    — here the position-set join IS the membership test, one broadcast
    hash join); the exact verify runs only on filter hits. One summary
    row, all integers. Dup ground truth exists because _dup_corpus'
    +1e6 exact copies land in different residue classes than their
    originals."""
    c = _dup_corpus_local(spark, sf_dir)
    a = c.filter(F.col("doc_id") % 3 == 0)
    b = c.filter(F.col("doc_id") % 3 != 0)
    pos_arr = (
        "array("
        + ", ".join(
            f"CAST(conv(substring(md5(concat('{s}', text)), 1, 8), 16, 10)"
            f" AS BIGINT) % {_BLOOM_M}"
            for s in _BLOOM_SALTS
        )
        + ")"
    )
    abits = (
        a.select(F.explode(F.expr(pos_arr)).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    a_hashes = a.select(F.md5("text").alias("th")).distinct()
    probe = (
        b.select(
            "doc_id",
            F.md5("text").alias("th"),
            F.explode(F.expr(pos_arr)).alias("pos"),
        )
        .join(F.broadcast(abits), "pos", "left")
        .groupBy("doc_id", "th")
        .agg(F.sum(F.expr("CASE WHEN hit IS NULL THEN 0 ELSE 1 END"))
             .alias("nhit"))
    )
    flags = probe.join(
        F.broadcast(a_hashes.withColumn("dup", F.lit(1))), "th", "left"
    ).selectExpr(
        "CASE WHEN nhit = 3 THEN 1 ELSE 0 END AS maybe",
        "CASE WHEN dup IS NULL THEN 0 ELSE 1 END AS is_dup",
    )
    n_a = a.agg(F.count(F.lit(1)).alias("n_a"))
    return (
        flags.agg(
            F.count(F.lit(1)).alias("n_b"),
            F.sum("maybe").alias("n_maybe"),
            F.sum("is_dup").alias("n_true_dup"),
            F.sum(F.expr("maybe * (1 - is_dup)")).alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_a))
        .selectExpr(
            "n_a",
            "n_b",
            "n_maybe",
            "n_true_dup",
            "n_false_pos",
            # NULL when every probe doc is a true duplicate (the ×10
            # shard-replicated fixture reaches this: identical texts in
            # every shard make n_true_dup = n_b) — an unguarded divide
            # is an ANSI ArithmeticException
            "CASE WHEN n_b > n_true_dup THEN"
            " n_false_pos * 10000 div (n_b - n_true_dup) END AS fp_bp",
        )
    )


def _dup_corpus_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kuibadb_spark.operators.dedup import _dup_corpus

    return _dup_corpus(spark, sf_dir)


QUERIES["dedup_bloom_prefilter"] = dedup_bloom_prefilter


def _bloom_oracle() -> str:
    from kuibadb_spark.operators.dedup import _DUP_CORPUS_DUCK

    pos_rows = " UNION ALL ".join(
        f"SELECT doc_id, md5(text) AS th,"
        f" CAST('0x' || substr(md5('{s}' || text), 1, 8) AS BIGINT)"
        f" % {_BLOOM_M} AS pos FROM b"
        for s in _BLOOM_SALTS
    )
    return f"""
    WITH {_DUP_CORPUS_DUCK},
    a AS (SELECT * FROM corpus WHERE doc_id % 3 = 0),
    b AS (SELECT * FROM corpus WHERE doc_id % 3 <> 0),
    abits AS (
        SELECT DISTINCT pos FROM (
            {" UNION ALL ".join(
                f"SELECT CAST('0x' || substr(md5('{s}' || text), 1, 8)"
                f" AS BIGINT) % {_BLOOM_M} AS pos FROM a"
                for s in _BLOOM_SALTS)}
        )
    ),
    ah AS (SELECT DISTINCT md5(text) AS th FROM a),
    bpos AS ({pos_rows}),
    probe AS (
        SELECT doc_id, th,
               sum(CASE WHEN abits.pos IS NULL THEN 0 ELSE 1 END) AS nhit
        FROM bpos LEFT JOIN abits ON bpos.pos = abits.pos
        GROUP BY doc_id, th
    ),
    flags AS (
        SELECT CASE WHEN nhit = 3 THEN 1 ELSE 0 END AS maybe,
               CASE WHEN ah.th IS NULL THEN 0 ELSE 1 END AS is_dup
        FROM probe LEFT JOIN ah ON probe.th = ah.th
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
           CAST(count(*) AS BIGINT) AS n_b,
           CAST(sum(maybe) AS BIGINT) AS n_maybe,
           CAST(sum(is_dup) AS BIGINT) AS n_true_dup,
           CAST(sum(maybe * (1 - is_dup)) AS BIGINT) AS n_false_pos,
           CAST(CASE WHEN count(*) > CAST(sum(is_dup) AS BIGINT) THEN
                CAST(sum(maybe * (1 - is_dup)) AS BIGINT) * 10000
                // (count(*) - CAST(sum(is_dup) AS BIGINT)) END AS BIGINT)
               AS fp_bp
    FROM flags
    """


ORACLES["dedup_bloom_prefilter"] = _bloom_oracle()


# ---------------------------------------------------------------------------
# 9. Period-over-period revenue deltas (MoM / YoY)
# ---------------------------------------------------------------------------
def w_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth per nation —
    the canonical finance dashboard. The prior periods come from
    CALENDAR-ARITHMETIC equi-joins on (nation, month_key), not
    row-offset lag(): a nation with a silent month would silently
    misalign every lag(12); the join instead yields NULL growth exactly
    where the prior period is missing.

    Determinism: revenue in exact integer cents; growth written as
    ((rev - prev) * 100.0) / prev — one integer subtraction, one double
    multiply, one divide, same operand order both engines, round 4.
    Scale shape: groupBy (25 nations x months) then two self-equi-joins
    on the tiny aggregate — the joins see post-aggregation cardinality,
    never the fact table."""
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    rev = (
        o.join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(
            "n_name",
            F.expr(
                "CAST(year(o_orderdate) * 100 + month(o_orderdate)"
                " AS BIGINT)"
            ).alias("month_key"),
        )
        .agg(
            F.expr(
                "sum(CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT))"
            ).alias("rev_cents")
        )
    )
    # prev/yoy derive FROM rev (self-join): rename every column before
    # joining so no attribute is shared — `rev["n_name"] ==
    # prev["n_name"]` on a derived frame resolves to the SAME attribute
    # id (trivially-true predicate + AMBIGUOUS_REFERENCE downstream).
    prev = rev.selectExpr(
        "n_name AS p_name", "month_key AS pk", "rev_cents AS prev_cents"
    )
    yoy = rev.selectExpr(
        "n_name AS y_name", "month_key AS yk", "rev_cents AS yoy_cents"
    )
    return (
        rev.withColumn(
            "prev_key",
            F.expr("CASE WHEN month_key % 100 = 1 THEN month_key - 89"
                   " ELSE month_key - 1 END"),
        )
        .join(
            prev,
            (F.col("n_name") == F.col("p_name"))
            & (F.col("prev_key") == F.col("pk")),
            "left",
        )
        .join(
            yoy,
            (F.col("n_name") == F.col("y_name"))
            & (F.col("month_key") - 100 == F.col("yk")),
            "left",
        )
        .selectExpr(
            "n_name",
            "month_key",
            "rev_cents",
            "round(((rev_cents - prev_cents) * 100.0D) / prev_cents, 4)"
            " AS mom_pct4",
            "round(((rev_cents - yoy_cents) * 100.0D) / yoy_cents, 4)"
            " AS yoy_pct4",
        )
        .orderBy("n_name", "month_key")
    )


QUERIES["w_period_over_period"] = w_period_over_period

ORACLES["w_period_over_period"] = """
    WITH rev AS (
        SELECT n_name,
               CAST(year(o_orderdate) * 100 + month(o_orderdate)
                    AS BIGINT) AS month_key,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    )
    SELECT r.n_name, r.month_key, r.rev_cents,
           round(((r.rev_cents - p.rev_cents) * 100.0) / p.rev_cents, 4)
               AS mom_pct4,
           round(((r.rev_cents - y.rev_cents) * 100.0) / y.rev_cents, 4)
               AS yoy_pct4
    FROM rev r
    LEFT JOIN rev p ON p.n_name = r.n_name
     AND p.month_key = CASE WHEN r.month_key % 100 = 1
                            THEN r.month_key - 89 ELSE r.month_key - 1 END
    LEFT JOIN rev y ON y.n_name = r.n_name
     AND y.month_key = r.month_key - 100
    ORDER BY r.n_name, r.month_key
"""


# ---------------------------------------------------------------------------
# 10. Per-user behavioral entropy
# ---------------------------------------------------------------------------
def ev_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (a monitor pinging one endpoint scores
    ~0 bits; an engaged user near log2|types|). Computed as
    H = ln(n) - (1/n)*sum(c_i*ln(c_i)) in nats, which needs only the
    per-(user,type) counts — one aggregation, no per-event math.

    Determinism: c_i*ln(c_i) terms are doubles, so the cross-term SUM
    accumulates in an ORDERED window frame (by event_type) and the last
    frame row is taken — both engines add the same doubles in the same
    sequence (the ev_survival_km rule); ln is libm-identical. n and
    n_types are exact ints. Scale shape: groupBy(user, type) then a
    |types|-row window per user."""
    cnts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wp = W.partitionBy("user_id")
    wo = wp.orderBy("event_type").rowsBetween(W.unboundedPreceding, 0)
    scored = (
        cnts.withColumn("n", F.sum("c").over(wp))
        .withColumn("n_types", F.count(F.lit(1)).over(wp))
        .withColumn(
            "s", F.sum(F.expr("c * ln(CAST(c AS DOUBLE))")).over(wo)
        )
        .withColumn(
            "rn",
            F.row_number().over(wp.orderBy(F.desc("event_type"))),
        )
        .filter(F.col("rn") == 1)
    )
    return scored.selectExpr(
        "user_id",
        "n AS n_events",
        "n_types",
        "round(ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 4)"
        " AS entropy4",
    ).orderBy("user_id")


QUERIES["ev_user_entropy"] = ev_user_entropy

ORACLES["ev_user_entropy"] = """
    WITH cnts AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT user_id, event_type,
               CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS n,
               count(*) OVER (PARTITION BY user_id) AS n_types,
               sum(c * ln(CAST(c AS DOUBLE)))
                   OVER (PARTITION BY user_id ORDER BY event_type
                         ROWS UNBOUNDED PRECEDING) AS s,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_type DESC) AS rn
        FROM cnts
    )
    SELECT user_id, n AS n_events,
           CAST(n_types AS BIGINT) AS n_types,
           round(ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 4)
               AS entropy4
    FROM scored WHERE rn = 1
    ORDER BY user_id
"""
