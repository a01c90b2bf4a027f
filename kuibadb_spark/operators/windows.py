"""Window-function surface (SURVEY.md §2.3): ranking, analytic, and frame
queries. The reference reserves window functions in its catalog
(ProKind::Window, /root/reference src/catalog.rs:127-150) but declares
none; semantics follow the PostgreSQL contract, implemented with Spark's
native Window (JVM-side, whole-stage codegen — no UDFs).

Determinism rules for oracle hash-matching:
- every window ORDER BY ends in a unique key (tie-breaks pin row order for
  row_number/ntile/lag/lead/frames);
- cumulative float aggregates are rounded (frame order is deterministic,
  but rounding guards cross-engine FP formatting).

Scale notes: a window partitioned by a key is one shuffle on that key —
same cost model as groupBy. Partition keys here (customer, supplier,
user_id, brand) are high-cardinality, so partitions stay small and skew-
free; nothing requires a global sort except the final presentation ORDER
BY, which Spark executes as a range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# top-k per group: row_number ≤ k (the scalable top-k idiom — no global sort)
# --------------------------------------------------------------------------
def w_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# running (cumulative) aggregate per partition
# --------------------------------------------------------------------------
def w_running_revenue_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # accumulate integer cents: window sums are order-sensitive in doubles
    # (DuckDB uses segment trees), integers are exact in any order
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        l.filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .withColumn("running_revenue_cents", F.sum(rev_cents).over(w))
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "running_revenue_cents",
        )
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# lag / lead analytics over an event stream ordered by time
# --------------------------------------------------------------------------
def w_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_value", F.lag("value", 1).over(w))
        .withColumn("next_value", F.lead("value", 1).over(w))
        .withColumn(
            "gap_us",
            F.expr(
                "timestampdiff(MICROSECOND, lag(ts, 1) over "
                "(partition by user_id order by ts, event_id), ts)"
            ),
        )
        .filter(F.col("user_id") < 20)
        .select("user_id", "event_id", "ts", "value", "prev_value", "next_value", "gap_us")
        .orderBy("user_id", "ts", "event_id")
    )


# --------------------------------------------------------------------------
# ranking family: rank / dense_rank / ntile / percent_rank / cume_dist
# --------------------------------------------------------------------------
def w_ranking_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .withColumn("quartile", F.ntile(4).over(w))
        .withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
        .withColumn("cdist", F.round(F.cume_dist().over(w), 6))
        .select(
            "p_brand", "p_partkey", "p_retailprice",
            "rnk", "drnk", "quartile", "pct_rank", "cdist",
        )
        .orderBy("p_brand", "rnk", "p_partkey")
    )


# --------------------------------------------------------------------------
# sliding ROWS frame (moving average) + first/last value in frame
# --------------------------------------------------------------------------
def w_moving_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = base.rowsBetween(-2, 0)
    return (
        o.withColumn("mavg3", F.round(F.avg("o_totalprice").over(w3), 4))
        .withColumn("first_price", F.first("o_totalprice").over(w3))
        .withColumn(
            "last_price",
            F.last("o_totalprice").over(
                base.rowsBetween(W.currentRow, W.unboundedFollowing)
            ),
        )
        .filter(F.col("o_custkey") < 30)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
                "mavg3", "first_price", "last_price")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------------
# numeric RANGE frame: peers within a value band
# --------------------------------------------------------------------------
def w_range_frame_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice").rangeBetween(-100, 0)
    return (
        p.withColumn("n_in_band", F.count(F.lit(1)).over(w))
        .withColumn("band_sum", F.round(F.sum("p_retailprice").over(w), 2))
        .select("p_brand", "p_partkey", "p_retailprice", "n_in_band", "band_sum")
        .orderBy("p_brand", "p_retailprice", "p_partkey")
    )


# --------------------------------------------------------------------------
# nth_value + lag/lead with defaults + offset variants
# --------------------------------------------------------------------------
def w_nth_lag_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("ks_orders_w2")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               nth_value(o_totalprice, 2) OVER wf AS second_price,
               lag(o_totalprice, 2, -1.0) OVER wo AS lag2_dflt,
               lead(o_totalprice, 3, 0.0) OVER wo AS lead3_dflt
        FROM ks_orders_w2
        WHERE o_custkey < 40
        WINDOW wf AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wo AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
        """
    )


QUERIES = {
    "w_nth_lag_defaults": w_nth_lag_defaults,
    "w_top3_orders_per_customer": w_top3_orders_per_customer,
    "w_running_revenue_per_supplier": w_running_revenue_per_supplier,
    "w_lag_lead_events": w_lag_lead_events,
    "w_ranking_parts": w_ranking_parts,
    "w_moving_avg_orders": w_moving_avg_orders,
    "w_range_frame_prices": w_range_frame_prices,
}

ORACLES = {
    "w_nth_lag_defaults": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               nth_value(o_totalprice, 2) OVER wf AS second_price,
               lag(o_totalprice, 2, -1.0) OVER wo AS lag2_dflt,
               lead(o_totalprice, 3, 0.0) OVER wo AS lead3_dflt
        FROM orders
        WHERE o_custkey < 40
        WINDOW wf AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wo AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    "w_top3_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
            FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    "w_running_revenue_per_supplier": """
        SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS running_revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
        ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
    "w_lag_lead_events": """
        SELECT user_id, event_id, ts, value,
               lag(value, 1)  OVER w AS prev_value,
               lead(value, 1) OVER w AS next_value,
               CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS BIGINT) AS gap_us
        FROM events
        WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts, event_id
    """,
    "w_ranking_parts": """
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(rank()       OVER w AS INTEGER) AS rnk,
               CAST(dense_rank() OVER w AS INTEGER) AS drnk,
               CAST(ntile(4)     OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist()    OVER w, 6) AS cdist
        FROM part
        WINDOW w AS (PARTITION BY p_brand
                     ORDER BY p_retailprice DESC, p_partkey ASC)
        ORDER BY p_brand, rnk, p_partkey
    """,
    "w_moving_avg_orders": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
               first_value(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS first_price,
               last_value(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_price
        FROM orders
        WHERE o_custkey < 30
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "w_range_frame_prices": """
        SELECT p_brand, p_partkey, p_retailprice,
               count(*) OVER w AS n_in_band,
               round(sum(p_retailprice) OVER w, 2) AS band_sum
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice
                     RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        ORDER BY p_brand, p_retailprice, p_partkey
    """,
}


# --------------------------------------------------------------------------
# time-interval RANGE frame: per-row trailing 1-hour aggregates
# --------------------------------------------------------------------------
def w_trailing_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True per-row trailing window (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW): every event sees the aggregate of ITS
    OWN last hour — not the bucketed approximation tumbling/sliding
    windows give. The frame is value-defined (all ties included), so the
    result is order-independent within equal timestamps; the sum runs
    in exact integer cents. One shuffle on user_id + one sort — the
    same cost as any other window over the stream."""
    load(spark, sf_dir, "events").createOrReplaceTempView("ks_events_ttw")
    return spark.sql(
        """
        SELECT user_id, event_id, ts,
               count(*) OVER w AS n_last_hour,
               sum(CAST(round(value * 100) AS BIGINT)) OVER w
                   AS cents_last_hour
        FROM ks_events_ttw
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
        ORDER BY user_id, ts, event_id
        """
    )


QUERIES["w_trailing_time_window"] = w_trailing_time_window

ORACLES["w_trailing_time_window"] = """
    SELECT user_id, event_id, ts,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS cents_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
"""


# --------------------------------------------------------------------------
# price-streak histogram via ONE window pass (the islands trick) — the
# scale-path counterpart of rec_price_streaks' 24-step recursive CTE
# --------------------------------------------------------------------------
def w_price_streaks_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical output to rec_price_streaks (recursive.py), computed as
    a segmented scan instead of a linear recurrence: a reset flag
    (price not strictly above the previous) cumulative-sums into island
    ids, streak length = island row count, best = per-customer max.
    Three window/groupBy passes over ONE customer-hash exchange vs the
    recursion's depth × (join + shuffle) — this is the plan you'd run
    at 100 TB (measured 0.8 s vs ~10 s at sf0.1; the recursive twin
    stays in the registry as the declared WITH RECURSIVE surface, and
    both share one oracle shape so the driver pins them to the same
    answer)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("ck").orderBy("od", "ok")
    streaks = (
        o.select(
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").alias("tp"),
            F.col("o_orderdate").alias("od"),
            F.col("o_orderkey").alias("ok"),
        )
        .withColumn(
            "reset",
            F.when(
                F.lag("tp").over(w).isNull()
                | (F.col("tp") <= F.lag("tp").over(w)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("reset").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("ck", "island")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        streaks.groupBy("ck")
        .agg(F.max("len").alias("best_streak"))
        .groupBy("best_streak")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("best_streak")
    )


QUERIES["w_price_streaks_scan"] = w_price_streaks_scan

ORACLES["w_price_streaks_scan"] = """
    WITH flagged AS (
        SELECT o_custkey AS ck, o_orderdate AS od, o_orderkey AS ok,
               CASE WHEN lag(o_totalprice) OVER w IS NULL
                         OR o_totalprice <= lag(o_totalprice) OVER w
                    THEN 1 ELSE 0 END AS reset
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    islands AS (
        SELECT ck,
               sum(reset) OVER (PARTITION BY ck ORDER BY od, ok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    ),
    lens AS (SELECT ck, island, count(*) AS len FROM islands GROUP BY ck, island),
    best AS (SELECT ck, max(len) AS best_streak FROM lens GROUP BY ck)
    SELECT best_streak, count(*) AS n_customers
    FROM best GROUP BY best_streak ORDER BY best_streak
"""
