"""Composed pipelines — the queries a training-data curation job actually
runs: multiple operators from this engine chained in one plan. These are
the integration proof that the operator surface composes (filter →
dedup → stats in a single Catalyst plan, no materialization between
stages).

Scale notes: the curation pipeline is scan → narrow filters → one
hash-groupBy (dedup) → one groupBy (stats): two shuffles total at any
corpus size. The funnel is a single per-user aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# curation pipeline: quality gate → language allowlist → exact dedup →
# per-language corpus statistics
# --------------------------------------------------------------------------
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.withColumn("toks", F.split("text", r"\s+"))
    quality = toks.withColumn("n_toks", F.size("toks")).withColumn(
        "uniq_ratio", F.size(F.array_distinct("toks")) / F.col("n_toks")
    )
    gated = quality.filter(
        (F.col("n_toks") >= 20)
        & (F.col("uniq_ratio") > 0.3)
        & F.col("lang").isin("en", "de", "fr")
    )
    deduped = (
        gated.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("lang").alias("lang"),
            F.min("n_toks").alias("n_toks"),
        )
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_toks"),
            F.expr("(sum(n_toks) * 100) div count(1)").alias("toks_per_doc_e2"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# top-k frequent tokens per language (exact, window top-k)
# --------------------------------------------------------------------------
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", r"\s+")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "rank", "tok", "n")
        .orderBy("lang", "rank")
    )


# --------------------------------------------------------------------------
# funnel: signup → first purchase conversion per user cohort
# --------------------------------------------------------------------------
def ev_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase_ts"
        ),
    )
    converted = per_user.withColumn(
        "converted",
        F.col("signup_ts").isNotNull()
        & F.col("first_purchase_ts").isNotNull()
        & (F.col("first_purchase_ts") > F.col("signup_ts")),
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("signup_ts").isNotNull(), 1).otherwise(0)).alias(
            "n_signed_up"
        ),
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("n_converted"),
    )


# --------------------------------------------------------------------------
# retention cohorts: signup week × weeks-since-signup activity matrix
# --------------------------------------------------------------------------
def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("WEEK", F.min("ts")).alias("cohort_week")
    )
    activity = e.join(first_seen, "user_id").withColumn(
        "week_offset",
        F.expr(
            "CAST(timestampdiff(DAY, cohort_week, date_trunc('WEEK', ts)) div 7"
            " AS INT)"
        ),
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# data profiling: per-column nulls / exact NDV / extrema in one pass shape
# --------------------------------------------------------------------------
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    parts = []
    for c in cols:
        parts.append(
            l.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.when(F.col(c).isNull(), 1)).alias("n_nulls"),
                F.countDistinct(c).alias("ndv"),
                F.min(c).cast("string").alias("min_s"),
                F.max(c).cast("string").alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("col_name")


QUERIES = {
    "profile_lineitem": profile_lineitem,
    "ev_retention_cohorts": ev_retention_cohorts,
    "pipeline_curation": pipeline_curation,
    "text_top_tokens": text_top_tokens,
    "ev_funnel_signup_purchase": ev_funnel_signup_purchase,
}

ORACLES = {
    "profile_lineitem": """
        SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
               count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_nulls,
               count(DISTINCT l_orderkey) AS ndv,
               CAST(min(l_orderkey) AS VARCHAR) AS min_s,
               CAST(max(l_orderkey) AS VARCHAR) AS max_s
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', count(*),
               count(CASE WHEN l_quantity IS NULL THEN 1 END),
               count(DISTINCT l_quantity),
               CAST(CAST(min(l_quantity) AS DOUBLE) AS VARCHAR),
               CAST(CAST(max(l_quantity) AS DOUBLE) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', count(*),
               count(CASE WHEN l_returnflag IS NULL THEN 1 END),
               count(DISTINCT l_returnflag),
               min(l_returnflag), max(l_returnflag)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*),
               count(CASE WHEN l_shipdate IS NULL THEN 1 END),
               count(DISTINCT l_shipdate),
               strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'),
               strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')
        FROM lineitem
        ORDER BY col_name
    """,
    "ev_retention_cohorts": """
        WITH first_seen AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT e.user_id, f.cohort_week,
                   CAST(date_diff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7
                        AS INTEGER) AS week_offset
            FROM events e JOIN first_seen f ON e.user_id = f.user_id
        )
        SELECT cohort_week, week_offset,
               count(DISTINCT user_id) AS active_users
        FROM activity
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    "pipeline_curation": """
        WITH toks AS (
            SELECT doc_id, lang, text,
                   string_split_regex(text, '\\s+') AS toks
            FROM documents
        ), quality AS (
            SELECT doc_id, lang, text, len(toks) AS n_toks,
                   len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                       AS uniq_ratio
            FROM toks
        ), gated AS (
            SELECT * FROM quality
            WHERE n_toks >= 20 AND uniq_ratio > 0.3
              AND lang IN ('en', 'de', 'fr')
        ), deduped AS (
            SELECT md5(text) AS h, min(doc_id) AS doc_id,
                   min(lang) AS lang, min(n_toks) AS n_toks
            FROM gated GROUP BY md5(text)
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS total_toks,
               CAST((sum(n_toks) * 100) // count(*) AS BIGINT) AS toks_per_doc_e2
        FROM deduped
        GROUP BY lang
        ORDER BY lang
    """,
    "text_top_tokens": """
        WITH counts AS (
            SELECT lang, unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents
        ), agg AS (
            SELECT lang, tok, count(*) AS n FROM counts GROUP BY lang, tok
        )
        SELECT lang, rank, tok, n FROM (
            SELECT lang, tok, n,
                   CAST(row_number() OVER (PARTITION BY lang
                        ORDER BY n DESC, tok ASC) AS INTEGER) AS rank
            FROM agg)
        WHERE rank <= 5
        ORDER BY lang, rank
    """,
    "ev_funnel_signup_purchase": """
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS first_purchase_ts
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN signup_ts IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signed_up,
               CAST(sum(CASE WHEN signup_ts IS NOT NULL
                             AND first_purchase_ts IS NOT NULL
                             AND first_purchase_ts > signup_ts
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        FROM per_user
    """,
}


# --------------------------------------------------------------------------
# declarative data-quality audit: constraint checks as one aggregate
# --------------------------------------------------------------------------
def profile_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-test / Great-Expectations-style constraint audit compiled to
    aggregates — the reference enforces NOT NULL imperatively at write
    time (check_notnull, /root/reference src/access/cs.rs:58-76); at
    warehouse scale constraints are VERIFIED declaratively: each rule is
    a count over a predicate, referential rules are broadcast anti-join
    counts, and the whole audit is a handful of scans emitting one row
    per rule (rule, n_violations, pass). Nothing moves but counters."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    def rule(name, violating):
        return violating.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_violations")
        ).selectExpr(
            f"'{name}' AS rule", "n_violations", "n_violations = 0 AS pass"
        )

    checks = [
        rule("lineitem_quantity_positive",
             li.filter(~(F.col("l_quantity") > 0))),
        rule("lineitem_discount_range",
             li.filter(~F.col("l_discount").between(0.0, 1.0))),
        rule("orders_totalprice_notnull",
             o.filter(F.col("o_totalprice").isNull())),
        rule("orders_custkey_refs_customer",
             o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")),
        rule("lineitem_orderkey_refs_orders",
             li.join(F.broadcast(o.select("o_orderkey")),
                     li.l_orderkey == F.col("o_orderkey"), "left_anti")),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionAll(ch)
    return out.orderBy("rule")


QUERIES["profile_constraint_checks"] = profile_constraint_checks

ORACLES["profile_constraint_checks"] = """
    SELECT rule, n_violations, n_violations = 0 AS pass FROM (
        SELECT 'lineitem_quantity_positive' AS rule,
               count(*) FILTER (WHERE NOT (l_quantity > 0)) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_discount_range',
               count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 1.0))
        FROM lineitem
        UNION ALL
        SELECT 'orders_totalprice_notnull',
               count(*) FILTER (WHERE o_totalprice IS NULL)
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_refs_customer',
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'lineitem_orderkey_refs_orders',
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
    )
    ORDER BY rule
"""


# --------------------------------------------------------------------------
# A/B experiment readout: hash-assigned variants, integer-exact lift
# --------------------------------------------------------------------------
def ev_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation readout: users deterministically hash-assigned to
    control/treatment (md5 bucket — the same stable assignment a real
    platform uses so a user never flips arms), purchase behavior
    compared per arm with integer-cents means at 1e-2 precision and the
    treatment-minus-control lift emitted in exact integer units. One
    row per arm plus a 'lift' row — everything partial-aggregable, no
    floats in any cross-row path."""
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )
    armed = p.withColumn(
        "arm",
        F.when(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            "control",
        ).otherwise("treatment"),
    )
    per_arm = armed.groupBy("arm").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("total_cents"),
    ).withColumn(
        "mean_cents_per_purchase",
        F.expr("total_cents div n_purchases"),
    )
    lift = (
        per_arm.groupBy()
        .pivot("arm", ["control", "treatment"])
        .sum("total_cents")
        .selectExpr(
            "'lift' AS arm",
            "CAST(NULL AS BIGINT) AS n_users",
            "CAST(NULL AS BIGINT) AS n_purchases",
            "treatment - control AS total_cents",
            "CAST(NULL AS BIGINT) AS mean_cents_per_purchase",
        )
    )
    return per_arm.unionAll(lift).orderBy("arm")


QUERIES["ev_ab_test_lift"] = ev_ab_test_lift

ORACLES["ev_ab_test_lift"] = """
    WITH armed AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                             1, 8) AS BIGINT) % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm
        FROM events
        WHERE event_type = 'purchase'
    ),
    per_arm AS (
        SELECT arm,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_purchases,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(cents) // count(*) AS BIGINT)
                   AS mean_cents_per_purchase
        FROM armed
        GROUP BY arm
    )
    SELECT arm, n_users, n_purchases, total_cents, mean_cents_per_purchase
    FROM per_arm
    UNION ALL
    SELECT 'lift', NULL, NULL,
           (SELECT total_cents FROM per_arm WHERE arm = 'treatment')
             - (SELECT total_cents FROM per_arm WHERE arm = 'control'),
           NULL
    ORDER BY arm
"""


# --------------------------------------------------------------------------
# ordered 4-step funnel: signup → view → click → purchase, in time order
# --------------------------------------------------------------------------
def ev_step_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic ordered funnel chart: users who did signup, then a
    view within 24 h after the signup, then a click within 24 h of that
    view, then a purchase within 24 h of that click — per-step user
    counts and step-over-step conversion in exact integer ppm. The
    24 h step deadline is what makes the funnel slope on this fixture
    (150 → 39 → 16 → 5 users at sf0.01); without it every user
    eventually completes every step.

    Plan shape: four chained window passes over ONE user_id exchange
    (each step's first-qualifying timestamp is a min-over-partition
    that references the previous step's column — no self-joins, no
    per-user arrays), then a global conditional aggregate whose output
    is 4 rows. At 100 TB: one shuffle of (user, type, ts) triples,
    window state is 4 timestamps per user."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type AS et", "unix_micros(CAST(ts AS TIMESTAMP)) AS us"
    )
    w = W.partitionBy("user_id")
    staged = (
        e.withColumn("t1", F.min(F.when(F.col("et") == "signup", F.col("us"))).over(w))
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("et") == "view")
                    & (F.col("us") > F.col("t1"))
                    & (F.col("us") - F.col("t1") <= 86400000000),
                    F.col("us"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("et") == "click")
                    & (F.col("us") > F.col("t2"))
                    & (F.col("us") - F.col("t2") <= 86400000000),
                    F.col("us"),
                )
            ).over(w),
        )
        .withColumn(
            "t4",
            F.min(
                F.when(
                    (F.col("et") == "purchase")
                    & (F.col("us") > F.col("t3"))
                    & (F.col("us") - F.col("t3") <= 86400000000),
                    F.col("us"),
                )
            ).over(w),
        )
        .select("user_id", "t1", "t2", "t3", "t4")
        .distinct()
    )
    agg = staged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
        F.count("t4").alias("n4"),
    )
    return (
        agg.selectExpr(
            "stack(4,"
            " 1, 'signup', n1, CAST(1000000 * n1 div n0 AS BIGINT),"
            " 2, 'view_after_signup', n2, CAST(1000000 * n2 div n1 AS BIGINT),"
            " 3, 'click_after_view', n3, CAST(1000000 * n3 div n2 AS BIGINT),"
            " 4, 'purchase_after_click', n4, CAST(1000000 * n4 div n3 AS BIGINT)"
            ") AS (step, step_name, n_users, conv_ppm)"
        )
        .orderBy("step")
    )


QUERIES["ev_step_funnel"] = ev_step_funnel

ORACLES["ev_step_funnel"] = """
    WITH e AS (
        SELECT user_id, event_type AS et, epoch_us(ts) AS us FROM events
    ),
    staged AS (
        SELECT DISTINCT user_id, t1, t2, t3, t4 FROM (
            SELECT user_id,
                   t1, t2, t3,
                   min(CASE WHEN et = 'purchase' AND us > t3 AND us - t3 <= 86400000000 THEN us END)
                       OVER (PARTITION BY user_id) AS t4
            FROM (
                SELECT user_id, et, us, t1, t2,
                       min(CASE WHEN et = 'click' AND us > t2 AND us - t2 <= 86400000000 THEN us END)
                           OVER (PARTITION BY user_id) AS t3
                FROM (
                    SELECT user_id, et, us, t1,
                           min(CASE WHEN et = 'view' AND us > t1 AND us - t1 <= 86400000000 THEN us END)
                               OVER (PARTITION BY user_id) AS t2
                    FROM (
                        SELECT user_id, et, us,
                               min(CASE WHEN et = 'signup' THEN us END)
                                   OVER (PARTITION BY user_id) AS t1
                        FROM e
                    )
                )
            )
        )
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(count(t1) AS BIGINT) AS n1,
               CAST(count(t2) AS BIGINT) AS n2,
               CAST(count(t3) AS BIGINT) AS n3,
               CAST(count(t4) AS BIGINT) AS n4
        FROM staged
    )
    SELECT * FROM (
        SELECT 1 AS step, 'signup' AS step_name, n1 AS n_users,
               CAST(1000000 * n1 // n0 AS BIGINT) AS conv_ppm FROM agg
        UNION ALL
        SELECT 2, 'view_after_signup', n2, CAST(1000000 * n2 // n1 AS BIGINT)
        FROM agg
        UNION ALL
        SELECT 3, 'click_after_view', n3, CAST(1000000 * n3 // n2 AS BIGINT)
        FROM agg
        UNION ALL
        SELECT 4, 'purchase_after_click', n4, CAST(1000000 * n4 // n3 AS BIGINT)
        FROM agg
    )
    ORDER BY step
"""


# --------------------------------------------------------------------------
# distribution drift: first half vs second half of the stream, chi² in ppm
# --------------------------------------------------------------------------
def profile_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: per event type, compare the value distribution
    of the stream's first time-half against its second (50-unit value
    bands) with a per-band chi-square statistic Σ 1e6·(a−b)² div (a+b)
    — cross-multiplied integer arithmetic, so the drift score is exact
    across engines (the float PSI/chi² it stands in for is ulp-unstable
    under partial-sum reordering). The time split is the integer
    microsecond midpoint of the observed range.

    Scale: two metadata-cheap global bounds, one row-local band/half
    tag, one partial-aggregated groupBy(type, band) producing a
    bands×types table, and a tiny final reduce — the same shape as any
    monitoring rollup; output cardinality = event types."""
    e = load(spark, sf_dir, "events")
    b = e.agg(
        F.min(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).alias("lo"),
        F.max(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).alias("hi"),
    )
    banded = (
        e.crossJoin(F.broadcast(b))
        .selectExpr(
            "event_type",
            "CAST(floor(value / 50.0) AS INT) AS band",
            "CASE WHEN unix_micros(CAST(ts AS TIMESTAMP)) * 2 <= lo + hi"
            " THEN 0 ELSE 1 END AS half",
        )
        .groupBy("event_type", "band")
        .agg(
            F.count_if(F.col("half") == 0).cast("bigint").alias("a"),
            F.count_if(F.col("half") == 1).cast("bigint").alias("b"),
        )
    )
    return (
        banded.groupBy("event_type")
        .agg(
            F.sum("a").alias("n_first"),
            F.sum("b").alias("n_second"),
            F.sum(
                F.expr("1000000 * (a - b) * (a - b) div (a + b)")
            ).alias("chi2_e6"),
        )
        .orderBy("event_type")
    )


QUERIES["profile_drift_chi2"] = profile_drift_chi2

ORACLES["profile_drift_chi2"] = """
    WITH b AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ),
    banded AS (
        SELECT event_type,
               CAST(floor(value / 50.0) AS INTEGER) AS band,
               CAST(count_if(epoch_us(ts) * 2 <= lo + hi) AS BIGINT) AS a,
               CAST(count_if(epoch_us(ts) * 2 > lo + hi) AS BIGINT) AS b
        FROM events, b
        GROUP BY event_type, band
    )
    SELECT event_type,
           CAST(sum(a) AS BIGINT) AS n_first,
           CAST(sum(b) AS BIGINT) AS n_second,
           CAST(sum(1000000 * (a - b) * (a - b) // (a + b)) AS BIGINT)
               AS chi2_e6
    FROM banded
    GROUP BY event_type
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation: quintile scores over recency/frequency/monetary
# ---------------------------------------------------------------------------
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per customer,
    recency (latest order date), frequency (order count), and monetary
    (lifetime value, exact integer cents so double summation order can't
    drift), each ntile(5)-scored with a fully deterministic ordering
    (metric, then custkey — ntile's bucket-remainder rule is the SQL
    standard in both engines, so assignments match exactly). Output is
    the segment-level rollup: customers, total cents, and min/max of
    each score in the segment.

    Scale shape: one groupBy(custkey) over orders (partial-agg), then
    three exact distributed ntiles (plans/ranks.py: range-repartition
    + partitioned row_number + a broadcast prefix cross over the
    ≤32 per-range counts). No global window anywhere — the old form's
    three single-task entity-frame sorts (the round-7 [ent] whitelist
    entry) are retired; bucket assignments are bit-identical to window
    ntile, so the oracle is unchanged."""
    from kuibadb_spark.plans.ranks import distributed_ntile

    o = load(spark, sf_dir, "orders").selectExpr(
        "o_custkey",
        "o_orderdate",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )
    scored = distributed_ntile(
        distributed_ntile(
            distributed_ntile(
                per_cust,
                [F.asc("last_order"), F.asc("o_custkey")], 5, "r",
            ),
            [F.asc("n_orders"), F.asc("o_custkey")], 5, "f",
        ),
        [F.asc("total_cents"), F.asc("o_custkey")], 5, "m",
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("total_cents").alias("segment_cents"),
            F.min("n_orders").alias("min_orders"),
            F.max("n_orders").alias("max_orders"),
        )
        .orderBy("r", "f", "m")
    )


QUERIES["rfm_segmentation"] = rfm_segmentation

ORACLES["rfm_segmentation"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        GROUP BY o_custkey
    ),
    scored AS (
        SELECT *,
               ntile(5) OVER (ORDER BY last_order ASC, o_custkey ASC) AS r,
               ntile(5) OVER (ORDER BY n_orders ASC, o_custkey ASC) AS f,
               ntile(5) OVER (ORDER BY total_cents ASC, o_custkey ASC) AS m
        FROM per_cust
    )
    SELECT CAST(r AS INTEGER) AS r,
           CAST(f AS INTEGER) AS f,
           CAST(m AS INTEGER) AS m,
           count(*) AS n_customers,
           CAST(sum(total_cents) AS BIGINT) AS segment_cents,
           min(n_orders) AS min_orders,
           max(n_orders) AS max_orders
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
"""


# ---------------------------------------------------------------------------
# linear multi-touch attribution: credit purchases across preceding touches
# ---------------------------------------------------------------------------
def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — each purchase splits one unit of
    credit equally (integer ppm) across ALL the user's view/click
    touches in the trailing 7 days (inclusive of the purchase instant).
    No join forms: purchases and touches ride ONE per-user exchange and
    the per-type touch counts come from conditional counts over a
    RANGE frame keyed on integer microseconds — the w_trailing window
    discipline. Output is the per-channel credit rollup marketers
    actually consume.

    Scale shape: one shuffle on user_id; the range frame scans each
    user's 7-day trailing span once (sorted within partition); the
    final per-type rollup is a 2-row aggregate."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    tagged = e.selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    seven_d = 7 * 24 * 3600 * 1_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-seven_d, 0)
    )
    counted = (
        tagged.withColumn(
            "n_view",
            F.count(F.when(F.col("event_type") == "view", 1)).over(w),
        )
        .withColumn(
            "n_click",
            F.count(F.when(F.col("event_type") == "click", 1)).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .withColumn("n_touch", F.col("n_view") + F.col("n_click"))
        .filter(F.col("n_touch") > 0)
    )
    per_purchase = counted.selectExpr(
        "event_id",
        "n_view",
        "n_click",
        "n_touch",
        "(1000000 * n_view) div n_touch AS view_credit_ppm",
        "(1000000 * n_click) div n_touch AS click_credit_ppm",
    )
    return per_purchase.agg(
        F.count(F.lit(1)).alias("n_attributed_purchases"),
        F.sum("view_credit_ppm").alias("view_credit_ppm_total"),
        F.sum("click_credit_ppm").alias("click_credit_ppm_total"),
        F.sum("n_view").alias("touches_view"),
        F.sum("n_click").alias("touches_click"),
    )


QUERIES["ev_attribution_linear"] = ev_attribution_linear

ORACLES["ev_attribution_linear"] = """
    WITH tagged AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    counted AS (
        SELECT event_id, event_type,
               count(CASE WHEN event_type = 'view' THEN 1 END)
                   OVER w AS n_view_raw,
               count(CASE WHEN event_type = 'click' THEN 1 END)
                   OVER w AS n_click_raw
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    ),
    purchases AS (
        SELECT event_id,
               CAST(n_view_raw AS BIGINT) AS n_view,
               CAST(n_click_raw AS BIGINT) AS n_click,
               CAST(n_view_raw + n_click_raw AS BIGINT) AS n_touch
        FROM counted
        WHERE event_type = 'purchase' AND n_view_raw + n_click_raw > 0
    )
    SELECT count(*) AS n_attributed_purchases,
           CAST(sum((1000000 * n_view) // n_touch) AS BIGINT)
               AS view_credit_ppm_total,
           CAST(sum((1000000 * n_click) // n_touch) AS BIGINT)
               AS click_credit_ppm_total,
           CAST(sum(n_view) AS BIGINT) AS touches_view,
           CAST(sum(n_click) AS BIGINT) AS touches_click
    FROM purchases
"""
