"""Relational surface, round 5: bag-semantics set ops, boolean
aggregates, higher-order array lambdas, OHLC time-series downsampling,
distribution window functions, and correlated scalar subqueries —
rounding out SURVEY.md §2.3's declared/target surface (the reference
grammar executes none of the relational surface,
/root/reference/src/parser/sql.lalrpop:314-318; set ops and scalar
subqueries are standard PostgreSQL semantics the reference's
pg_catalog-derived surface implies).

Scale notes (100 TB):
- setop_bag_semantics: INTERSECT ALL / EXCEPT ALL compile to a single
  hash aggregation per input (Catalyst rewrites them as counted
  aggregates + generate) — one shuffle per side on the compare key, no
  sort, then the per-key recount is map-side partial. No driver work.
- agg_boolean_aggs: classic partial+final aggregation — bool_and/
  bool_or/count_if are all associative, so the map-side combine sends
  one row per (partition, group) across the wire.
- coll_lambda_ops: every lambda (filter/exists/forall/aggregate/
  zip_with) is row-local JVM codegen over the token array — zero
  shuffle until the final ORDER BY of the 500-row-per-SF result;
  at 100 TB this is the pure map-stage shape, like text_quality.
- ts_ohlc_downsample: one shuffle on the bucket key; open/close come
  from a row_number window partitioned by the same key, so the window
  sort and the aggregation share a single exchange (AQE coalesces).
  Downsampling is the canonical 100 TB → dashboard reduction: output
  cardinality is time-buckets × symbols, independent of input rows.
- w_distribution_funcs: one shuffle on the partition key; percent_rank/
  cume_dist/ntile share one window sort. Ranks divide row counts —
  integer-over-integer IEEE division is bit-identical across engines.
- subq_scalar_correlated: Catalyst decorrelates both scalar subqueries
  into one aggregate-then-join on c_nationkey — no per-row re-execution
  (the same shape as q17's decorrelation). The acctbal-vs-nation-mean
  comparison is cross-multiplied in integer cents, so the predicate is
  exact on both engines (no float-mean boundary flips).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# bag-semantics set operations: INTERSECT ALL / EXCEPT ALL / UNION ALL
# --------------------------------------------------------------------------
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset semantics (duplicates preserved): suppkey occurrences on
    returned lines vs finished lines. Distinct-set ops are in
    setop_union_intersect_except; this exercises the ALL variants, which
    Catalyst rewrites into counted hash aggregates (no sort)."""
    l = load(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    b = l.filter(F.col("l_linestatus") == "F").select(F.col("l_suppkey").alias("k"))

    def counted(df: DataFrame, op: str) -> DataFrame:
        return (
            df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(op).alias("op"), "k", "n")
        )

    return (
        counted(a.intersectAll(b), "intersect_all")
        .unionAll(counted(a.exceptAll(b), "except_all"))
        .unionAll(counted(a.unionAll(b), "union_all"))
        .orderBy("op", "k")
    )


# --------------------------------------------------------------------------
# boolean aggregates: bool_and / bool_or / count_if
# --------------------------------------------------------------------------
def agg_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.bool_and(F.col("o_totalprice") > 5000).alias("all_over_5k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# higher-order array lambdas: filter / exists / forall / aggregate / zip_with
# --------------------------------------------------------------------------
def coll_lambda_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda family over token arrays. Every expression is row-local
    whole-stage codegen (no UDF, no shuffle); zip_with pairs each token
    with its 1-based position for a position-weighted length sum."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("toks", F.expr("split(text, ' ')"))
        .select(
            "doc_id",
            F.expr("size(filter(toks, t -> length(t) > 4))").alias("n_long"),
            F.expr("exists(toks, t -> length(t) >= 8)").alias("has_verylong"),
            F.expr("forall(toks, t -> length(t) <= 10)").alias("all_short"),
            F.expr("aggregate(toks, 0, (acc, t) -> acc + length(t))").alias(
                "total_len"
            ),
            F.expr(
                "aggregate(zip_with(toks, sequence(1, size(toks)),"
                " (t, i) -> i * length(t)), 0L, (acc, x) -> acc + x)"
            ).alias("pos_weighted_len"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# OHLC downsampling: per-hour open/high/low/close/volume over events
# --------------------------------------------------------------------------
def ts_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick reduction of the event stream: first/last value by
    (ts, event_id) order — deterministic under duplicate timestamps —
    plus min/max/count/volume per hour bucket."""
    e = load(spark, sf_dir, "events").withColumn(
        "hr", F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
    )
    w_a = Window.partitionBy("hr").orderBy("ts", "event_id")
    w_d = Window.partitionBy("hr").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
        .groupBy("hr")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
        .orderBy("hr")
    )


# --------------------------------------------------------------------------
# distribution window functions: percent_rank / cume_dist / ntile
# --------------------------------------------------------------------------
def w_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
        F.ntile(4).over(w).alias("price_quartile"),
    ).orderBy("p_brand", "p_partkey")


# --------------------------------------------------------------------------
# correlated scalar subqueries: customers above their nation's mean balance
# --------------------------------------------------------------------------
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("ks_customer_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT count(*) FROM ks_customer_sq c2
                 WHERE c2.c_nationkey = c.c_nationkey) AS nation_peers
        FROM ks_customer_sq c
        WHERE CAST(round(c.c_acctbal * 100) AS BIGINT)
                * (SELECT count(*) FROM ks_customer_sq c2
                    WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                   FROM ks_customer_sq c2
                  WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
        """
    )


QUERIES = {
    "setop_bag_semantics": setop_bag_semantics,
    "agg_boolean_aggs": agg_boolean_aggs,
    "coll_lambda_ops": coll_lambda_ops,
    "ts_ohlc_downsample": ts_ohlc_downsample,
    "w_distribution_funcs": w_distribution_funcs,
    "subq_scalar_correlated": subq_scalar_correlated,
}

ORACLES = {
    "setop_bag_semantics": """
        WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
             b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F')
        SELECT op, k, n FROM (
            SELECT 'intersect_all' AS op, k, count(*) AS n
            FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
            UNION ALL
            SELECT 'except_all' AS op, k, count(*) AS n
            FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
            UNION ALL
            SELECT 'union_all' AS op, k, count(*) AS n
            FROM (SELECT k FROM a UNION ALL SELECT k FROM b) GROUP BY k
        )
        ORDER BY op, k
    """,
    "agg_boolean_aggs": """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               bool_and(o_totalprice > 5000) AS all_over_5k,
               bool_or(o_totalprice > 400000) AS any_over_400k,
               CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "coll_lambda_ops": """
        SELECT doc_id,
               CAST(len(list_filter(toks, t -> length(t) > 4)) AS INTEGER)
                   AS n_long,
               len(list_filter(toks, t -> length(t) >= 8)) > 0
                   AS has_verylong,
               len(list_filter(toks, t -> length(t) > 10)) = 0
                   AS all_short,
               CAST(list_sum(list_transform(toks, t -> length(t)))
                    AS INTEGER) AS total_len,
               CAST(list_sum(list_transform(toks, (t, i) -> i * length(t)))
                    AS BIGINT) AS pos_weighted_len
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        ORDER BY doc_id
    """,
    "ts_ohlc_downsample": """
        SELECT hr,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               count(*) AS n_events,
               round(sum(value), 2) AS volume
        FROM (
            SELECT date_trunc('hour', ts) AS hr, value,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        GROUP BY hr
        ORDER BY hr
    """,
    "w_distribution_funcs": """
        SELECT p_brand, p_partkey,
               percent_rank() OVER w AS price_pct_rank,
               cume_dist() OVER w AS price_cume_dist,
               CAST(ntile(4) OVER w AS INTEGER) AS price_quartile
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        ORDER BY p_brand, p_partkey
    """,
    "subq_scalar_correlated": """
        SELECT c_custkey, c_name,
               (SELECT count(*) FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey) AS nation_peers
        FROM customer c
        WHERE CAST(round(c.c_acctbal * 100) AS BIGINT)
                * (SELECT count(*) FROM customer c2
                    WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                             AS BIGINT)
                   FROM customer c2
                  WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
    """,
}


# --------------------------------------------------------------------------
# per-group bottom-k hash sampling (distributed reservoir equivalent)
# --------------------------------------------------------------------------
def sample_bottomk_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k=5 sample WITHOUT replacement per order priority, via
    bottom-k over md5(o_orderkey) — the mergeable form of reservoir
    sampling: the bottom-k of a union is the bottom-k of the merged
    bottom-k sets, so per-partition samples combine associatively (a
    real reservoir's RNG state does not). Same determinism story as
    sample_hash_10pct; the hash plays the role of the random tag.

    One shuffle on the group key; the rank window rides that exchange.
    """
    o = load(spark, sf_dir, "orders")
    tag = F.md5(F.col("o_orderkey").cast("string"))
    w = Window.partitionBy("o_orderpriority").orderBy(tag.asc())
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "o_orderpriority",
            F.col("rk").alias("sample_rank"),
            "o_orderkey",
            "o_totalprice",
        )
        .orderBy("o_orderpriority", "sample_rank")
    )


QUERIES["sample_bottomk_reservoir"] = sample_bottomk_reservoir

ORACLES["sample_bottomk_reservoir"] = """
    SELECT o_orderpriority, CAST(rk AS INTEGER) AS sample_rank, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY md5(CAST(o_orderkey AS VARCHAR)))
                   AS rk
        FROM orders
    )
    WHERE rk <= 5
    ORDER BY o_orderpriority, sample_rank
"""


# --------------------------------------------------------------------------
# generated calendar dimension (FROM-less table generation at scale)
# --------------------------------------------------------------------------
def ts_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generated from the orders date range — the
    scale analog of the reference's FROM-less Result node (its only
    executable SELECT shape, optimizer.rs:23-62): a table produced by
    expression evaluation, not a scan. One row per day via
    sequence+explode; joinable to any fact on the date key. All fields
    are integer date-part functions — exact in both engines; ISO
    weekday via (dayofweek + 5) % 7 + 1 so Monday=1 matches DuckDB's
    isodow."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    return (
        bounds.select(
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
        )
        .selectExpr(
            "d AS cal_date",
            "year(d) AS y",
            "quarter(d) AS q",
            "month(d) AS m",
            "day(d) AS dom",
            "(dayofweek(d) + 5) % 7 + 1 AS isodow",
            "(dayofweek(d) + 5) % 7 + 1 >= 6 AS is_weekend",
            "dayofyear(d) AS doy",
        )
        .orderBy("cal_date")
    )


QUERIES["ts_calendar_dim"] = ts_calendar_dim

ORACLES["ts_calendar_dim"] = """
    WITH bounds AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS d0,
               CAST(max(o_orderdate) AS DATE) AS d1
        FROM orders
    )
    SELECT CAST(d AS DATE) AS cal_date,
           CAST(year(d) AS INTEGER) AS y,
           CAST(quarter(d) AS INTEGER) AS q,
           CAST(month(d) AS INTEGER) AS m,
           CAST(day(d) AS INTEGER) AS dom,
           CAST(isodow(d) AS INT) AS isodow,
           isodow(d) >= 6 AS is_weekend,
           CAST(dayofyear(d) AS INT) AS doy
    FROM (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
        FROM bounds
    )
    ORDER BY cal_date
"""


# --------------------------------------------------------------------------
# try_* error-safe arithmetic (the NULL-on-failure complement of ANSI mode)
# --------------------------------------------------------------------------
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine runs ANSI mode (overflow/div-zero/bad-cast RAISE,
    matching the reference's checked arithmetic — adt.rs:29-33); the
    try_* family is the explicit opt-OUT: NULL on failure instead of an
    error, per expression. Exercises try_divide (÷0 and interval),
    try_add overflow at the BIGINT edge, try_cast on malformed input,
    and try_element_at past the end — each against a DuckDB equivalent
    spelled with TRY_CAST/NULLIF/CASE guards."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    big = 9_223_372_036_854_775_807  # BIGINT max
    return (
        o.selectExpr(
            "o_orderkey",
            "try_divide(o_totalprice, o_orderkey % 3) AS div_maybe_zero",
            f"try_add({big}L, o_orderkey) AS add_overflow",
            "try_add(o_orderkey, 1) AS add_ok",
            "try_cast(CASE WHEN o_orderkey % 2 = 0 THEN 'not-a-number' "
            "ELSE CAST(o_orderkey AS STRING) END AS BIGINT) AS cast_maybe",
            "try_element_at(array(1, 2, 3), CAST(o_orderkey % 5 AS INT) + 1)"
            " AS elem_maybe",
        )
        .orderBy("o_orderkey")
    )


QUERIES["scalar_try_arithmetic"] = scalar_try_arithmetic

ORACLES["scalar_try_arithmetic"] = """
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_orderkey % 3, 0) AS div_maybe_zero,
           CASE WHEN o_orderkey > 0 THEN NULL
                ELSE 9223372036854775807 + o_orderkey END AS add_overflow,
           o_orderkey + 1 AS add_ok,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0 THEN 'not-a-number'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT)
               AS cast_maybe,
           CASE WHEN o_orderkey % 5 + 1 <= 3
                THEN CAST(o_orderkey % 5 + 1 AS INT) END AS elem_maybe
    FROM orders
    WHERE o_orderkey < 1000
    ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# salted two-phase aggregation (skew remedy as an oracled query)
# --------------------------------------------------------------------------
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately skewed key
    (l_returnflag has ~3 values over the whole table — every row of a
    group lands on one reducer in the naive plan): phase 1 aggregates
    (key, salt) with a deterministic md5 salt spreading each group over
    8 reducers, phase 2 merges the 8 partials per key. Every aggregate
    here is associative (count/sum/min/max — sums in exact integer
    cents), so the result is IDENTICAL to the direct groupBy the oracle
    spells — which is the point: salting is a physical rewrite, not a
    semantic one. (Spark's own partial aggregation already does this
    map-side; explicit salting is the remedy when the skew survives to
    the REDUCE side, e.g. high-cardinality-input distincts or
    collect_list payloads per hot key.)"""
    from kuibadb_spark.plans.salting import salt_column

    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", salt_column(F.col("l_orderkey"), 8))
    phase1 = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias(
            "cents"
        ),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    )
    return (
        phase1.groupBy("l_returnflag")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum("cents").alias("revenue_cents"),
            F.min("mn").alias("min_qty"),
            F.max("mx").alias("max_qty"),
            F.count(F.lit(1)).alias("n_salt_partials"),
        )
        .orderBy("l_returnflag")
    )


QUERIES["agg_salted_skew"] = agg_salted_skew

ORACLES["agg_salted_skew"] = """
    WITH salted AS (
        SELECT l_returnflag, l_extendedprice, l_quantity,
               CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 8 AS salt
        FROM lineitem
    ),
    phase1 AS (
        SELECT l_returnflag, salt, count(*) AS n,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents,
               min(l_quantity) AS mn, max(l_quantity) AS mx
        FROM salted GROUP BY l_returnflag, salt
    )
    SELECT l_returnflag,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           min(mn) AS min_qty,
           max(mx) AS max_qty,
           count(*) AS n_salt_partials
    FROM phase1
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# null-safe equality join: <=> (IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-join semantics side by side: keys with injected NULLs joined
    under plain `=` (NULL matches nothing — 3VL) vs `<=>` / IS NOT
    DISTINCT FROM (NULL matches NULL — the PostgreSQL operator the
    reference's catalog family implies for null-safe comparisons). Emits
    per-key pair counts under both operators; the NULL bucket exists
    only in the null-safe column.

    Plan shape: the pair count per key is |a_k| × |b_k| — computed as a
    product of per-side aggregates joined null-safely on the 51-row
    count tables, NEVER by materializing the pair join (the low-
    cardinality key makes that quadratic: 450M joined rows, measured
    5.8 s at sf0.1 vs 0.4 s for this form — and it is exactly the
    fan-out that melts first at 100 TB). Spark plans EqualNullSafe as a
    hash key like any equi-join — that part is unchanged."""
    o = load(spark, sf_dir, "orders")
    keyed = o.selectExpr(
        "CASE WHEN o_orderkey % 97 = 0 THEN NULL"
        " ELSE o_custkey % 50 END AS k",
        "o_orderkey",
    )
    # groupBy puts NULL keys in their own group (null-safe by nature)
    ca = (
        keyed.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("na"))
        .alias("ca")
    )
    cb = (
        keyed.filter(F.col("o_orderkey") % 2 == 1)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nb"))
        .alias("cb")
    )
    return (
        ca.join(cb, F.col("ca.k").eqNullSafe(F.col("cb.k")))
        .selectExpr(
            "ca.k AS k",
            "na * nb AS n_nullsafe",
            "CASE WHEN ca.k IS NULL THEN 0L ELSE na * nb END AS n_strict",
            "ca.k IS NULL AS is_null_bucket",
        )
        .orderBy(F.col("k").asc_nulls_first())
    )


QUERIES["join_null_safe_eq"] = join_null_safe_eq

ORACLES["join_null_safe_eq"] = """
    WITH keyed AS (
        SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                    ELSE o_custkey % 50 END AS k,
               o_orderkey
        FROM orders
    ),
    a AS (SELECT * FROM keyed WHERE o_orderkey % 2 = 0),
    b AS (SELECT * FROM keyed WHERE o_orderkey % 2 = 1),
    strict AS (
        SELECT a.k, count(*) AS n_strict
        FROM a JOIN b ON a.k = b.k
        GROUP BY a.k
    ),
    nullsafe AS (
        SELECT a.k, count(*) AS n_nullsafe
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        GROUP BY a.k
    )
    SELECT ns.k, ns.n_nullsafe,
           coalesce(s.n_strict, 0) AS n_strict,
           ns.k IS NULL AS is_null_bucket
    FROM nullsafe ns
    LEFT JOIN strict s ON ns.k IS NOT DISTINCT FROM s.k
    ORDER BY ns.k ASC NULLS FIRST
"""
