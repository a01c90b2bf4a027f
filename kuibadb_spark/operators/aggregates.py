"""Aggregation surface beyond plain groupBy (SURVEY.md §2.3): grouping
sets / rollup / cube, multi-distinct, statistical aggregates, FILTERed
and conditional aggregation, pivot, and sketch-based approximations.

The reference reserves aggregates in its catalog (ProKind::Agg,
/root/reference src/catalog.rs:127-133) but declares none; this module
supplies the PostgreSQL-contract surface with Spark built-ins only.

Scale notes: groupBy/rollup/cube all get map-side partial aggregation
(the Expand for rollup/cube multiplies rows AFTER the scan but partials
still combine before the shuffle). Multi-distinct triggers Spark's
Expand-based plan — one extra shuffle, unavoidable for exact distincts;
the sketch query (approx_count_distinct = HyperLogLog++) is the 100 TB
path where exactness isn't required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from kuibadb_spark.catalog import load


def _grp(col):  # grouping() → int in both engines
    return F.grouping(col).cast("int")


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _grp("l_returnflag").alias("g_rf"),
            _grp("l_linestatus").alias("g_ls"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            _grp("o_orderstatus").alias("g_st"),
            _grp("o_orderpriority").alias("g_pr"),
        )
        .orderBy("g_st", "g_pr", "o_orderstatus", "o_orderpriority")
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("ks_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS total,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls
        FROM ks_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
        """
    )


def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_part"),
            F.countDistinct("l_suppkey").alias("nd_supp"),
            F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_dist_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.stddev_pop("l_discount"), 6).alias("sdp_disc"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
            F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("cov_pd"),
            F.round(F.covar_pop("l_extendedprice", "l_discount"), 4).alias("covp_pd"),
        )
        .orderBy("l_returnflag")
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-status percentiles of order value — the declared exact
    quantile surface. Scale shape: percentile() buffers a counts map
    over DISTINCT o_totalprice cents per group (bounded by the price
    grid, not row count), but its updates are interpreted
    ObjectHashAggregate work; at agg_approx_sketches-scale inputs the
    codegen histogram-selection spelling there (aggregates.py:219) is
    the drop-in replacement, and approx_percentile is the sketch path."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    big = F.col("value") > 100.0
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.when(big, 1)).alias("n_big"),
            F.round(F.sum(F.when(big, F.col("value")).otherwise(0.0)), 2).alias(
                "sum_big"
            ),
            F.bool_or(big).alias("any_big"),
            F.bool_and(big).alias("all_big"),
            # argmax with unique tie-break: bare max_by(value) is
            # nondeterministic when values tie (bit us at sf0.1); the key is
            # zero-padded (cents, event_id) so lexicographic == numeric
            F.expr(
                "max_by(event_id, concat(lpad(CAST(CAST(round(value * 100) AS BIGINT)"
                " AS STRING), 12, '0'), lpad(CAST(event_id AS STRING), 12, '0')))"
            ).alias("top_event"),
            F.expr(
                "min_by(event_id, concat(lpad(CAST(CAST(round(value * 100) AS BIGINT)"
                " AS STRING), 12, '0'), lpad(CAST(event_id AS STRING), 12, '0')))"
            ).alias("bottom_event"),
        )
        .orderBy("event_type")
    )


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    )


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long): per-returnflag metric columns melted into
    (metric, value) rows via stack()."""
    l = load(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("disc"),
    )
    return (
        wide.selectExpr(
            "l_returnflag",
            "stack(3, 'qty', qty, 'price', price, 'disc', disc)"
            " AS (metric, val)",
        )
        .orderBy("l_returnflag", "metric")
    )


def subq_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with NULLs in the subquery (3-valued logic): a NULL in the
    IN-list makes NOT IN never-true — the classic SQL trap, same in PG,
    Spark, and DuckDB. The NULL-stripped variant returns rows."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("ks_cust_ni")
    load(spark, sf_dir, "orders").createOrReplaceTempView("ks_ord_ni")
    return spark.sql(
        """
        WITH keys AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_custkey END AS k
            FROM ks_ord_ni
        )
        SELECT
            (SELECT count(*) FROM ks_cust_ni
             WHERE c_custkey NOT IN (SELECT k FROM keys)) AS with_nulls,
            (SELECT count(*) FROM ks_cust_ni
             WHERE c_custkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL))
                AS without_nulls
        """
    )


def _bucket_selection_median(l: DataFrame) -> DataFrame:
    """Exact per-flag median of l_extendedprice by two-pass bucket
    selection → (l_returnflag, _exact_median). Bit-identical to
    `percentile(l_extendedprice, 0.5)` for non-NULL ≤2-decimal inputs
    (the agg_approx_sketches precondition); kept as a named helper so
    tests can compare it against percentile() directly on adversarial
    layouts (tests/test_lakehouse_sketches.py: boundary-straddling
    middles, duplicates piled on the bucket edge)."""
    cents = l.filter("l_extendedprice IS NOT NULL").selectExpr(
        "l_returnflag",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS _c",
    ).withColumn("_cb", F.expr("_c div 4096"))
    coarse = cents.groupBy("l_returnflag", "_cb").agg(
        F.count(F.lit(1)).alias("_m")
    )
    wb = W.partitionBy("l_returnflag").orderBy("_cb")
    sel = (
        coarse.withColumn("_hi", F.sum("_m").over(wb))
        .withColumn("_n", F.sum("_m").over(W.partitionBy("l_returnflag")))
        .withColumn("_lo", F.col("_hi") - F.col("_m"))
        .filter(
            "((_n - 1) DIV 2 >= _lo AND (_n - 1) DIV 2 < _hi)"
            " OR (_n DIV 2 >= _lo AND _n DIV 2 < _hi)"
        )
        .select("l_returnflag", "_cb", "_lo", "_n")
    )
    fine = (
        cents.join(F.broadcast(sel), ["l_returnflag", "_cb"])
        .groupBy("l_returnflag", "_c")
        .agg(
            F.count(F.lit(1)).alias("_m"),
            F.min("_lo").alias("_blo"),
            F.min("_n").alias("_n"),
        )
    )
    wf = W.partitionBy("l_returnflag").orderBy("_c")
    return (
        fine.withColumn(
            "_off", F.min("_blo").over(W.partitionBy("l_returnflag"))
        )
        .withColumn("_hi", F.col("_off") + F.sum("_m").over(wf))
        .selectExpr(
            "l_returnflag",
            "CASE WHEN (_n - 1) DIV 2 >= _hi - _m AND (_n - 1) DIV 2 < _hi"
            " THEN _c END AS _v0",
            "CASE WHEN _n DIV 2 >= _hi - _m AND _n DIV 2 < _hi"
            " THEN _c END AS _v1",
        )
        .groupBy("l_returnflag")
        .agg(F.max("_v0").alias("_v0"), F.max("_v1").alias("_v1"))
        .selectExpr(
            "l_returnflag",
            "(_v0 + _v1) / 2.0 / 100.0 AS _exact_median",
        )
    )


def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates, oracle-able form: the raw HLL++/GK
    estimates are engine-specific, so the query emits the EXACT answer
    plus booleans asserting each sketch lands within its error bound
    (HLL++ default rsd 0.05 → 5%; approx_percentile vs exact percentile
    ≤5% relative). The oracle computes the exact side and expects TRUE —
    a sketch drifting out of bound flips the row and fails the hash.
    At 100 TB the sketches are the point (one pass, bounded memory vs an
    exact distinct's shuffle of every key); the exact columns here are
    the test harness, not the production plan."""
    l = load(spark, sf_dir, "lineitem")
    # sketches and exact sides in SEPARATE aggregation passes joined on
    # the 5-row group key: one combined agg mixes DISTINCT (expand: every
    # row duplicated per distinct/non-distinct path) with a sort-based
    # exact percentile and ran 3.5× slower (6.1 s → 1.75 s at sf0.1, N=3
    # noop-forced). Two lean scans beat one expanded scan.
    approx = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_approx_parts"),
        F.expr("approx_percentile(l_extendedprice, 0.5)")
        .alias("_approx_median"),
    )
    # Exact median via TWO-PASS BUCKET SELECTION, not percentile() and
    # not a full-grid histogram window. History of this spelling:
    # percentile() is an interpreted ObjectHashAggregate over a boxed
    # counts map (127 s at ×100); the round-9 (flag, cents) histogram
    # + flag-partitioned window assumed the cents GRID is
    # domain-bounded, but the fixture's prices are near-continuous —
    # 23.9 M distinct cents at ×100 — so the two windows walked the
    # data, not the domain (36 s standalone, the query's whole ×24).
    # The classic distributed selection instead: PASS 1 aggregates
    # 4096-cent coarse buckets (≤ ~2.6 k buckets per flag — bounded by
    # the PRICE DOMAIN / 4096, fully map-combinable codegen) and a
    # window over that tiny frame finds, per flag, the bucket(s)
    # holding order statistics (n−1) div 2 and n div 2 — at most two,
    # and cumulative-ADJACENT (the targets differ by ≤1 position, so
    # no non-empty bucket can lie between them; their rows are
    # contiguous in the global value order starting at min(_lo)).
    # PASS 2 broadcast-semi-joins lineitem down to those buckets' rows
    # (~rows/2.6k) and selects the exact positions from the small
    # exact histogram. Both passes are narrow codegen aggregates; no
    # window ever sees more than rows-per-bucket. 36 → ~2×2.5 s at
    # ×100; at 100 TB rows-per-bucket grows linearly and the width
    # (or one recursion level) is the documented knob.
    # (v0+v1)/2 reproduces percentile()'s type-7 median bit-for-bit:
    # odd n → both positions hit the same value, even n → mean of the
    # two middles; the quotient only feeds a ±5% band check.
    # PRECONDITION (stated, not assumed silently): l_extendedprice is
    # non-NULL with ≤2 decimals. percentile() ignores NULLs, so the
    # selection drops them explicitly before quantizing — otherwise a
    # NULL-cents group would shift the selected positions; sub-cent
    # prices would likewise collide under the cents grid.
    med = _bucket_selection_median(l)
    # Exact distinct via CHUNKED BITSETS, not countDistinct: Spark plans
    # countDistinct as an Expand-based two-phase aggregate whose first
    # exchange carries every (flag, partkey) pair — at ×100 rows that
    # expand was this query's dominant cost (67 s, ×29.9 over two
    # decades). The agg_bitmap_distinct form (above, same file) replaces
    # it: each key sets bit (key mod 63) of 63-bit chunk (key div 63),
    # chunks merge with bit_or — an associative, partial-aggregable
    # combine, so the map side collapses each chunk to ONE row before
    # the exchange and shuffled rows are bounded by the KEY RANGE / 63,
    # not by the row count. popcount-sum yields the identical exact
    # count (dense int keys; 63-bit chunks keep the shift portable).
    bits = (
        l.selectExpr(
            "l_returnflag",
            "l_partkey div 63 AS _chunk",
            "shiftleft(CAST(1 AS BIGINT), CAST(l_partkey % 63 AS INT)) AS _bit",
        )
        .groupBy("l_returnflag", "_chunk")
        .agg(F.expr("bit_or(_bit)").alias("_bm"))
        .groupBy("l_returnflag")
        .agg(F.expr("CAST(sum(bit_count(_bm)) AS BIGINT)").alias("exact_parts"))
    )
    exact = bits.join(med, "l_returnflag")
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .selectExpr(
            "l_returnflag",
            "exact_parts",
            "abs(_approx_parts - exact_parts) <= 0.05 * exact_parts"
            " AS parts_within_5pct",
            "abs(_approx_median - _exact_median) <= 0.05 * _exact_median"
            " AS median_within_5pct",
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# equi-width histogram: 20 fixed buckets over customer balances — the
# data-profiling primitive (bucket key derived per row, one small shuffle)
# --------------------------------------------------------------------------
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    lo, hi, n = 0.0, 10000.0, 20
    width = (hi - lo) / n
    bucket = F.least(
        F.greatest(F.floor((F.col("c_acctbal") - lo) / width), F.lit(0)),
        F.lit(n - 1),
    ).cast("int")
    return (
        c.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .withColumn("bucket_lo", F.round(F.col("bucket") * width + lo, 2))
        .withColumn("bucket_hi", F.round(F.col("bucket") * width + lo + width, 2))
        .select("bucket", "bucket_lo", "bucket_hi", "n", "avg_bal")
        .orderBy("bucket")
    )


QUERIES = {
    "agg_rollup": agg_rollup,
    "agg_histogram": agg_histogram,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_multi_distinct": agg_multi_distinct,
    "agg_stats": agg_stats,
    "agg_percentiles": agg_percentiles,
    "agg_conditional": agg_conditional,
    "agg_pivot": agg_pivot,
    "agg_unpivot": agg_unpivot,
    "subq_not_in_nulls": subq_not_in_nulls,
    "agg_approx_sketches": agg_approx_sketches,
}

ORACLES = {
    "agg_histogram": """
        WITH bucketed AS (
            SELECT CAST(least(greatest(floor((c_acctbal - 0.0) / 500.0), 0), 19)
                        AS INTEGER) AS bucket,
                   c_acctbal
            FROM customer
        )
        SELECT bucket,
               CAST(round(bucket * 500.0, 2) AS DOUBLE) AS bucket_lo,
               CAST(round(bucket * 500.0 + 500.0, 2) AS DOUBLE) AS bucket_hi,
               count(*) AS n,
               round(avg(c_acctbal), 4) AS avg_bal
        FROM bucketed
        GROUP BY bucket
        ORDER BY bucket
    """,
    "agg_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_ls
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """,
    "agg_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g_st,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_pr
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority
    """,
    "agg_grouping_sets": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_extendedprice), 2) AS total,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """,
    "agg_multi_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS nd_part,
               count(DISTINCT l_suppkey) AS nd_supp,
               round(sum(DISTINCT l_quantity), 2) AS sum_dist_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "agg_stats": """
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 4) AS sd_price,
               round(stddev_pop(l_discount), 6)       AS sdp_disc,
               round(var_samp(l_quantity), 4)         AS var_qty,
               round(corr(l_extendedprice, l_quantity), 6)        AS corr_pq,
               round(covar_samp(l_extendedprice, l_discount), 4)  AS cov_pd,
               round(covar_pop(l_extendedprice, l_discount), 4)   AS covp_pd
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "agg_percentiles": """
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "agg_conditional": """
        SELECT event_type,
               count(CASE WHEN value > 100.0 THEN 1 END) AS n_big,
               round(sum(CASE WHEN value > 100.0 THEN value ELSE 0.0 END), 2)
                   AS sum_big,
               bool_or(value > 100.0)  AS any_big,
               bool_and(value > 100.0) AS all_big,
               arg_max(event_id, lpad(CAST(CAST(round(value * 100, 0) AS BIGINT)
                       AS VARCHAR), 12, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS top_event,
               arg_min(event_id, lpad(CAST(CAST(round(value * 100, 0) AS BIGINT)
                       AS VARCHAR), 12, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS bottom_event
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "agg_approx_sketches": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               TRUE AS parts_within_5pct,
               TRUE AS median_within_5pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "agg_unpivot": """
        WITH wide AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 2) AS qty,
                   round(sum(l_extendedprice), 2) AS price,
                   round(sum(l_discount), 2) AS disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty' AS metric, qty AS val FROM wide
        UNION ALL SELECT l_returnflag, 'price', price FROM wide
        UNION ALL SELECT l_returnflag, 'disc', disc FROM wide
        ORDER BY l_returnflag, metric
    """,
    "subq_not_in_nulls": """
        WITH keys AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_custkey END AS k
            FROM orders
        )
        SELECT
            (SELECT count(*) FROM customer
             WHERE c_custkey NOT IN (SELECT k FROM keys)) AS with_nulls,
            (SELECT count(*) FROM customer
             WHERE c_custkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL))
                AS without_nulls
    """,
    "agg_pivot": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
}


# --------------------------------------------------------------------------
# hand-rolled HyperLogLog with EXACT cross-engine parity: md5-keyed
# 64-register sketch, integer-scaled harmonic sum, per-group sketches
# merged by register-max — the mergeability that makes sketches the
# 100 TB answer to COUNT(DISTINCT), here with a DuckDB hash-match (the
# native approx_count_distinct above stays rows-only: HLL++ internals
# are engine-specific by design).
# --------------------------------------------------------------------------
_HLL_M = 64  # registers (b=6 bits)
_HLL_ALPHA = 0.709  # alpha_64


def agg_hll_handrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag HLL estimate of distinct l_partkey, plus a
    '__all__' row whose sketch is the MERGE (register-wise max) of the
    per-flag sketches — the union-without-rescan property that makes
    sketches composable across partitions/days at 100 TB.

    Exactness across engines: the hash is md5 (identical by
    construction), rho is branch-free integer bit math, and the harmonic
    sum is kept as an INTEGER (sum of 2^(55-M_j), register scale 2^55)
    so no cross-row float accumulation exists; the single final
    double division is IEEE-exact. countDistinct rides along as the
    ground truth column."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    hashed = li.selectExpr(
        "l_returnflag AS grp",
        "l_partkey",
        "CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) AS h",
    ).selectExpr("grp", "l_partkey", "h % 64 AS bucket", "h div 64 AS rest")
    rho = (
        "least(bit_count((rest & -rest) - 1) + 1, 55)"
    )
    regs = (
        hashed.selectExpr("grp", "bucket", f"{rho} AS rho")
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .selectExpr("'__all__' AS grp", "bucket", "m")
    )
    est = (
        regs.unionAll(merged)
        .groupBy("grp")
        .agg(
            F.expr(
                "sum(shiftleft(CAST(1 AS BIGINT), 55 - m))"
            ).alias("sum_present"),
            F.count(F.lit(1)).alias("n_regs"),
        )
        .selectExpr(
            "grp",
            "sum_present + (64 - n_regs) * shiftleft(CAST(1 AS BIGINT), 55)"
            " AS hll_sum_scaled",
        )
        .selectExpr(
            "grp",
            "hll_sum_scaled",
            f"round({_HLL_ALPHA}D * {_HLL_M * _HLL_M} * pow(2.0D, 55)"
            " / hll_sum_scaled, 4) AS hll_estimate",
        )
    )
    exact = (
        li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.countDistinct("l_partkey").alias("n_exact"))
        .unionAll(
            li.agg(
                F.countDistinct("l_partkey").alias("n_exact")
            ).selectExpr("'__all__' AS grp", "n_exact").select("grp", "n_exact")
        )
    )
    return (
        est.join(exact, "grp")
        .select("grp", "n_exact", "hll_sum_scaled", "hll_estimate")
        .orderBy("grp")
    )


QUERIES["agg_hll_handrolled"] = agg_hll_handrolled

ORACLES["agg_hll_handrolled"] = """
    WITH hashed AS (
        SELECT l_returnflag AS grp, l_partkey,
               CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM lineitem
    ),
    br AS (
        SELECT grp, h % 64 AS bucket, h // 64 AS rest FROM hashed
    ),
    regs AS (
        SELECT grp, bucket,
               max(least(bit_count((rest & -rest) - 1) + 1, 55)) AS m
        FROM br GROUP BY grp, bucket
    ),
    merged AS (
        SELECT '__all__' AS grp, bucket, max(m) AS m
        FROM regs GROUP BY bucket
    ),
    allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
    sums AS (
        SELECT grp,
               CAST(sum(CAST(1 AS BIGINT) << (55 - m)) AS BIGINT)
                   + (64 - count(*)) * (CAST(1 AS BIGINT) << 55)
                   AS hll_sum_scaled
        FROM allregs GROUP BY grp
    ),
    est AS (
        SELECT grp, hll_sum_scaled,
               round(CAST(0.709 AS DOUBLE) * 4096 * pow(2.0, 55)
                     / hll_sum_scaled, 4) AS hll_estimate
        FROM sums
    ),
    exact AS (
        SELECT l_returnflag AS grp,
               count(DISTINCT l_partkey) AS n_exact
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT '__all__', count(DISTINCT l_partkey) FROM lineitem
    )
    SELECT e.grp, x.n_exact, e.hll_sum_scaled, e.hll_estimate
    FROM est e JOIN exact x ON e.grp = x.grp
    ORDER BY e.grp
"""


# ---------------------------------------------------------------------------
# hand-rolled Count-Min sketch: heavy-hitter frequencies with exact parity
# ---------------------------------------------------------------------------
_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row


def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=4 rows x w=256 counters) over lineitem
    l_partkey, probed for the top-20 exact heavy hitters — estimate =
    min over rows of the hashed counter, always >= exact (one-sided
    error), with the overcount emitted so the oracle checks the sketch
    CONTENT, not just the winners.

    Like agg_hll_handrolled, the whole sketch is exact across engines:
    md5-keyed buckets, integer counters, no floats anywhere. The sketch
    is a 1,024-cell aggregate — mergeable cell-wise across partitions /
    days / tables (same property as the HLL register row), which is why
    a 100 TB deployment keeps one per ingest window and answers
    frequency probes without rescanning anything. Build is one
    explode(d)+groupBy shuffle of (row, bucket) ints; probes broadcast.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    # the d "independent" row hashes are d disjoint bytes of ONE md5 —
    # one hash evaluation per input row instead of d (md5 dominated the
    # build: 4x fewer digests, measured 4.1s -> ~1s at sf0.1); hex pair
    # at offset 2r+1 is row r's 8-bit bucket
    rows = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("r")
    bucket = F.conv(
        F.expr("substring(h, 2 * r + 1, 2)"), 16, 10
    ).cast("int")
    hashed = li.withColumn("h", F.md5(F.col("l_partkey").cast("string")))
    cells = (
        hashed.select("l_partkey", "h", rows)
        .withColumn("bucket", bucket)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_exact"))
    # top-k via orderBy+limit => TakeOrderedAndProject (per-partition
    # partial top-20, merged on the driver) — NOT a global row_number
    # window, which would single-partition the whole count table
    cand = counts.orderBy(F.desc("n_exact"), "l_partkey").limit(20)
    probes = (
        cand.withColumn("h", F.md5(F.col("l_partkey").cast("string")))
        .select("l_partkey", "n_exact", "h", rows)
        .withColumn("bucket", bucket)
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("l_partkey", "n_exact")
        .agg(F.min("cnt").alias("cms_est"))
        .selectExpr(
            "l_partkey",
            "n_exact",
            "cms_est",
            "cms_est - n_exact AS overcount",
        )
        .orderBy("l_partkey")
    )


QUERIES["agg_cms_heavy_hitters"] = agg_cms_heavy_hitters

ORACLES["agg_cms_heavy_hitters"] = f"""
    WITH keyed AS (
        SELECT l_partkey, md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem
    ),
    rows_ AS (SELECT unnest(range(0, {_CMS_D})) AS r),
    cells AS (
        SELECT r,
               CAST('0x' || substr(h, 2 * r + 1, 2) AS INT) AS bucket,
               count(*) AS cnt
        FROM keyed CROSS JOIN rows_
        GROUP BY 1, 2
    ),
    counts AS (
        SELECT l_partkey, count(*) AS n_exact, any_value(h) AS h
        FROM keyed GROUP BY l_partkey
    ),
    cand AS (
        SELECT l_partkey, n_exact, h FROM (
            SELECT l_partkey, n_exact, h,
                   row_number() OVER (ORDER BY n_exact DESC, l_partkey) AS rn
            FROM counts
        ) WHERE rn <= 20
    )
    SELECT c.l_partkey, c.n_exact, min(s.cnt) AS cms_est,
           min(s.cnt) - c.n_exact AS overcount
    FROM cand c
    CROSS JOIN rows_ rr
    JOIN cells s
      ON s.r = rr.r
     AND s.bucket = CAST('0x' || substr(c.h, 2 * rr.r + 1, 2) AS INT)
    GROUP BY c.l_partkey, c.n_exact
    ORDER BY c.l_partkey
"""


# ---------------------------------------------------------------------------
# bitmap-index exact distinct: chunked bitsets + bit_or merge
# ---------------------------------------------------------------------------
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) via bitmap indexes (the Roaring/bitmap-OLAP
    technique, integer-exact in both engines): each l_partkey sets bit
    (key mod 64) in 64-bit chunk (key div 64); per-group chunks merge
    with bit_or — an associative partial-aggregable combine, unlike the
    Expand-based exact-distinct plan — and popcounts sum to the distinct
    count. The '__all__' row re-merges the per-flag chunk bitmaps,
    proving the same union-without-rescan property as the HLL/CMS rows
    but EXACT: bitmap distincts trade memory (bits ∝ key range) for
    zero error, the classic warehouse accelerator for dense int keys.

    Two narrow shuffles: groupBy(grp, chunk) bit_or, then groupBy(grp)
    popcount-sum. countDistinct rides along as the ground truth."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    # 63 bits per chunk: bit 63 would flip the BIGINT sign, which DuckDB
    # rejects as shift overflow (Spark wraps silently) — 62 is the max
    # portable shift
    chunks = li.selectExpr(
        "l_returnflag AS grp",
        "l_partkey div 63 AS chunk",
        "shiftleft(CAST(1 AS BIGINT), CAST(l_partkey % 63 AS INT)) AS bit",
    )
    per_flag = chunks.groupBy("grp", "chunk").agg(
        F.expr("bit_or(bit)").alias("bm")
    )
    merged = (
        per_flag.groupBy("chunk")
        .agg(F.expr("bit_or(bm)").alias("bm"))
        .selectExpr("'__all__' AS grp", "chunk", "bm")
    )
    counts = (
        per_flag.unionAll(merged)
        .groupBy("grp")
        .agg(
            F.expr("sum(bit_count(bm))").alias("n_distinct_bitmap"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )
    exact = (
        li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.countDistinct("l_partkey").alias("n_exact"))
        .unionAll(
            li.agg(F.countDistinct("l_partkey").alias("n_exact"))
            .selectExpr("'__all__' AS grp", "n_exact")
        )
    )
    return (
        counts.join(exact, "grp")
        .selectExpr(
            "grp",
            "n_distinct_bitmap",
            "n_chunks",
            "n_exact",
            "n_distinct_bitmap = n_exact AS bitmap_exact",
        )
        .orderBy("grp")
    )


QUERIES["agg_bitmap_distinct"] = agg_bitmap_distinct

ORACLES["agg_bitmap_distinct"] = """
    WITH chunks AS (
        SELECT l_returnflag AS grp,
               l_partkey // 63 AS chunk,
               (CAST(1 AS BIGINT) << CAST(l_partkey % 63 AS INT)) AS bit
        FROM lineitem
    ),
    per_flag AS (
        SELECT grp, chunk, bit_or(bit) AS bm
        FROM chunks GROUP BY grp, chunk
    ),
    merged AS (
        SELECT '__all__' AS grp, chunk, bit_or(bm) AS bm
        FROM per_flag GROUP BY chunk
    ),
    counts AS (
        SELECT grp,
               CAST(sum(bit_count(bm)) AS BIGINT) AS n_distinct_bitmap,
               count(*) AS n_chunks
        FROM (SELECT * FROM per_flag UNION ALL SELECT * FROM merged)
        GROUP BY grp
    ),
    exact AS (
        SELECT l_returnflag AS grp,
               count(DISTINCT l_partkey) AS n_exact
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT '__all__', count(DISTINCT l_partkey) FROM lineitem
    )
    SELECT c.grp, c.n_distinct_bitmap, c.n_chunks, e.n_exact,
           c.n_distinct_bitmap = e.n_exact AS bitmap_exact
    FROM counts c JOIN exact e ON c.grp = e.grp
    ORDER BY c.grp
"""


# ---------------------------------------------------------------------------
# deterministic mode (most frequent value, ties broken by value)
# ---------------------------------------------------------------------------
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with a pinned tie-break: built-in mode() is free to return
    ANY most-frequent value (engine- and partition-order-dependent), so
    the portable form is count-then-rank with (count DESC, value ASC) —
    deterministic in every engine. Two partial-aggregated shuffles on
    narrow int keys; the rank window rides the second's partitioning."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


QUERIES["agg_mode_deterministic"] = agg_mode_deterministic

ORACLES["agg_mode_deterministic"] = """
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
    FROM (
        SELECT l_returnflag, l_quantity, count(*) AS n,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY count(*) DESC, l_quantity) AS rn
        FROM lineitem
        GROUP BY l_returnflag, l_quantity
    )
    WHERE rn = 1
    ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# exact weighted average (integer cross-multiplied)
# ---------------------------------------------------------------------------
def agg_weighted_avg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted mean discount per return flag, exact: weights
    and values in integer cents/1e-4 units, the ratio emitted as
    truncating integer division at 1e-6 scale — no float accumulation
    anywhere, so partition order can't move the answer (a float wavg
    over 100 TB gives different last digits per run; this one is
    bit-stable). Single partial-aggregated groupBy."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.selectExpr(
            "l_returnflag",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS w_cents",
            "CAST(round(l_discount * 10000) AS BIGINT) AS d_e4",
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.expr("w_cents * d_e4")).alias("num"),
            F.sum("w_cents").alias("den"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr(
            "l_returnflag",
            "(100 * num) div den AS wavg_discount_e6",
            "den AS total_cents",
            "n",
        )
        .orderBy("l_returnflag")
    )


QUERIES["agg_weighted_avg_exact"] = agg_weighted_avg_exact

ORACLES["agg_weighted_avg_exact"] = """
    SELECT l_returnflag,
           CAST((100 * sum(w_cents * d_e4)) // sum(w_cents) AS BIGINT)
               AS wavg_discount_e6,
           CAST(sum(w_cents) AS BIGINT) AS total_cents,
           count(*) AS n
    FROM (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS w_cents,
               CAST(round(l_discount * 10000) AS BIGINT) AS d_e4
        FROM lineitem
    )
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""
