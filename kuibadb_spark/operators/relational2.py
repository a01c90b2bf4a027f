"""Relational surface, round 2: outer/cross joins, correlated subqueries,
views-as-CTEs, deterministic sampling, ORDER BY NULL placement, OFFSET —
completing the join/subquery matrix of SURVEY.md §2.3.

Determinism: hash-based sampling (md5 % N) instead of TABLESAMPLE (engine
RNG differs); NULLS FIRST/LAST pinned explicitly (Spark ASC default is
NULLS FIRST, DuckDB's is NULLS LAST — never rely on defaults).

Scale notes: outer joins shuffle on their keys like inner ones; the
correlated q17 subquery is decorrelated by Catalyst into an aggregate +
join (same shape as the hand-written oracle); hash-sampling is a
pushdown-friendly filter, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# outer-join matrix: left / right / full with null-extension counts
# --------------------------------------------------------------------------
def join_outer_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000.0
    ).select("o_custkey", "o_orderkey", "o_totalprice")

    def summarize(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("join_type"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            F.count("c_custkey").alias("n_custs"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "null_right"
            ),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
                "null_left"
            ),
        )

    left = summarize(c.join(o, c.c_custkey == o.o_custkey, "left"), "left")
    right = summarize(c.join(o, c.c_custkey == o.o_custkey, "right"), "right")
    full = summarize(c.join(o, c.c_custkey == o.o_custkey, "full"), "full")
    return left.unionAll(right).unionAll(full).orderBy("join_type")


# --------------------------------------------------------------------------
# cross join (small × small): region × nation grid
# --------------------------------------------------------------------------
def join_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = load(spark, sf_dir, "nation")
    return (
        r.crossJoin(F.broadcast(n.select("n_nationkey", "n_regionkey")))
        .withColumn("is_home", F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("is_home"), 1).otherwise(0)).alias("n_home"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# q17-style correlated scalar subquery: parts ordered below 20% of their
# own average order size (Catalyst decorrelates into agg + join)
# --------------------------------------------------------------------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("ks_part_q17")
    l.createOrReplaceTempView("ks_lineitem_q17")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM ks_lineitem_q17, ks_part_q17
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity)
              FROM ks_lineitem_q17
              WHERE l_partkey = p_partkey)
        """
    )


# --------------------------------------------------------------------------
# q21-style multi-EXISTS: suppliers with returned lines on multi-supplier
# orders where they were the only returner (semi + anti composition)
# --------------------------------------------------------------------------
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    l1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    exists_other = l1.join(
        l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    not_exists_other_return = exists_other.join(
        l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        not_exists_other_return.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


# --------------------------------------------------------------------------
# q15-style view + global max: top revenue supplier(s) via a reused CTE
# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("m"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# deterministic hash sampling (TABLESAMPLE without engine RNG)
# --------------------------------------------------------------------------
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 100
    return (
        o.withColumn("bucket", bucket)
        .filter(F.col("bucket") < 10)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# ORDER BY with explicit NULL placement + LIMIT/OFFSET pagination
# --------------------------------------------------------------------------
def sort_nulls_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").withColumn(
        "bal", F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_acctbal"))
    )
    return (
        c.select("c_custkey", "bal")
        .orderBy(F.col("bal").desc_nulls_last(), F.col("c_custkey").asc())
        .offset(10)
        .limit(25)
    )


# --------------------------------------------------------------------------
# q8-style national market share (ratio of sums — integer cents for
# cross-engine determinism of the division)
# --------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"ks8_{t}")
    return spark.sql(
        """
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_3' THEN vol_cents ELSE 0 END)
                     / CAST(sum(vol_cents) AS DOUBLE), 6) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                       AS vol_cents,
                   n2.n_name AS nation
            FROM ks8_part, ks8_supplier, ks8_lineitem, ks8_orders, ks8_customer,
                 ks8_nation n1, ks8_nation n2, ks8_region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
              AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
              AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
              AND p_type = 'ECONOMY'
        )
        GROUP BY o_year
        ORDER BY o_year
        """
    )


# --------------------------------------------------------------------------
# q9-style product profit by nation and year (cost modeled as 80% of price)
# --------------------------------------------------------------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "supplier", "lineitem", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"ks9_{t}")
    return spark.sql(
        """
        SELECT nation, o_year,
               sum(profit_cents) AS profit_cents
        FROM (
            SELECT n_name AS nation,
                   year(o_orderdate) AS o_year,
                   CAST(round((l_extendedprice * (1 - l_discount)
                        - 0.8 * l_extendedprice) * 100) AS BIGINT) AS profit_cents
            FROM ks9_part, ks9_supplier, ks9_lineitem, ks9_orders, ks9_nation
            WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%bolt%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
        """
    )


# --------------------------------------------------------------------------
# q16-style: distinct supplier counts per part attribute combo
# --------------------------------------------------------------------------
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# q20-style nested-IN chain: suppliers who shipped >100 units of small parts
# --------------------------------------------------------------------------
def q20_small_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    big_shippers = (
        l.join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(big_shippers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_name")
    )


QUERIES = {
    "q8_market_share": q8_market_share,
    "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
    "q20_small_part_shippers": q20_small_part_shippers,
    "q9_product_profit": q9_product_profit,
    "join_outer_matrix": join_outer_matrix,
    "join_cross_grid": join_cross_grid,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q15_top_supplier": q15_top_supplier,
    "sample_hash_10pct": sample_hash_10pct,
    "sort_nulls_offset": sort_nulls_offset,
}

ORACLES = {
    "q16_parts_supplier_relationship": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_small_part_shippers": """
        SELECT s_suppkey, s_name, s_nationkey
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 100)
        ORDER BY s_name
    """,
    "q8_market_share": """
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_3' THEN vol_cents ELSE 0 END)
                     / CAST(sum(vol_cents) AS DOUBLE), 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                       AS vol_cents,
                   n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer,
                 nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
              AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
              AND p_type = 'ECONOMY'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q9_product_profit": """
        SELECT nation, o_year,
               CAST(sum(profit_cents) AS BIGINT) AS profit_cents
        FROM (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(round((l_extendedprice * (1 - l_discount)
                        - 0.8 * l_extendedprice) * 100, 0) AS BIGINT)
                       AS profit_cents
            FROM part, supplier, lineitem, orders, nation
            WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%bolt%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    "join_outer_matrix": """
        WITH c AS (SELECT c_custkey, c_nationkey FROM customer),
             o AS (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
                   WHERE o_totalprice > 450000.0),
        s AS (
            SELECT 'left' AS join_type, count(*) AS n_rows,
                   count(o_orderkey) AS n_orders, count(c_custkey) AS n_custs,
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS null_right,
                   CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS null_left
            FROM c LEFT JOIN o ON c_custkey = o_custkey
            UNION ALL
            SELECT 'right', count(*), count(o_orderkey), count(c_custkey),
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM c RIGHT JOIN o ON c_custkey = o_custkey
            UNION ALL
            SELECT 'full', count(*), count(o_orderkey), count(c_custkey),
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM c FULL JOIN o ON c_custkey = o_custkey
        )
        SELECT * FROM s ORDER BY join_type
    """,
    "join_cross_grid": """
        SELECT r_name, count(*) AS n_pairs,
               CAST(sum(CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_home
        FROM region CROSS JOIN nation
        GROUP BY r_name
        ORDER BY r_name
    """,
    "q17_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity)
              FROM lineitem
              WHERE l_partkey = p_partkey)
    """,
    "q21_waiting_supplier": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "sample_hash_10pct": """
        SELECT o_orderstatus, count(*) AS n_sampled,
               round(sum(o_totalprice), 2) AS sampled_total
        FROM orders
        WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < 10
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "sort_nulls_offset": """
        SELECT c_custkey, bal FROM (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
            FROM customer)
        ORDER BY bal DESC NULLS LAST, c_custkey ASC
        LIMIT 25 OFFSET 10
    """,
}
