"""Relational surface, round 3: the last TPC-H patterns missing from the
inventory — q2 (correlated min over a snowflake join), q11 (HAVING against
a global scalar aggregate), q13 (outer-join distribution histogram).

The reference declares the relational contract but executes none of it
(grammar has no FROM — /root/reference/src/parser/sql.lalrpop:314-318);
these queries live in the declared/target surface of SURVEY.md §2.3.

Adaptation note: the driver's fixtures have no partsupp table, so q2/q11
derive the supplier-part relationship from lineitem — unit cost =
floor(l_extendedprice*100/l_quantity) cents (min over lines), part value =
sum of line price cents. Integer cents everywhere: float SUMs differ in low
bits across engines, and the HAVING threshold comparison is done as
value_cents * 1000 > total_cents (pure integer, no rounding boundary).

Scale notes (100 TB):
- q2: the ps aggregation shuffles lineitem once on (partkey, suppkey);
  the per-part regional min is a re-aggregation of that (much smaller)
  result, then joined back on partkey. nation/region are broadcast;
  supplier is left to AQE (broadcastable at small SF, shuffle join at
  huge SF).
- q11: one shuffle on partkey for the national value; the global total is
  a single-row broadcast joined back — no second pass over lineitem.
- q13: the orderpriority filter is pushed into the orders scan *before*
  the left join (it is part of the join condition, not a post-filter —
  semantics differ and the pushed form is the fast one); both groupBys
  reduce before shuffling (partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# q2-style minimum-cost supplier: for each STANDARD size-15 part, the
# European supplier(s) offering the regional minimum unit cost
# --------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )

    # part predicate pushed BELOW the cost aggregation: the per-part min
    # is independent across parts, so restricting to the selected parts
    # first (broadcast semi-shape) shrinks the groupBy and both
    # downstream joins by the part selectivity — 1.6 s → 0.6 s at sf0.1,
    # identical 80 rows; Catalyst cannot hoist the filter through the
    # aggregate+self-join on its own
    ps = (
        l.join(
            F.broadcast(p.select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.floor(
                    F.col("l_extendedprice") * 100 / F.col("l_quantity")
                ).cast("bigint")
            ).alias("cost_cents")
        )
    )
    eu_supp = s.join(
        F.broadcast(
            n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
                "n_nationkey", "n_name"
            )
        ),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    eu_ps = ps.join(eu_supp, ps.l_suppkey == F.col("s_suppkey"))
    min_cost = eu_ps.groupBy("l_partkey").agg(
        F.min("cost_cents").alias("min_cost")
    ).withColumnRenamed("l_partkey", "mc_partkey")
    return (
        eu_ps.join(
            min_cost,
            (eu_ps.l_partkey == F.col("mc_partkey"))
            & (eu_ps.cost_cents == F.col("min_cost")),
        )
        .join(p, eu_ps.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost_cents")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


# --------------------------------------------------------------------------
# q11-style important stock: parts whose national line value exceeds twice
# the nation's average part value (HAVING vs a global scalar aggregate;
# the threshold is relative to the average, not a fixed fraction of the
# total, so the result set does not vanish as the part count scales up)
# --------------------------------------------------------------------------
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")

    national = (
        l.join(
            s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey")).select(
                "s_suppkey"
            ),
            l.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "value_cents"
            )
        )
    )
    total = national.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        national.join(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select(F.col("l_partkey").alias("partkey"), "value_cents")
        .orderBy(F.desc("value_cents"), "partkey")
    )


# --------------------------------------------------------------------------
# q13-style customer distribution: histogram of per-customer order counts,
# non-urgent orders only, customers with zero orders included (left join)
# --------------------------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q13_customer_distribution": q13_customer_distribution,
}

ORACLES = {
    "q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   CAST(min(floor(l_extendedprice * 100 / l_quantity)) AS BIGINT)
                       AS cost_cents
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu_ps AS (
            SELECT l_partkey, cost_cents, s_suppkey, s_name, s_acctbal, n_name
            FROM ps
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_cents
        FROM eu_ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_size = 15 AND p_type = 'STANDARD'
          AND cost_cents = (SELECT min(e2.cost_cents) FROM eu_ps e2
                            WHERE e2.l_partkey = eu_ps.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    "q11_important_stock": """
        WITH national AS (
            SELECT l_partkey,
                   CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS partkey, value_cents
        FROM national
        WHERE value_cents * (SELECT count(*) FROM national)
              > 2 * (SELECT sum(value_cents) FROM national)
        ORDER BY value_cents DESC, partkey
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
}
