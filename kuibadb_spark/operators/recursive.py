"""Recursive-CTE queries (WITH RECURSIVE) — iterative dataflow declared
in SQL and executed by the engine's own fixpoint operator.

The reference's grammar has no recursion (src/parser/sql.lalrpop:314-318
is a FROM-less select), but its declared PostgreSQL contract does
(pg_catalog-derived operator surface, src/bin/initdb/main.rs:459-462 —
WITH RECURSIVE is core PostgreSQL). Spark 4 executes recursive CTEs
natively (UnionLoop under the hood), so unlike the driver-looped label
propagation in operators/graph.py these run as ONE declarative plan with
the engine controlling the iteration — and the DuckDB oracle runs the
same SQL text modulo dialect (div vs //).

Scale notes: each recursion step is a join/scan over the previous step's
frontier — Spark materializes the step result and feeds it back, so the
shuffle story per step is identical to the hand-rolled loop; the frontier
shrinks monotonically in both queries below. Recursion depth is bounded
by data shape (log3(partkey) ≈ 11; max orders per customer ≈ 40), far
under spark.sql.cteRecursionLevelLimit (100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kuibadb_spark.catalog import load


def rec_part_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic part assembly tree: parent(p) = p div 3 (a complete
    3-ary hierarchy over p_partkey). Recursive ancestor walk computes
    each part's depth; output is the per-depth census — the BOM-explosion
    access pattern (transitive part containment) on TPC-H's part table."""
    load(spark, sf_dir, "part").createOrReplaceTempView("rec_part_v")
    return spark.sql(
        """
        WITH RECURSIVE up (partkey, cur, steps) AS (
            SELECT p_partkey, p_partkey, 0 FROM rec_part_v
            UNION ALL
            SELECT partkey, cur div 3, steps + 1 FROM up WHERE cur > 1
        ),
        depths AS (
            SELECT partkey, max(steps) AS depth FROM up GROUP BY partkey
        )
        SELECT depth,
               count(*) AS n_parts,
               min(partkey) AS min_part,
               max(partkey) AS max_part
        FROM depths
        GROUP BY depth
        ORDER BY depth
        """
    )


def rec_price_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive orders (per customer, in order-date
    order) with strictly increasing o_totalprice. The run-reset makes
    this a sequential recurrence — the recursive CTE threads state
    order-to-order (frontier = one row per customer per step), then the
    histogram aggregates per-customer maxima. Ties in order date break
    on o_orderkey, so row numbering is deterministic in both engines.

    Cost shape, measured at sf0.1: depth = max-orders-per-customer (24),
    and each recursive step is one join+shuffle with ~0.4 s fixed BSP
    overhead → ~10 s total; materializing the numbered CTE first changes
    nothing (the steps, not the CTE rebuild, dominate — both ~10 s).
    Deep sequential recurrence is the one shape a BSP engine is bad at
    BY DESIGN; the scale-path formulation of this exact computation is
    the one-pass segmented scan in ts_interval_merge's island style, and
    the recursion the engine is good at (log-depth) is benched via
    rec_part_hierarchy_depth. This query stays as the declared
    sequential-recurrence surface with its correctness oracle."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("rec_orders_v")
    return spark.sql(
        """
        WITH RECURSIVE ord AS (
            SELECT o_custkey AS ck, o_totalprice AS tp,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS rn
            FROM rec_orders_v
        ),
        streak (ck, rn, tp, len) AS (
            SELECT ck, rn, tp, 1 FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.ck, o.rn, o.tp,
                   CASE WHEN o.tp > s.tp THEN s.len + 1 ELSE 1 END
            FROM ord o JOIN streak s ON o.ck = s.ck AND o.rn = s.rn + 1
        ),
        best AS (
            SELECT ck, max(len) AS best_streak FROM streak GROUP BY ck
        )
        SELECT best_streak, count(*) AS n_customers
        FROM best
        GROUP BY best_streak
        ORDER BY best_streak
        """
    )


QUERIES = {
    "rec_part_hierarchy_depth": rec_part_hierarchy_depth,
    "rec_price_streaks": rec_price_streaks,
}

ORACLES = {
    "rec_part_hierarchy_depth": """
        WITH RECURSIVE up (partkey, cur, steps) AS (
            SELECT p_partkey, p_partkey, 0 FROM part
            UNION ALL
            SELECT partkey, cur // 3, steps + 1 FROM up WHERE cur > 1
        ),
        depths AS (
            SELECT partkey, max(steps) AS depth FROM up GROUP BY partkey
        )
        SELECT depth,
               count(*) AS n_parts,
               min(partkey) AS min_part,
               max(partkey) AS max_part
        FROM depths
        GROUP BY depth
        ORDER BY depth
    """,
    "rec_price_streaks": """
        WITH RECURSIVE ord AS (
            SELECT o_custkey AS ck, o_totalprice AS tp,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS rn
            FROM orders
        ),
        streak (ck, rn, tp, len) AS (
            SELECT ck, rn, tp, 1 FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.ck, o.rn, o.tp,
                   CASE WHEN o.tp > s.tp THEN s.len + 1 ELSE 1 END
            FROM ord o JOIN streak s ON o.ck = s.ck AND o.rn = s.rn + 1
        ),
        best AS (
            SELECT ck, max(len) AS best_streak FROM streak GROUP BY ck
        )
        SELECT best_streak, count(*) AS n_customers
        FROM best
        GROUP BY best_streak
        ORDER BY best_streak
    """,
}
