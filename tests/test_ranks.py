"""plans/ranks.py: the distributed rank/prefix-sum helpers must be
bit-identical to the global-window forms they replace, on every order
shape, and must fall back to the window form when exchange reuse is
off (the round-8 ADVICE structural concern: without reuse the two
consumers of the range exchange could sample boundaries independently
and join counts from one partitioning against ranks from another)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W, functions as F

from kuibadb_spark.plans.ranks import distributed_ntile, distributed_prefix_sum


def _frame(spark, n=997):
    # skewed values + a unique tie-break id; deliberately NOT a power
    # of the range count so remainder buckets are exercised
    return spark.range(n).selectExpr(
        "id",
        "CAST(pmod(xxhash64(id), 37) AS BIGINT) AS v",  # heavy ties
        "CAST(pmod(xxhash64(id, 7), 1000000) - 500000 AS BIGINT) AS x",
    )


@pytest.mark.parametrize("k,num_ranges", [(10, 32), (3, 4), (7, 64)])
def test_ntile_matches_window(spark, k, num_ranges):
    df = _frame(spark)
    order = [F.desc("v"), F.asc("id")]
    got = distributed_ntile(df, order, k, "b", num_ranges=num_ranges)
    want = df.withColumn("b", F.ntile(k).over(W.orderBy(*order)))
    assert (
        got.select("id", "b").exceptAll(want.select("id", "b")).count() == 0
    )
    assert got.count() == want.count()


@pytest.mark.parametrize("num_ranges", [4, 32, 2048])
def test_prefix_sum_matches_window(spark, num_ranges):
    # num_ranges=2048 >> row count: empty ranges must contribute 0
    df = _frame(spark)
    order = [F.asc("v"), F.asc("id")]
    got = distributed_prefix_sum(df, order, "x", "cum", num_ranges=num_ranges)
    want = df.withColumn(
        "cum",
        F.sum("x").over(
            W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    assert (
        got.select("id", "cum").exceptAll(want.select("id", "cum")).count()
        == 0
    )
    assert got.count() == want.count()


def test_prefix_sum_nulls_carry_earlier_ranges(spark):
    """NULL val_col rows (round-9 ADVICE): a range whose local running
    sum is still NULL must carry the earlier ranges' offset, exactly as
    the window form does — only the rows before the first non-NULL
    value globally may differ (documented 0-vs-NULL edge; exercised
    separately below the window comparison)."""
    # v < 3 rows sort FIRST under the asc order and are all NULL —
    # guaranteeing a non-empty leading-NULL prefix — plus scattered
    # NULLs (id%3) through the body
    df = _frame(spark).selectExpr(
        "id",
        "v",
        "CASE WHEN v < 3 OR pmod(id, 3) = 0 THEN NULL ELSE x END AS x",
    )
    order = [F.asc("v"), F.asc("id")]
    got = distributed_prefix_sum(df, order, "x", "cum", num_ranges=16)
    want = df.withColumn(
        "cum",
        F.sum("x").over(
            W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    # compare only from the first global non-NULL onward: before it the
    # window reads NULL, the distributed form reads 0 (documented)
    w0 = want.withColumn(
        "_seen",
        F.count("x").over(
            W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        ),
    ).filter("_seen > 0")
    assert (
        got.join(w0.select("id"), "id")
        .select("id", "cum")
        .exceptAll(w0.select("id", "cum"))
        .count()
        == 0
    )
    # the documented edge itself: leading-NULL rows read 0, never NULL
    lead = got.join(w0.select("id"), "id", "left_anti").select("cum").collect()
    assert all(r["cum"] == 0 for r in lead) and len(lead) > 0


def test_fallback_when_exchange_reuse_off(spark):
    df = _frame(spark, 200)
    order = [F.asc("v"), F.asc("id")]
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        nt = distributed_ntile(df, order, 5, "b")
        ps = distributed_prefix_sum(df, order, "x", "cum")
        # fallback = the plain global window: no range repartition of
        # the helper's making anywhere in the plan
        for d in (nt, ps):
            plan = d._jdf.queryExecution().optimizedPlan().toString()
            assert "_rk_pid" not in plan
        want_nt = df.withColumn("b", F.ntile(5).over(W.orderBy(*order)))
        assert (
            nt.select("id", "b").exceptAll(want_nt.select("id", "b")).count()
            == 0
        )
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
