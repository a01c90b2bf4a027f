"""Bucketing: co-located joins and aggregations must plan WITHOUT a
shuffle (no Exchange on the bucketed side) — the scale property that
makes repeated fact-table joins affordable.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from kuibadb_spark.catalog import load
from kuibadb_spark.plans.bucketing import cobucket_join, write_bucketed

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    # spark.sql.warehouse.dir is a static conf — bucketed catalog tables
    # land in the default warehouse (./spark-warehouse, gitignored)
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    spark.sql("USE bktest")
    # disable auto-broadcast so the test observes the bucketed join path,
    # not a broadcast shortcut
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(
        load(spark, SF, "lineitem"), "bk_lineitem", "l_orderkey", 8,
        sort_by="l_orderkey",
    )
    write_bucketed(
        load(spark, SF, "orders"), "bk_orders", "o_orderkey", 8,
        sort_by="o_orderkey",
    )
    yield spark
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("USE default")


def test_cobucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    df = cobucket_join(spark, "bk_lineitem", "bk_orders", "l_orderkey", "o_orderkey")
    p = _plan(df)
    assert "Exchange" not in p, p
    # and it's still a real join producing the right row count
    assert df.count() == load(spark, SF, "lineitem").count()


def test_bucketed_groupby_has_no_exchange(bucketed):
    spark = bucketed
    from pyspark.sql import functions as F

    df = spark.table("bk_lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    p = _plan(df)
    assert "Exchange" not in p, p


def test_unbucketed_join_does_shuffle(bucketed):
    spark = bucketed
    l = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders")
    p = _plan(l.join(o, l.l_orderkey == o.o_orderkey))
    assert "Exchange" in p  # the contrast case
