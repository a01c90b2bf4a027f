"""Salted joins must be result-identical to plain joins and key the
shuffle on (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.plans.salting import salted_join

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    l = load(spark, SF, "lineitem").select("l_orderkey", "l_linenumber", "l_suppkey")
    s = load(spark, SF, "supplier").select("s_suppkey", "s_name")
    plain = l.join(s, l.l_suppkey == s.s_suppkey)
    salted = salted_join(l, s, "l_suppkey", "s_suppkey", stable_id="l_orderkey")
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.select("l_orderkey", "l_linenumber", "s_name").collect()}
    b = {tuple(r) for r in salted.select("l_orderkey", "l_linenumber", "s_name").collect()}
    assert a == b


def test_salt_is_deterministic_and_spread(spark):
    from kuibadb_spark.plans.salting import salt_column

    l = load(spark, SF, "lineitem").withColumn(
        "salt", salt_column(F.col("l_orderkey"), 8)
    )
    counts = dict(
        (r.salt, r["count"]) for r in l.groupBy("salt").count().collect()
    )
    assert set(counts) == set(range(8))  # all salts used
    again = dict(
        (r.salt, r["count"]) for r in load(spark, SF, "lineitem")
        .withColumn("salt", salt_column(F.col("l_orderkey"), 8))
        .groupBy("salt").count().collect()
    )
    assert counts == again
