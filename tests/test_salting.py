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


def test_aqe_skew_join_splits_hot_partition(spark):
    """The runtime half of the skew story (manual salting is the plan-
    time half): with AQE skew-join on, a 90%-hot key must show a
    skew=true split in the EXECUTED adaptive plan. Thresholds are
    lowered to make local data trip the same machinery a 100 TB hot key
    would; confs restored after."""
    saved = {}
    lowered = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in lowered.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200000).selectExpr(
            "IF(id % 10 = 0, id, 0) AS k", "id AS v"
        )
        right = spark.range(0, 3000).selectExpr("id AS k", "id * 2 AS w")
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0][0] > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
