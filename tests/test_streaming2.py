"""Streaming round 2: stream-static joins and foreachBatch sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    stream_static_join,
    write_foreach_batch,
)

SF = "/root/testdata/sf0.001"


def test_stream_static_join(spark):
    # static dim: per-user event counts derived from the batch table
    dim = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total"))
    )
    joined = stream_static_join(read_events_stream(spark, SF), dim)
    out = run_to_memory(joined.select("event_id", "user_id", "user_total"),
                        mode="append")
    assert out.count() == 1000
    assert out.filter(F.col("user_total").isNull()).count() == 0


def test_stream_stream_join(spark):
    # stream-stream inner join with watermarks + event-time range bound:
    # each purchase joined to views of the same user within the prior hour
    views = (
        read_events_stream(spark, SF)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        read_events_stream(spark, SF)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    out = run_to_memory(joined.select("purchase_id", "view_id"), mode="append")
    # batch equivalent on the same data
    e = load(spark, SF, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    assert out.count() == batch.count() > 0


def test_foreach_batch_sink(spark, tmp_path):
    out_dir = str(tmp_path / "fb_out")
    write_foreach_batch(
        read_events_stream(spark, SF).select("event_id", "user_id", "value"),
        out_dir,
    )
    back = spark.read.parquet(out_dir)
    assert back.count() == 1000
    assert back.select("event_id").distinct().count() == 1000
