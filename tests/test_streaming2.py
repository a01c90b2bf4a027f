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


def test_foreach_batch_sink(spark, tmp_path):
    out_dir = str(tmp_path / "fb_out")
    write_foreach_batch(
        read_events_stream(spark, SF).select("event_id", "user_id", "value"),
        out_dir,
    )
    back = spark.read.parquet(out_dir)
    assert back.count() == 1000
    assert back.select("event_id").distinct().count() == 1000
