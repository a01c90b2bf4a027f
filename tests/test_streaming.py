"""Structured Streaming tests: the incremental operators must converge to
their batch equivalents on a finite source (parquet dir, memory sink).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_values,
    streaming_dedup,
)

SF = "/root/testdata/sf0.001"


def test_streaming_session_windows_match_batch(spark):
    out = run_to_memory(session_values(read_events_stream(spark, SF)))
    batch = (
        load(spark, SF, "events")
        .groupBy(F.session_window(F.col("ts").cast("timestamp"), "10 minutes"), "user_id")
        .count()
    )
    assert out.count() == batch.count()
    # total events across sessions == total events
    assert out.agg(F.sum("n_events")).head()[0] == 1000


def test_streaming_dedup(spark):
    out = run_to_memory(streaming_dedup(read_events_stream(spark, SF)), mode="append")
    assert out.count() == 1000  # event_id unique → dedup is identity here
    assert out.select("event_id").distinct().count() == 1000


def test_stream_source_is_incremental(spark):
    # the streaming read plans a streaming source, not a batch scan
    s = read_events_stream(spark, SF)
    assert s.isStreaming
