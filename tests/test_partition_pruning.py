"""Partition pruning: a dt-partitioned table scanned with a partition
predicate must read only matching partitions (PartitionFilters in the
scan, pruned directory count) — the other half of the 100 TB scan story
next to PushedFilters.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    e = load(spark, SF, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    e.write.mode("overwrite").partitionBy("day").parquet(out)

    part = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    p = _plan(part)
    assert "PartitionFilters" in p
    assert "2024-01-05" in p
    # correct result and only that day's rows
    expected = e.filter(F.col("day") == "2024-01-05").count()
    assert part.count() == expected > 0
