"""Bucketed tables: shuffle-free co-located joins — the 100 TB answer to
"this join shuffles both sides every query".

The reference's analog is its per-table L0/L1/L2 file layout keyed by
write locality (/root/reference src/access/sv.rs:129-148); Spark's
native form is hive-style bucketing: `bucketBy(n, key)` at write time
hash-partitions files by key, and joins/aggregations on that key skip
the Exchange entirely (verified by tests/test_bucketing.py on the
physical plan).

At 100 TB: bucket the fact tables on their join keys once at ingest
(lineitem/orders on orderkey), and every subsequent orderkey join is
a zipped per-bucket sort-merge with zero network movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Materialize df as a bucketed (and optionally sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(name)


def cobucket_join(
    spark: SparkSession, left: str, right: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys: with matching
    bucket counts Spark plans a per-bucket join with no Exchange."""
    l = spark.table(left)
    r = spark.table(right)
    return l.join(r, l[key_l] == r[key_r])
