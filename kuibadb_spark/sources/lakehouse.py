"""Lakehouse table formats (Delta Lake / Iceberg / Hudi): connector
surface, gated — their jars are not on this container's classpath
(pyspark 4.1 ships none of them). The engine's own manifest tables
(plans/manifest.py) provide the same core semantics natively (atomic
commit, snapshot reads, time travel, compaction, GC); use these entry
points when the jars are present in a deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class LakehouseFormatUnavailable(ImportError):
    pass


def _require_format(spark: SparkSession, fmt: str, probe_class: str) -> None:
    jvm = spark.sparkContext._jvm
    try:
        jvm.java.lang.Class.forName(probe_class)
    except Exception as exc:
        raise LakehouseFormatUnavailable(
            f"{fmt} requires its runtime jar on the Spark classpath; "
            f"engine-native manifest tables (Engine.create_table/copy_from/"
            f"table(version=…)/compact/gc) cover snapshotting without it"
        ) from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _require_format(spark, "Delta Lake", "org.apache.spark.sql.delta.DeltaLog")
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _require_format(spark, "Iceberg", "org.apache.iceberg.catalog.Catalog")
    return spark.read.format("iceberg").load(table)
