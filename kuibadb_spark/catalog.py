"""Table catalog: the fixture star schema + engine warehouse tables.

The reference keeps a PostgreSQL-style catalog in SQLite
(kb_class/kb_attribute/kb_type; /root/reference src/bin/initdb/main.rs:48-322).
Here the catalog *is* Spark's: fixture tables are parquet directories
resolved by name, engine-managed tables live under a warehouse dir and go
through Spark SQL DDL (see engine.py). No bespoke metadata store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Parquet scan → Catalyst gets pushdown/pruning.

    ``events.ts`` has appeared in two fixture generations: TIMESTAMP(NANOS)
    (which Spark only reads as a raw long under the legacy conf — truncate
    to micros, exactly what DuckDB does on the same file) and plain
    TIMESTAMP(MICROS). Detect from the read type and normalize both to
    timestamp_ntz so the oracle comparison stays value-identical.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        if dict(df.dtypes)["ts"] == "bigint":
            ts = F.expr("timestamp_micros(ts div 1000)")
        else:
            ts = F.col("ts")
        return df.withColumn("ts", ts.cast("timestamp_ntz"))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register fixture tables as temp views (for spark.sql-style queries)."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
