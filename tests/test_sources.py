"""Source/sink format coverage: JSON / ORC / CSV roundtrips preserve
values and schema (SURVEY.md §2.3 scans row); JDBC needs a driver jar —
out of scope in this container, engine raises cleanly via Spark.

Also: SET/SHOW GUC semantics through the engine's SQL entry point
(reference: src/utility.rs:107-149 — the GUC system maps to Spark conf).
"""

from __future__ import annotations

import pytest

from kuibadb_spark.catalog import load
from kuibadb_spark.engine import Engine

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


@pytest.mark.parametrize("fmt", ["json", "orc", "csv"])
def test_format_roundtrip(spark, tmp_path, fmt):
    src = load(spark, SF, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    w = src.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    getattr(w, fmt)(path)

    r = spark.read
    if fmt == "csv":
        r = r.option("header", True)
    back = getattr(r.schema(src.schema), fmt)(path)
    assert back.count() == 25
    assert {x.n_name for x in back.collect()} == {x.n_name for x in src.collect()}
    assert back.schema == src.schema


def test_set_show_guc(engine):
    # SET k = v and SHOW-style readback flow through Spark conf natively
    engine.sql("SET spark.sql.shuffle.partitions=16")
    [row] = engine.sql("SET spark.sql.shuffle.partitions").collect()
    assert row.value == "16"
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") == "16"
    engine.sql("SET spark.sql.shuffle.partitions=32")


def test_jdbc_needs_driver(spark):
    # no JDBC driver jars in the container: the source surface exists but
    # must fail cleanly, not hang
    with pytest.raises(Exception):
        spark.read.format("jdbc").options(
            url="jdbc:postgresql://localhost:5432/x", dbtable="t"
        ).load()
