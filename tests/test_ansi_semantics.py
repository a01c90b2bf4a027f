"""ANSI error semantics — the reference's checked arithmetic contract
(/root/reference src/utils/adt.rs:29-33: int4pl raises
ERRCODE_NUMERIC_VALUE_OUT_OF_RANGE on overflow; int4div /0 is PG error
22012): with spark.sql.ansi.enabled=true these raise instead of
wrapping/nulling, and TRY_-variants give the PG-less lenient path.
"""

from __future__ import annotations

import pytest
from pyspark.errors import ArithmeticException, NumberFormatException


def test_int_overflow_raises(spark):
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT 2147483647 + CAST(1 AS INT)").collect()


def test_int_div_by_zero_raises(spark):
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT 1 div 0").collect()


def test_bad_cast_raises(spark):
    with pytest.raises(NumberFormatException):
        spark.sql("SELECT CAST('junk' AS INT)").collect()


def test_try_variants_return_null(spark):
    row = spark.sql(
        "SELECT TRY_CAST('junk' AS INT) AS a, try_add(2147483647, 1) AS b,"
        " try_divide(1, 0) AS c"
    ).collect()[0]
    assert row.a is None and row.b is None and row.c is None


def test_float_div_by_zero_raises(spark):
    # Spark 4 ANSI errors on float /0 — matching PG float8div (error
    # 22012), stricter than IEEE-Infinity engines like DuckDB
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT 1.0D / 0.0D AS x").collect()
