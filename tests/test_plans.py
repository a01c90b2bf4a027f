"""Physical-plan regression tests: the scale properties we rely on —
predicate pushdown into the parquet scan, column pruning, broadcast
joins for O(1) dims, partial+final aggregation — must stay in the plan.
"""

from __future__ import annotations

import contextlib
import io

from kuibadb_spark.operators.relational import (
    q1_pricing_summary,
    q5_local_supplier_volume,
    q6_forecast_revenue,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark):
    p = _plan(q6_forecast_revenue(spark, SF))
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity,24.0)" in p


def test_q6_column_pruning(spark):
    p = _plan(q6_forecast_revenue(spark, SF))
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_q5_broadcasts_dimensions(spark):
    p = _plan(q5_local_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q1_partial_aggregation(spark):
    p = _plan(q1_pricing_summary(spark, SF))
    # partial (map-side) + final HashAggregate pair around the exchange
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p
