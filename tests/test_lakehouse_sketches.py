from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.sources.lakehouse import LakehouseFormatUnavailable, read_delta

SF = "/root/testdata/sf0.01"


def test_delta_gated_cleanly(spark, tmp_path):
    with pytest.raises(LakehouseFormatUnavailable):
        read_delta(spark, str(tmp_path))


def test_hll_sketch_accuracy(spark):
    # approx_count_distinct (HLL++, default rsd 5%) must track the exact
    # count within tolerance — the 100 TB substitute for exact distincts
    l = load(spark, SF, "lineitem")
    row = l.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).head()
    assert abs(row.approx - row.exact) / row.exact < 0.1


def test_approx_percentile_tracks_exact(spark):
    o = load(spark, SF, "orders")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("approx"),
    ).head()
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_agg_approx_sketches_vs_exact(spark):
    """agg_approx_sketches now emits the error-bound verdict directly
    (round-2 verdict item 3 — the query became oracle-able by shipping
    exact_parts + within-bound booleans instead of raw sketch values).
    Pin that every group's booleans are TRUE and exact_parts matches a
    freshly computed exact distinct."""
    from kuibadb_spark.operators.aggregates import agg_approx_sketches

    rows = {r.l_returnflag: r for r in agg_approx_sketches(spark, SF).collect()}
    l = load(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("parts"))
        .collect()
    }
    assert set(rows) == set(exact) and len(exact) >= 3
    for k, e in exact.items():
        a = rows[k]
        assert a.exact_parts == e.parts, (k, a, e)
        assert a.parts_within_5pct is True, (k, a)
        assert a.median_within_5pct is True, (k, a)


def test_bucket_selection_median_bit_identical(spark):
    """The round-10 two-pass bucket-selection exact median must match
    percentile() bit-for-bit on adversarial layouts: middle positions
    straddling a 4096-cent coarse-bucket boundary (the two selected
    buckets are then DISTINCT and must compose via the min(_lo) offset),
    odd and even n, duplicates piled on the boundary, NULLs dropped."""
    from kuibadb_spark.operators.aggregates import _bucket_selection_median

    cases = [
        # even n, middles straddle the 4095|4096-cent bucket edge
        [40.95, 40.97],
        [40.95, 40.95, 40.97, 40.97],
        # odd n, median in the second of two occupied buckets
        [1.00, 40.97, 41.00],
        # duplicates on both sides of the edge + far outliers
        [0.01, 40.95, 40.95, 40.96, 40.96, 40.96, 99.99, 500.0],
        # all values in ONE bucket (degenerate single-bucket path)
        [10.0, 10.0, 10.01, 11.0],
        # NULLs interleaved: percentile() ignores them, so must we
        [None, 40.95, None, 40.97, 123.45],
        # selected buckets separated by EMPTY buckets in between
        [40.95, 122.88],
    ]
    rows = []
    for i, vals in enumerate(cases):
        rows += [(f"f{i}", 1 + j, v) for j, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_partkey long, l_extendedprice double"
    )
    # _exact_median is DECIMAL (SQL literal 2.0 is decimal-typed, and
    # bigint/decimal stays decimal) — coerce for the comparison
    got = {
        r.l_returnflag: float(r._exact_median)
        for r in _bucket_selection_median(df).collect()
    }
    want = {
        r.l_returnflag: r.m
        for r in df.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
        .collect()
    }
    assert set(got) == set(want) and len(got) == len(cases)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
