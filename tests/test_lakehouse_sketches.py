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
    """The registry's only oracle-less query gets its verification story
    here (round-1 verdict item 6): every per-group HLL++ estimate and
    approx-median from agg_approx_sketches is pinned against the exact
    counterpart with documented error bounds (rsd 5% → assert 3σ = 15%;
    approx_percentile at default accuracy is near-exact, assert ≤1%)."""
    from kuibadb_spark.operators.aggregates import agg_approx_sketches

    approx = {r.l_returnflag: r for r in agg_approx_sketches(spark, SF).collect()}
    l = load(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) >= 3
    for k, e in exact.items():
        a = approx[k]
        assert abs(a.approx_parts - e.parts) / e.parts <= 0.15, (k, a, e)
        assert abs(a.approx_median - e.median) / e.median <= 0.01, (k, a, e)
