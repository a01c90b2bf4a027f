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
