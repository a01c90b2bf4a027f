"""Mirror of the driver's correctness gate: every query with an oracle must
match DuckDB (row count + column names + order-insensitive value multiset)
at sf0.001. The driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from kuibadb_spark import registry
from kuibadb_spark.parity import compare

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, sf_dir, name):
    rep = compare(spark, name, sf_dir, QUERIES[name], ORACLES[name])
    assert rep["cols_match"], rep
    assert rep["match"], rep


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
