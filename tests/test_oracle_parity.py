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
    # a 0-row result passes parity trivially and verifies nothing — the
    # round-2 sweep found two such queries (ev_burst_detection at minute
    # grain, graph_link_prediction on the all-cliques shingle graph);
    # every oracle query must do real work at fixture scale
    # q7 is spec-pinned TPC-H (FRANCE↔GERMANY pairs) and legitimately
    # empty at sf0.001; it returns rows at the driver's sf0.01
    if name not in {"q7_volume_shipping"}:
        assert rep["spark_rows"] > 0, f"{name}: trivially-empty parity"


def test_every_query_has_an_oracle():
    """Since round 3 every registry query has a DuckDB oracle
    (agg_approx_sketches was reshaped to emit its error-bound verdict) —
    no rows-only checks remain; regression here means a new query shipped
    without its oracle."""
    assert set(QUERIES) == set(ORACLES), sorted(set(QUERIES) - set(ORACLES))
