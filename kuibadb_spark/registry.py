"""Central query registry: merges each operator module's QUERIES/ORACLES.

The driver contract (__spark_entry__.py) exposes queries() and oracle_sql()
from here. A query appears in ORACLES only when it is expressible in ANSI
SQL runnable by DuckDB; genuinely non-SQL ops (custom stateful streaming,
iterative algorithms) register in QUERIES only → rows-only check.
"""

from __future__ import annotations

from kuibadb_spark.functions import scalar, udfs
from kuibadb_spark.operators import (
    aggregates,
    collections,
    curation,
    dedup,
    events,
    graph,
    multimodal,
    pipelines,
    recursive,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    similarity,
    temporal,
    text,
    windows,
)
from kuibadb_spark.streaming import events as streaming_events

_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    windows,
    aggregates,
    scalar,
    events,
    streaming_events,
    dedup,
    similarity,
    text,
    multimodal,
    temporal,
    collections,
    udfs,
    pipelines,
    graph,
    recursive,
    curation,
]


def all_queries() -> dict:
    out: dict = {}
    for m in _MODULES:
        dup = set(out) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict:
    out: dict = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLES", {}))
    unknown = set(out) - set(all_queries())
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return out
