"""Local correctness harness mirroring the driver's gate: run a Spark query
and its DuckDB oracle on the same parquet tables and compare row count,
column names, and an order-insensitive value multiset (columns sorted by
name — same normalization the driver describes).

This is test infrastructure, not an operator path: collecting to the driver
here is deliberate (results are small aggregates).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from kuibadb_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    try:  # decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return _norm_cell(float(v))
    except ImportError:
        pass
    return f"s:{v}"


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark, name: str, sf_dir: str, query_fn, oracle: str) -> dict:
    sdf = query_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    report = {
        "name": name,
        "spark_rows": len(srows),
        "duck_rows": len(drows),
        "cols_match": sorted(scols) == sorted(dcols),
        "spark_cols": sorted(scols),
        "duck_cols": sorted(dcols),
    }
    if not report["cols_match"]:
        report["match"] = False
        return report
    sn = _normalize(srows, scols)
    dn = _normalize(drows, dcols)
    report["match"] = sn == dn
    if not report["match"]:
        s_only = [r for r in sn if r not in set(dn)][:5]
        d_only = [r for r in dn if r not in set(sn)][:5]
        report["spark_only_sample"] = s_only
        report["duck_only_sample"] = d_only
    return report
