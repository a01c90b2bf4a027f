"""COPY ingest throughput — the reference's primary executable workload
(src/commands/copy.rs: parallel delimited-text load into columnar files).

Usage: python tools/ingest_bench.py [sf_dir]

Exports lineitem to delimited text once, then measures Engine.copy_from
(text dialect and CSV dialect, parallel 32) into a fresh manifest table,
reporting rows/s end-to-end (parse + type + NOT NULL scan + parquet
write + manifest commit). Appends nothing anywhere — prints one JSON
line; paste the numbers into SCALING.md when they change materially.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kuibadb_spark.engine import Engine  # noqa: E402
from kuibadb_spark.session import get_spark  # noqa: E402

# the fixture's 11-column lineitem (TESTDATA.md), ts exported as string
SCHEMA = (
    "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
    " l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
    " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
    " l_linestatus STRING, l_shipdate TIMESTAMP"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("kuibadb-ingest-bench")
    work = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        n_rows = src.count()
        txt_dir = os.path.join(work, "lineitem_txt")
        (
            src.write.options(delimiter="|", nullValue=r"\N", emptyValue="",
                              quote="")
            .csv(txt_dir)
        )
        engine = Engine(spark, warehouse=os.path.join(work, "wh"))
        # warm-up: first COPY in a session pays file-listing + codegen
        # (~1.7 s at sf0.1) — absorb it so dialects compare steady-state
        engine.create_table("warmup", SCHEMA)
        engine.copy_from("warmup", f"{txt_dir}/part-*", delimiter="|",
                         parallel=32)
        results = {}
        for label, kwargs in (
            ("copy_text", {"delimiter": "|"}),
            ("copy_csv", {"delimiter": "|", "csv": True}),
        ):
            tname = f"li_{label}"
            engine.create_table(tname, SCHEMA)
            t0 = time.perf_counter()
            n = engine.copy_from(tname, f"{txt_dir}/part-*", parallel=32,
                                 **kwargs)
            dt = time.perf_counter() - t0
            assert n == n_rows, (n, n_rows)
            results[label] = {
                "rows": n,
                "sec": round(dt, 2),
                "rows_per_sec": int(n / dt),
            }
        print(json.dumps({"metric": "copy_ingest", "sf_dir": sf_dir,
                          **results}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
