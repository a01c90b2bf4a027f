"""Time every queries() entry at a given SF dir; print sorted JSON.

Usage: python tools/sweep.py [sf_dir] [out_json]
Each query is executed twice (cold+warm within one session); the warm
time is what matters for bench headroom, the cold time catches
pathological plan-compile or scan costs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep.json"

import __spark_entry__ as entry
from kuibadb_spark.session import get_spark

spark = get_spark()
qs = entry.queries()
rows = {}
for name, fn in qs.items():
    try:
        t0 = time.time()
        fn(spark, sf_dir).collect()
        cold = time.time() - t0
        t1 = time.time()
        fn(spark, sf_dir).collect()
        warm = time.time() - t1
        rows[name] = {"cold": round(cold, 2), "warm": round(warm, 2)}
    except Exception as e:  # noqa: BLE001
        rows[name] = {"error": str(e)[:200]}
    print(f"{name}: {rows[name]}", flush=True)

with open(out, "w") as f:
    json.dump(rows, f, indent=1, sort_keys=True)
ranked = sorted(
    ((v.get("warm", 999), k) for k, v in rows.items() if "warm" in v), reverse=True
)
print("\n== slowest warm ==")
for w, k in ranked[:15]:
    print(f"{w:7.2f}s  {k}  (cold {rows[k]['cold']}s)")
errs = {k: v for k, v in rows.items() if "error" in v}
if errs:
    print("\n== errors ==")
    for k, v in errs.items():
        print(k, v["error"])
