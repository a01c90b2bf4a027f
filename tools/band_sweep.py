"""Round-4 sweep: ev_concurrent_sessions banded-join bucket width.

The band width trades fan-out (sessions explode to ceil(len/band) + 1
buckets) against per-bucket pair count (bucket population grows with
band, pairs grow quadratically in it). 600 s has been the setting since
round 2; VERDICT r3 asked for a 2-point probe (300 s / 1200 s) at sf0.1
to either shave the #1 headliner cost or close the question.

Usage: python tools/band_sweep.py  (prints per-band median seconds)
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from kuibadb_spark.operators import events
from kuibadb_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
BANDS_S = [300, 600, 1200]
REPS = 5


def main() -> None:
    spark = get_spark("band-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for band in BANDS_S:
        events._CS_BAND_S = band
        # warm-up run compiles the plan and faults in the page cache
        rows = events.ev_concurrent_sessions(spark, SF_DIR).count()
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            events.ev_concurrent_sessions(spark, SF_DIR).count()
            times.append(time.perf_counter() - t0)
        results[band] = (statistics.median(times), rows)
        print(f"band={band:5d}s  median={results[band][0]:.2f}s "
              f"(runs: {', '.join(f'{t:.2f}' for t in times)})  rows={rows}")
    events._CS_BAND_S = 600
    base_rows = results[600][1]
    assert all(r == base_rows for _, r in results.values()), \
        "row counts diverged across bands — correctness bug, not a tuning knob"
    best = min(results, key=lambda b: results[b][0])
    print(f"best: {best}s-band at {results[best][0]:.2f}s "
          f"(600s baseline {results[600][0]:.2f}s)")


if __name__ == "__main__":
    main()
