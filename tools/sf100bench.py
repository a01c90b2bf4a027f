"""Standing two-decade scale guard (round-9 judge ask #7): the ×100
TRUE-fixture spot table, promoted from a by-hand single-shot read to a
per-round artifact with a mechanical alarm rule.

    python tools/sf100bench.py [--rebuild]

Times the ~15 PROBE keys — the round-9 two-decade table: one
representative per heavy family, chosen because they exercise every
scale-critical plan shape (banded LSH, distributed ntile/prefix-sum,
iterative graph, postings caps, bitset distinct, IVF buckets) — against
the ×100 true fixture (/tmp/sf100true, tools/genfixture.py: 63 M
lineitem, 10 M events, 500 k docs, Heaps vocabulary). Writes
BENCH_SF100_DETAIL.json next to the other bench artifacts.

Measurement: SINGLE-SHOT steady state after one warm-up action (these
keys run 2-80 s each at ×100; best-of-N would double a ~5-minute
sweep for noise that the two-decade alarm band already absorbs), with
one-time eager-build cost split out and the comparison run on
BUILD+QUERY totals, same as tools/sf1bench.py.

Alarm rule (the gate `tools/preflight.py --gates` re-checks at HEAD):
a probe key whose (×100 total) / (sf0.1 total) ratio exceeds ×40 over
the TWO-DECADE gap trips the alarm unless listed in
SF100_SUPERLINEAR_OK with a candidate-volume-minimality justification.
×40 for ×100 data is the empirical far-sub-linear band: every green
round-9 reading sat ≤ ×30, and a genuine O(n²)/O(n·log n)-gone-wrong
cliff reads hundreds here (the class this guard exists to trip:
dedup_simhash's fixed band space read ×46.7 on its FIRST ×10 run).

`ev_concurrent_sessions` is deliberately NOT probed at ×100: same-span
user density implies ~10⁴× real overlap pairs — the workload's own
candidate growth (DENSITY_SUPERLINEAR_OK in sf1bench.py), measured and
bounded at ×10 instead.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kuibadb_spark import registry  # noqa: E402
from kuibadb_spark.session import get_spark  # noqa: E402

SF100 = "/tmp/sf100true"
RATIO_ALARM = 40.0  # two decades of data in ≤ ×40 time = far sub-linear

PROBES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "w_pareto_abc",
    "w_decile_bands_orders",
    "ev_bot_decile_screen",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_fuzzy_levenshtein",
    "text_unigram_surprisal",
    "text_cross_source_overlap",
    "graph_pagerank",
    "graph_source_modularity",
    "agg_approx_sketches",
    "sim_ann_ivf",
    "dedup_embedding_cosine",
    "ev_peak_concurrency",
]

# key -> (raised per-key alarm ceiling, justification); add entries ONLY
# with a candidate-volume-minimality argument (the
# DENSITY_SUPERLINEAR_OK contract in sf1bench.py). agg_approx_sketches
# left the list via the round-10 chunked-bitset/bucket-selection replans
# (x29.9 -> x9.6-x15). Round-11 (ADVICE): whitelisted keys get a RAISED
# band instead of an unconditional exemption, so a genuine future
# regression on a whitelisted key (a plan change making it worse than
# the spec-minimal candidate volume) can still trip the guard.
SF100_SUPERLINEAR_OK: dict[str, tuple[float, str]] = {
    # EMPTY as of round 11. dedup_embedding_cosine left the list (it
    # entered in round 10 at ×88 with the by-spec quadratic-candidates
    # argument): the round-11 verify replan — group-pair cogroup (9×
    # replication instead of 33×) + prefilter-then-exact-score (one
    # BLAS matmul + 2 elementwise passes instead of ~10) — cut the
    # same-epoch ×100 reading 313.5 → 26.9 s (the round-10 form and
    # the ×88 artifact reading are the same plan in different epochs),
    # putting it back inside the plain ×40 band with identical output.
    # Candidate volume is still quadratic by spec; the CONSTANT was the
    # problem. If a future epoch trips ×40 again, re-argue with a
    # same-epoch decomposition before re-whitelisting.
}


def main() -> int:
    from genfixture import build

    spark = get_spark("kuibadb-sf100bench")
    if "--rebuild" in sys.argv or not os.path.exists(
        f"{SF100}/lineitem.parquet"
    ):
        print(f"building true ×100 fixture at {SF100}…", flush=True)
        build(spark, scale=100, dst=SF100)
    spark.read.parquet(f"{SF100}/region.parquet").count()  # warm

    queries = registry.all_queries()
    timings: dict[str, float] = {}
    builds: dict[str, float] = {}
    for name in PROBES:
        tb = time.perf_counter()
        df = queries[name](spark, SF100)
        build_s = time.perf_counter() - tb
        if build_s >= 1.0:
            builds[name] = round(build_s, 3)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        print(f"{name:34s} {timings[name]:8.2f}", flush=True)

    base: dict[str, float] = {}
    base_build: dict[str, float] = {}
    try:
        with open(ROOT / "BENCH_DETAIL.json") as f:
            d = json.load(f)
            base = d.get("queries", {})
            base_build = d.get("build", {})
    except Exception:
        pass

    def _base_tot(n: str) -> float:
        return base.get(n, 0.0) + base_build.get(n, 0.0)

    def _ratios(t: dict[str, float]) -> dict[str, float]:
        return {
            n: round((t[n] + builds.get(n, 0.0)) / _base_tot(n), 1)
            for n in t
            if _base_tot(n) > 0
        }

    def _ceiling(n: str) -> float:
        return max(RATIO_ALARM, SF100_SUPERLINEAR_OK.get(n, (0.0, ""))[0])

    def _alarm_keys(ratios: dict[str, float]) -> list[str]:
        return [n for n in ratios if ratios[n] > _ceiling(n)]

    ratios = _ratios(timings)
    # Single-shot noise guard (round-10 measurement fix, recorded in
    # OPTIMIZATION_r10.md): this host's I/O throughput swings ×4-10
    # between consecutive reads of the same plan (w_pareto_abc read
    # 18.9 s and 80.6 s in two back-to-back sweeps; its quiet-epoch
    # read is ~7-14 s), so ONE bad read of a ~×30 key trips the ×40
    # band without any plan change. A key whose single shot trips the
    # alarm gets exactly one re-probe — the alarm then fires only when
    # the ratio reproduces, which is the event the guard exists for.
    # Round-11 methodology fix (ADVICE r10): the retry feeds ONLY the
    # alarm decision — reported timings/queries/value keep the FIRST
    # reading for every key, so the headline totals stay single-shot
    # like-for-like across rounds instead of best-of-2 for exactly the
    # keys that read slow. Both readings live in `retries`. Build-phase
    # noise is NOT retried (the build keeps its first reading by
    # design: re-constructing the frame in a warm session would
    # under-state it), so an alarm whose noise landed in the build
    # cannot be cleared by the retry — stated here and in the artifact.
    retries: dict[str, dict[str, float]] = {}
    alarm_timings = dict(timings)
    for n in _alarm_keys(ratios):
        # drop the first frame before re-timing so builder-internal
        # localCheckpoint blocks can be GC-released and don't skew the
        # re-read (clearCache drops persist()s but not checkpoints)
        spark.catalog.clearCache()
        df = queries[n](spark, SF100)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        rq = round(time.perf_counter() - t0, 3)
        del df
        spark.catalog.clearCache()
        retries[n] = {"first_query_s": timings[n], "retry_query_s": rq}
        alarm_timings[n] = min(timings[n], rq)
        print(f"retry {n:28s} {rq:8.2f}", flush=True)
    alarm_ratios = _ratios(alarm_timings)
    alarms = sorted(
        (
            {"query": n, "sf01_total_s": round(_base_tot(n), 2),
             "sf100_total_s": round(
                 alarm_timings[n] + builds.get(n, 0.0), 2),
             "ratio": alarm_ratios[n], "ceiling": _ceiling(n)}
            for n in _alarm_keys(alarm_ratios)
        ),
        key=lambda m: -m["ratio"],
    )

    out = {
        "metric": "two_decade_probe_total_sf100",
        "value": round(sum(timings.values()), 3),
        "value_with_build": round(
            sum(timings.values()) + sum(builds.values()), 3
        ),
        "unit": "sec",
        "sf": "true x100 fixture (tools/genfixture.py)",
        "queries_n": len(timings),
        "ratio_alarm": RATIO_ALARM,
        "per_key_ceilings": {
            n: c for n, (c, _) in SF100_SUPERLINEAR_OK.items()
        },
        "basis": "build+query per key vs BENCH_DETAIL.json sf0.1 totals;"
                 " timings/queries/value are FIRST readings (retries feed"
                 " only the alarm decision); build-phase noise is not"
                 " retried",
        "alarms": alarms,
        "retries": retries,
        "queries": timings,
        "build": builds,
        "ratios_vs_sf01": ratios,
        "alarm_ratios": alarm_ratios,
    }
    with open(ROOT / "BENCH_SF100_DETAIL.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in (
        "metric", "value", "value_with_build", "queries_n")}))
    print("sf100bench", "PASSED" if not alarms
          else f"FAILED: {[a['query'] for a in alarms]}")
    return 0 if not alarms else 1


if __name__ == "__main__":
    raise SystemExit(main())
