"""One-command pre-commit gate: everything the driver will check, locally.

    python tools/preflight.py [--sf01] [--gates]

Runs, in order, sharing one Spark session:
1. registry invariants (unique keys, oracles subset, unverified-first order)
2. full oracle TYPE audit (DuckDB arrow schema vs Spark schema — the
   typed-hash trap class, tools/type_audit.py) + the whole-registry
   physical-plan audit (tools/plan_audit.py: no cartesian product, no
   unwhitelisted BNLJ, no unbounded global window — always runs, static)
3. full value parity at sf0.001 (row count + columns + order-insensitive
   multiset + non-empty guard), optionally sf0.01 with --sf01 (the
   driver's actual correctness SF — slower)
4. driver-contract smoke (entry/queries/oracle_sql importable + shaped)
5. with --gates: the runtime gates — cachecheck (orphaned persists
   over bench headliners, at sf0.1) and lengthprobe (payload-length
   axis over its sf0.01-based ×1/×4/×16 fixtures, auto-built and
   rebuilt when incomplete)

The full pre-round command is `python tools/preflight.py --sf01 --gates`.
Exit 0 iff every gate passes. pytest plan/engine suites are NOT run here
(run `python -m pytest tests/ -q` for those).
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from kuibadb_spark import registry  # noqa: E402
from kuibadb_spark.parity import compare  # noqa: E402
from kuibadb_spark.session import get_spark  # noqa: E402
from type_audit import audit  # noqa: E402

EMPTY_OK = {"q7_volume_shipping"}  # spec-pinned TPC-H, empty below sf0.01


def main() -> int:
    failures: list[str] = []  # failing stage names, re-printed at the end
    qs, osql = registry.all_queries(), registry.all_oracles()

    # 1. registry invariants
    keys = list(qs)
    verified = registry.driver_verified()
    assert len(keys) == len(set(keys)), "duplicate registry keys"
    assert set(osql) <= set(qs), "oracles without queries"
    # _REVERIFY keys are verified-but-stale (semantics changed after
    # their green grade) and deliberately sort to the window front
    fresh_verified = verified - registry._REVERIFY
    n_unverified = len(keys) - len(fresh_verified & set(keys))
    assert not (set(keys[:n_unverified]) & fresh_verified), \
        "verified key in window"
    print(f"[1/5] registry: {len(keys)} queries, {len(osql)} oracles, "
          f"{n_unverified} not yet driver-verified or stale (ordered first)")

    # 1b. no complex output types: the driver's pandas canonicalizer
    # sorts/hashes every result cell, and raises `unhashable type` on
    # bytearray/list cells — so no ARRAY/MAP/BINARY/STRUCT column may
    # reach a final query schema (stringify at the boundary: hex() /
    # array_join() / CAST AS STRING). type_audit can't catch this class:
    # the types *agree* across engines (array<bigint> ≡ list<i64>).
    print("[1b] complex-output-type scan (schemas at sf0.001)…")
    spark = get_spark()
    complex_bad = []
    for n in sorted(qs):
        try:
            schema = qs[n](spark, "/root/testdata/sf0.001").schema
        except Exception as e:  # schema derivation itself failing is a fail
            complex_bad.append((n, f"schema error: {e}"))
            continue
        for f in schema.fields:
            tn = f.dataType.typeName()
            if tn in ("array", "map", "binary", "struct"):
                complex_bad.append((n, f"{f.name}: {f.dataType.simpleString()}"))
    if complex_bad:
        failures.append("complex-types")
        for n, why in complex_bad:
            print(f"  FAIL {n}: {why}")
    else:
        print(f"  {len(qs)} schemas scalar-only")

    # 2. type audit
    print("[2/5] type audit (sf0.001)…")
    if audit("/root/testdata/sf0.001") != 0:
        failures.append("type-audit")

    # 2b. whole-registry physical-plan audit (round-5 judge ask #3):
    # static — builds every plan without executing, so it always runs.
    # Fails on any CartesianProduct, unwhitelisted
    # BroadcastNestedLoopJoin, or unbounded global window.
    print("[2b] physical-plan audit…")
    from plan_audit import main as plan_audit_main
    if plan_audit_main("/root/testdata/sf0.001") != 0:
        failures.append("plan-audit")

    # 3. value parity
    sfs = ["/root/testdata/sf0.001"]
    if "--sf01" in sys.argv:
        sfs.append("/root/testdata/sf0.01")
    for sf in sfs:
        print(f"[3/5] value parity at {sf}…")
        bad = []
        for n in sorted(osql):
            rep = compare(spark, n, sf, qs[n], osql[n])
            if not rep["match"]:
                bad.append((n, "mismatch"))
            elif rep["spark_rows"] == 0 and n not in EMPTY_OK:
                bad.append((n, "trivially empty"))
        if bad:
            failures.append(f"parity:{sf.rsplit('/', 1)[-1]}")
            for n, why in bad:
                print(f"  FAIL {n}: {why}")
        else:
            print(f"  {len(osql)} oracles green")

    # 3b. the driver's NEXT grading window: first 50 keys must all have
    # oracles and pass at the driver's sf0.01 (cheap: 50 of the 180+)
    print("[3b/5] driver window (first 50 keys) at sf0.01…")
    window_bad = []
    for n in keys[:50]:
        if n not in osql:
            window_bad.append((n, "no oracle"))
            continue
        rep = compare(spark, n, "/root/testdata/sf0.01", qs[n], osql[n])
        if not rep["match"] or rep["spark_rows"] == 0:
            window_bad.append((n, rep.get("spark_rows")))
    if window_bad:
        failures.append("driver-window")
        for n, why in window_bad:
            print(f"  FAIL {n}: {why}")
    else:
        print("  50/50 green")

    # 4. driver contract
    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as entrymod

    rows = entrymod.entry(spark).count()
    assert rows > 0, "entry() returned no rows"
    assert len(entrymod.queries()) == len(qs)
    assert len(entrymod.oracle_sql()) == len(osql)
    print(f"[4/5] driver contract: entry rows={rows}, "
          f"queries={len(qs)}, oracles={len(osql)}")

    # 5. runtime gates (round-5 judge ask #3): the orphaned-persist
    # detector over the bench headliners and the payload-length probe,
    # both at real data scale — minutes, so behind --gates (the full
    # pre-round command is `python tools/preflight.py --sf01 --gates`).
    if "--gates" in sys.argv:
        from cachecheck import main as cachecheck_main
        from lengthprobe import build as lp_build
        from lengthprobe import fixtures_complete as lp_complete
        from lengthprobe import run as lp_run

        # a gate CRASHING is a gate FAILING — don't let one abort the
        # others with a bare traceback (round-6 review)
        print("[5a] cachecheck (orphaned persists, sf0.1)…")
        try:
            if cachecheck_main("/root/testdata/sf0.1") != 0:
                failures.append("cachecheck")
        except Exception as e:
            failures.append("cachecheck-crash")
            print(f"  FAIL cachecheck crashed: {e}")
        print("[5b] lengthprobe (payload-length axis)…")
        try:
            if not lp_complete():  # absent OR partially-built fixtures
                lp_build(spark)
            if lp_run(spark) != 0:
                failures.append("lengthprobe")
        except Exception as e:
            failures.append("lengthprobe-crash")
            print(f"  FAIL lengthprobe crashed: {e}")
        # 5c. two-decade guard artifact (round-9 judge ask #7): the ×100
        # probe sweep itself takes ~10 min on a 2 GB fixture, so the
        # gate re-checks the committed artifact, not a live run — it
        # must exist, cover the probe set, and carry ZERO unwhitelisted
        # alarms. Regenerate per round with `python tools/sf100bench.py`
        # AFTER bench.py (ratios must share an environment epoch).
        print("[5c] sf100 two-decade artifact…")
        try:
            import json as _json
            from sf100bench import PROBES
            with open(ROOT / "BENCH_SF100_DETAIL.json") as f:
                sf100 = _json.load(f)
            missing = [p for p in PROBES if p not in sf100.get("queries", {})]
            # the artifact's alarm list already applies the per-key
            # raised ceilings (round-11: whitelisted keys alarm above
            # their own band instead of never), so every recorded alarm
            # is live
            live = sf100.get("alarms", [])
            if missing:
                failures.append("sf100-artifact-incomplete")
                print(f"  FAIL missing probes: {missing}")
            elif live:
                failures.append("sf100-alarms")
                for a in live:
                    print(f"  FAIL {a['query']}: ×{a['ratio']} at ×100")
            else:
                print(f"  {len(sf100['queries'])} probes, 0 alarms")
        except FileNotFoundError:
            failures.append("sf100-artifact-missing")
            print("  FAIL BENCH_SF100_DETAIL.json not generated this round")
        except Exception as e:
            failures.append("sf100-artifact-crash")
            print(f"  FAIL sf100 artifact check crashed: {e}")

    # the final line names every failing stage: the driver (and any
    # bounded stdout tail) keeps only the end of the log, so a bare
    # FAILED that lost its per-stage context was unactionable (round-7
    # judge ask #1b)
    if failures:
        print(f"PREFLIGHT FAILED: [{', '.join(failures)}]")
        return 1
    print("PREFLIGHT PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
