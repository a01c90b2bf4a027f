"""Dump `.explain("formatted")` output for registry queries to files.

    python tools/dump_plans.py <out_dir> <suffix> <key> [<key> ...]

Writes <out_dir>/<key>_<suffix>.txt for each key (e.g. suffix "before"
run from a git worktree at the pre-optimization commit, "after" at
HEAD). Planning only — no job execution. Used to produce the
plans/r10/ evidence files the optimization-round judge checks claims
against.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kuibadb_spark import registry  # noqa: E402
from kuibadb_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix = Path(sys.argv[1]), sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("kuibadb-dump-plans")
    queries = registry.all_queries()
    for key in keys:
        df = queries[key](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{key}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {out_dir / f'{key}_{suffix}.txt'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
