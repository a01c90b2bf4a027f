"""COPY … FROM — parallel delimited-text ingest with the reference's
semantics (/root/reference src/commands/copy.rs:101-283):

- custom single-char delimiter (grammar sql.lalrpop:560-572),
- custom NULL marker, exact string match ⇒ NULL (copy.rs:160-166),
- a line with extra/missing columns is an error
  (ERRCODE_BAD_COPY_FILE_FORMAT, copy.rs:155-172),
- text→type conversion errors surface per-column (typinput procs,
  adt.rs:148-176 — here: ANSI CAST),
- NULL into a NOT NULL column is ERRCODE_NOT_NULL_VIOLATION
  (cs.rs:58-76),
- `(parallel N)` worker fan-out, one output file per worker
  (copy.rs:131-145) → repartition(N), one task file each,
- result is the loaded row count (`COPY n`).

Spark-first shape: the coordinator/worker scatter (bounded channel +
threadpool in the reference) IS Spark's task model. Lines are read
distributed (spark.read.text), split/validated/cast JVM-side (split +
element_at + CAST — no Python in the row path), and committed atomically
via the table manifest. Validation counts are aggregations, not
collect()s — at 100 TB the error scan is a full parallel pass, same as
the load itself.
"""

from __future__ import annotations

import glob as _glob
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from kuibadb_spark.errors import (
    BadCopyFileFormat,
    CheckViolation,
    NotNullViolation,
)

# Target input bytes per COPY task when the user gives no `(parallel N)`.
# Measured (INGEST.json / INGEST_SF1.json, round 8): a fixed knob
# inverts with input size — p8 beats p32 by 2.2× on a ~70 MB input
# (per-task parse+file overhead dominates) while p32 beats p8 by 1.4×
# at ~700 MB (parallel parse+write dominates). One task per ~16 MiB
# reproduces the per-size optimum at both scales (round-9 sweep:
# auto=5 within noise of the p8 optimum at sf0.1, auto=32 = the
# measured optimum at ×10), and at cluster scale the width is capped
# by the session's parallelism, so a 100 TB COPY degenerates to
# one-task-per-core waves rather than 6M tiny files.
_AUTO_TASK_BYTES = 16 << 20


def auto_copy_parallel(spark: SparkSession, path: str) -> int | None:
    """Size-derived COPY fan-out: ⌈input bytes / 16 MiB⌉ clamped to
    [1, defaultParallelism]. Local-filesystem paths (the lakehouse
    layout; globs allowed) are sized directly. Inputs this process
    CANNOT size — remote URIs, empty files, globs matching nothing —
    return None, meaning "don't repartition": the reference default is
    parallel=1/no scatter (copy.rs:131-145), and forcing a
    defaultParallelism repartition on an unsized input would pay a full
    shuffle for a guess (round-9 ADVICE)."""
    p = path
    # both URI spellings: file:///x (authority) and file:/x (no authority)
    if p.startswith("file://"):
        p = p[len("file://"):]
    elif p.startswith("file:/"):
        p = p[len("file:"):]
    # a literal path wins over glob interpretation: only treat p as a
    # glob when no file/dir exists under the literal name (paths that
    # genuinely contain *?[ are otherwise swallowed by a no-match glob)
    if os.path.exists(p):
        paths = [p]
    elif re.search(r"[*?\[]", p):
        paths = _glob.glob(p)
    else:
        return None  # remote URI / nonexistent: cannot size
    total = 0
    for q in paths:
        if os.path.isdir(q):
            for root, _, files in os.walk(q):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        elif os.path.isfile(q):
            total += os.path.getsize(q)
    if total <= 0:
        return None  # empty input or unmatched glob: nothing to size
    cap = spark.sparkContext.defaultParallelism
    return max(1, min((total + _AUTO_TASK_BYTES - 1) // _AUTO_TASK_BYTES, cap))


def parse_typed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = ",",
    null_marker: str = r"\N",
    csv: bool = False,
) -> DataFrame:
    """Distributed parse of delimited text into a typed DataFrame.

    Raises BadCopyFileFormat on column-count mismatches (non-CSV path).
    Type conversion uses ANSI CAST: junk text raises, matching the
    reference's typinput error behavior.
    """
    if csv:
        # quoted-field dialect → Spark's CSV reader implements it natively
        return spark.read.csv(
            path,
            sep=delimiter,
            nullValue=null_marker,
            schema=schema,
            mode="FAILFAST",
        )
    # text dialect FAST PATH: the native vectorized reader with quoting
    # DISABLED — extra AND missing columns raise MALFORMED_CSV_RECORD
    # under FAILFAST, at native-reader throughput (end-to-end COPY
    # 152k → 574k rows/s steady-state at sf0.1, tools/ingest_bench.py —
    # 3.8×; parquet write + manifest commit now dominate). Callers that
    # want the reference's counted diagnostics re-run
    # diagnose_bad_lines() on failure (Engine.copy_from does).
    #
    # Two univocity behaviors deviate from the reference contract and
    # are corrected here (round-6 review, verified empirically):
    # 1. An unquoted EMPTY field maps to null BEFORE the nullValue
    #    comparison — indistinguishable from the NULL marker — so
    #    'a,,5' silently loaded b=NULL where the reference loads ''
    #    (only an exact null_marker match is NULL, copy.rs:160-166).
    #    Fix: read every column as STRING with an impossible nullValue
    #    sentinel, so the ONLY nulls are univocity's empty-field
    #    mapping; coalesce them back to '', apply the exact-match NULL
    #    marker ourselves, then ANSI-cast (junk still raises, and ''
    #    into a numeric column now raises like the reference's
    #    typinput instead of silently loading NULL).
    # 2. The reader SKIPS blank lines, which the reference rejects as
    #    wrong-column-count rows (for a 1-column table a blank line is
    #    a legitimate row holding '') — so blank input silently lost
    #    rows. Fix: one cheap unparsed text pass rejects blank lines
    #    up front; 1-column tables take a split-based path where the
    #    blank line IS the row.
    ncols = len(schema.fields)
    raw = spark.read.text(path)
    if ncols == 1:
        # a line CONTAINING the delimiter is a 2+-column row into a
        # 1-column table — the reference's "extra data after last
        # expected column" (copy.rs:155-159). The whole-line read
        # succeeds regardless, so prescan explicitly (same shape as the
        # blank-line prescan below); the NULL marker itself is exempt
        # even if it happens to contain the delimiter.
        if raw.filter(
            F.col("value").contains(delimiter)
            & (F.col("value") != null_marker)
        ).limit(1).count():
            sample = raw.filter(
                F.col("value").contains(delimiter)
                & (F.col("value") != null_marker)
            ).head()[0]
            raise BadCopyFileFormat(
                f"extra data after last expected column (expected 1 "
                f"column); first offender: {sample!r}"
            )
        f = schema.fields[0]
        c = F.when(F.col("value") == null_marker, F.lit(None)).otherwise(
            F.col("value").cast(f.dataType)
        )
        return raw.select(c.alias(f.name))
    if raw.filter(F.col("value") == "").limit(1).count():
        raise BadCopyFileFormat(
            f"blank line in input: expected {ncols} columns"
        )
    sentinel = "\x00\x01__kb_never__"
    all_str = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    )
    df = spark.read.csv(
        path,
        sep=delimiter,
        nullValue=sentinel,
        schema=all_str,
        mode="FAILFAST",
        quote="",
    )
    cols = []
    for f in schema.fields:
        s = F.coalesce(F.col(f.name), F.lit(""))  # empty field, not NULL
        cols.append(
            F.when(s == null_marker, F.lit(None))
            .otherwise(s.cast(f.dataType))
            .alias(f.name)
        )
    return df.select(*cols)


def diagnose_bad_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str,
) -> None:
    """Diagnostic slow path, run only after the fast reader failed: count
    wrong-column-count lines and raise the reference's
    ERRCODE_BAD_COPY_FILE_FORMAT with the tally + first offender
    (copy.rs:155-172). Returns normally if counts are fine (the failure
    was a type error — let the caller re-raise the original)."""
    ncols = len(schema.fields)
    parts = F.split(F.col("value"), re.escape(delimiter), -1)
    bad = spark.read.text(path).select(parts.alias("p")).filter(
        F.size("p") != ncols
    )
    n_bad = bad.count()
    if n_bad:
        sample = bad.select(F.array_join("p", delimiter)).head()[0]
        raise BadCopyFileFormat(
            f"{n_bad} line(s) with wrong column count "
            f"(expected {ncols}); first: {sample!r}"
        )


def check_constraint(df: DataFrame, expr: str | None) -> None:
    """Write-path CHECK constraint: every incoming row must satisfy the
    table's check expression (declared via CREATE TABLE … WITH
    (check='…') reloptions). One aggregation pass, same shape as the
    NOT NULL scan; a violating row raises with a sample — PG 23514
    check_violation semantics on the lakehouse write path."""
    if not expr:
        return
    bad = df.filter(~F.expr(expr).eqNullSafe(F.lit(True)))
    n_bad = bad.count()
    if n_bad:
        sample = bad.limit(1).collect()[0].asDict()
        raise CheckViolation(
            f"{n_bad} row(s) violate CHECK ({expr}); first: {sample}"
        )


def check_not_null(df: DataFrame, not_null: list[str]) -> None:
    """Write-path NOT NULL enforcement (Spark does not enforce nullability
    on write; the reference errors — cs.rs:58-76). One aggregation pass
    over all constrained columns."""
    if not not_null:
        return
    counts = df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in not_null]
    ).head()
    for c in not_null:
        if counts[c]:
            raise NotNullViolation(
                f"column {c!r}: {counts[c]} NULL value(s) in COPY input"
            )
