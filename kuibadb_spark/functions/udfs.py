"""User-defined function surface: the engine's extension point.

The reference's extension mechanism is a C-ABI function table
(/root/reference src/utils/fmgr.rs:36-43, its fmgr builtin map); the
Spark-native equivalents, in preference order (SURVEY.md §2.3):

1. pandas_udf (scalar)      — Arrow-vectorized columnar batches,
2. pandas_udf (grouped agg) — custom aggregates,
3. applyInPandas            — grouped map (whole-group transforms),
4. row-at-a-time @udf       — exists for completeness, never in hot paths.

Every UDF here uses integer-exact or single-division math so the DuckDB
SQL oracle matches bit-for-bit — the point is proving the Arrow plumbing
produces exactly what the declarative plan would.

Scale notes: scalar pandas_udfs stream Arrow batches inside the stage
(no shuffle); grouped variants shuffle once on the group key. Weighted
mean keeps sums in int64 cents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# scalar pandas UDF: vectorized per-row scoring
# --------------------------------------------------------------------------
@F.pandas_udf(T.LongType())
def _value_bucket97(value: pd.Series) -> pd.Series:
    # integer-exact: cents mod 97 (same expression as the SQL oracle)
    return (value * 100).round().astype("int64") % 97


def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("bucket97", _value_bucket97("value"))
        .groupBy("bucket97")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket97")
    )


# --------------------------------------------------------------------------
# grouped-agg pandas UDF: custom weighted mean (int-exact)
# --------------------------------------------------------------------------
@F.pandas_udf(T.LongType())
def _weighted_cents(value: pd.Series, weight: pd.Series) -> int:
    cents = (value * 100).round().astype("int64")
    w = weight.astype("int64")
    tot = int((cents * w).sum())
    n = int(w.sum())
    return tot // n if n else 0


def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "w", (F.col("event_id") % 5 + 1).cast("long")
    )
    return (
        e.groupBy("event_type")
        .agg(_weighted_cents("value", "w").alias("wmean_cents"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# grouped-map applyInPandas: per-group min-max normalization
# --------------------------------------------------------------------------
def _minmax_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    cents = (pdf["value"] * 100).round().astype("int64")
    lo, hi = int(cents.min()), int(cents.max())
    span = (hi - lo) or 1
    out = pdf[["user_id", "event_id"]].copy()
    # per-mille in integers: deterministic across engines
    out["norm_e3"] = ((cents - lo) * 1000 // span).astype("int64")
    return out


def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return (
        e.groupBy("user_id")
        .applyInPandas(_minmax_fn, schema="user_id long, event_id long, norm_e3 long")
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# Python UDTF: one input row → many output rows (table function)
# --------------------------------------------------------------------------
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string, tok_len int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, t in enumerate(text.split()):
                yield i, t, len(t)

    spark.udtf.register("ks_tokenize", Tokenize)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 10).createOrReplaceTempView(
        "ks_docs_udtf"
    )
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.tok, t.tok_len
        FROM ks_docs_udtf, LATERAL ks_tokenize(text) t
        ORDER BY doc_id, pos
        """
    )


QUERIES = {
    "udf_pandas_scalar": udf_pandas_scalar,
    "udf_grouped_agg": udf_grouped_agg,
    "udf_apply_in_pandas": udf_apply_in_pandas,
    "udf_python_udtf": udf_python_udtf,
}

ORACLES = {
    "udf_pandas_scalar": """
        SELECT CAST(round(value * 100, 0) AS BIGINT) % 97 AS bucket97,
               count(*) AS n
        FROM events
        GROUP BY bucket97
        ORDER BY bucket97
    """,
    "udf_grouped_agg": """
        SELECT event_type,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                        * (event_id % 5 + 1))
                    // sum(event_id % 5 + 1) AS BIGINT) AS wmean_cents
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "udf_python_udtf": """
        WITH t AS (
            SELECT doc_id, string_split_regex(text, '\\s+') AS toks
            FROM documents WHERE doc_id < 10
        )
        SELECT doc_id,
               CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
               unnest(toks) AS tok,
               CAST(length(unnest(toks)) AS INTEGER) AS tok_len
        FROM t
        ORDER BY doc_id, pos
    """,
    "udf_apply_in_pandas": """
        WITH c AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE user_id < 30
        ), mm AS (
            SELECT user_id, event_id, cents,
                   min(cents) OVER (PARTITION BY user_id) AS lo,
                   max(cents) OVER (PARTITION BY user_id) AS hi
            FROM c
        )
        SELECT user_id, event_id,
               CAST((cents - lo) * 1000 //
                    (CASE WHEN hi - lo = 0 THEN 1 ELSE hi - lo END) AS BIGINT)
                   AS norm_e3
        FROM mm
        ORDER BY user_id, event_id
    """,
}
