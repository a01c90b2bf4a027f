"""Round-9 additions: inter-arrival spectrum telemetry and per-source
quality-quota sampling — two bounded-output training-pipeline staples.

Registered after curation19 in registry._MODULES (freeze discipline:
new keys append last so they queue behind the round's reverify set in
the grading window, displacing nothing).

Determinism house style throughout: integer seconds, `length(bin(x))`
for exact log₂ bucketing (pure integer/string in both engines — no
float log), ppm integers, rank ties broken on the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. inter-arrival spectrum: log2-bucketed per-user gaps, per event type
# ---------------------------------------------------------------------------
def ev_interarrival_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user inter-event gaps in log₂-second buckets,
    per event type — the arrival-process SPECTRUM next to
    ev_arrival_dispersion's one-number Fano verdict: Poisson traffic
    fills a smooth exponential ramp, metronomic bots spike one bucket,
    retry storms pile mass under a second. Output is (type × ≤22
    buckets) rows at any corpus size.

    Determinism: gaps are exact integer seconds; the bucket is
    length(bin(gap)) = floor(log₂ gap)+1 — an integer/string identity
    in BOTH engines (no float log whose last-ulp could flip a boundary
    power of two); sub-second gaps (gap = 0 s) land in bucket 0.

    Scale shape: one lag window partitioned by (user) — entity-
    partitioned, never global — then one narrow partial-aggregated
    groupBy((type, bucket)); the share denominator rides a second
    aggregation of the SAME grouped relation (type-level sums from the
    bucket rows, a ≤22-row-per-type frame), never a rescan."""
    e = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .selectExpr(
            "event_type",
            "(us - prev_us) DIV 1000000 AS gap_s",
        )
        .selectExpr(
            "event_type",
            "CASE WHEN gap_s <= 0 THEN 0"
            " ELSE length(bin(gap_s)) END AS bucket",
        )
    )
    per_bucket = gaps.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_gaps")
    )
    wt = W.partitionBy("event_type")
    return (
        per_bucket.withColumn("_tot", F.sum("n_gaps").over(wt))
        .selectExpr(
            "event_type",
            "bucket",
            "n_gaps",
            "n_gaps * 1000000 DIV _tot AS share_ppm",
        )
        .orderBy("event_type", "bucket")
    )


QUERIES["ev_interarrival_spectrum"] = ev_interarrival_spectrum

ORACLES["ev_interarrival_spectrum"] = """
    WITH gaps AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
               // 1000000 AS gap_s
        FROM events
    ),
    buckets AS (
        SELECT event_type,
               CASE WHEN gap_s <= 0 THEN 0
                    ELSE length(bin(gap_s)) END AS bucket
        FROM gaps WHERE gap_s IS NOT NULL
    ),
    per_bucket AS (
        SELECT event_type, CAST(bucket AS INT) AS bucket,
               COUNT(*) AS n_gaps
        FROM buckets GROUP BY 1, 2
    )
    SELECT event_type, bucket, n_gaps,
           CAST(n_gaps * 1000000 // SUM(n_gaps) OVER (
                PARTITION BY event_type) AS BIGINT) AS share_ppm
    FROM per_bucket
    ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# 2. per-source quality-quota sample (top-k docs by lexical diversity)
# ---------------------------------------------------------------------------
_QUOTA_K = 5


def sample_quota_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-quota sampling: each source contributes its top-5
    documents by lexical diversity (distinct-token share in ppm, the
    type/token ratio — boilerplate and template spam score low), rank
    ties broken on doc_id. The standard per-source quota pass when a
    mixture owner wants equal-source representation but only the best
    of each — output is sources × 5 rows at any corpus size.

    Determinism: the score is an exact integer ppm of two exact integer
    counts (array set/size — row-local, no float); rank is
    row_number over (score DESC, doc_id ASC), a total order.

    Scale shape: one row-local projection (split + array_distinct),
    then a source-partitioned rank that the planner collapses to
    WindowGroupLimit (partial per-partition top-5 before the exchange,
    ≤ sources×5 rows shuffle) — the bounded-headline pattern of
    ev_concurrent_sessions. No global window, no joins."""
    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "source",
        "split(text, ' ') AS w",
    ).selectExpr(
        "doc_id",
        "source",
        "size(w) AS n_tokens",
        # BIGINT before the ×1e6: an INT32 product overflows (ANSI
        # hard-error) once a doc tops ~2147 distinct tokens
        "CAST(size(array_distinct(w)) AS BIGINT) * 1000000 DIV size(w)"
        " AS diversity_ppm",
    )
    w = W.partitionBy("source").orderBy(
        F.desc("diversity_ppm"), F.asc("doc_id")
    )
    return (
        d.withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= _QUOTA_K)
        .select(
            "source", "rank_in_source", "doc_id", "n_tokens",
            "diversity_ppm",
        )
        .orderBy("source", "rank_in_source")
    )


QUERIES["sample_quota_per_source"] = sample_quota_per_source

ORACLES["sample_quota_per_source"] = """
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) * 1000000
                    // len(string_split(text, ' ')) AS BIGINT)
                   AS diversity_ppm
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY source
                   ORDER BY diversity_ppm DESC, doc_id) AS rank_in_source
        FROM d
    )
    SELECT source,
           CAST(rank_in_source AS INT) AS rank_in_source,
           doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           diversity_ppm
    FROM ranked
    WHERE rank_in_source <= 5
    ORDER BY source, rank_in_source
"""
