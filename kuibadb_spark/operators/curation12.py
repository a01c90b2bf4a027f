"""Round-4 batch 7: readability scoring, embedding-space health audit,
a regex scalar family, the A/B sample-ratio-mismatch guardrail, and
first-time-event share.

Registered after curation11 in registry._MODULES (rounds 4/5 grading
windows undisturbed; gradable from round 6). Determinism rules are
curation5-11's. The regex family sticks to patterns whose semantics
are identical between Spark's Java regex and DuckDB's RE2 (character
classes, bounded quantifiers, anchors — no lookaround, no lazy ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. Flesch-Kincaid readability per source
# ---------------------------------------------------------------------------
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per source: syllables approximated as
    vowel groups (the standard dictionary-free heuristic), sentences as
    terminal-punctuation runs, words as whitespace tokens — all exact
    integer counts aggregated per source, with the FK formula
    0.39·(W/S) + 11.8·(Syl/W) − 15.59 as one final double expression.
    The readability band is a core text-quality feature (C4 keeps
    'sentence-like' text; extreme FK flags OCR junk and legalese)."""
    per = load(spark, sf_dir, "documents").selectExpr(
        "source",
        r"size(split(text, '\\s+')) AS w",
        "greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1) AS s",
        "greatest(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)), 1)"
        " AS syl",
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("words"),
            F.sum("s").alias("sentences"),
            F.sum("syl").alias("syllables"),
        )
        .selectExpr(
            "source", "n_docs", "words", "sentences", "syllables",
            "CAST(round((0.39D * (CAST(words AS DOUBLE) / sentences)"
            " + 11.8D * (CAST(syllables AS DOUBLE) / words)"
            " - 15.59D) * 100.0D) AS BIGINT) AS fk_grade_x100",
        )
        .orderBy("source")
    )


QUERIES["text_readability_scores"] = text_readability_scores

ORACLES["text_readability_scores"] = """
    WITH per AS (
        SELECT source,
               len(string_split_regex(text, '\\s+')) AS w,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
               greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                   AS syl
        FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS words,
           CAST(SUM(s) AS BIGINT) AS sentences,
           CAST(SUM(syl) AS BIGINT) AS syllables,
           CAST(round((0.39 * (CAST(SUM(w) AS DOUBLE) / SUM(s))
                + 11.8 * (CAST(SUM(syl) AS DOUBLE) / SUM(w))
                - 15.59) * 100.0) AS BIGINT) AS fk_grade_x100
    FROM per
    GROUP BY source
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 2. embedding-norm health audit
# ---------------------------------------------------------------------------
def sim_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health audit per label: norm distribution stats
    (mean, spread, extremes) plus the count of near-zero vectors —
    collapsed or dead embeddings are the first thing to check before
    any similarity search is trusted. Norms quantize to 1e6-scaled
    integers (sqrt of an exact integer sum-of-squares — libm-identical),
    so every aggregate is exact; the spread is the integer norm range
    rather than a float variance."""
    e = load(spark, sf_dir, "embeddings").selectExpr(
        "label",
        "CAST(round(sqrt(aggregate(transform(embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D,"
        " (acc, x) -> acc + x)) * 1000000.0D) AS BIGINT) AS norm_u",
    )
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm_u").alias("norm_min_u"),
            F.max("norm_u").alias("norm_max_u"),
            F.expr("SUM(norm_u) DIV COUNT(1)").alias("norm_mean_u"),
            F.sum(F.expr(
                "CASE WHEN norm_u < 100000 THEN 1 ELSE 0 END"
            )).alias("n_near_zero"),
        )
        .orderBy("label")
    )


QUERIES["sim_embedding_norm_audit"] = sim_embedding_norm_audit

ORACLES["sim_embedding_norm_audit"] = """
    WITH e AS (
        SELECT label,
               CAST(round(sqrt(list_sum(list_transform(
                   CAST(embedding AS DOUBLE[]), x -> x * x)))
                   * 1000000.0) AS BIGINT) AS norm_u
        FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(MIN(norm_u) AS BIGINT) AS norm_min_u,
           CAST(MAX(norm_u) AS BIGINT) AS norm_max_u,
           CAST(SUM(norm_u) // COUNT(*) AS BIGINT) AS norm_mean_u,
           CAST(SUM(CASE WHEN norm_u < 100000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_near_zero
    FROM e
    GROUP BY label
    ORDER BY label
"""


# ---------------------------------------------------------------------------
# 3. regex scalar family
# ---------------------------------------------------------------------------
def scalar_regex_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regex scalar surface over real column data: extract, replace,
    count, boolean match, and split-count — the §2.2 family the string
    matrix only grazes. Patterns are restricted to the Java-regex ∩ RE2
    common core (character classes, bounded repetition, anchors) so
    both engines agree byte-for-byte; inputs are the customer name plus
    a record-code string synthesized from fixture columns (the fixture
    ships no phone column)."""
    c = load(spark, sf_dir, "customer").filter("c_custkey % 3 = 0")
    code = ("concat(CAST(c_nationkey AS STRING), '-',"
            " CAST(c_custkey AS STRING), '-', c_mktsegment)")
    return (
        c.selectExpr(
            "c_custkey",
            f"regexp_extract({code}, '^([0-9]+)-', 1) AS nation_code",
            f"regexp_replace({code}, '[0-9]', '#') AS masked_code",
            f"size(regexp_extract_all({code}, '[0-9]+', 0)) AS digit_runs",
            f"CAST({code} RLIKE '^[0-9]{{2}}-' AS INT) AS has_cc2",
            r"size(split(c_name, '[#]+')) AS name_parts",
            "regexp_extract(c_name, '([0-9]+)$', 1) AS name_suffix",
            f"regexp_extract({code}, '([A-Z]+)$', 1) AS segment_caps",
        )
        .orderBy("c_custkey")
    )


QUERIES["scalar_regex_ops"] = scalar_regex_ops

ORACLES["scalar_regex_ops"] = """
    WITH c AS (
        SELECT c_custkey, c_name,
               CAST(c_nationkey AS VARCHAR) || '-'
               || CAST(c_custkey AS VARCHAR) || '-' || c_mktsegment AS code
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT c_custkey,
           regexp_extract(code, '^([0-9]+)-', 1) AS nation_code,
           regexp_replace(code, '[0-9]', '#', 'g') AS masked_code,
           CAST(len(regexp_extract_all(code, '[0-9]+')) AS INT)
               AS digit_runs,
           CAST(regexp_matches(code, '^[0-9]{2}-') AS INT) AS has_cc2,
           CAST(len(string_split_regex(c_name, '[#]+')) AS INT)
               AS name_parts,
           regexp_extract(c_name, '([0-9]+)$', 1) AS name_suffix,
           regexp_extract(code, '([A-Z]+)$', 1) AS segment_caps
    FROM c
    ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# 4. A/B sample-ratio-mismatch guardrail
# ---------------------------------------------------------------------------
def ev_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Ratio Mismatch check — the guardrail every experiment
    readout runs FIRST: under a 50/50 split, chi² = (nA−nB)²/(nA+nB)
    against the 3.841 critical value (alpha=0.05, df=1); a triggered
    SRM invalidates the experiment regardless of the metric movement.
    Exact integer counts per event type; one double expression."""
    counts = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a",
        )
        .groupBy("event_type")
        .agg(F.sum("is_a").alias("n_a"),
             F.sum(F.expr("1 - is_a")).alias("n_b"))
    )
    return (
        counts.selectExpr(
            "event_type", "n_a", "n_b",
            "CAST(round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)"
            " / (n_a + n_b) * 1000000.0D) AS BIGINT) AS chi2_micro",
            "CAST(CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)"
            " / (n_a + n_b) > 3.841458820694124D THEN 1 ELSE 0 END AS INT)"
            " AS srm_detected",
        )
        .orderBy("event_type")
    )


QUERIES["ev_ab_srm_check"] = ev_ab_srm_check

ORACLES["ev_ab_srm_check"] = """
    WITH counts AS (
        SELECT event_type,
               SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                / (n_a + n_b) * 1000000.0) AS BIGINT) AS chi2_micro,
           CAST(CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                / (n_a + n_b) > 3.841458820694124 THEN 1 ELSE 0 END AS INT)
               AS srm_detected
    FROM counts
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 5. first-time-event share
# ---------------------------------------------------------------------------
def ev_first_time_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty mix of the event stream: per day, what share of events
    is a user's FIRST of that type — separating acquisition/discovery
    activity from routine re-engagement. 'First' is a per-(user, type)
    row_number over the time order (bounded entity partitions, one
    exchange); the rollup is exact integer ppm."""
    ev = load(spark, sf_dir, "events")
    wfirst = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = ev.select(
        F.date_trunc("day", "ts").alias("d"),
        F.when(F.row_number().over(wfirst) == 1, 1).otherwise(0)
        .alias("is_first"),
    )
    return (
        flagged.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_first").alias("n_first"),
        )
        .selectExpr(
            "d", "n_events", "n_first",
            "n_first * 1000000 DIV n_events AS first_share_ppm",
        )
        .orderBy("d")
    )


QUERIES["ev_first_time_share"] = ev_first_time_share

ORACLES["ev_first_time_share"] = """
    WITH flagged AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CASE WHEN row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT d, COUNT(*) AS n_events,
           CAST(SUM(is_first) AS BIGINT) AS n_first,
           CAST(SUM(is_first) * 1000000 // COUNT(*) AS BIGINT)
               AS first_share_ppm
    FROM flagged
    GROUP BY d
    ORDER BY d
"""
