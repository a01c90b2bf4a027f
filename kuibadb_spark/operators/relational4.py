"""Relational surface, round 4: LATERAL correlated joins, stratified
sampling, and PII redaction — the remaining declared/target-surface gaps
(SURVEY.md §2.3; the reference's grammar executes none of the relational
surface, /root/reference/src/parser/sql.lalrpop:314-318).

Scale notes (100 TB):
- join_lateral_topk: Catalyst decorrelates the LATERAL subquery into a
  ranked window over one shuffle of customer by nationkey — no per-row
  re-execution; nation stays broadcast-sized.
- sample_stratified: a pure map-side filter (hash bucket < per-stratum
  rate) followed by a partial-aggregated groupBy — one small shuffle of
  per-partition partials. No sort, no global pass; rates are row-local
  decisions so the sample is reproducible under any partitioning.
- text_pii_redact: row-local regex work (no shuffle at all until the
  result); the redaction pass is exactly the shape of a 100 TB cleaning
  job — read, transform columns, write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load


# --------------------------------------------------------------------------
# LATERAL top-k: for each nation, the two highest-balance customers
# --------------------------------------------------------------------------
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").alias("n")
    c = load(spark, sf_dir, "customer").alias("c")
    top2 = (
        c.where(F.col("c.c_nationkey") == F.col("n.n_nationkey").outer())
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(2)
    )
    return (
        n.lateralJoin(top2)
        .select("n_name", "c_custkey", "c_name", "c_acctbal")
        .orderBy("n_name", F.col("c_acctbal").desc(), "c_custkey")
    )


# --------------------------------------------------------------------------
# stratified deterministic sample: per-status rates via md5 hash buckets
# --------------------------------------------------------------------------
_RATES = {"O": 10, "F": 20, "P": 50}  # buckets of 100 kept per stratum


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = (
        F.when(F.col("o_orderstatus") == "O", _RATES["O"])
        .when(F.col("o_orderstatus") == "F", _RATES["F"])
        .otherwise(_RATES["P"])
    )
    return (
        o.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# PII redaction: inject deterministic synthetic PII, then scrub it
# --------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture corpus has no PII, so each doc gets a deterministic
    synthetic contact line first (email always, phone on even doc_ids) —
    identical synthesis in the DuckDB oracle, so the redacted text and
    per-type match counts must agree byte-for-byte."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    phone = F.concat(
        F.lit(" 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    seeded = d.withColumn(
        "t2",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(F.col("doc_id") % 2 == 0, phone).otherwise(F.lit("")),
        ),
    )
    return (
        seeded.select(
            "doc_id",
            F.regexp_count(F.col("t2"), F.lit(_EMAIL_RE)).alias("n_emails"),
            F.regexp_count(F.col("t2"), F.lit(_PHONE_RE)).alias("n_phones"),
            F.regexp_replace(
                F.regexp_replace("t2", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            ).alias("redacted"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "join_lateral_topk": join_lateral_topk,
    "sample_stratified": sample_stratified,
    "text_pii_redact": text_pii_redact,
}

ORACLES = {
    "join_lateral_topk": """
        SELECT n_name, t.c_custkey, t.c_name, t.c_acctbal
        FROM nation,
        LATERAL (
            SELECT c_custkey, c_name, c_acctbal
            FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
        ORDER BY n_name, t.c_acctbal DESC, t.c_custkey
    """,
    "sample_stratified": """
        WITH bucketed AS (
            SELECT o_orderstatus, o_totalprice,
                   CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 AS bucket,
                   CASE o_orderstatus WHEN 'O' THEN 10 WHEN 'F' THEN 20
                        ELSE 50 END AS rate
            FROM orders
        )
        SELECT o_orderstatus,
               count(*) AS n_sampled,
               round(sum(o_totalprice), 2) AS sampled_total
        FROM bucketed WHERE bucket < rate
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "text_pii_redact": r"""
        WITH seeded AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com'
                        || CASE WHEN doc_id % 2 = 0
                           THEN ' 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           ELSE '' END AS t2
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t2, '[a-z0-9._]+@[a-z0-9.]+'))
                    AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(t2, '\d{3}-\d{3}-\d{4}'))
                    AS INTEGER) AS n_phones,
               regexp_replace(
                   regexp_replace(t2, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                   '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
        FROM seeded
        ORDER BY doc_id
    """,
}
