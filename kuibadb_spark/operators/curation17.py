"""Round-7 batch 3: behavioral bot screening, tokenizer coverage
curves, and dedup-aware mixture re-weighting.

Registered after curation16 in registry._MODULES — same freeze
discipline: these unverified keys queue behind the round-7 window
head.

Determinism: rank/decile verdicts break ties on the entity key, counts
and shares are exact integers, and the only float is the already-exact
integer-sqrt pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. behavioral bot screen (rate × regularity deciles)
# ---------------------------------------------------------------------------
def ev_bot_decile_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user abuse screen over the event stream — the threshold-free
    twin of curation4's ev_bot_detection rule stack: events per active
    minute (rate) and the Fano dispersion of per-minute counts
    (regularity — metronomic robots sit far under Poisson's 1e6 ppm),
    with DECILE-based verdicts (top-rate AND most-metronomic decile).
    Deciles adapt to any traffic mix where fixed rule thresholds must
    be retuned per deployment; ntile ties break on user_id in both
    engines.

    Scale shape: groupBy(user, minute) then groupBy(user) — two
    partial-aggregated narrow shuffles; the deciles use the exact
    distributed ntile (plans/ranks.py: range-repartition + partitioned
    row_number + broadcast prefix cross), so no global window sorts the
    user frame in one task; assignments are bit-identical to window
    ntile and the oracle is unchanged.

    int64 headroom (ADVICE r7, closed r9): dispersion uses the
    decomposed milli form D_milli = (1000·q) div S − (1000·S) div n
    (the ev_arrival_dispersion house spelling — q/S − S/n exact in
    rationals, each floor < 1 milli) — nothing ever multiplies
    active_minutes into the numerator, so the PER-USER bound is just
    Σc² < 9.2e15: a single user would need ~96 M events in one minute
    (or 2 years at ~2 M/minute) to overflow. No caveat at 100 TB.
    """
    from kuibadb_spark.plans.ranks import distributed_ntile

    ev = load(spark, sf_dir, "events").selectExpr(
        "user_id", "date_trunc('minute', ts) AS m"
    )
    per_min = ev.groupBy("user_id", "m").agg(F.count(F.lit(1)).alias("c"))
    u = per_min.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("active_minutes"),
        F.sum("c").alias("n_events"),
        F.sum(F.expr("c * c")).alias("q"),
    ).selectExpr(
        "user_id",
        "n_events",
        "active_minutes",
        "n_events * 1000 DIV active_minutes AS rate_milli",
        "(1000 * q) DIV n_events - (1000 * n_events) DIV active_minutes"
        " AS dispersion_milli",
    )
    return (
        distributed_ntile(
            distributed_ntile(
                u, [F.desc("rate_milli"), F.asc("user_id")], 10,
                "rate_decile",
            ),
            [F.asc("dispersion_milli"), F.asc("user_id")], 10,
            "regularity_decile",
        )
        .selectExpr(
            "user_id",
            "n_events",
            "active_minutes",
            "rate_milli",
            "dispersion_milli",
            "rate_decile",
            "regularity_decile",
            "CAST(rate_decile = 1 AND regularity_decile = 1 AS INT)"
            " AS bot_suspect",
        )
        .orderBy("user_id")
    )


QUERIES["ev_bot_decile_screen"] = ev_bot_decile_screen

ORACLES["ev_bot_decile_screen"] = """
    WITH per_min AS (
        SELECT user_id, date_trunc('minute', ts) AS m, COUNT(*) AS c
        FROM events GROUP BY user_id, date_trunc('minute', ts)
    ),
    u AS (
        SELECT user_id,
               CAST(SUM(c) AS BIGINT) AS n_events,
               COUNT(*) AS active_minutes,
               CAST(SUM(c) * 1000 // COUNT(*) AS BIGINT) AS rate_milli,
               CAST((1000 * SUM(c * c)) // SUM(c)
                    - (1000 * SUM(c)) // COUNT(*) AS BIGINT) AS dispersion_milli
        FROM per_min GROUP BY user_id
    ),
    ranked AS (
        SELECT *,
               ntile(10) OVER (ORDER BY rate_milli DESC, user_id)
                   AS rate_decile,
               ntile(10) OVER (ORDER BY dispersion_milli, user_id)
                   AS regularity_decile
        FROM u
    )
    SELECT user_id, n_events, active_minutes, rate_milli, dispersion_milli,
           CAST(rate_decile AS INT) AS rate_decile,
           CAST(regularity_decile AS INT) AS regularity_decile,
           CAST(CASE WHEN rate_decile = 1 AND regularity_decile = 1
                THEN 1 ELSE 0 END AS INT) AS bot_suspect
    FROM ranked
    ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 2. tokenizer coverage curve (top-K n-gram mass)
# ---------------------------------------------------------------------------
def text_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary-size/coverage trade behind tokenizer design: what
    share of all corpus 3-gram OCCURRENCES the top-K most frequent
    3-grams cover, at K ∈ {100, 1000, 10000}. A steep curve (high
    coverage at small K) means a small merge vocabulary already
    compresses well; Zipf-flat tails argue for bigger K.

    Frequency ranks break ties on the gram string, so the top-K set is
    identical in both engines.

    Scale shape: one explode → groupBy(gram) (the wide shuffle), then
    the rank window over the GRAM-frequency table (vocabulary-, not
    corpus-, cardinality — the [hist] global-window class; at web-scale
    vocabularies the two-pass count-of-counts histogram selection
    documented in ev_time_to_convert applies) and a 3-row conditional
    aggregate.
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "split(text, ' ') AS w"
    )
    grams = (
        d.filter(F.expr("size(w) >= 3"))
        .selectExpr(
            "explode(transform(sequence(0, size(w) - 3),"
            " i -> array_join(slice(w, i + 1, 3), ' '))) AS gram"
        )
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = W.orderBy(F.desc("n"), "gram")
    ranked = grams.withColumn("rn", F.row_number().over(wr))
    return (
        ranked.selectExpr("explode(array(100, 1000, 10000)) AS k", "rn", "n")
        .groupBy("k")
        .agg(
            F.sum(F.expr("CASE WHEN rn <= k THEN n ELSE 0 END")).alias(
                "covered"
            ),
            F.sum("n").alias("total_occurrences"),
            F.count(F.lit(1)).alias("vocab_size"),
        )
        .selectExpr(
            "k",
            "least(k, vocab_size) AS vocab_used",
            "vocab_size",
            "total_occurrences",
            "covered * 1000000 DIV total_occurrences AS coverage_ppm",
        )
        .orderBy("k")
    )


QUERIES["text_ngram_coverage_curve"] = text_ngram_coverage_curve

ORACLES["text_ngram_coverage_curve"] = """
    WITH d AS (
        SELECT string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT array_to_string(list_slice(w, i + 1, i + 3), ' ') AS gram,
               COUNT(*) AS n
        FROM d, unnest(generate_series(0, len(w) - 3)) t(i)
        WHERE len(w) >= 3
        GROUP BY 1
    ),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, gram) AS rn
        FROM grams
    )
    SELECT k,
           CAST(LEAST(k, COUNT(*)) AS BIGINT) AS vocab_used,
           COUNT(*) AS vocab_size,
           CAST(SUM(n) AS BIGINT) AS total_occurrences,
           CAST(SUM(CASE WHEN rn <= k THEN n ELSE 0 END) * 1000000
                // SUM(n) AS BIGINT) AS coverage_ppm
    FROM ranked, unnest([100, 1000, 10000]) t(k)
    GROUP BY k
    ORDER BY k
"""


# ---------------------------------------------------------------------------
# 3. dedup-aware mixture re-weighting
# ---------------------------------------------------------------------------
def sample_dedup_aware_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What dedup does to the mixture: sqrt-temperature source weights
    computed over RAW tokens vs over UNIQUE tokens (md5-keeper exact
    dedup on the mirrored-crawl corpus of dedup_tokens_saved — the
    keeper owns the text, so a fully-mirrored pseudo-source contributes
    zero unique mass) and the share shift in ppm. The table that shows
    which sources were quietly inflated by duplication before
    re-weighting.

    Scale shape: one groupBy(text hash) for keepers (the wide shuffle,
    shared shape with dedup_tokens_saved), one groupBy(source), then
    sources-row arithmetic with 1-row totals broadcast (BNLJ
    whitelisted).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    corpus = d.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_id"), F.col("text"), F.col("source")),
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.struct(
                        (F.col("doc_id") + 1000000).alias("doc_id"),
                        F.col("text"),
                        F.concat(F.col("source"), F.lit("_mirror")).alias(
                            "source"
                        ),
                    ),
                ),
            )
        ).alias("r")
    ).select("r.*").filter(F.col("doc_id").isNotNull())
    h = corpus.selectExpr(
        "doc_id", "source", "md5(text) AS text_hash",
        "size(split(text, ' ')) AS n_tok",
    )
    keep = h.groupBy("text_hash").agg(F.min("doc_id").alias("kept_doc_id"))
    src = (
        h.join(keep, "text_hash")
        .groupBy("source")
        .agg(
            F.sum("n_tok").alias("raw_tokens"),
            F.sum(
                F.expr("CASE WHEN doc_id = kept_doc_id THEN n_tok ELSE 0 END")
            ).alias("unique_tokens"),
        )
    )

    def isqrt(col: str, out: str) -> str:
        return (
            f"CASE WHEN (s_{out} + 1) * (s_{out} + 1) <= {col}"
            f" THEN s_{out} + 1 WHEN s_{out} * s_{out} > {col}"
            f" THEN s_{out} - 1 ELSE s_{out} END AS {out}"
        )

    w = src.selectExpr(
        "source", "raw_tokens", "unique_tokens",
        "CAST(floor(sqrt(CAST(raw_tokens AS DOUBLE))) AS BIGINT) AS s_w_raw",
        "CAST(floor(sqrt(CAST(unique_tokens AS DOUBLE))) AS BIGINT)"
        " AS s_w_uniq",
    ).selectExpr(
        "source", "raw_tokens", "unique_tokens",
        isqrt("raw_tokens", "w_raw"),
        isqrt("unique_tokens", "w_uniq"),
    )
    tot = w.agg(
        F.sum("w_raw").alias("tw_raw"), F.sum("w_uniq").alias("tw_uniq")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "raw_tokens",
            "unique_tokens",
            "raw_tokens - unique_tokens AS dup_tokens",
            "w_raw * 1000000 DIV tw_raw AS raw_share_ppm",
            "w_uniq * 1000000 DIV tw_uniq AS dedup_share_ppm",
            "w_uniq * 1000000 DIV tw_uniq - w_raw * 1000000 DIV tw_raw"
            " AS share_shift_ppm",
        )
        .orderBy("source")
    )


QUERIES["sample_dedup_aware_mixture"] = sample_dedup_aware_mixture

ORACLES["sample_dedup_aware_mixture"] = """
    WITH corpus AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, source || '_mirror'
        FROM documents WHERE doc_id % 10 = 0
    ),
    h AS (
        SELECT doc_id, source, md5(text) AS text_hash,
               len(string_split(text, ' ')) AS n_tok
        FROM corpus
    ),
    keep AS (
        SELECT text_hash, MIN(doc_id) AS kept_doc_id FROM h GROUP BY text_hash
    ),
    src AS (
        SELECT h.source,
               CAST(SUM(h.n_tok) AS BIGINT) AS raw_tokens,
               CAST(SUM(CASE WHEN h.doc_id = k.kept_doc_id THEN h.n_tok
                        ELSE 0 END) AS BIGINT) AS unique_tokens
        FROM h JOIN keep k USING (text_hash)
        GROUP BY h.source
    ),
    w AS (
        SELECT source, raw_tokens, unique_tokens,
               CASE WHEN (sr + 1) * (sr + 1) <= raw_tokens THEN sr + 1
                    WHEN sr * sr > raw_tokens THEN sr - 1 ELSE sr END
                   AS w_raw,
               CASE WHEN (su + 1) * (su + 1) <= unique_tokens THEN su + 1
                    WHEN su * su > unique_tokens THEN su - 1 ELSE su END
                   AS w_uniq
        FROM (
            SELECT source, raw_tokens, unique_tokens,
                   CAST(floor(sqrt(CAST(raw_tokens AS DOUBLE))) AS BIGINT)
                       AS sr,
                   CAST(floor(sqrt(CAST(unique_tokens AS DOUBLE))) AS BIGINT)
                       AS su
            FROM src
        )
    )
    SELECT source, raw_tokens, unique_tokens,
           raw_tokens - unique_tokens AS dup_tokens,
           CAST(w_raw * 1000000 // SUM(w_raw) OVER () AS BIGINT)
               AS raw_share_ppm,
           CAST(w_uniq * 1000000 // SUM(w_uniq) OVER () AS BIGINT)
               AS dedup_share_ppm,
           CAST(w_uniq * 1000000 // SUM(w_uniq) OVER ()
                - w_raw * 1000000 // SUM(w_raw) OVER () AS BIGINT)
               AS share_shift_ppm
    FROM w
    ORDER BY source
"""
