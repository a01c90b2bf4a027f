"""Training-data curation operators over `documents` / `embeddings` —
the LLM-pipeline surface beyond dedup/similarity (BASELINE.json north
star; the reference engine has no analog — SURVEY.md §2.3 maps this
whole family to DataFrame ops):

- test-set decontamination : n-gram overlap between the corpus and a
  held-out benchmark set (the doc_id%17 slice stands in for an eval
  benchmark) — the standard pre-training hygiene pass
- sequence packing         : documents packed into fixed token-budget
  training sequences by cumulative-offset assignment
- mixture sampling         : per-language target sampling rates applied
  via deterministic hash buckets (data-mixture reweighting)
- embedding quantization   : per-vector symmetric int8 quantization with
  exact integer round-trip stats (the ANN-index compaction step)

All row-path computation is JVM-side expressions; every query has a
DuckDB oracle with an identical expression tree (IEEE double ops are
exactly specified, integer folds are order-independent), so results
hash-match across engines.

Scale notes (100 TB):
- decontamination is a broadcast semi-join: the benchmark shingle set is
  tiny (benchmarks are MBs, corpora are TBs), so the corpus side stays
  map-side — one partial-agg groupBy(doc_id) is the only shuffle.
- packing partitions by a hash bucket and runs an in-bucket window
  cumsum — buckets are independent, so parallelism is the bucket count
  and no global sort exists.
- mixture sampling is a pure map-side filter + partial-agg groupBy —
  the same shape as any cleaning pass.
- quantization is embarrassingly parallel per vector (narrow transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load

# ---------------------------------------------------------------------------
# shared: per-doc distinct 3-word shingle arrays (row-local, no shuffle)
# ---------------------------------------------------------------------------

_SHINGLE_ARR_SPARK = (
    "array_distinct(CASE WHEN size(w) < 3 THEN array() "
    "ELSE transform(sequence(1, size(w) - 2), "
    "i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), "
    "element_at(w, i+2))) END)"
)

_SHINGLES_DUCK = r"""
    toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM toks
    )
"""


# ---------------------------------------------------------------------------
# 1. test-set decontamination: corpus vs benchmark shingle overlap
# ---------------------------------------------------------------------------
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every corpus document, the count of its distinct 3-gram
    shingles that also appear in the benchmark slice (doc_id%17==0), and
    a contamination flag (≥10 shared shingles, or ≥20% of the doc's
    shingles shared).

    Scale: the benchmark shingle set is broadcast (eval benchmarks are
    MB-scale; the corpus is the 100 TB side), so corpus shingles are
    probed map-side with no shuffle; the per-doc count is one
    partial-aggregated groupBy(doc_id)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh = (
        d.withColumn("w", F.split("text", r"\s+"))
        .select("doc_id", F.expr(_SHINGLE_ARR_SPARK).alias("shs"))
        # explode_outer + isNotNull == explode without the
        # InferFiltersFromGenerate clone of the shingle expression into
        # an interpreted scan filter (see operators/dedup.py)
        .select("doc_id", F.explode_outer("shs").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    bench = (
        sh.filter(F.col("doc_id") % 17 == 0)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corp = sh.filter(F.col("doc_id") % 17 != 0)
    return (
        corp.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.count("hit").alias("n_shared"),
        )
        .select(
            "doc_id",
            "sz",
            "n_shared",
            (
                (F.col("n_shared") >= 10)
                | (F.col("n_shared") * 5 >= F.col("sz"))
            )
            .cast("int")
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# 2. sequence packing: cumulative-offset assignment into 256-token packs
# ---------------------------------------------------------------------------
_PACK_BUDGET = 256
_PACK_BUCKETS = 8


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-budget training sequences: docs are
    sharded into hash buckets (doc_id % 8), ordered by doc_id within a
    bucket, and assigned pack_id = floor(start_offset / 256) where
    start_offset is the running token count before the doc — the
    deterministic "concat-and-chop" packing every pre-training pipeline
    runs. Output is one row per pack with doc/token totals.

    Scale: the window cumsum partitions by bucket — no global sort, and
    bucket count is the parallelism knob (thousands at 100 TB). Each
    bucket's packing is sequential by construction (packing IS a running
    sum), which is exactly why the bucket sharding exists."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.selectExpr(
        "doc_id",
        f"doc_id % {_PACK_BUCKETS} AS bucket",
        r"size(split(text, '\\s+')) AS tok",
    )
    packed = toks.selectExpr(
        "bucket",
        "doc_id",
        "tok",
        "sum(tok) OVER (PARTITION BY bucket ORDER BY doc_id "
        f"ROWS UNBOUNDED PRECEDING) - tok AS start",
    ).selectExpr("bucket", "doc_id", "tok", f"start div {_PACK_BUDGET} AS pack_id")
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bucket", "pack_id")
    )


# ---------------------------------------------------------------------------
# 3. mixture sampling: per-language target rates via md5 hash buckets
# ---------------------------------------------------------------------------
_MIX_RATES = {"en": 900, "de": 500, "fr": 400, "es": 300, "zh": 200}  # /1000


def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reweight the corpus toward a target language mixture: each doc is
    kept iff md5('mix'||doc_id) % 1000 < rate(lang) — reproducible under
    any partitioning (the keep decision is row-local), the same shape as
    sample_stratified but with the training-mixture framing. Output is
    per-language totals, kept counts, and achieved per-mille (integer
    division, exact)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    rate = F.when(F.lit(False), None)
    for lang, r in _MIX_RATES.items():
        rate = rate.when(F.col("lang") == lang, r)
    rate = rate.otherwise(0)
    return (
        d.withColumn("kept", (bucket < rate).cast("bigint"))
        .withColumn("target_per_mille", rate.cast("bigint"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
            F.first("target_per_mille").alias("target_per_mille"),
        )
        .selectExpr(
            "lang",
            "n_total",
            "n_kept",
            "target_per_mille",
            "(n_kept * 1000) div n_total AS achieved_per_mille",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# 4. symmetric int8 embedding quantization with exact round-trip stats
# ---------------------------------------------------------------------------
def sim_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize each embedding to int8 (q = floor(x*127/maxabs + 0.5),
    the symmetric per-vector scheme ANN indexes ship), then report exact
    integer stats per label: vector count, total quantized squared norm,
    total saturated lanes, and the min/max per-vector scale (rounded).

    Every cross-row aggregate is over integers or min/max of doubles —
    order-independent, so the DuckDB oracle hash-matches despite both
    engines summing in arbitrary partition order. Scale: narrow per-row
    transform + one partial-agg groupBy(label)."""
    e = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
    )
    q = (
        e.withColumn(
            "maxabs", F.expr("array_max(transform(v, x -> abs(x)))")
        )
        .filter(F.col("maxabs") > 0)
        .withColumn(
            "q",
            F.expr(
                "transform(v, x -> CAST(floor(x * 127.0D / maxabs + 0.5D)"
                " AS INT))"
            ),
        )
    )
    return (
        q.selectExpr(
            "label",
            "aggregate(q, 0L, (acc, x) -> acc + x * x) AS qnorm",
            "size(filter(q, x -> x = 127 OR x = -127)) AS n_sat",
            "round(maxabs, 6) AS maxabs6",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("qnorm").alias("sum_qnorm"),
            F.sum("n_sat").alias("sum_saturated"),
            F.min("maxabs6").alias("min_scale6"),
            F.max("maxabs6").alias("max_scale6"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# 5. C4/Gopher-style quality-filter rule set (integer-exact, row-local)
# ---------------------------------------------------------------------------
def text_c4_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard pre-training quality-filter pass (C4 / Gopher rule
    families), re-expressed as integer-exact row-local predicates so the
    cross-engine hash matches:

    - r_min_words : ≥ 20 words
    - r_mean_len  : mean word length in [3, 10] (as 3·n ≤ Σlen ≤ 10·n —
      integer inequality, no division)
    - r_stopwords : ≥ 2 stopword occurrences (Gopher's "has function
      words" signal)
    - r_repetition: most frequent word ≤ 10% of the doc (10·max_freq ≤ n)

    keep = all four. Everything is a narrow per-row transform over the
    token array — zero shuffle until the final ORDER BY; at 100 TB this
    is a pure map-side cleaning pass (the same shape C4 itself ran)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    w = d.withColumn("w", F.split("text", r"\s+"))
    scored = w.selectExpr(
        "doc_id",
        "size(w) AS n_words",
        "aggregate(transform(w, t -> length(t)), 0L, (a, x) -> a + x)"
        " AS sum_len",
        "size(filter(w, t -> t IN ('the', 'a'))) AS n_stop",
        "array_max(transform(array_distinct(w),"
        " x -> size(filter(w, t -> t = x)))) AS max_freq",
    )
    return scored.selectExpr(
        "doc_id",
        "n_words",
        "CAST(n_words >= 20 AS INT) AS r_min_words",
        "CAST(3 * n_words <= sum_len AND sum_len <= 10 * n_words AS INT)"
        " AS r_mean_len",
        "CAST(n_stop >= 2 AS INT) AS r_stopwords",
        "CAST(10 * max_freq <= n_words AS INT) AS r_repetition",
        "CAST(n_words >= 20 AND 3 * n_words <= sum_len"
        " AND sum_len <= 10 * n_words AND n_stop >= 2"
        " AND 10 * max_freq <= n_words AS INT) AS keep",
    ).orderBy("doc_id")


QUERIES = {
    "text_decontaminate": text_decontaminate,
    "text_c4_quality_filters": text_c4_quality_filters,
    "text_pack_sequences": text_pack_sequences,
    "sample_mixture_weights": sample_mixture_weights,
    "sim_embedding_quantize": sim_embedding_quantize,
}

ORACLES = {
    "text_c4_quality_filters": r"""
        WITH w AS (
            SELECT doc_id, string_split_regex(text, '\s+') AS w
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
                   CAST(len(w) AS INTEGER) AS n_words,
                   CAST(list_sum(list_transform(w, t -> length(t)))
                        AS BIGINT) AS sum_len,
                   len(list_filter(w, t -> t IN ('the', 'a'))) AS n_stop,
                   list_max(list_transform(list_distinct(w),
                       x -> len(list_filter(w, t -> t = x)))) AS max_freq
            FROM w
        )
        SELECT doc_id,
               n_words,
               CAST(n_words >= 20 AS INTEGER) AS r_min_words,
               CAST(3 * n_words <= sum_len AND sum_len <= 10 * n_words
                    AS INTEGER) AS r_mean_len,
               CAST(n_stop >= 2 AS INTEGER) AS r_stopwords,
               CAST(10 * max_freq <= n_words AS INTEGER) AS r_repetition,
               CAST(n_words >= 20 AND 3 * n_words <= sum_len
                    AND sum_len <= 10 * n_words AND n_stop >= 2
                    AND 10 * max_freq <= n_words AS INTEGER) AS keep
        FROM scored
        ORDER BY doc_id
    """,
    "text_decontaminate": f"""
        WITH {_SHINGLES_DUCK},
        bench AS (
            SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0
        ),
        corp AS (SELECT * FROM sh WHERE doc_id % 17 <> 0)
        SELECT c.doc_id,
               count(*) AS sz,
               count(b.shingle) AS n_shared,
               CAST(count(b.shingle) >= 10
                    OR count(b.shingle) * 5 >= count(*) AS INTEGER)
                   AS contaminated
        FROM corp c LEFT JOIN bench b ON c.shingle = b.shingle
        GROUP BY c.doc_id
        ORDER BY c.doc_id
    """,
    "text_pack_sequences": f"""
        WITH toks AS (
            SELECT doc_id,
                   doc_id % {_PACK_BUCKETS} AS bucket,
                   len(string_split_regex(text, '\\s+')) AS tok
            FROM documents
        ),
        packed AS (
            SELECT bucket, doc_id, tok,
                   CAST((sum(tok) OVER (PARTITION BY bucket ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - tok)
                       // {_PACK_BUDGET} AS BIGINT) AS pack_id
            FROM toks
        )
        SELECT bucket, pack_id,
               count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS pack_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM packed
        GROUP BY bucket, pack_id
        ORDER BY bucket, pack_id
    """,
    "sample_mixture_weights": f"""
        WITH d AS (
            SELECT lang,
                   CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)),
                        1, 8) AS BIGINT) % 1000 AS bucket,
                   CASE {' '.join(f"WHEN lang = '{l}' THEN {r}" for l, r in _MIX_RATES.items())}
                        ELSE 0 END AS target_per_mille
            FROM documents
        )
        SELECT lang,
               count(*) AS n_total,
               CAST(sum(CASE WHEN bucket < target_per_mille THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(min(target_per_mille) AS BIGINT) AS target_per_mille,
               (CAST(sum(CASE WHEN bucket < target_per_mille THEN 1 ELSE 0 END)
                     AS BIGINT) * 1000) // count(*) AS achieved_per_mille
        FROM d
        GROUP BY lang
        ORDER BY lang
    """,
    "sim_embedding_quantize": """
        WITH e AS (
            SELECT label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        m AS (
            SELECT label, v,
                   list_max(list_transform(v, x -> abs(x))) AS maxabs
            FROM e
            WHERE list_max(list_transform(v, x -> abs(x))) > 0
        ),
        q AS (
            SELECT label, maxabs,
                   list_transform(v, x ->
                       CAST(floor(x * 127.0 / maxabs + 0.5) AS INTEGER)) AS q
            FROM m
        ),
        per_vec AS (
            SELECT label,
                   CAST(list_sum(list_transform(q, x ->
                       CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT)
                       AS qnorm,
                   len(list_filter(q, x -> x = 127 OR x = -127)) AS n_sat,
                   round(maxabs, 6) AS maxabs6
            FROM q
        )
        SELECT label,
               count(*) AS n_vecs,
               CAST(sum(qnorm) AS BIGINT) AS sum_qnorm,
               CAST(sum(n_sat) AS BIGINT) AS sum_saturated,
               min(maxabs6) AS min_scale6,
               max(maxabs6) AS max_scale6
        FROM per_vec
        GROUP BY label
        ORDER BY label
    """,
}


# ---------------------------------------------------------------------------
# DSIR-style hashed importance weights (data selection for LM pretraining)
# ---------------------------------------------------------------------------
_DSIR_B = 1024  # hashed feature buckets


def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023), the
    hashed n-gram variant, integer-exact: score each document by how
    much its hashed-bigram distribution looks like the TARGET slice
    (lang='en' here stands in for "high-quality domain") vs the full
    corpus background.

    Importance weight per doc = Σ_features [ ilog2(1 + target_cnt[f])
    − ilog2(1 + background_cnt[f]) ] with ilog2 = floor(log2) computed
    by BIT LENGTH (length(bin(x)) − 1) — a branch-free integer log both
    engines evaluate identically, sidestepping float-log ulp drift the
    same way the HLL/kmeans/pagerank ops do.

    Scale shape: the two count tables are bounded by B=1024 buckets
    regardless of corpus size — they broadcast; the corpus side is one
    row-local bigram explode + two map-side-combined groupBys + a
    per-doc sum. No shuffle touches anything wider than (doc_id, int).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # same explode_outer + post-exchange-attribute discipline as
    # dedup._pair_stats (InferFiltersFromGenerate re-evaluation trap)
    arr = d.withColumn("w", F.split("text", r"\s+")).select(
        "doc_id",
        "lang",
        F.expr(
            "CASE WHEN size(w) < 2 THEN array() "
            "ELSE transform(sequence(1, size(w) - 1), "
            "i -> concat(element_at(w, i), ' ', element_at(w, i+1))) END"
        ).alias("bgs"),
    ).repartition(d.sparkSession.sparkContext.defaultParallelism)
    feats = (
        arr.select("doc_id", "lang", F.explode_outer("bgs").alias("bg"))
        .filter(F.col("bg").isNotNull())
        .withColumn(
            "f",
            F.conv(F.substring(F.md5("bg"), 1, 15), 16, 10).cast("bigint")
            % _DSIR_B,
        )
        .drop("bg")
    )
    # BOTH count tables in ONE aggregation pass (conditional count for
    # the target slice): the explode+md5 of `feats` is evaluated twice
    # instead of three times, and one broadcast join disappears
    # (1.30 s → 1.08 s at sf0.1; persisting feats instead measured
    # NEUTRAL — materialization ≈ recompute — so the cacheless form
    # wins: at 100 TB it deletes a full corpus scan+explode without
    # spilling bigram rows to executor storage)
    cnt = feats.groupBy("f").agg(
        F.count(F.lit(1)).alias("b"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("t"),
    )
    ilog2 = "length(bin(1 + {})) - 1"
    return (
        feats.join(F.broadcast(cnt), "f")
        .selectExpr(
            "doc_id",
            "lang",
            f"{ilog2.format('t')} AS lt",
            f"{ilog2.format('b')} AS lb",
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.expr("lt - lb")).alias("dsir_score"),
        )
        .withColumn("kept", F.col("dsir_score") > 0)
        .orderBy("doc_id")
    )


QUERIES["text_dsir_importance"] = text_dsir_importance

ORACLES["text_dsir_importance"] = f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split_regex(text, '\\s+') AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(bg), 1, 15) AS BIGINT) % {_DSIR_B} AS f
        FROM (
            SELECT doc_id, lang,
                   unnest(list_transform(
                       generate_series(1, greatest(len(w) - 1, 0)),
                       i -> w[i] || ' ' || w[i+1])) AS bg
            FROM toks
        )
    ),
    tcnt AS (
        SELECT f, count(*) AS t FROM feats WHERE lang = 'en' GROUP BY f
    ),
    bcnt AS (SELECT f, count(*) AS b FROM feats GROUP BY f)
    SELECT doc_id, lang,
           count(*) AS n_feats,
           CAST(sum((length(printf('%b', 1 + coalesce(t.t, 0))) - 1)
                  - (length(printf('%b', 1 + b.b)) - 1)) AS BIGINT)
               AS dsir_score,
           CAST(sum((length(printf('%b', 1 + coalesce(t.t, 0))) - 1)
                  - (length(printf('%b', 1 + b.b)) - 1)) AS BIGINT) > 0
               AS kept
    FROM feats
    LEFT JOIN tcnt t USING (f)
    JOIN bcnt b USING (f)
    GROUP BY doc_id, lang
    ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# per-source scorecard: the mixture/filtering decision table
# --------------------------------------------------------------------------
def text_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source decision table a pretraining pipeline builds before
    choosing mixture weights: for every source, document count, exact
    duplicate rate, mean token count, quality pass rate (C4-style length
    + word-length-band rules), and a derived keep recommendation
    pass_ppm × (1 − dup_ppm) — all in exact integer ppm (cross-
    multiplied, no float division), so the scorecard hash-matches
    across engines.

    Scale: one row-local projection (tokens, rule bits, md5), one
    partial-aggregated groupBy(source) with count_distinct for dups —
    the same one-shuffle profile shape as profile_lineitem; output
    cardinality = number of sources."""
    d = load(spark, sf_dir, "documents")
    scored = d.selectExpr(
        "source",
        "md5(text) AS dig",
        "size(split(text, ' ')) AS n_toks",
        "aggregate(split(text, ' '), 0, (a, t) -> a + length(t)) AS sum_len",
    ).selectExpr(
        "source",
        "dig",
        "n_toks",
        "CAST(n_toks >= 20 AND 3 * n_toks <= sum_len"
        " AND sum_len <= 10 * n_toks AS INT) AS pass",
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("dig").alias("n_distinct"),
            F.sum("n_toks").alias("total_toks"),
            F.sum("pass").alias("n_pass"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "CAST(1000000 * (n_docs - n_distinct) div n_docs AS BIGINT)"
            " AS dup_ppm",
            "CAST(100 * total_toks div n_docs AS BIGINT) AS mean_toks_e2",
            "CAST(1000000 * n_pass div n_docs AS BIGINT) AS pass_ppm",
            "CAST((1000000 * n_pass div n_docs)"
            " * (1000000 - 1000000 * (n_docs - n_distinct) div n_docs)"
            " div 1000000 AS BIGINT) AS keep_ppm",
        )
        .orderBy("source")
    )


QUERIES["text_source_scorecard"] = text_source_scorecard

ORACLES["text_source_scorecard"] = """
    WITH scored AS (
        SELECT source,
               md5(text) AS dig,
               len(string_split(text, ' ')) AS n_toks,
               CAST(list_sum(list_transform(string_split(text, ' '),
                                            t -> length(t))) AS BIGINT)
                   AS sum_len
        FROM documents
    ),
    b AS (
        SELECT source, dig, n_toks,
               CASE WHEN n_toks >= 20 AND 3 * n_toks <= sum_len
                         AND sum_len <= 10 * n_toks THEN 1 ELSE 0 END AS pass
        FROM scored
    ),
    agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT dig) AS BIGINT) AS n_distinct,
               CAST(sum(n_toks) AS BIGINT) AS total_toks,
               CAST(sum(pass) AS BIGINT) AS n_pass
        FROM b GROUP BY source
    )
    SELECT source, n_docs,
           CAST(1000000 * (n_docs - n_distinct) // n_docs AS BIGINT) AS dup_ppm,
           CAST(100 * total_toks // n_docs AS BIGINT) AS mean_toks_e2,
           CAST(1000000 * n_pass // n_docs AS BIGINT) AS pass_ppm,
           CAST((1000000 * n_pass // n_docs)
                * (1000000 - 1000000 * (n_docs - n_distinct) // n_docs)
                // 1000000 AS BIGINT) AS keep_ppm
    FROM agg
    ORDER BY source
"""


# --------------------------------------------------------------------------
# the capstone: end-to-end curation attrition funnel (one pass, 5 stages)
# --------------------------------------------------------------------------
def pipeline_attrition_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-attrition table every pretraining data team ships:
    how many documents survive each curation stage, cumulatively —
    exact dedup → cross-doc boilerplate filter → C4 quality rules →
    benchmark decontamination → mixture sampling. Output: one row per
    stage with survivor count and cumulative keep-ppm.

    Plan shape: every stage is computed as a PER-DOC BOOLEAN FLAG in one
    annotated table (a window for canonical-exact-dup, one chunk-count
    join for boilerplate, row-local C4 rules, one broadcast semi-probe
    for decontamination, a row-local hash for sampling), and the funnel
    is ONE conditional aggregate over cumulative flag conjunctions —
    the whole 5-stage report costs ~two shuffles + one broadcast, not
    five pipeline re-runs. That is exactly how the report stays cheap
    at 100 TB: stages annotate, one reduce counts.

    Input is the synthesized dup corpus (documents + exact/near copies,
    dedup._dup_corpus) so the dedup stage does real work — raw fixture
    documents contain no exact duplicates."""
    from kuibadb_spark.operators.dedup import _dup_corpus

    d = _dup_corpus(spark, sf_dir)
    # stage 1: exact dedup — keep the min doc_id per content digest
    w_dig = F.expr(
        "doc_id = min(doc_id) OVER (PARTITION BY md5(text))"
    )
    # stage 2: boilerplate — share of 10-token chunks repeated in ≥2 docs
    chunks = d.selectExpr("doc_id", "split(text, ' ') AS w").selectExpr(
        "doc_id",
        "explode(transform(sequence(0, CAST(ceil(size(w)/10.0) AS INT) - 1),"
        " i -> array_join(slice(w, i*10+1, 10), ' '))) AS chunk",
    )
    ccount = chunks.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    boiler = (
        chunks.join(ccount, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("nd") >= 2).alias("n_boiler"),
        )
        .selectExpr("doc_id", "10 * n_boiler < 3 * n_chunks AS f_boiler")
    )
    # stage 4 input: benchmark 3-shingle set (doc_id%17==0 slice)
    sh = (
        d.withColumn("w", F.split("text", r"\s+"))
        .select("doc_id", F.expr(_SHINGLE_ARR_SPARK).alias("shs"))
        .select("doc_id", F.explode_outer("shs").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    bench = (
        sh.filter(F.col("doc_id") % 17 == 0).select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    contam = (
        sh.filter(F.col("doc_id") % 17 != 0)
        .join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"), F.count("hit").alias("n_shared"))
        .selectExpr(
            "doc_id",
            "NOT (n_shared >= 10 OR n_shared * 5 >= sz) AS f_clean",
        )
    )
    flags = (
        d.withColumn("f_exact", w_dig)
        .selectExpr(
            "doc_id", "f_exact",
            # C4-style rules, row-local (text_c4_quality_filters' set)
            "size(split(text, ' ')) AS n_words",
            "aggregate(split(text, ' '), 0, (a, t) -> a + length(t)) AS sum_len",
            # mixture sampling: keep 80% by hash, deterministic
            "CAST(conv(substring(md5(concat('funnel', CAST(doc_id AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT) % 100 < 80 AS f_mix",
        )
        .withColumn(
            "f_c4",
            F.expr("n_words >= 20 AND 3 * n_words <= sum_len"
                   " AND sum_len <= 10 * n_words"),
        )
        .join(boiler, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "f_exact",
            "coalesce(f_boiler, true) AS f_boiler",
            "f_c4",
            # benchmark docs themselves (not in contam) count as clean
            "coalesce(f_clean, true) AS f_clean",
            "f_mix",
        )
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if("f_exact").alias("n1"),
        F.count_if(F.expr("f_exact AND f_boiler")).alias("n2"),
        F.count_if(F.expr("f_exact AND f_boiler AND f_c4")).alias("n3"),
        F.count_if(F.expr("f_exact AND f_boiler AND f_c4 AND f_clean")).alias("n4"),
        F.count_if(
            F.expr("f_exact AND f_boiler AND f_c4 AND f_clean AND f_mix")
        ).alias("n5"),
    )
    return agg.selectExpr(
        "stack(6,"
        " 0, 'raw', n0, 1000000L,"
        " 1, 'exact_dedup', n1, CAST(1000000 * n1 div n0 AS BIGINT),"
        " 2, 'boilerplate', n2, CAST(1000000 * n2 div n0 AS BIGINT),"
        " 3, 'c4_quality', n3, CAST(1000000 * n3 div n0 AS BIGINT),"
        " 4, 'decontaminated', n4, CAST(1000000 * n4 div n0 AS BIGINT),"
        " 5, 'mixture_sampled', n5, CAST(1000000 * n5 div n0 AS BIGINT)"
        ") AS (stage, stage_name, n_docs, cum_keep_ppm)"
    ).selectExpr(
        "stage", "stage_name", "CAST(n_docs AS BIGINT) AS n_docs", "cum_keep_ppm"
    ).orderBy("stage")


QUERIES["pipeline_attrition_funnel"] = pipeline_attrition_funnel

from kuibadb_spark.operators.dedup import _DUP_CORPUS_DUCK as _FUNNEL_CORPUS

ORACLES["pipeline_attrition_funnel"] = rf"""
    WITH {_FUNNEL_CORPUS},
    f_ex AS (
        SELECT doc_id, text,
               doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS f_exact
        FROM corpus
    ),
    chunks AS (
        SELECT doc_id,
               array_to_string(w[i*10+1:i*10+10], ' ') AS chunk
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
             unnest(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS u(i)
    ),
    ccount AS (
        SELECT chunk, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY chunk
    ),
    boiler AS (
        SELECT doc_id, 10 * count_if(nd >= 2) < 3 * count(*) AS f_boiler
        FROM chunks JOIN ccount USING (chunk)
        GROUP BY doc_id
    ),
    ftoks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM corpus
    ),
    fsh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM ftoks
    ),
    bench AS (SELECT DISTINCT shingle FROM fsh WHERE doc_id % 17 = 0),
    contam AS (
        SELECT s.doc_id,
               NOT (count(b.shingle) >= 10
                    OR count(b.shingle) * 5 >= count(*)) AS f_clean
        FROM fsh s LEFT JOIN bench b USING (shingle)
        WHERE s.doc_id % 17 != 0
        GROUP BY s.doc_id
    ),
    flags AS (
        SELECT f_ex.doc_id,
               f_exact,
               coalesce(f_boiler, true) AS f_boiler,
               len(string_split(text, ' ')) >= 20
                 AND 3 * len(string_split(text, ' '))
                     <= list_sum(list_transform(string_split(text, ' '),
                                                t -> length(t)))
                 AND list_sum(list_transform(string_split(text, ' '),
                                             t -> length(t)))
                     <= 10 * len(string_split(text, ' ')) AS f_c4,
               coalesce(f_clean, true) AS f_clean,
               CAST('0x' || substr(md5('funnel' || CAST(f_ex.doc_id AS VARCHAR)),
                                   1, 8) AS BIGINT) % 100 < 80 AS f_mix
        FROM f_ex
        LEFT JOIN boiler ON boiler.doc_id = f_ex.doc_id
        LEFT JOIN contam ON contam.doc_id = f_ex.doc_id
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(count_if(f_exact) AS BIGINT) AS n1,
               CAST(count_if(f_exact AND f_boiler) AS BIGINT) AS n2,
               CAST(count_if(f_exact AND f_boiler AND f_c4) AS BIGINT) AS n3,
               CAST(count_if(f_exact AND f_boiler AND f_c4 AND f_clean)
                    AS BIGINT) AS n4,
               CAST(count_if(f_exact AND f_boiler AND f_c4 AND f_clean
                             AND f_mix) AS BIGINT) AS n5
        FROM flags
    )
    SELECT * FROM (
        SELECT 0 AS stage, 'raw' AS stage_name, n0 AS n_docs,
               CAST(1000000 AS BIGINT) AS cum_keep_ppm FROM agg
        UNION ALL SELECT 1, 'exact_dedup', n1,
               CAST(1000000 * n1 // n0 AS BIGINT) FROM agg
        UNION ALL SELECT 2, 'boilerplate', n2,
               CAST(1000000 * n2 // n0 AS BIGINT) FROM agg
        UNION ALL SELECT 3, 'c4_quality', n3,
               CAST(1000000 * n3 // n0 AS BIGINT) FROM agg
        UNION ALL SELECT 4, 'decontaminated', n4,
               CAST(1000000 * n4 // n0 AS BIGINT) FROM agg
        UNION ALL SELECT 5, 'mixture_sampled', n5,
               CAST(1000000 * n5 // n0 AS BIGINT) FROM agg
    )
    ORDER BY stage
"""


# ---------------------------------------------------------------------------
# temperature-scaled source mixing (alpha = 0.5), exact integer arithmetic
# ---------------------------------------------------------------------------
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling — the multilingual-corpus
    mixing standard (sampling probability ∝ count^α, α = 0.5): big
    sources are downsampled, small sources upweighted, flattening the
    source distribution without inverting it. Weights use an EXACT
    integer sqrt (floor-sqrt with ±1 correction, so both engines agree
    bit-for-bit regardless of their double rounding), rates are integer
    ppm, and expected kept-doc counts are integer products — the whole
    mixture plan is reproducible arithmetic, no floats.

    Scale: one groupBy(source) over the corpus (partial-agg combine),
    then per-source arithmetic against a broadcast 1-row total — the
    corpus-count scalar pattern (plan_audit-whitelisted BNLJ)."""
    d = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = d.selectExpr(
        "source",
        "n_docs",
        "CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0",
    ).selectExpr(
        "source",
        "n_docs",
        "CASE WHEN (s0 + 1) * (s0 + 1) <= n_docs THEN s0 + 1 "
        "WHEN s0 * s0 > n_docs THEN s0 - 1 ELSE s0 END AS weight_isqrt",
    )
    tot = w.agg(F.sum("weight_isqrt").alias("tw"))
    return (
        w.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n_docs",
            "weight_isqrt",
            "(1000000 * weight_isqrt) div tw AS rate_ppm",
            "(n_docs * ((1000000 * weight_isqrt) div tw)) div 1000000"
            " AS expected_docs",
        )
        .orderBy("source")
    )


QUERIES["sample_temperature_mixture"] = sample_temperature_mixture

ORACLES["sample_temperature_mixture"] = """
    WITH c AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs,
               CASE WHEN (s0 + 1) * (s0 + 1) <= n_docs THEN s0 + 1
                    WHEN s0 * s0 > n_docs THEN s0 - 1 ELSE s0
               END AS weight_isqrt
        FROM (
            SELECT source, n_docs,
                   CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0
            FROM c
        )
    ),
    t AS (SELECT CAST(sum(weight_isqrt) AS BIGINT) AS tw FROM w)
    SELECT source,
           n_docs,
           weight_isqrt,
           CAST((1000000 * weight_isqrt) // tw AS BIGINT) AS rate_ppm,
           CAST((n_docs * ((1000000 * weight_isqrt) // tw)) // 1000000
                AS BIGINT) AS expected_docs
    FROM w, t
    ORDER BY source
"""
