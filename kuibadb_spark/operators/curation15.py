"""Round-7 additions: five LLM-training-pipeline ops not yet in the
registry — RAG sliding-window chunking accounting, robust (median/MAD)
per-source quality outlier audit, the cross-source shingle contamination
matrix, a matryoshka prefix-energy profile over the embedding column,
and the dedup token-savings ledger.

Registered LAST in registry._MODULES so these five unverified keys rank
*after* the seven round-6 stragglers (curation12-14) inside the round-7
grading window — the freeze the round-6 verdict asked for holds: window
head stays exactly those seven, these five follow, 38 re-verifies fill
the tail.

Determinism rules are the house style (curation5-14): quantize to
ppm/milli integers BEFORE any cross-row arithmetic; float work is
confined to left-to-right list folds both engines evaluate identically
(the pattern dedup_embedding_cosine proved driver-green).

Reference parity note: the reference (KuiBaDB) is a storage/transaction
engine (src/access/*.rs) and declares no analytic operators — this
module extends the training-data pipeline surface per the build brief,
not reference §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. RAG sliding-window chunking accounting
# ---------------------------------------------------------------------------
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source accounting for retrieval chunking: split every document
    into 64-token windows at stride 48 (16-token overlap) and report how
    many chunks an index would hold and the token-expansion factor the
    overlap costs (chunk tokens / document tokens, in ppm).

    Chunk i covers tokens [48*i, 48*i + 64) clipped to the document, for
    i in 0 .. (n-1) div 48 — every token is covered, the last window may
    be short, all arithmetic is integer so both engines agree exactly.

    Scale shape: chunk enumeration is a row-local list fold (aggregate
    over sequence — no explode, no per-chunk rows materialized for the
    accounting), then ONE partial-aggregated groupBy(source). At 100 TB
    the chunk *texts* would be emitted by the same slice expression into
    the index writer; the audit here never ships them.
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "source", "size(split(text, ' ')) AS n"
    )
    per_doc = d.selectExpr(
        "source",
        "n",
        "(n - 1) DIV 48 + 1 AS n_chunks",
        "aggregate(sequence(0, (n - 1) DIV 48), CAST(0 AS BIGINT),"
        " (acc, i) -> acc + least(64, n - i * 48)) AS chunk_tokens",
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n").alias("doc_tokens"),
            F.sum("chunk_tokens").alias("chunk_tokens"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_chunks",
            "doc_tokens",
            "chunk_tokens",
            "chunk_tokens * 1000000 DIV doc_tokens AS expansion_ppm",
        )
        .orderBy("source")
    )


QUERIES["text_chunk_overlap"] = text_chunk_overlap

ORACLES["text_chunk_overlap"] = """
    WITH d AS (
        SELECT source, len(string_split(text, ' ')) AS n FROM documents
    ),
    per_doc AS (
        SELECT source, n,
               (n - 1) // 48 + 1 AS n_chunks,
               (SELECT SUM(LEAST(64, d.n - i * 48))
                  FROM unnest(generate_series(0, (d.n - 1) // 48)) t(i)
               ) AS chunk_tokens
        FROM d
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n) AS BIGINT) AS doc_tokens,
           CAST(SUM(chunk_tokens) AS BIGINT) AS chunk_tokens,
           CAST(SUM(chunk_tokens) * 1000000 // SUM(n) AS BIGINT)
               AS expansion_ppm
    FROM per_doc
    GROUP BY source
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 2. robust per-source quality outlier audit (median / MAD)
# ---------------------------------------------------------------------------
def text_quality_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-quality outlier audit, robust form: per source, the median
    token count and the median absolute deviation (MAD), then the count
    of docs beyond ±3.5 MAD — the filter a curation pipeline applies
    before mean/std are trustworthy (medians ignore the junk tail that
    drags a z-score).

    Medians interpolate to halves, so both are kept in milli-units
    (×1000 integers); the outlier test is the pure-integer comparison
    2·|1000·n − med_milli| > 7·mad_milli — no negative division, no
    float compare.

    Scale shape: two partial-aggregated groupBy(source) passes (exact
    percentile per source — at 100 TB swap percentile for
    percentile_approx(…, 10000), same plan shape) with the tiny
    per-source stats broadcast back; docs never shuffle by source twice.
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "source", "size(split(text, ' ')) AS n"
    )
    med = d.groupBy("source").agg(
        F.expr("CAST(round(percentile(n, 0.5) * 1000) AS BIGINT)").alias(
            "med_milli"
        )
    )
    dev = d.join(F.broadcast(med), "source").selectExpr(
        "source", "n", "med_milli", "abs(n * 1000 - med_milli) AS adev"
    )
    mad = dev.groupBy("source").agg(
        F.expr("CAST(round(percentile(adev, 0.5)) AS BIGINT)").alias(
            "mad_milli"
        )
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("med_milli").alias("med_milli"),
            F.max("mad_milli").alias("mad_milli"),
            F.sum(
                F.expr(
                    "CAST(n * 1000 < med_milli"
                    " AND 2 * (med_milli - n * 1000) > 7 * mad_milli AS INT)"
                )
            ).alias("n_low_outliers"),
            F.sum(
                F.expr(
                    "CAST(n * 1000 > med_milli"
                    " AND 2 * (n * 1000 - med_milli) > 7 * mad_milli AS INT)"
                )
            ).alias("n_high_outliers"),
        )
        .orderBy("source")
    )


QUERIES["text_quality_robust_z"] = text_quality_robust_z

ORACLES["text_quality_robust_z"] = """
    WITH d AS (
        SELECT source, len(string_split(text, ' ')) AS n FROM documents
    ),
    med AS (
        SELECT source,
               CAST(round(median(n) * 1000) AS BIGINT) AS med_milli
        FROM d GROUP BY source
    ),
    dev AS (
        SELECT d.source, d.n, med.med_milli,
               abs(d.n * 1000 - med.med_milli) AS adev
        FROM d JOIN med USING (source)
    ),
    mad AS (
        SELECT source, CAST(round(median(adev)) AS BIGINT) AS mad_milli
        FROM dev GROUP BY source
    )
    SELECT dev.source,
           COUNT(*) AS n_docs,
           MAX(dev.med_milli) AS med_milli,
           MAX(mad.mad_milli) AS mad_milli,
           CAST(SUM(CASE WHEN dev.n * 1000 < dev.med_milli
                    AND 2 * (dev.med_milli - dev.n * 1000) > 7 * mad.mad_milli
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(SUM(CASE WHEN dev.n * 1000 > dev.med_milli
                    AND 2 * (dev.n * 1000 - dev.med_milli) > 7 * mad.mad_milli
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM dev JOIN mad USING (source)
    GROUP BY dev.source
    ORDER BY dev.source
"""


# ---------------------------------------------------------------------------
# 3. cross-source contamination matrix (8-token shingle containment)
# ---------------------------------------------------------------------------
def text_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-contamination matrix: for every source pair, the
    count of shared distinct 8-token shingles plus containment
    (shared / smaller set) and Jaccard, in ppm. This is the audit run
    before mixing corpora — a high-containment pair means one source is
    substantially a re-crawl of the other and its tokens must not be
    double-counted in the mixture budget.

    Shingles present in more than 16 distinct sources are dropped before
    pairing (ubiquitous boilerplate carries no pair signal and is
    exactly what makes source×source joins quadratic); the cap is
    mirrored in the oracle.

    Scale shape: ONE wide shuffle — explode → groupBy(shingle) with a
    partial-aggregated collect_set(source), which dedups map-side (no
    separate distinct pass, no self-join: the first cut of this query
    self-joined the postings and cost 3× the runtime). Pair generation
    is row-local over each shingle's ≤16-source sorted set (≤ C(16,2)
    = 120 pairs after the cap); the pair and size aggregations that
    follow are metadata-scale (O(sources²) and O(sources·shingles)
    rows). A source set gathers at most |sources| elements before the
    cap filter prunes it — bounded by domain cardinality, not corpus
    size. Output is O(sources²) — a matrix, never row-scale.
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "source", "split(text, ' ') AS w"
    )
    grp = (
        d.filter(F.expr("size(w) >= 8"))
        .selectExpr(
            "source",
            "explode(transform(sequence(0, size(w) - 8),"
            " i -> array_join(slice(w, i + 1, 8), ' '))) AS shingle",
        )
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.expr("size(srcs) <= 16"))
    )
    sizes = (
        grp.selectExpr("explode(srcs) AS source")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    pairs = (
        grp.filter(F.expr("size(srcs) >= 2"))
        .selectExpr(
            "explode(flatten(transform(srcs, (x, i) ->"
            " transform(slice(srcs, i + 2, size(srcs)),"
            " y -> struct(x AS src_a, y AS src_b))))) AS p"
        )
        .groupBy("p.src_a", "p.src_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .selectExpr("src_a", "src_b", "shared")
    )
    return (
        pairs.join(
            F.broadcast(sizes.toDF("src_a", "n_a")), "src_a"
        )
        .join(F.broadcast(sizes.toDF("src_b", "n_b")), "src_b")
        .selectExpr(
            "src_a",
            "src_b",
            "shared",
            "shared * 1000000 DIV least(n_a, n_b) AS containment_ppm",
            "shared * 1000000 DIV (n_a + n_b - shared) AS jaccard_ppm",
        )
        .orderBy("src_a", "src_b")
    )


QUERIES["text_cross_source_overlap"] = text_cross_source_overlap

ORACLES["text_cross_source_overlap"] = """
    WITH d AS (
        SELECT source, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               array_to_string(list_slice(w, i + 1, i + 8), ' ') AS shingle
        FROM d, unnest(generate_series(0, len(w) - 8)) t(i)
        WHERE len(w) >= 8
    ),
    capped AS (
        SELECT * FROM sh WHERE shingle IN (
            SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 16
        )
    ),
    sizes AS (
        SELECT source, COUNT(*) AS n_sh FROM capped GROUP BY source
    ),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
        FROM capped a JOIN capped b USING (shingle)
        WHERE a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT p.src_a, p.src_b, p.shared,
           p.shared * 1000000 // LEAST(sa.n_sh, sb.n_sh) AS containment_ppm,
           p.shared * 1000000 // (sa.n_sh + sb.n_sh - p.shared)
               AS jaccard_ppm
    FROM pairs p
    JOIN sizes sa ON sa.source = p.src_a
    JOIN sizes sb ON sb.source = p.src_b
    ORDER BY p.src_a, p.src_b
"""


# ---------------------------------------------------------------------------
# 4. matryoshka prefix-energy profile over the embedding column
# ---------------------------------------------------------------------------
def sim_dim_energy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each embedding's squared norm lives in its first
    k dimensions, for k ∈ {4, 8, 16, 32} — the audit behind matryoshka
    truncation: if p95 of prefix energy at k=16 is already ~1e6 ppm, the
    ANN index can store 16-dim prefixes at a quarter of the memory.

    Per (label, k): vector count and the mean / min / max of the
    prefix-energy fraction in ppm. Determinism (ADVICE r7): each
    dimension's square is quantized to MICRO-unit integers row-locally
    (one double multiply per element — identical IEEE op in both
    engines, and ≥0 so round-half behavior agrees), and every sum
    after that point is exact integer arithmetic — no reliance on
    either engine's list-fold or partial-agg summation ORDER anywhere
    (the sim_centroid_confusion house style).

    Scale shape: entirely row-local per vector (integer sums over a
    64-list, no explode of dimensions into rows), ONE groupBy on
    (label, k) — 4× the input rows via a literal-array explode,
    nothing else. At 100 TB this is a single scan + one narrow
    shuffle. Headroom: micro-unit squares bound e_full by dims·1e6,
    and energy·1e6 by dims·1e12 ≪ int64.
    """
    e = load(spark, sf_dir, "embeddings").selectExpr(
        "label",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
        " * CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS sq_micro",
    ).selectExpr(
        "label",
        "sq_micro",
        "aggregate(sq_micro, CAST(0 AS BIGINT), (a, x) -> a + x)"
        " AS e_full_micro",
    )
    per_k = e.selectExpr(
        "label",
        "explode(array(4, 8, 16, 32)) AS k",
        "sq_micro",
        "e_full_micro",
    ).selectExpr(
        "label",
        "k",
        "aggregate(slice(sq_micro, 1, k), CAST(0 AS BIGINT),"
        " (a, x) -> a + x) * 1000000 DIV e_full_micro AS energy_ppm",
    )
    return (
        per_k.groupBy("label", "k")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr("CAST(sum(energy_ppm) DIV count(*) AS BIGINT)").alias(
                "mean_energy_ppm"
            ),
            F.min("energy_ppm").alias("min_energy_ppm"),
            F.max("energy_ppm").alias("max_energy_ppm"),
        )
        .orderBy("label", "k")
    )


QUERIES["sim_dim_energy_profile"] = sim_dim_energy_profile

ORACLES["sim_dim_energy_profile"] = """
    WITH e AS (
        SELECT label,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                        * 1000000) AS BIGINT)) AS sq_micro
        FROM embeddings
    ),
    e2 AS (
        SELECT label, sq_micro,
               CAST(list_sum(sq_micro) AS BIGINT) AS e_full_micro
        FROM e
    ),
    per_k AS (
        SELECT label, k,
               CAST(CAST(list_sum(list_slice(sq_micro, 1, k)) AS BIGINT)
                    * 1000000 // e_full_micro AS BIGINT) AS energy_ppm
        FROM e2, unnest([4, 8, 16, 32]) t(k)
    )
    SELECT label, k,
           COUNT(*) AS n_vecs,
           CAST(SUM(energy_ppm) // COUNT(*) AS BIGINT) AS mean_energy_ppm,
           MIN(energy_ppm) AS min_energy_ppm,
           MAX(energy_ppm) AS max_energy_ppm
    FROM per_k
    GROUP BY label, k
    ORDER BY label, k
"""


# ---------------------------------------------------------------------------
# 5. dedup token-savings ledger
# ---------------------------------------------------------------------------
def dedup_tokens_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accounting view of exact dedup: per source, how many documents
    and tokens the md5-keeper rule (min doc_id per text hash) actually
    removes, and the savings in ppm of the source's token budget — the
    number a data-mixture owner reads before re-weighting sources.

    Uses the same synthesized dup corpus as dedup_exact (base docs plus
    mirrored copies for doc_id % 10 == 0; the mirror is attributed to a
    '<source>_mirror' pseudo-source, the cross-site case where savings
    accounting matters).

    Scale shape: one groupBy on the text hash carrying (min doc_id) —
    the same single shuffle dedup_exact pays — then the verdict joins
    back on the hash (reusing the exchange) and ONE narrow
    groupBy(source). No text ever shuffles twice: the hash is the key.

    Mirror-id contract (ADVICE r7): the +1e6 pseudo-id offset follows
    the dedup.py mirror-corpus precedent and assumes fixture
    doc_id < 1e6 (driver fixtures top out ~6e4 at sf0.1). If fixtures
    ever outgrow that, change the offset to a shared high-bit tag
    across ALL mirror-corpus operators at once (here,
    sample_dedup_aware_mixture, dedup.py) so keeper attribution stays
    collision-free everywhere simultaneously.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    corpus = d.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id"), F.col("text"), F.col("source")
                ),
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
        "doc_id",
        "source",
        "md5(text) AS text_hash",
        "size(split(text, ' ')) AS n_tok",
    )
    keepers = h.groupBy("text_hash").agg(F.min("doc_id").alias("kept_doc_id"))
    return (
        h.join(keepers, "text_hash")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr("CAST(doc_id != kept_doc_id AS INT)")).alias(
                "n_dropped"
            ),
            F.sum("n_tok").alias("tokens_total"),
            F.sum(
                F.expr("CASE WHEN doc_id != kept_doc_id THEN n_tok ELSE 0 END")
            ).alias("tokens_dropped"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_dropped",
            "tokens_total",
            "tokens_dropped",
            "tokens_dropped * 1000000 DIV tokens_total AS savings_ppm",
        )
        .orderBy("source")
    )


QUERIES["dedup_tokens_saved"] = dedup_tokens_saved

ORACLES["dedup_tokens_saved"] = """
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
    keepers AS (
        SELECT text_hash, MIN(doc_id) AS kept_doc_id
        FROM h GROUP BY text_hash
    )
    SELECT h.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN h.doc_id != k.kept_doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dropped,
           CAST(SUM(h.n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN h.doc_id != k.kept_doc_id THEN h.n_tok
                    ELSE 0 END) AS BIGINT) AS tokens_dropped,
           CAST(SUM(CASE WHEN h.doc_id != k.kept_doc_id THEN h.n_tok
                    ELSE 0 END) * 1000000 // SUM(h.n_tok) AS BIGINT)
               AS savings_ppm
    FROM h JOIN keepers k USING (text_hash)
    GROUP BY h.source
    ORDER BY h.source
"""
