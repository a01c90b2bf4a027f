"""Round-8 batch: fact-scale distributed deciles (the plans/ranks.py
form as first-class operators), graph degree assortativity, train/
holdout contamination, and the exact-dup cluster-size spectrum.

Registered after curation17 in registry._MODULES — same freeze
discipline: these unverified keys queue at the head of the next driver
window without displacing anything.

Determinism house style throughout: ppm/milli integer quantization
before any cross-row arithmetic, `DIV`/`//` truncating division,
ntile via the exact distributed form (bit-identical to the window
ntile the oracles use), and the only doubles are single IEEE-exact
multiplies/sqrt on integer-valued operands.

Reference parity: the reference's grammar stops at FROM-less SELECT
(sql.lalrpop:314-318) — this whole analytic surface is the Spark-first
extension documented in SURVEY.md §2.3 / LLM-extension rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.plans.ranks import distributed_ntile

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. order-value decile bands over the FACT table (distributed ntile)
# ---------------------------------------------------------------------------
def w_decile_bands_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue decile bands over the full ORDERS fact table — which
    tenth of orders carries what share of the book. Unlike the
    entity-level RFM deciles, this ntile runs over FACT cardinality,
    the case where a window ntile's single-task global sort is not a
    judgment call but an outright scale bug — so it exercises the
    exact distributed ntile (plans/ranks.py: range repartition +
    partitioned rank + bounded prefix cross) as a first-class operator
    against a window-ntile oracle.

    Scale shape: two narrow shuffles of (orderkey, cents) + one
    ≤32-row broadcast cross, then one 10-group aggregate. No global
    window, no entity table, output is 10 rows at any corpus size.
    """
    o = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
    )
    banded = distributed_ntile(
        o, [F.asc("cents"), F.asc("o_orderkey")], 10, "decile"
    )
    return (
        banded.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("band_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("decile")
    )


QUERIES["w_decile_bands_orders"] = w_decile_bands_orders

ORACLES["w_decile_bands_orders"] = """
    WITH o AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    banded AS (
        SELECT cents,
               CAST(ntile(10) OVER (ORDER BY cents, o_orderkey) AS INT)
                   AS decile
        FROM o
    )
    SELECT decile,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS band_cents,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents
    FROM banded
    GROUP BY decile
    ORDER BY decile
"""


# ---------------------------------------------------------------------------
# 2. document-length decile bands (distributed ntile over documents)
# ---------------------------------------------------------------------------
def text_length_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count decile bands over the corpus — the length profile a
    packing/curriculum planner reads before choosing sequence lengths:
    per decile of the document-length distribution, how many documents
    and tokens, and the band's token range. Exact deciles via the
    distributed ntile (no single-task sort of the corpus), tie-broken
    on doc_id so assignments are unique and engine-identical.

    Scale shape: one scan computing token counts row-locally, the
    two-shuffle distributed rank, one 10-group aggregate. Token
    counting is length-linear (lengthprobe entry).
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS n_tok",
    )
    banded = distributed_ntile(
        d, [F.asc("n_tok"), F.asc("doc_id")], 10, "decile"
    )
    return (
        banded.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens_total"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
        .orderBy("decile")
    )


QUERIES["text_length_decile_bands"] = text_length_decile_bands

ORACLES["text_length_decile_bands"] = """
    WITH d AS (
        -- CAST to INT: Spark's size() is i32, DuckDB len() is i64
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tok
        FROM documents
    ),
    banded AS (
        SELECT n_tok,
               CAST(ntile(10) OVER (ORDER BY n_tok, doc_id) AS INT)
                   AS decile
        FROM d
    )
    SELECT decile,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           MIN(n_tok) AS min_tok,
           MAX(n_tok) AS max_tok
    FROM banded
    GROUP BY decile
    ORDER BY decile
"""


# ---------------------------------------------------------------------------
# 3. degree assortativity of the co-activity kNN graph
# ---------------------------------------------------------------------------
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the shared kNN co-activity graph: the
    Pearson correlation between out-degrees at the two ends of every
    directed edge. Positive = hubs prefer hubs (social cores), negative
    = hub-and-spoke (bot fan-in) — the one-number structural read next
    to graph_degree_distribution.

    Exact-moment Pearson (the profile_corr_matrix house pattern): all
    five moments are exact integer sums (degree ≤ 10 by kNN cap, so
    n·Σxy ≤ 100·n_edges² — int64-safe to ~3e8 edges; shard the edge
    list beyond that); the only doubles are the final two
    exactly-representable variance terms, one IEEE-correctly-rounded
    multiply + sqrt, and the ppm round (≥/≤0 symmetric, half away from
    zero in both engines).

    Scale shape: the shared capped kNN builder (one bounded hour
    self-join), a degree groupBy, two broadcast-able joins of (node,
    deg ≤ 10) onto edges, one 1-row aggregate. No windows beyond the
    builder's own partitioned ones. The builder feeds THREE consumers
    (the degree aggregate + both edge-end joins); it is materialized
    ONCE via an eager localCheckpoint (round-8 ADVICE: the static plan
    embeds the builder subtree per consumer with no ReusedExchange
    node, so without materialization the hour self-join could run three
    times per action; the checkpointed edge list is degree-bounded,
    ≤ 10·V rows of two bigints, and localCheckpoint survives
    clearCache, the curation7 house pattern).
    """
    from kuibadb_spark.operators.curation7 import _knn_graph

    sym = _knn_graph(spark, sf_dir).localCheckpoint(eager=True)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = (
        sym.join(deg.withColumnRenamed("src", "s2"),
                 F.col("src") == F.col("s2"))
        .withColumnRenamed("deg", "dx")
        .drop("s2")
        .join(
            deg.select(
                F.col("src").alias("d2"), F.col("deg").alias("dy")
            ),
            F.col("dst") == F.col("d2"),
        )
        .drop("d2")
    )
    m = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.expr("dx * dx")).alias("sxx"),
        F.sum(F.expr("dy * dy")).alias("syy"),
        F.sum(F.expr("dx * dy")).alias("sxy"),
    )
    return m.selectExpr(
        "n_edges",
        "sx * 1000 DIV n_edges AS mean_src_deg_milli",
        "sy * 1000 DIV n_edges AS mean_dst_deg_milli",
        """CASE WHEN (n_edges * sxx - sx * sx) = 0
                  OR (n_edges * syy - sy * sy) = 0 THEN CAST(0 AS BIGINT)
           ELSE CAST(round(1000000 * CAST(n_edges * sxy - sx * sy AS DOUBLE)
                / sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)
                       * CAST(n_edges * syy - sy * sy AS DOUBLE)))
                AS BIGINT) END AS assortativity_ppm""",
    )


QUERIES["graph_degree_assortativity"] = graph_degree_assortativity


def _assort_oracle() -> str:
    from kuibadb_spark.operators.curation7 import _KNN_GRAPH_DUCK

    return f"""
    WITH {_KNN_GRAPH_DUCK},
    deg AS (
        SELECT src, COUNT(*) AS deg FROM sym GROUP BY src
    ),
    e AS (
        SELECT a.deg AS dx, b.deg AS dy
        FROM sym JOIN deg a ON sym.src = a.src
                 JOIN deg b ON sym.dst = b.src
    ),
    m AS (
        SELECT COUNT(*) AS n_edges,
               CAST(SUM(dx) AS BIGINT) AS sx,
               CAST(SUM(dy) AS BIGINT) AS sy,
               CAST(SUM(dx * dx) AS BIGINT) AS sxx,
               CAST(SUM(dy * dy) AS BIGINT) AS syy,
               CAST(SUM(dx * dy) AS BIGINT) AS sxy
        FROM e
    )
    SELECT n_edges,
           CAST(sx * 1000 // n_edges AS BIGINT) AS mean_src_deg_milli,
           CAST(sy * 1000 // n_edges AS BIGINT) AS mean_dst_deg_milli,
           CASE WHEN (n_edges * sxx - sx * sx) = 0
                  OR (n_edges * syy - sy * sy) = 0 THEN CAST(0 AS BIGINT)
           ELSE CAST(round(1000000 * CAST(n_edges * sxy - sx * sy AS DOUBLE)
                / sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)
                       * CAST(n_edges * syy - sy * sy AS DOUBLE)))
                AS BIGINT) END AS assortativity_ppm
    FROM m
"""


ORACLES["graph_degree_assortativity"] = _assort_oracle()


# ---------------------------------------------------------------------------
# 4. train/holdout split contamination audit
# ---------------------------------------------------------------------------
_SH5_SPARK = (
    "array_distinct(CASE WHEN size(w) < 5 THEN array() "
    "ELSE transform(sequence(1, size(w) - 4), "
    "i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), "
    "element_at(w, i+2), element_at(w, i+3), element_at(w, i+4))) END)"
)


def sample_holdout_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/holdout leakage audit: split the corpus deterministically
    (doc_id % 7 == 0 → holdout, ~14%; 7 is coprime with the fixture's
    source = doc_id %% 20 assignment, so every source contributes to
    both sides), shingle both sides into distinct
    5-grams, and report per source how many holdout documents share at
    least one 5-gram with the TRAIN side plus the shingle-level leak
    rate — the pre-training sanity check that an eval split was not
    quietly contaminated by near-copies in train
    (text_decontaminate's twin, aimed at the SPLIT instead of an
    external benchmark, so neither side is broadcast-size).

    Scale shape: one distinct-deduped equi-join on the shingle key —
    join output is bounded by holdout postings (linear), so no df cap
    is needed; then two partial-aggregated groupBys (doc, source).
    Shingling is length-linear (lengthprobe entry).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    sh = (
        d.withColumn("w", F.split("text", " "))
        .select("doc_id", "source", F.expr(_SH5_SPARK).alias("shs"))
        .select("doc_id", "source", F.explode_outer("shs").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    train_sh = (
        sh.filter(F.col("doc_id") % 7 != 0)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    hold = sh.filter(F.col("doc_id") % 7 == 0)
    per_doc = (
        hold.join(train_sh, "shingle", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.count("hit").alias("n_shared"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_holdout_docs"),
            F.sum(F.expr("CAST(n_shared > 0 AS INT)")).alias(
                "n_contaminated"
            ),
            F.sum("sz").alias("holdout_shingles"),
            F.sum("n_shared").alias("shared_shingles"),
        )
        .selectExpr(
            "source",
            "n_holdout_docs",
            "n_contaminated",
            "n_contaminated * 1000000 DIV n_holdout_docs"
            " AS contaminated_ppm",
            "shared_shingles * 1000000 DIV holdout_shingles AS leak_ppm",
        )
        .orderBy("source")
    )


QUERIES["sample_holdout_contamination"] = sample_holdout_contamination

ORACLES["sample_holdout_contamination"] = """
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, source,
               array_to_string(list_slice(w, i, i + 4), ' ') AS shingle
        FROM toks, unnest(generate_series(1, len(w) - 4)) t(i)
        WHERE len(w) >= 5
    ),
    train_sh AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 != 0
    ),
    per_doc AS (
        SELECT h.doc_id, h.source,
               COUNT(*) AS sz,
               COUNT(t.shingle) AS n_shared
        FROM sh h LEFT JOIN train_sh t USING (shingle)
        WHERE h.doc_id % 7 = 0
        GROUP BY h.doc_id, h.source
    )
    SELECT source,
           COUNT(*) AS n_holdout_docs,
           CAST(SUM(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(SUM(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS contaminated_ppm,
           CAST(SUM(n_shared) * 1000000 // SUM(sz) AS BIGINT) AS leak_ppm
    FROM per_doc
    GROUP BY source
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 5. exact-dup cluster-size spectrum
# ---------------------------------------------------------------------------
def dedup_cluster_size_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The size distribution of exact-duplicate clusters — the shape
    behind every dedup savings number: a corpus dominated by size-2
    clusters dedups very differently (mirror sites) from one with
    9+ giants (boilerplate storms). Bands: 1 / 2 / 3-4 / 5-8 / 9+,
    with per-band cluster count, document count, and the band's
    duplication overhead (docs beyond one keeper per cluster, ppm of
    the band's docs).

    Corpus: documents plus mirrors at doc_id%10==0 (+1e6 ids, the
    dedup.py mirror contract — see dedup_tokens_saved's headroom note)
    and second mirrors at doc_id%50==0 (+2e6), so the fixture
    exercises bands 1, 2 and 3-4 deterministically.

    Scale shape: one groupBy(md5(text)) — the dedup_exact shuffle —
    then a ≤5-group band aggregate. All arithmetic band-local; no
    totals cross, no windows.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_id"), F.col("text")),
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.struct(
                        (F.col("doc_id") + 1000000).alias("doc_id"),
                        F.col("text"),
                    ),
                ),
                F.when(
                    F.col("doc_id") % 50 == 0,
                    F.struct(
                        (F.col("doc_id") + 2000000).alias("doc_id"),
                        F.col("text"),
                    ),
                ),
            )
        ).alias("r")
    ).select("r.*").filter(F.col("doc_id").isNotNull())
    clusters = corpus.selectExpr("md5(text) AS h").groupBy("h").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        clusters.selectExpr(
            "c",
            "CASE WHEN c = 1 THEN '1_unique' WHEN c = 2 THEN '2_pair'"
            " WHEN c <= 4 THEN '3_4' WHEN c <= 8 THEN '5_8'"
            " ELSE '9_plus' END AS band",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("c").alias("n_docs"),
        )
        .selectExpr(
            "band",
            "n_clusters",
            "n_docs",
            "(n_docs - n_clusters) * 1000000 DIV n_docs"
            " AS dup_overhead_ppm",
        )
        .orderBy("band")
    )


QUERIES["dedup_cluster_size_spectrum"] = dedup_cluster_size_spectrum

ORACLES["dedup_cluster_size_spectrum"] = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 50 = 0
    ),
    clusters AS (
        SELECT md5(text) AS h, COUNT(*) AS c FROM corpus GROUP BY md5(text)
    ),
    banded AS (
        SELECT c,
               CASE WHEN c = 1 THEN '1_unique' WHEN c = 2 THEN '2_pair'
                    WHEN c <= 4 THEN '3_4' WHEN c <= 8 THEN '5_8'
                    ELSE '9_plus' END AS band
        FROM clusters
    )
    SELECT band,
           COUNT(*) AS n_clusters,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST((SUM(c) - COUNT(*)) * 1000000 // SUM(c) AS BIGINT)
               AS dup_overhead_ppm
    FROM banded
    GROUP BY band
    ORDER BY band
"""
