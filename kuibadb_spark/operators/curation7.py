"""Round-4 batch 2: graph analytics + LLM-pipeline curation ops —
label-propagation community detection, multi-source BFS reach,
Adamic-Adar link scoring, triplet hard-negative mining, Gopher quality
rules, quality-budget thresholding, class-separation diagnostics,
b-bit minhash similarity estimation, perceptual DCT hashing, and
content-defined chunking dedup.

Registered after curation6 in registry._MODULES: rounds 4 and 5's
planned grading windows stay undisturbed; these keys become gradable
from round 6.

Graph ops reuse the kNN-sparsified hour-co-activity graph construction
proven by graph_link_prediction (graph.py:497): the raw co-activity
graph densifies with activity (66% of user pairs qualify at sf0.1), so
every node keeps its 10 strongest neighbors — bounding all downstream
work at nodes x 100 regardless of corpus size. Determinism rules are
curation5/6's: integer quantization first, windows over bounded sets,
single final double expressions spelled identically in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.operators.dedup import (
    _DUP_CORPUS_DUCK,
    _SHINGLES_DUCK,
    _doc_shingles,
    _dup_corpus,
)
from kuibadb_spark.operators.similarity import _EMB_DUCK, _dot, _emb

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# shared: kNN-sparsified hour-co-activity graph (graph.py:497 shape)
# ---------------------------------------------------------------------------
def _knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed kNN adjacency (src, dst) — delegates to the single
    shared builder (graph._coactivity_knn: hour-capped co-activity,
    shared >= 5, top-10 neighbors per node; round-6 review dedup of the
    formerly copy-pasted pipeline)."""
    from kuibadb_spark.operators.graph import _coactivity_knn

    return _coactivity_knn(spark, sf_dir)


from kuibadb_spark.operators.graph import _AH_CAPPED_DUCK as _AH_CAP_CTE

_KNN_GRAPH_DUCK = f"""
    {_AH_CAP_CTE},
    raw_e AS (
        SELECT p.user_id AS src, q.user_id AS dst, COUNT(*) AS shared
        FROM ah p JOIN ah q ON p.h = q.h AND p.user_id < q.user_id
        GROUP BY p.user_id, q.user_id
        HAVING COUNT(*) >= 5
    ),
    sym_full AS (
        SELECT src, dst, shared FROM raw_e
        UNION ALL
        SELECT dst, src, shared FROM raw_e
    ),
    sym AS (
        SELECT src, dst FROM (
            SELECT *, row_number() OVER (PARTITION BY src
                       ORDER BY shared DESC, dst ASC) AS rn
            FROM sym_full
        ) WHERE rn <= 10
    )
"""


# ---------------------------------------------------------------------------
# 1. label-propagation community detection (3 synchronous rounds)
# ---------------------------------------------------------------------------
_LPA_ROUNDS = 3


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) on the sparsified
    co-activity graph: every node starts with its own id and adopts, per
    round, the most frequent label among its kNN neighbors (count desc,
    label asc tie-break — fully deterministic, unlike the randomized
    original). Fixed 3 rounds in BOTH engines (the pagerank fixed-rounds
    precedent); each round is one groupBy + one argmax window over the
    DEGREE-BOUNDED edge list, so a round costs O(E)=O(10·V) at any
    scale. Output: communities of >= 2 members with sizes.

    Lineage discipline (the graph_kcore precedent, curation4): the
    co-activity graph is persisted (else every round re-derives the
    hour self-join — first sweep measured ×16.1 at ×10) and each
    round's labels are localCheckpoint'd so round r+1's plan does not
    embed round r's twice."""
    sym = _knn_graph(spark, sf_dir).persist()
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        wpick = W.partitionBy("src").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            votes.withColumn("rn", F.row_number().over(wpick))
            .filter("rn = 1")
            .select(F.col("src").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.min("node").alias("min_node"))
        .filter("n_members >= 2")
        .selectExpr("label AS community", "n_members", "min_node")
        .orderBy(F.desc("n_members"), F.asc("community"))
    )


QUERIES["graph_label_propagation"] = graph_label_propagation

_LPA_ROUND_DUCK = """
    votes{r} AS MATERIALIZED (
        SELECT s.src, l.label, COUNT(*) AS c
        FROM sym s JOIN l{p} l ON s.dst = l.node
        GROUP BY s.src, l.label
    ),
    l{r} AS MATERIALIZED (
        SELECT src AS node, label FROM (
            SELECT *, row_number() OVER (PARTITION BY src
                       ORDER BY c DESC, label ASC) AS rn
            FROM votes{r}
        ) WHERE rn = 1
    )
"""

ORACLES["graph_label_propagation"] = f"""
    WITH {_KNN_GRAPH_DUCK},
    l0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS label FROM sym
    ),
    {",".join(_LPA_ROUND_DUCK.format(r=i + 1, p=i)
              for i in range(_LPA_ROUNDS))}
    SELECT label AS community, COUNT(*) AS n_members, MIN(node) AS min_node
    FROM l{_LPA_ROUNDS}
    GROUP BY label
    HAVING COUNT(*) >= 2
    ORDER BY n_members DESC, community ASC
"""


# ---------------------------------------------------------------------------
# 2. multi-source BFS reach (3 hops, unrolled)
# ---------------------------------------------------------------------------
_BFS_HOPS = 3


def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reach from the 3 highest-degree hubs: how much of
    the graph is within k hops of each hub — the influence/propagation
    primitive. 3 unrolled frontier-expansion rounds; every round is a
    frontier⋈adjacency equi-join + distinct, bounded by degree^hops
    (10³ here) per hub. The hub set is deterministic (degree desc,
    node asc)."""
    sym = _knn_graph(spark, sf_dir).persist()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    wtop = W.orderBy(F.desc("d"), F.asc("src"))
    hubs = (
        deg.withColumn("rn", F.row_number().over(wtop))
        .filter("rn <= 3")
        .select(F.col("src").alias("hub"))
    )
    # each round's reach set is localCheckpoint'd: round r+1 references
    # round r TWICE (count + expansion), so without truncation the plan
    # doubles per hop and re-derives the co-activity build — the first
    # sweep measured 29.6 s at sf0.1 for what is 3 tiny joins
    reached = (
        F.broadcast(hubs).join(sym, hubs.hub == sym.src)
        .select("hub", F.col("dst").alias("node")).distinct()
        .localCheckpoint(eager=True)
    )
    out = [reached.groupBy("hub").agg(F.count(F.lit(1)).alias("n_reached"))
           .selectExpr("hub", "CAST(1 AS INT) AS hop", "n_reached")]
    for hop in range(2, _BFS_HOPS + 1):
        frontier = (
            reached.join(sym, reached.node == sym.src)
            .select("hub", F.col("dst").alias("node"))
        )
        reached = (
            reached.unionAll(frontier).distinct()
            .localCheckpoint(eager=True)
        )
        out.append(
            reached.groupBy("hub").agg(F.count(F.lit(1)).alias("n_reached"))
            .selectExpr("hub", f"CAST({hop} AS INT) AS hop", "n_reached")
        )
    sym.unpersist()
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res.orderBy("hub", "hop")


QUERIES["graph_bfs_reach"] = graph_bfs_reach

ORACLES["graph_bfs_reach"] = f"""
    WITH {_KNN_GRAPH_DUCK},
    hubs AS MATERIALIZED (
        SELECT src AS hub FROM (
            SELECT src, row_number() OVER (
                ORDER BY COUNT(*) DESC, src ASC) AS rn
            FROM sym GROUP BY src
        ) WHERE rn <= 3
    ),
    r1 AS MATERIALIZED (
        SELECT DISTINCT h.hub, s.dst AS node
        FROM hubs h JOIN sym s ON s.src = h.hub
    ),
    r2 AS MATERIALIZED (
        SELECT DISTINCT hub, node FROM (
            SELECT hub, node FROM r1
            UNION ALL
            SELECT r.hub, s.dst AS node FROM r1 r JOIN sym s ON s.src = r.node
        )
    ),
    r3 AS MATERIALIZED (
        SELECT DISTINCT hub, node FROM (
            SELECT hub, node FROM r2
            UNION ALL
            SELECT r.hub, s.dst AS node FROM r2 r JOIN sym s ON s.src = r.node
        )
    )
    SELECT hub, hop, n_reached FROM (
        SELECT hub, CAST(1 AS INT) AS hop, COUNT(*) AS n_reached
        FROM r1 GROUP BY hub
        UNION ALL
        SELECT hub, CAST(2 AS INT), COUNT(*) FROM r2 GROUP BY hub
        UNION ALL
        SELECT hub, CAST(3 AS INT), COUNT(*) FROM r3 GROUP BY hub
    )
    ORDER BY hub, hop
"""


# ---------------------------------------------------------------------------
# 3. Adamic-Adar link scoring
# ---------------------------------------------------------------------------
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the sparsified graph — the
    degree-penalized cousin of graph_link_prediction's Jaccard: a
    common neighbor n contributes 1/ln(deg(n)), so hub-mediated
    connections count less. Per-neighbor contributions are quantized
    to round(1e6/ln(max(deg,2))) BEFORE summing (ln is libm-identical
    on identical integer inputs; the max(,2) clamp is the standard
    guard for degree-1 leaves). Two-hop candidates over the bounded
    adjacency, existing edges anti-joined away, top 20 by score."""
    sym = _knn_graph(spark, sf_dir).persist()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    contrib = deg.selectExpr(
        "src AS n",
        "CAST(round(1000000.0D / ln(CAST(greatest(d, 2) AS DOUBLE))) AS BIGINT)"
        " AS w",
    )
    hops = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.dst") == F.col("y.dst"))
        .filter(F.col("x.src") < F.col("y.src"))
        .select(
            F.col("x.src").alias("a"),
            F.col("y.src").alias("b"),
            F.col("x.dst").alias("n"),
        )
    )
    scored = (
        hops.join(F.broadcast(contrib), "n")
        .groupBy("a", "b")
        .agg(F.sum("w").alias("aa_micro"),
             F.count(F.lit(1)).alias("n_common"))
    )
    non_edges = scored.join(
        sym.selectExpr("src AS a", "dst AS b"), ["a", "b"], "anti"
    )
    # top-20 via orderBy().limit() — TakeOrderedAndProject, a distributed
    # per-partition top-k + driver merge of 20 rows. A partition-less
    # row_number window here single-task-sorts EVERY candidate pair
    # (first sweep: ×32.8 at ×10); the rank column is then a window over
    # 20 rows only.
    top = non_edges.orderBy(
        F.desc("aa_micro"), F.asc("a"), F.asc("b")
    ).limit(20)
    wtop = W.orderBy(F.desc("aa_micro"), F.asc("a"), F.asc("b"))
    return (
        top.withColumn("rn", F.row_number().over(wtop))
        .selectExpr("CAST(rn AS INT) AS rank", "a", "b", "n_common",
                    "aa_micro")
        .orderBy("rank")
    )


QUERIES["graph_adamic_adar"] = graph_adamic_adar

ORACLES["graph_adamic_adar"] = f"""
    WITH {_KNN_GRAPH_DUCK},
    contrib AS (
        SELECT src AS n,
               CAST(round(1000000.0 / ln(CAST(greatest(COUNT(*), 2)
                    AS DOUBLE))) AS BIGINT) AS w
        FROM sym GROUP BY src
    ),
    hops AS (
        SELECT x.src AS a, y.src AS b, x.dst AS n
        FROM sym x JOIN sym y ON x.dst = y.dst AND x.src < y.src
    ),
    scored AS (
        SELECT h.a, h.b,
               CAST(SUM(c.w) AS BIGINT) AS aa_micro,
               COUNT(*) AS n_common
        FROM hops h JOIN contrib c USING (n)
        GROUP BY h.a, h.b
    ),
    non_edges AS (
        SELECT s.* FROM scored s
        WHERE NOT EXISTS (SELECT 1 FROM sym e
                          WHERE e.src = s.a AND e.dst = s.b)
    )
    SELECT CAST(rn AS INT) AS rank, a, b, n_common, aa_micro FROM (
        SELECT *, row_number() OVER (
            ORDER BY aa_micro DESC, a ASC, b ASC) AS rn
        FROM non_edges
    ) WHERE rn <= 20
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 4. triplet hard-negative mining
# ---------------------------------------------------------------------------
def sim_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-triplet mining for metric learning (FaceNet, Schroff 2015):
    per anchor, the hardest positive = the SAME-label vector with the
    LOWEST cosine, the hardest negative = the DIFFERENT-label vector
    with the HIGHEST cosine; margin = pos − neg (negative margin means
    the triplet violates, i.e. is a useful training example). The fixed
    20-anchor query set broadcasts against the corpus — the same
    bounded-build-side shape as sim_topk_bruteforce (at production
    scale the candidate side comes from the IVF/LSH bucketed ANN paths,
    sim_ann_ivf); cosine is the registry-standard round(dot/(n·n), 6)."""
    e = _emb(spark, sf_dir)
    anchors = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("av"),
        F.col("norm").alias("an"), F.col("label").alias("a_label"),
    )
    pairs = (
        F.broadcast(anchors)
        .join(e, F.col("vec_id") != F.col("a_id"))
        .withColumn("cos", F.round(_dot("av", "v") / (F.col("an") * F.col("norm")), 6))
    )
    wpos = W.partitionBy("a_id").orderBy(F.asc("cos"), F.asc("vec_id"))
    pos = (
        pairs.filter("label = a_label")
        .withColumn("rn", F.row_number().over(wpos))
        .filter("rn = 1")
        .select("a_id", F.col("vec_id").alias("pos_id"),
                F.col("cos").alias("cos_pos"))
    )
    wneg = W.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    neg = (
        pairs.filter("label != a_label")
        .withColumn("rn", F.row_number().over(wneg))
        .filter("rn = 1")
        .select("a_id", F.col("vec_id").alias("neg_id"),
                F.col("cos").alias("cos_neg"))
    )
    return (
        pos.join(neg, "a_id")
        .selectExpr("a_id", "pos_id", "cos_pos", "neg_id", "cos_neg",
                    "round(cos_pos - cos_neg, 6) AS margin6")
        .orderBy("a_id")
    )


QUERIES["sim_triplet_mining"] = sim_triplet_mining

ORACLES["sim_triplet_mining"] = f"""
    WITH {_EMB_DUCK},
    anchors AS (
        SELECT vec_id AS a_id, v AS av, norm AS an, label AS a_label
        FROM emb WHERE vec_id < 20
    ),
    pairs AS (
        SELECT a_id, a_label, e.vec_id, e.label,
               round(list_dot_product(av, e.v) / (an * e.norm), 6) AS cos
        FROM anchors JOIN emb e ON e.vec_id <> anchors.a_id
    ),
    pos AS (
        SELECT a_id, vec_id AS pos_id, cos AS cos_pos FROM (
            SELECT *, row_number() OVER (PARTITION BY a_id
                       ORDER BY cos ASC, vec_id ASC) AS rn
            FROM pairs WHERE label = a_label
        ) WHERE rn = 1
    ),
    neg AS (
        SELECT a_id, vec_id AS neg_id, cos AS cos_neg FROM (
            SELECT *, row_number() OVER (PARTITION BY a_id
                       ORDER BY cos DESC, vec_id ASC) AS rn
            FROM pairs WHERE label <> a_label
        ) WHERE rn = 1
    )
    SELECT a_id, pos_id, cos_pos, neg_id, cos_neg,
           round(cos_pos - cos_neg, 6) AS margin6
    FROM pos JOIN neg USING (a_id)
    ORDER BY a_id
"""


# ---------------------------------------------------------------------------
# 5. Gopher quality rules
# ---------------------------------------------------------------------------
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, §A1.1) per
    source: word-count bounds [50, 100k], mean word length in [3, 10],
    >= 80% of words containing an alphabetic character, hash-symbol
    ratio <= 10%, and >= 2 distinct required stopwords present. Every
    rule is row-local integer arithmetic over token arrays, aggregated
    to per-source pass/fail counts — a single scan + one small groupBy,
    the cheapest possible curation screen at any corpus size."""
    d = load(spark, sf_dir, "documents")
    stop_expr = " + ".join(
        f"CASE WHEN contains(concat(' ', lower(text), ' '), ' {s} ')"
        f" THEN 1 ELSE 0 END"
        for s in _GOPHER_STOPS
    )
    per = d.selectExpr(
        "doc_id", "source",
        r"split(text, '\\s+') AS toks",
        "length(text) - length(replace(text, '#', '')) AS n_hash",
        f"({stop_expr}) AS stop_hits",
    ).selectExpr(
        "doc_id", "source", "n_hash", "stop_hits",
        "size(toks) AS n_words",
        "aggregate(toks, 0, (acc, t) -> acc + length(t)) AS word_chars",
        "size(filter(toks, t -> t rlike '[a-z]')) AS n_alpha",
    ).selectExpr(
        "source",
        "CASE WHEN n_words BETWEEN 50 AND 100000 THEN 0 ELSE 1 END AS f_wc",
        "CASE WHEN word_chars * 100 BETWEEN n_words * 300"
        " AND n_words * 1000 THEN 0 ELSE 1 END AS f_mwl",
        "CASE WHEN n_alpha * 100 >= n_words * 80 THEN 0 ELSE 1 END AS f_alpha",
        "CASE WHEN n_hash * 10 <= n_words THEN 0 ELSE 1 END AS f_sym",
        "CASE WHEN stop_hits >= 2 THEN 0 ELSE 1 END AS f_stop",
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr(
                "CASE WHEN f_wc + f_mwl + f_alpha + f_sym + f_stop = 0"
                " THEN 1 ELSE 0 END")).alias("n_pass"),
            F.sum("f_wc").alias("fail_wordcount"),
            F.sum("f_mwl").alias("fail_meanwordlen"),
            F.sum("f_alpha").alias("fail_alpharatio"),
            F.sum("f_sym").alias("fail_symbolratio"),
            F.sum("f_stop").alias("fail_stopwords"),
        )
        .orderBy("source")
    )


QUERIES["text_gopher_quality_rules"] = text_gopher_quality_rules

_GOPHER_STOP_DUCK = " + ".join(
    f"CASE WHEN contains(' ' || lower(text) || ' ', ' {s} ')"
    f" THEN 1 ELSE 0 END"
    for s in _GOPHER_STOPS
)

ORACLES["text_gopher_quality_rules"] = f"""
    WITH per AS (
        SELECT source,
               len(string_split_regex(text, '\\s+')) AS n_words,
               list_sum(list_transform(string_split_regex(text, '\\s+'),
                   t -> length(t))) AS word_chars,
               len(list_filter(string_split_regex(text, '\\s+'),
                   t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
               length(text) - length(replace(text, '#', '')) AS n_hash,
               ({_GOPHER_STOP_DUCK}) AS stop_hits
        FROM documents
    ),
    flags AS (
        SELECT source,
               CASE WHEN n_words BETWEEN 50 AND 100000 THEN 0 ELSE 1 END AS f_wc,
               CASE WHEN word_chars * 100 BETWEEN n_words * 300
                    AND n_words * 1000 THEN 0 ELSE 1 END AS f_mwl,
               CASE WHEN n_alpha * 100 >= n_words * 80 THEN 0 ELSE 1 END AS f_alpha,
               CASE WHEN n_hash * 10 <= n_words THEN 0 ELSE 1 END AS f_sym,
               CASE WHEN stop_hits >= 2 THEN 0 ELSE 1 END AS f_stop
        FROM per
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN f_wc + f_mwl + f_alpha + f_sym + f_stop = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(f_wc) AS BIGINT) AS fail_wordcount,
           CAST(SUM(f_mwl) AS BIGINT) AS fail_meanwordlen,
           CAST(SUM(f_alpha) AS BIGINT) AS fail_alpharatio,
           CAST(SUM(f_sym) AS BIGINT) AS fail_symbolratio,
           CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords
    FROM flags
    GROUP BY source
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 6. quality-budget thresholding
# ---------------------------------------------------------------------------
_BUDGET_PCT = 60


def text_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source selection under a char budget: rank docs by quality
    (here n_chars as the stand-in score — longer docs first, the same
    role a model-based quality score plays in production) and keep docs
    while the cumulative chars BEFORE each doc stay under 60% of the
    source's total — the deterministic greedy knapsack every data-
    mixture pipeline runs to hit a token budget. Windows are per-source
    cumulative sums (bounded partitions); all integers."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    wcum = (
        W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wall = (
        W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    flagged = d.select(
        "source", "doc_id", "n_chars",
        F.coalesce(F.sum("n_chars").over(wcum), F.lit(0)).alias("cum_before"),
        F.sum("n_chars").over(wall).alias("total"),
    ).withColumn(
        "kept",
        F.expr(f"CASE WHEN cum_before * 100 < total * {_BUDGET_PCT}"
               " THEN 1 ELSE 0 END"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.max("total").alias("chars_total"),
            F.sum(F.expr("kept * n_chars")).alias("chars_kept"),
            F.min(F.expr("CASE WHEN kept = 1 THEN n_chars END"))
            .alias("cutoff_chars"),
        )
        .orderBy("source")
    )


QUERIES["text_quality_budget"] = text_quality_budget

ORACLES["text_quality_budget"] = f"""
    WITH flagged AS (
        SELECT source, doc_id, n_chars,
               COALESCE(SUM(n_chars) OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before,
               SUM(n_chars) OVER (PARTITION BY source) AS total
        FROM documents
    ),
    keptf AS (
        SELECT *, CASE WHEN cum_before * 100 < total * {_BUDGET_PCT}
                       THEN 1 ELSE 0 END AS kept
        FROM flagged
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(MAX(total) AS BIGINT) AS chars_total,
           CAST(SUM(kept * n_chars) AS BIGINT) AS chars_kept,
           CAST(MIN(CASE WHEN kept = 1 THEN n_chars END) AS BIGINT)
               AS cutoff_chars
    FROM keptf
    GROUP BY source
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 7. class-separation diagnostics (within/between scatter)
# ---------------------------------------------------------------------------
def sim_class_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-style class-separation audit of the embedding space: per
    label, within-class scatter Σ||v−μ_c||² and the centroid's distance
    to the global centroid — the diagnostic that tells you whether
    labels are learnable before training anything. Embeddings quantize
    to 1e6-scaled integers FIRST, so per-dimension sums are exact in
    both engines, and both scatters reduce to the closed forms
    (n·Σ|q|² − |Σq|²)/n² and Σ_dim(s_c/n_c − s_g/n_g)² evaluated as
    single double expressions from exact integer sums. One explode to
    (label, dim, q), two groupBys — linear, no pairwise anything."""
    e = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0D)"
        " AS BIGINT)) AS q",
    )
    dims = e.selectExpr(
        "label", "posexplode(q) AS (dim, qv)"
    )
    per_label_dim = dims.groupBy("label", "dim").agg(
        F.sum("qv").alias("s"),
        F.sum(F.expr("qv * qv")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    glob_dim = per_label_dim.groupBy("dim").agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    )
    joined = per_label_dim.join(F.broadcast(glob_dim), "dim")
    return (
        joined.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            # within-scatter: Σ_dim (n·ss − s²)/n² — exact ints then one divide
            F.expr(
                "round(SUM((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)"
                " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
                " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / 1e12, 6)"
            ).alias("within6"),
            # centroid-to-global distance²
            F.expr(
                "round(SUM((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
                " - CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE))"
                " * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
                " - CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE))) / 1e12, 6)"
            ).alias("between6"),
        )
        .orderBy("label")
    )


QUERIES["sim_class_separation"] = sim_class_separation

ORACLES["sim_class_separation"] = """
    WITH q AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qv
        FROM embeddings
    ),
    dims AS (
        SELECT label,
               unnest(generate_series(1, len(qv))) AS dim1,
               qv
        FROM q
    ),
    flat AS (
        SELECT label, dim1 - 1 AS dim, qv[dim1] AS v FROM dims
    ),
    per_label_dim AS (
        SELECT label, dim, SUM(v) AS s, SUM(v * v) AS ss, COUNT(*) AS n
        FROM flat GROUP BY label, dim
    ),
    glob_dim AS (
        SELECT dim, SUM(s) AS gs, SUM(n) AS gn
        FROM per_label_dim GROUP BY dim
    )
    SELECT p.label, MAX(p.n) AS n_vecs,
           round(SUM((CAST(p.n AS DOUBLE) * CAST(p.ss AS DOUBLE)
                 - CAST(p.s AS DOUBLE) * CAST(p.s AS DOUBLE))
                 / (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE))) / 1e12, 6)
               AS within6,
           round(SUM((CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE)
                 - CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE))
                 * (CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE)
                 - CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE))) / 1e12, 6)
               AS between6
    FROM per_label_dim p JOIN glob_dim g USING (dim)
    GROUP BY p.label
    ORDER BY p.label
"""


# ---------------------------------------------------------------------------
# 8. b-bit minhash similarity estimation
# ---------------------------------------------------------------------------
_BBIT_K = 16


def dedup_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minhash (Li & König 2010, b=1, k=16): store only the
    LOWEST BIT of each of 16 minhashes — 2 bytes per doc instead of
    128 — and estimate Jaccard from the bit-agreement fraction via
    ĵ = 2·(agree/k) − 1 (for b=1 a non-matching pair agrees half the
    time). Candidates come from dedup's inverted-postings builder (never
    all-pairs); the estimate is compared against the exact Jaccard the
    postings already carry, reporting the estimator error — the storage
    -vs-accuracy tradeoff measurement that justifies b-bit sketches at
    100 TB. All hashing is md5; signatures pack into one BIGINT."""
    from kuibadb_spark.operators.dedup import _pair_stats

    corpus = _dup_corpus(spark, sf_dir)
    # localCheckpoint, NOT persist: consumed by the pair listing at
    # build time AND the signature path on every re-execution. A
    # persist() here is orphaned by any clearCache() between actions —
    # the plan's InMemoryRelation stays but the cache entry is gone, so
    # EVERY later run recomputes the shingle build once per consumer
    # subtree (~13 s/run measured at sf0.1, the DESIGN #30 class);
    # the eager checkpoint pays the build once and stays immune.
    shs = _doc_shingles(corpus).localCheckpoint(eager=True)
    pairs = _pair_stats(shs)
    # top-20 via TakeOrderedAndProject + checkpoint (consumed 3x below);
    # the 16x shingle-hash signature explode then runs for ONLY the <=40
    # docs those pairs touch (broadcast semi-join), not the corpus —
    # first sweep paid 23.6 s / x12 computing corpus-wide signatures that
    # the result never read
    top = (
        pairs.orderBy(F.desc("inter"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(20)
        .withColumn("rn", F.row_number().over(
            W.orderBy(F.desc("inter"), F.asc("doc_a"), F.asc("doc_b"))))
        .localCheckpoint(eager=True)
    )
    need = (
        top.selectExpr("doc_a AS doc_id")
        .unionAll(top.selectExpr("doc_b AS doc_id")).distinct()
    )
    sigs = (
        shs.join(F.broadcast(need), "doc_id", "semi")
        .selectExpr("doc_id", "explode(shs) AS shingle")
        .selectExpr("doc_id", "shingle",
                    f"explode(sequence(0, {_BBIT_K - 1})) AS j")
        .selectExpr(
            "doc_id", "j",
            "CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', shingle)),"
            " 1, 8), 16, 10) AS BIGINT) AS h",
        )
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("m"))
        .groupBy("doc_id")
        .agg(F.sum(F.expr(
            "CASE WHEN m % 2 = 1 THEN shiftleft(CAST(1 AS BIGINT), j)"
            " ELSE CAST(0 AS BIGINT) END")).alias("sig"))
    )
    return (
        top.join(sigs.selectExpr("doc_id AS doc_a", "sig AS sig_a"), "doc_a")
        .join(sigs.selectExpr("doc_id AS doc_b", "sig AS sig_b"), "doc_b")
        .selectExpr(
            "CAST(rn AS INT) AS rank", "doc_a", "doc_b",
            "inter * 1000000 DIV (sz_a + sz_b - inter) AS exact_ppm",
            f"CAST((2 * ({_BBIT_K} - bit_count(sig_a ^ sig_b)) - {_BBIT_K})"
            f" * {1000000 // _BBIT_K} AS BIGINT) AS est_ppm",
            f"abs((2 * ({_BBIT_K} - bit_count(sig_a ^ sig_b)) - {_BBIT_K})"
            f" * {1000000 // _BBIT_K}"
            " - inter * 1000000 DIV (sz_a + sz_b - inter)) AS err_ppm",
        )
        .orderBy("rank")
    )


QUERIES["dedup_bbit_minhash"] = dedup_bbit_minhash

ORACLES["dedup_bbit_minhash"] = f"""
    WITH {_DUP_CORPUS_DUCK},
    {_SHINGLES_DUCK},
    sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    top AS (
        SELECT p.doc_a, p.doc_b, p.inter, sa.sz AS sz_a, sb.sz AS sz_b,
               row_number() OVER (
                   ORDER BY p.inter DESC, p.doc_a ASC, p.doc_b ASC) AS rn
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        QUALIFY rn <= 20
    ),
    sigs AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN m % 2 = 1 THEN (CAST(1 AS BIGINT) << j)
                        ELSE 0 END) AS BIGINT) AS sig
        FROM (
            SELECT s.doc_id, seeds.j,
                   MIN(CAST('0x' || substr(md5(CAST(seeds.j AS VARCHAR)
                       || '|' || s.shingle), 1, 8) AS BIGINT)) AS m
            FROM shingles s
            CROSS JOIN (SELECT unnest(generate_series(0, {_BBIT_K - 1}))
                        AS j) seeds
            WHERE s.doc_id IN (SELECT doc_a FROM top
                               UNION SELECT doc_b FROM top)
            GROUP BY s.doc_id, seeds.j
        )
        GROUP BY doc_id
    )
    SELECT CAST(t.rn AS INT) AS rank, t.doc_a, t.doc_b,
           CAST(t.inter * 1000000 // (t.sz_a + t.sz_b - t.inter) AS BIGINT)
               AS exact_ppm,
           CAST((2 * ({_BBIT_K} - bit_count(xor(ga.sig, gb.sig)))
                 - {_BBIT_K}) * {1000000 // _BBIT_K} AS BIGINT) AS est_ppm,
           CAST(abs((2 * ({_BBIT_K} - bit_count(xor(ga.sig, gb.sig)))
                 - {_BBIT_K}) * {1000000 // _BBIT_K}
                 - t.inter * 1000000 // (t.sz_a + t.sz_b - t.inter))
                AS BIGINT) AS err_ppm
    FROM top t
    JOIN sigs ga ON ga.doc_id = t.doc_a
    JOIN sigs gb ON gb.doc_id = t.doc_b
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 9. perceptual DCT hash (pHash) over fake 8x8 "images"
# ---------------------------------------------------------------------------
# DCT-II basis quantized to 1e3 integers: c(x, u) = round(cos((2x+1)·u·π/16)·1e3)
_DCT_COEF = [
    (x, u,
     int(math.floor(abs(math.cos((2 * x + 1) * u * math.pi / 16)) * 1e3 + 0.5))
     * (1 if math.cos((2 * x + 1) * u * math.pi / 16) >= 0 else -1))
    for x in range(8) for u in range(4)
]


def mm_phash_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual DCT hash (pHash) with the decode step stubbed to a
    deterministic fake: the 8x8 'image' is the payload's first 64 bytes
    (a real deployment swaps in decode+downsample; the Spark plumbing —
    per-pixel explode, basis join, coefficient aggregation, per-doc
    median threshold — is identical). The 2-D DCT-II is evaluated as
    exact integer sums against a 1e3-quantized cosine basis (identical
    literals both engines); the hash takes the 15 non-DC coefficients
    of the 4x4 low-frequency block, thresholded at their (lower)
    median — the textbook pHash construction, multiplication-free at
    the bit stage. Linear: 64 pixels x 16 basis pairs per doc."""
    from kuibadb_spark.operators.multimodal import _payloads

    coef_vals = ", ".join(f"({x}, {u}, {c})" for x, u, c in _DCT_COEF)
    cu = F.broadcast(spark.sql(
        f"SELECT col1 AS x, col2 AS u, col3 AS cu FROM VALUES {coef_vals}"))
    cv = F.broadcast(spark.sql(
        f"SELECT col1 AS y, col2 AS v, col3 AS cv FROM VALUES {coef_vals}"))
    px = (
        _payloads(spark, sf_dir)
        .filter("doc_id < 100 AND octet_length(payload) >= 64")
        # hex only the 64 input bytes: hexing the WHOLE payload and
        # carrying it through the 64-row explode + basis joins ships
        # payload-sized strings per pixel row for a fixed 128-char need
        .selectExpr("doc_id", "hex(substring(payload, 1, 64)) AS hx")
        .selectExpr("doc_id", "hx", "explode(sequence(0, 63)) AS k")
        .selectExpr(
            "doc_id", "CAST(k DIV 8 AS INT) AS x", "CAST(k % 8 AS INT) AS y",
            "CAST(conv(substring(hx, 2 * k + 1, 2), 16, 10) AS BIGINT) AS p",
        )
    )
    coeffs = (
        px.join(cu, "x").join(cv, "y")
        .groupBy("doc_id", "u", "v")
        .agg(F.sum(F.expr("p * cu * cv")).alias("f"))
    )
    wmed = W.partitionBy("doc_id").orderBy("f", "u", "v")
    ac = coeffs.filter("NOT (u = 0 AND v = 0)").withColumn(
        "r", F.row_number().over(wmed))
    med = ac.filter("r = 8").select("doc_id", F.col("f").alias("med"))
    dc = coeffs.filter("u = 0 AND v = 0").select(
        "doc_id", F.col("f").alias("dc"))
    bits = (
        ac.join(med, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(F.expr(
            "CASE WHEN f > med THEN shiftleft(CAST(1 AS BIGINT),"
            " 4 * u + v - 1) ELSE CAST(0 AS BIGINT) END")).alias("phash"))
    )
    return (
        bits.join(dc, "doc_id").join(med, "doc_id")
        .select("doc_id", "phash", "dc", "med")
        .orderBy("doc_id")
    )


QUERIES["mm_phash_dct"] = mm_phash_dct

ORACLES["mm_phash_dct"] = f"""
    WITH payloads AS (
        SELECT doc_id, encode(text) AS payload FROM documents
        WHERE doc_id < 100
    ),
    coef(x, u, c) AS (
        VALUES {", ".join(f"({x}, {u}, {c})" for x, u, c in _DCT_COEF)}
    ),
    px AS (
        SELECT doc_id,
               CAST(k // 8 AS INT) AS x, CAST(k % 8 AS INT) AS y,
               CAST('0x' || substr(hex(payload), 2 * k + 1, 2) AS BIGINT) AS p
        FROM (
            SELECT doc_id, payload,
                   unnest(generate_series(0, 63)) AS k
            FROM payloads WHERE octet_length(payload) >= 64
        )
    ),
    coeffs AS (
        SELECT px.doc_id, cu.u, cv.u AS v,
               CAST(SUM(px.p * cu.c * cv.c) AS BIGINT) AS f
        FROM px
        JOIN coef cu ON cu.x = px.x
        JOIN coef cv ON cv.x = px.y
        GROUP BY px.doc_id, cu.u, cv.u
    ),
    ac AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY f, u, v) AS r
        FROM coeffs WHERE NOT (u = 0 AND v = 0)
    ),
    med AS (SELECT doc_id, f AS med FROM ac WHERE r = 8),
    dc AS (SELECT doc_id, f AS dc FROM coeffs WHERE u = 0 AND v = 0),
    bits AS (
        SELECT ac.doc_id,
               CAST(SUM(CASE WHEN ac.f > med.med THEN
                        (CAST(1 AS BIGINT) << (4 * ac.u + ac.v - 1))
                        ELSE 0 END) AS BIGINT) AS phash
        FROM ac JOIN med USING (doc_id)
        GROUP BY ac.doc_id
    )
    SELECT b.doc_id, b.phash, d.dc, m.med
    FROM bits b JOIN dc d USING (doc_id) JOIN med m USING (doc_id)
    ORDER BY b.doc_id
"""


# ---------------------------------------------------------------------------
# 10. content-defined chunking dedup
# ---------------------------------------------------------------------------
_CDC_MASK = 32  # expected chunk length ~32 bytes
# Rabin polynomial fingerprint over the trailing 8-byte (16-hex-char)
# window: h(i) = (Σ_k v[2i-15+k] · B^(15-k)) mod M, boundary when
# h % 32 = 0. Closed form with the B-powers PRE-REDUCED mod M and
# inlined as constants, so both engines evaluate 16 integer
# multiply-adds per position — no md5, no bignum. Values are the ASCII
# codes of hex chars (48..70), so each term ≤ 70·(M-1) ≈ 7.0e7 and the
# 16-term sum ≤ 1.12e9 — far inside int64 (Spark) and, with the
# oracle's explicit per-term CAST AS BIGINT, inside DuckDB's checked
# arithmetic too (DuckDB ascii() is INT32, whose 2.1e9 ceiling would
# leave only ~1.9× headroom and throw on overflow if M ever grew —
# round-6 review finding). Round-5 judge
# ask #4: the previous boundary rule ran a full md5 digest per byte
# position — linear but constant-heavy (the worst lengthprobe entry);
# this cuts the per-byte work to integer ops while keeping md5 where it
# belongs, once per ~32-byte chunk.
_CDC_B, _CDC_M = 31, 1_000_003
_CDC_POW = [pow(_CDC_B, 15 - k, _CDC_M) for k in range(16)]


def _cdc_chunk_batches(batches):
    """Arrow-batched CDC kernel: for each payload, the Rabin window
    fingerprints for ALL byte positions at once (numpy sliding-window
    matmul against the inlined power vector — identical values to the
    closed-form SQL spelling the oracle runs), then one md5 per emitted
    chunk. Vectorized C per byte; python-level loops only per document
    and per ~32-byte chunk."""
    import hashlib

    import numpy as np
    import pandas as pd

    # ascii of the uppercase hex digit for each half-byte value 0..15 —
    # the fingerprint is defined over hex-char ascii values so the
    # DuckDB oracle can evaluate the identical polynomial from substr()
    asc = np.array([48 + d if d < 10 else 55 + d for d in range(16)],
                   dtype=np.int64)
    pows = np.array(_CDC_POW, dtype=np.int64)
    for pdf in batches:
        fmts: list = []
        lens: list = []
        hashes: list = []
        for fmt, payload in zip(pdf["fmt"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            n = len(b)
            half = np.empty(2 * n, np.int64)
            half[0::2] = asc[b >> 4]
            half[1::2] = asc[b & 15]
            # rows = windows of 16 hex chars starting at even offsets =
            # the trailing-8-byte window of byte positions i = 8..n;
            # each term <= 70*(M-1), the 16-term dot <= 1.1e9 << int64
            w = np.lib.stride_tricks.sliding_window_view(half, 16)[0::2]
            h = (w @ pows) % _CDC_M
            mask = (h % _CDC_MASK) == 0
            mask[-1] = True  # i = n is always a boundary
            cuts = np.arange(8, n + 1)[mask]
            prev = np.concatenate(([0], cuts[:-1]))
            hx = payload.hex().upper()
            for a, c in zip(prev.tolist(), cuts.tolist()):
                fmts.append(fmt)
                lens.append(c - a)
                hashes.append(
                    hashlib.md5(hx[2 * a:2 * c].encode()).hexdigest()
                )
        yield pd.DataFrame({
            "fmt": pd.array(fmts, dtype="string"),
            "chunk_len": pd.array(lens, dtype="int64"),
            "chunk_hash": pd.array(hashes, dtype="string"),
        })


def mm_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/backup-dedup primitive):
    a position i is a chunk boundary when the Rabin polynomial
    fingerprint of the trailing 8-byte window ≡ 0 (mod 32) — boundaries
    move WITH content, so an insertion early in a payload re-chunks only
    its neighborhood, unlike fixed-size chunking which shifts every
    later block. Chunks dedup by md5 across the corpus; output is the
    per-format dedup scorecard (distinct/total chunks, dup ratio, mean
    chunk length).

    This is the repo's one sanctioned per-byte Pandas-UDF hot path
    (DESIGN.md #36): CDC genuinely touches every byte with arithmetic
    SQL expression trees evaluate boxed-per-element, and the measured
    gap is decisive — the best closed-form SQL spelling (16 inlined
    integer multiply-adds per position) runs 7.0 s at ×16 payload
    length / 2.9 s at sf0.1, while this Arrow-batched numpy kernel
    (one sliding-window matmul per document) runs 0.9 s / 0.8 s and is
    value-IDENTICAL (verified collect-vs-collect at sf0.001 + sf0.01 on
    top of oracle parity). Still row-local: payloads cross to Python
    once, partition-parallel, and never shuffle — the only exchange is
    the final per-(fmt,chunk) groupBy, O(corpus_bytes/32) small rows.
    The DuckDB oracle evaluates the same polynomial closed-form from
    substr()/ascii() — engine-agnostic SQL needs no fold primitive."""
    from kuibadb_spark.operators.multimodal import _payloads

    p = (
        _payloads(spark, sf_dir)
        .filter("octet_length(payload) >= 8")
        .select("fmt", "payload")
    )
    chunks = p.mapInPandas(
        _cdc_chunk_batches,
        "fmt string, chunk_len long, chunk_hash string",
    )
    return (
        chunks.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("n_distinct"),
            F.sum("chunk_len").alias("total_bytes"),
        )
        .selectExpr(
            "fmt", "n_chunks", "n_distinct",
            "(n_chunks - n_distinct) * 1000000 DIV n_chunks AS dup_ppm",
            "total_bytes * 100 DIV n_chunks AS avg_len_x100",
        )
        .orderBy("fmt")
    )


QUERIES["mm_cdc_chunking"] = mm_cdc_chunking

# the same 16-term inlined-constant window sum, with hex-digit values
# read via strpos over the uppercase hex alphabet (both engines' hex()
# emit uppercase; DuckDB has no conv())
_CDC_ORACLE_SUM = " + ".join(
    f"CAST(ascii(substr(hx, 2 * i - {15 - k}, 1)) AS BIGINT)"
    f" * {_CDC_POW[k]}"
    for k in range(16)
)

ORACLES["mm_cdc_chunking"] = f"""
    WITH payloads AS (
        SELECT doc_id, encode(text) AS payload,
               CASE WHEN doc_id % 3 = 0 THEN 'png'
                    WHEN doc_id % 3 = 1 THEN 'jpeg'
                    ELSE 'wav' END AS fmt
        FROM documents
    ),
    base AS (
        SELECT doc_id, fmt, hex(payload) AS hx,
               octet_length(payload) AS n
        FROM payloads WHERE octet_length(payload) >= 8
    ),
    cuts AS (
        SELECT DISTINCT doc_id, fmt, hx, i
        FROM (
            SELECT doc_id, fmt, hx, n,
                   unnest(generate_series(8, n)) AS i
            FROM base
        )
        WHERE i = n OR ({_CDC_ORACLE_SUM}) % {_CDC_M} % {_CDC_MASK} = 0
    ),
    chunks AS (
        SELECT fmt,
               i - COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
                   AS chunk_len,
               md5(substr(hx,
                   2 * COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i),
                                0) + 1,
                   2 * (i - COALESCE(LAG(i) OVER (
                       PARTITION BY doc_id ORDER BY i), 0)))) AS chunk_hash
        FROM cuts
    )
    SELECT fmt, COUNT(*) AS n_chunks,
           COUNT(DISTINCT chunk_hash) AS n_distinct,
           CAST((COUNT(*) - COUNT(DISTINCT chunk_hash)) * 1000000 // COUNT(*)
                AS BIGINT) AS dup_ppm,
           CAST(SUM(chunk_len) * 100 // COUNT(*) AS BIGINT) AS avg_len_x100
    FROM chunks
    GROUP BY fmt
    ORDER BY fmt
"""
