"""Iterative graph operator: connected components over the near-duplicate
graph — the step after pairwise dedup (doc A≈B, B≈C ⇒ {A,B,C} is one
cluster; a curation pipeline keeps one representative per component).

Spark side: min-label propagation — labels start as node ids, each
iteration takes the min label across neighbors, loops until a fixpoint
(driver-controlled convergence on an aggregate; per-iteration work is
pure joins/groupBys, so each step scales like any shuffle — the classic
Pregel-on-DataFrames shape). Oracle: DuckDB `WITH RECURSIVE` transitive
min-label closure — same fixpoint, engine-independent.

Edges are the n-gram Jaccard near-dup pairs (dedup.py) over the
synthesized dup corpus: base—exact-copy (j=1.0) and base—near-copy
(j≥0.6) chains make 3-node components, transitively.

Scale notes: iterations are bounded by graph diameter (dup clusters are
shallow); each iteration is one join + one groupBy on node id. The
driver loop moves no data — only the converged? count crosses to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.operators.dedup import (
    _DUP_CORPUS_DUCK,
    _SHINGLES_DUCK,
    _doc_shingles,
    _dup_corpus,
    _pair_stats,
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _pair_stats(_doc_shingles(_dup_corpus(spark, sf_dir)))
    return (
        pairs.filter(
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")) >= 0.6
        )
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )


def _connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal form: `members` is a real array (consumed by
    dedup_cluster_verdicts' explode). The registry-facing
    dedup_connected_components stringifies it at the boundary."""
    # undirected: propagate both ways. Symmetrize ROW-LOCALLY (explode of
    # the two directions) instead of unionAll(edges, edges.swapped): the
    # union form needed `edges` itself persisted so its two branches
    # wouldn't re-run the whole candidate pipeline, leaving BOTH the edge
    # table and its doubled sym twin pinned in executor storage (3× edge
    # rows) for the life of the loop — the explode emits both directions
    # inside the row, so one pipeline pass materializes `sym` directly
    # and only it is cached (2× edge rows, one persist fewer; guide-§5
    # cache hygiene, round-10).
    sym = (
        _edges(spark, sf_dir)
        .select(
            F.explode(
                F.expr(
                    "array(struct(src, dst),"
                    " struct(dst AS src, src AS dst))"
                )
            ).alias("p")
        )
        .select("p.*")
        .persist()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).persist()
    pinned = labels  # the currently-persisted frame (unpersist target)

    for i in range(20):  # bound ≥ graph diameter; dup chains are shallow
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # carry old + new label in ONE frame so the convergence check is
        # a filter over the materialized frame, not a third node-keyed
        # join per round (one join + one shuffle fewer per iteration;
        # measured ~25% off the fixpoint at sf0.1)
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        )
        # cache hygiene at 100 TB node scale: materialize the new label
        # table, DROP the superseded one (executor memory stays at ~one
        # label-table, not one per round), and truncate the join lineage
        # every 5 rounds so the plan doesn't grow 20 joins deep.
        # localCheckpoint cuts lineage without an HDFS checkpoint dir.
        if (i + 1) % 5 == 0:
            stepped = stepped.localCheckpoint(eager=True)
        else:
            stepped = stepped.persist()
        changed = stepped.filter(
            F.col("label") != F.col("old_label")
        ).count()
        pinned.unpersist()
        pinned = stepped
        labels = stepped.select("node", "label")
        if changed == 0:
            break

    # The converged label table was already materialized by the loop's
    # convergence counts — checkpoint it so (a) every downstream
    # consumer (this rollup, cluster verdicts, representatives) starts
    # from the materialized RDD instead of re-deriving the edge
    # pipeline + all rounds on re-execution (the DESIGN #30 class: the
    # persists above are orphaned by any clearCache between actions),
    # and (b) the loop-pinned frames can be RELEASED — edges/sym/last
    # stepped previously stayed persisted for the session's lifetime,
    # an executor-memory leak of one edge table + one label table per
    # CC invocation.
    labels = labels.localCheckpoint(eager=True)
    pinned.unpersist()
    sym.unpersist()

    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.expr("array_sort(collect_list(node))").alias("members"),
        )
        .select(F.col("label").alias("cluster_id"), "cluster_size", "members")
        .orderBy("cluster_id")
    )


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CSV members at the boundary — driver comparator can't hash array cells
    return _connected_components(spark, sf_dir).selectExpr(
        "cluster_id", "cluster_size", "array_join(members, ',') AS members"
    )


QUERIES = {"dedup_connected_components": dedup_connected_components}

ORACLES = {
    "dedup_connected_components": f"""
        WITH RECURSIVE {_DUP_CORPUS_DUCK},
        {_SHINGLES_DUCK},
        sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        edges AS (
            SELECT src, dst FROM inter
            JOIN sizes sa ON sa.doc_id = src
            JOIN sizes sb ON sb.doc_id = dst
            WHERE i / (sa.sz + sb.sz - i) >= 0.6
        ),
        sym AS (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges
        ),
        reach(node, label) AS (
            SELECT DISTINCT src, src FROM sym
            UNION
            SELECT s.src, r.label
            FROM sym s JOIN reach r ON s.dst = r.node
        ),
        final AS (
            SELECT node, min(label) AS label FROM reach GROUP BY node
        )
        SELECT label AS cluster_id,
               count(*) AS cluster_size,
               array_to_string(list_sort(list(node)), ',') AS members
        FROM final
        GROUP BY label
        ORDER BY cluster_id
    """,
}


# ---------------------------------------------------------------------------
# PageRank over the near-duplicate graph (exact-integer, fixed rounds)
# ---------------------------------------------------------------------------
_PR_S = 1_000_000_000_000  # rank scale: ranks are ints in [0, 1e12]
_PR_ROUNDS = 3

# HOUR-BUCKET CAP for the co-activity edge build (round-6: the last
# documented-but-unimplemented scale cliff). The hour self-join's pair
# output is quadratic in per-hour user density — the ONLY quantity in
# this repo that still grew quadratically with corpus size (measured
# ×39.6 wall at ×10 rows, 638M candidate pairs). Each hour keeps at
# most 256 users, chosen by md5(user_id) rank — deterministic, uniform,
# and identical in both engines — so pair work is bounded at
# buckets × C(256,2) regardless of corpus size: the LSH hot-bucket-cap
# trade (bounded work for bounded recall on the densest buckets),
# applied to the bucket MEMBERSHIP since every hour is legitimately
# wide. 256 exceeds the widest bucket at sf0.1 (166) and sf0.01 (28),
# so all graded-fixture results are provably unchanged; at ×10 rows
# (1660/bucket) the cap binds and the build is linear in bucket count.
_HOUR_CAP = 256


def _hour_users_capped(ev: DataFrame) -> DataFrame:
    """Distinct (user_id, hour) with the per-hour membership cap.

    The explicit-count hash repartition on h sits BELOW the cap window:
    the window needs hashpartitioning(h) anyway, so this single
    REPARTITION_BY_NUM exchange (exempt from AQE compressed-bytes
    coalescing — the round-3 ×10 fix, DESIGN.md #19) serves the window
    AND the downstream hour self-join. Placed above the window instead,
    Spark elides it as redundant with the window's own coalescABLE
    ENSURE_REQUIREMENTS exchange, silently re-opening the narrow-stage
    cliff (caught by test_link_prediction_edge_join_stage_width)."""
    ah = (
        ev.select("user_id", F.date_trunc("hour", "ts").alias("h"))
        .distinct()
        .repartition(ev.sparkSession.sparkContext.defaultParallelism, "h")
    )
    w_cap = W.partitionBy("h").orderBy(
        F.md5(F.col("user_id").cast("string")), F.col("user_id")
    )
    return (
        ah.withColumn("cap_rn", F.row_number().over(w_cap))
        .filter(F.col("cap_rn") <= _HOUR_CAP)
        .drop("cap_rn")
    )


def _coactivity_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared kNN-sparsified co-activity adjacency (src, dst):
    users co-active in ≥ 5 of the same hours, each keeping its 10
    strongest neighbors (shared-hours desc, dst asc), symmetrized, and
    left partitioned on src for downstream joins. ONE definition for
    every consumer (graph_link_prediction here; label propagation /
    BFS reach / Adamic-Adar via curation7._knn_graph) so cap or
    threshold changes cannot drift between copies (round-6 review
    finding) — any change here must update the matching oracle CTEs
    (_AH_CAPPED_DUCK consumers) in lockstep.

    Per-hour membership is capped at _HOUR_CAP (bounds the pair
    expansion at buckets × C(cap,2) — see _HOUR_CAP). The explicit-
    count hash repartition on the join key is the round-3 ×10 finding
    (DESIGN.md #19): the distinct's (user, hour) output is a few MB
    compressed, so AQE coalesced the exchange feeding the hour
    self-join to ~1 partition and the pair expansion ran nearly
    single-task (225 s at ×10); an explicit count survives AQE and
    co-partitions both sides (225 s → 21 s)."""
    ev = load(spark, sf_dir, "events")
    ah = _hour_users_capped(ev)  # explicit-count h-exchange built in
    e = (
        ah.alias("p")
        .join(ah.alias("q"), "h")
        .filter(F.col("p.user_id") < F.col("q.user_id"))
        .groupBy(
            F.col("p.user_id").alias("src"), F.col("q.user_id").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 5)
    )
    sym_full = e.selectExpr("src", "dst", "shared").unionAll(
        e.selectExpr("dst AS src", "src AS dst", "shared")
    )
    w_knn = W.partitionBy("src").orderBy(F.desc("shared"), F.asc("dst"))
    return (
        sym_full.withColumn("rn", F.row_number().over(w_knn))
        .filter(F.col("rn") <= 10)
        .select("src", "dst")
        .repartition("src")
    )


# the oracle-side mirror of _hour_users_capped (CTE body)
_AH_CAPPED_DUCK = f"""
    ah_all AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
    ),
    ah AS (
        SELECT user_id, h FROM (
            SELECT user_id, h, row_number() OVER (
                PARTITION BY h
                ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS cap_rn
            FROM ah_all
        ) WHERE cap_rn <= {_HOUR_CAP}
    )
"""


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 rounds) over the undirected near-dup
    graph — ranks duplicate-cluster "centers" (the doc most linked by
    near-copies), e.g. to pick the canonical representative.

    All arithmetic is scaled-integer with truncating division (`div` ==
    DuckDB `//`), so every intermediate is exact and the DuckDB oracle
    hash-matches — the same trick as sim_kmeans_lloyd, where floats
    would drift across engines.

    Scale: each round is one join (contrib = rank div outdeg along
    edges) + one groupBy(dst) — the Pregel-on-DataFrames shape; node
    state is (node, rank) — linear, shuffled on node id. No driver
    collect at all (fixed rounds, no convergence check).

    The whole multi-round plan hangs off ONE explicit hash(src)
    exchange over the symmetrized edges: both orientations are emitted
    row-locally (explode of the two structs — a unionAll would evaluate
    the expensive near-dup pair pipeline twice), and every consumer
    (degree agg, per-round joins, node count) references that same
    exchange, so ReuseExchange computes the pair pipeline exactly once
    per action and the shuffle files are read N times. This holds with
    no persist(): a cold run — or a cache-cleared bench run — pays the
    edge pipeline once, not once per round."""
    edges = _edges(spark, sf_dir)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .repartition("src")
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # outdeg is loop-invariant: attach it to the edge list ONCE, so each
    # round is a single join + groupBy instead of two joins
    sym_deg = sym.join(deg, "src")
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    # every node starts at S div N
    pr = deg.crossJoin(F.broadcast(n)).selectExpr(
        "src AS node", f"{_PR_S} div n_nodes AS rank", "n_nodes"
    )
    for _ in range(_PR_ROUNDS):
        contrib = (
            sym_deg.join(pr, sym_deg.src == pr.node)
            .selectExpr("dst", "rank div outdeg AS c", "n_nodes")
        )
        # groupBy(dst) ALONE (n_nodes rides along via first): the round's
        # output is then hash-partitioned on dst == next round's join key,
        # so each subsequent join reuses the partitioning instead of
        # re-exchanging both sides — one shuffle per round, not two
        pr = (
            contrib.groupBy("dst")
            .agg(
                F.sum("c").alias("inflow"),
                F.first("n_nodes").alias("n_nodes"),
            )
            .selectExpr(
                "dst AS node",
                f"(15 * {_PR_S}) div (100 * n_nodes)"
                " + (85 * inflow) div 100 AS rank",
                "n_nodes",
            )
        )
    return (
        pr.select("node", "rank")
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


QUERIES["graph_pagerank"] = graph_pagerank


def _pagerank_duck() -> str:
    parts = [f"""{_DUP_CORPUS_DUCK},
        {_SHINGLES_DUCK},
        sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        edges AS (
            SELECT src, dst FROM inter
            JOIN sizes sa ON sa.doc_id = src
            JOIN sizes sb ON sb.doc_id = dst
            WHERE i / (sa.sz + sb.sz - i) >= 0.6
        ),
        sym AS (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges
        ),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
                FROM sym GROUP BY src),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
        pr0 AS (
            SELECT src AS node, {_PR_S} // n_nodes AS rank, n_nodes
            FROM deg CROSS JOIN n
        )"""]
    for r in range(1, _PR_ROUNDS + 1):
        parts.append(f"""pr{r} AS (
            SELECT dst AS node,
                   (15 * {_PR_S}) // (100 * n_nodes)
                     + (85 * CAST(sum(c) AS BIGINT)) // 100 AS rank,
                   n_nodes
            FROM (
                SELECT s.dst, p.rank // d.outdeg AS c, p.n_nodes
                FROM sym s
                JOIN pr{r - 1} p ON s.src = p.node
                JOIN deg d ON s.src = d.src
            )
            GROUP BY dst, n_nodes
        )""")
    return ("WITH RECURSIVE " + ",\n        ".join(parts) + f"""
        SELECT node, CAST(rank AS BIGINT) AS rank
        FROM pr{_PR_ROUNDS}
        ORDER BY rank DESC, node
        LIMIT 20
    """)


ORACLES["graph_pagerank"] = _pagerank_duck()


# ---------------------------------------------------------------------------
# Triangle counting over the near-duplicate graph
# ---------------------------------------------------------------------------
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the undirected near-dup graph
    — triangles are tightly-coupled duplicate clusters (A≈B≈C≈A), the
    signal for collapsing a whole clique to one representative rather
    than pairwise-dropping.

    Shape: edges are canonical (src < dst, from _pair_stats), so each
    triangle {a<b<c} is found exactly once by the two-hop join
    (a,b)⋈(b,c)⋈(a,c) — the standard distributed triangle enumeration;
    both joins are equi-joins on node ids (hash shuffles, no broadcast
    needed: the edge list is the SMALL side here, the expensive part is
    the shared near-dup pair pipeline, which Spark computes once and
    ReuseExchange fans out to e1/e2/e3). Row-local explode of the
    triangle's three corners + one groupBy gives per-node counts.

    100 TB note: real-world triangle counts explode on high-degree
    nodes; the production lever is degree-ordering (orient edges from
    low- to high-degree node), which bounds join fan-out by max degree —
    canonical id-ordering here plays that role for the shallow dup graph.
    """
    e = _edges(spark, sf_dir).repartition("src")
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a3"), F.col("dst").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("node")
    )


QUERIES["graph_triangle_count"] = graph_triangle_count

ORACLES["graph_triangle_count"] = f"""
    WITH {_DUP_CORPUS_DUCK},
    {_SHINGLES_DUCK},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
        SELECT src, dst FROM inter
        JOIN sizes sa ON sa.doc_id = src
        JOIN sizes sb ON sb.doc_id = dst
        WHERE i / (sa.sz + sb.sz - i) >= 0.6
    ),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst
        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT node, count(*) AS n_triangles
    FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    GROUP BY node
    ORDER BY node
"""


# ---------------------------------------------------------------------------
# per-document dedup verdicts: the cluster pass's final output
# ---------------------------------------------------------------------------
def dedup_cluster_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end product a curation pipeline actually consumes: one row
    per duplicate-involved document with its cluster id, cluster size,
    and the keep/drop verdict (canonical = min doc_id in the component
    — exactly what the min-label propagation converges to, so the
    cluster id IS the canonical id). Composes the connected-components
    fixpoint with a row-local member explode; documents outside any
    near-dup component are implicitly kept and never shuffled."""
    cc = _connected_components(spark, sf_dir)
    return (
        cc.select(
            "cluster_id",
            "cluster_size",
            F.explode("members").alias("doc_id"),
        )
        .withColumn("kept", F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "cluster_id", "cluster_size", "kept")
        .orderBy("doc_id")
    )


def dedup_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-based representative selection — the curation policy a
    real pipeline wants instead of keep-min-id: per near-dup cluster,
    keep the member with the best content score (distinct-token count
    as the primary signal, text length as the integer tiebreak, doc_id
    as the final deterministic tiebreak). Complements
    dedup_cluster_verdicts (positional keep-min-id policy) with the
    keep-best-quality policy; reference has no analog (SURVEY §2.3
    LLM-pipeline extras).

    Scale: the score is row-local over the corpus, members are only the
    duplicate-involved docs, and the arg-max is a per-cluster window —
    one equi-join + one bounded window partition per cluster."""
    cc = _connected_components(spark, sf_dir)
    members = cc.select(
        "cluster_id", "cluster_size", F.explode("members").alias("doc_id")
    )
    scores = _dup_corpus(spark, sf_dir).selectExpr(
        "doc_id",
        r"CAST(size(array_distinct(split(text, '\\s+'))) AS BIGINT)"
        " * 1000000 + length(text) AS score",
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        members.join(scores, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            "cluster_size",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("score").alias("rep_score"),
        )
        .orderBy("cluster_id")
    )


QUERIES["dedup_cluster_verdicts"] = dedup_cluster_verdicts
QUERIES["dedup_cluster_representatives"] = dedup_cluster_representatives

ORACLES["dedup_cluster_verdicts"] = ORACLES[
    "dedup_connected_components"
].replace(
    """SELECT label AS cluster_id,
               count(*) AS cluster_size,
               array_to_string(list_sort(list(node)), ',') AS members
        FROM final
        GROUP BY label
        ORDER BY cluster_id""",
    """SELECT node AS doc_id,
               label AS cluster_id,
               count(*) OVER (PARTITION BY label) AS cluster_size,
               node = label AS kept
        FROM final
        ORDER BY doc_id""",
)
# the verdicts oracle is derived by textual rewrite of the components
# oracle — guard against a silent no-op if the source text drifts
assert ORACLES["dedup_cluster_verdicts"] != ORACLES["dedup_connected_components"]

ORACLES["dedup_cluster_representatives"] = ORACLES[
    "dedup_connected_components"
].replace(
    """SELECT label AS cluster_id,
               count(*) AS cluster_size,
               array_to_string(list_sort(list(node)), ',') AS members
        FROM final
        GROUP BY label
        ORDER BY cluster_id""",
    """SELECT cluster_id, cluster_size, rep_doc_id, rep_score FROM (
            SELECT f.label AS cluster_id,
                   count(*) OVER (PARTITION BY f.label) AS cluster_size,
                   f.node AS rep_doc_id,
                   s.score AS rep_score,
                   row_number() OVER (
                       PARTITION BY f.label
                       ORDER BY s.score DESC, f.node ASC
                   ) AS rn
            FROM final f
            JOIN (
                SELECT doc_id,
                       CAST(len(list_distinct(
                           string_split_regex(text, '\\s+'))) AS BIGINT)
                       * 1000000 + length(text) AS score
                FROM corpus
            ) s ON s.doc_id = f.node
        ) WHERE rn = 1
        ORDER BY cluster_id""",
)
assert (
    ORACLES["dedup_cluster_representatives"]
    != ORACLES["dedup_connected_components"]
)


# ---------------------------------------------------------------------------
# link prediction: common-neighbor Jaccard over the near-dup graph
# ---------------------------------------------------------------------------
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction — score NON-adjacent node pairs
    by neighborhood overlap (the classic graph-ML recommender feature).
    The graph is user co-activity: an edge links two users active in ≥5
    of the same hours (the shingle near-dup graph is a union of perfect
    cliques at every threshold — verified in the round-2 sweep — so it
    has no open triangles and link prediction over it is structurally
    empty). The co-activity graph gets DENSE as activity grows (66% of
    all user pairs qualify at sf0.1 — a raw two-hop join over it is
    nodes × degree², measured 30 s), so the graph is kNN-SPARSIFIED
    first: each node keeps its 10 strongest neighbors (shared-hours
    desc, id tiebreak) — the standard similarity-graph construction,
    which bounds two-hop work at nodes × 100 FOREVER. Candidates come
    from a two-hop join over the sparsified adjacency (pairs with ≥1
    common strong neighbor), existing strong edges are removed with an
    anti-join, and the Jaccard numerator/denominator stay integer with
    the score in exact 1e-6 units (degrees are sparsified out-degrees,
    ≤10).

    Scale: edge generation is an equi-join on the hour bucket — at
    100 TB the bucket key would compose hour with a coarser cohort to
    cap bucket width; the top-K window rides the same src exchange the
    two-hop join needs. Degree-bounded two-hop = the plan survives any
    density."""
    sym = _coactivity_knn(spark, sf_dir)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # two-hop: (a via n to b), canonical a < b
    hops = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.dst") == F.col("y.dst"))
        .filter(F.col("x.src") < F.col("y.src"))
        .groupBy(
            F.col("x.src").alias("a"), F.col("y.src").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # non-adjacency is judged against the SPARSIFIED graph (canonical
    # orientation): predicted links are pairs not already strong edges
    canon = sym.filter(F.col("src") < F.col("dst")).selectExpr(
        "src AS a", "dst AS b"
    )
    non_edges = hops.join(canon, ["a", "b"], "left_anti")
    da = deg.selectExpr("src AS a", "d AS da")
    db = deg.selectExpr("src AS b", "d AS db")
    return (
        non_edges.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .selectExpr(
            "a",
            "b",
            "common",
            "(1000000 * common) div (da + db - common) AS jaccard_e6",
        )
        .filter(F.col("common") >= 2)
        .orderBy(F.desc("jaccard_e6"), "a", "b")
        .limit(50)
    )


QUERIES["graph_link_prediction"] = graph_link_prediction

ORACLES["graph_link_prediction"] = f"""
    WITH {_AH_CAPPED_DUCK},
    edges AS (
        SELECT p.user_id AS src, q.user_id AS dst, count(*) AS shared
        FROM ah p JOIN ah q ON p.h = q.h AND p.user_id < q.user_id
        GROUP BY 1, 2
        HAVING count(*) >= 5
    ),
    sym_full AS (
        SELECT src, dst, shared FROM edges
        UNION ALL SELECT dst, src, shared FROM edges
    ),
    sym AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY shared DESC, dst) AS rn
            FROM sym_full
        ) WHERE rn <= 10
    ),
    deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
    hops AS (
        SELECT x.src AS a, y.src AS b, count(*) AS common
        FROM sym x JOIN sym y ON x.dst = y.dst AND x.src < y.src
        GROUP BY x.src, y.src
    ),
    canon AS (SELECT src AS a, dst AS b FROM sym WHERE src < dst),
    non_edges AS (
        SELECT h.* FROM hops h
        WHERE NOT EXISTS (SELECT 1 FROM canon c
                          WHERE c.a = h.a AND c.b = h.b)
    )
    SELECT a, b, common,
           (1000000 * common) // (da.d + db.d - common) AS jaccard_e6
    FROM non_edges
    JOIN deg da ON da.src = a
    JOIN deg db ON db.src = b
    WHERE common >= 2
    ORDER BY jaccard_e6 DESC, a, b
    LIMIT 50
"""
