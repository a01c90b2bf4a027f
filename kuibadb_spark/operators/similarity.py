"""Similarity search over `embeddings.embedding` (array<float>, 64-dim) —
the north-star ANN surface (SURVEY.md §2.3 'LLM-pipeline extras').

Three tiers, ordered by scale:

- sim_topk_bruteforce : exact cosine top-k per query — O(Q·N) dot
  products; the correctness baseline every ANN variant is judged against.
- sim_lsh_hyperplane  : random-hyperplane (SRP) LSH — 8 signed
  projections → 256 buckets; candidates = bucket equi-join, exact cosine
  re-rank inside buckets. The planes are seed-42 literals shared with the
  oracle, so both engines build the identical index.
- sim_ann_ivf         : IVF — centroids computed in-engine (elementwise
  mean per cell seed = label), every vector assigned to its nearest
  centroid, queries probe the 2 nearest cells, exact re-rank inside.

Scale notes (100 TB): brute force distributes as a broadcast of the
query set against a partitioned corpus (Q small); LSH/IVF replace the
full scan with an equi-join on bucket/cell id — the shuffle is on the
index key, and within-bucket work is quadratic only in bucket size.
Dot products run as JVM higher-order functions (aggregate/zip_with),
not Python UDFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load

_DIM = 64
_N_PLANES = 8
_rng = np.random.default_rng(42)
_PLANES = np.round(_rng.standard_normal((_N_PLANES, _DIM)), 6)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "embeddings")
        .selectExpr(
            "vec_id",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
            "label",
        )
        .withColumn(
            "norm", F.expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))")
        )
    )


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


# ---------------------------------------------------------------------------
# 1. exact brute-force cosine top-k (baseline)
# ---------------------------------------------------------------------------
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    pairs = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", F.round(_dot("qv", "v") / (F.col("qn") * F.col("norm")), 6))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos")
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# 2. random-hyperplane LSH: signed projections → bucket join → re-rank
# ---------------------------------------------------------------------------
def _plane_array_spark(j: int) -> str:
    vals = ", ".join(f"{x}D" for x in _PLANES[j])
    return f"array({vals})"


def _plane_array_duck(j: int) -> str:
    vals = ", ".join(str(x) for x in _PLANES[j])
    return f"[{vals}]"


def _bucket_expr_spark() -> str:
    bits = " + ".join(
        f"(CASE WHEN aggregate(zip_with(v, {_plane_array_spark(j)}, (x, y) -> x * y),"
        f" 0D, (acc, x) -> acc + x) >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_N_PLANES)
    )
    return f"({bits})"


def _bucket_expr_duck() -> str:
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_array_duck(j)}) >= 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(_N_PLANES)
    )
    return f"({bits})"


def sim_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).withColumn("bucket", F.expr(_bucket_expr_spark()))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("norm").alias("qn"), F.col("bucket").alias("qb"),
    )
    pairs = (
        F.broadcast(q)
        .join(e, (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("q_id")))
        .withColumn("cos", F.round(_dot("qv", "v") / (F.col("qn") * F.col("norm")), 6))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos")
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# 3. IVF: in-engine centroids, nearest-cell assignment, nprobe=2 search
# ---------------------------------------------------------------------------
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    # centroids: elementwise mean per cell (cell seed = label); assembled
    # deterministically by sorting (idx, mean) structs — no collect_list order
    expl = e.select(
        "label", F.posexplode("v").alias("idx", "x")
    )
    cent = (
        expl.groupBy("label", "idx")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(idx, m))), s -> s.m)"
            ).alias("cv")
        )
        .select(
            F.col("label").alias("cell"),
            "cv",
            F.expr("sqrt(aggregate(cv, 0D, (acc, x) -> acc + x * x))").alias("cn"),
        )
    )
    # assign every vector to its nearest centroid by cosine
    from pyspark.sql import Window as W

    vc = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("csim", _dot("v", "cv") / (F.col("norm") * F.col("cn")))
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    assigned = (
        vc.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "norm", "cell")
    )
    # queries probe their 2 nearest cells
    q = e.filter(F.col("vec_id") < 10)
    qc = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("csim", _dot("v", "cv") / (F.col("norm") * F.col("cn")))
    )
    w_probe = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 2)
        .select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
            F.col("norm").alias("qn"), "cell",
        )
    )
    # exact re-rank inside probed cells
    pairs = (
        F.broadcast(probes)
        .join(assigned, (probes.cell == assigned.cell) & (F.col("vec_id") != F.col("q_id")))
        .withColumn("cos", F.round(_dot("qv", "v") / (F.col("qn") * F.col("norm")), 6))
    )
    w_rank = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos")
        .orderBy("q_id", "rank")
    )


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_lsh_hyperplane": sim_lsh_hyperplane,
    "sim_ann_ivf": sim_ann_ivf,
}

_EMB_DUCK = """
    emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS norm
        FROM embeddings
    )
"""

ORACLES = {
    "sim_topk_bruteforce": f"""
        WITH {_EMB_DUCK},
        q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM emb WHERE vec_id < 10),
        pairs AS (
            SELECT q_id, e.vec_id AS neighbor_id,
                   round(list_dot_product(qv, e.v) / (qn * e.norm), 6) AS cos
            FROM q JOIN emb e ON e.vec_id <> q.q_id
        )
        SELECT q_id, neighbor_id, rank, cos FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM pairs)
        WHERE rank <= 5
        ORDER BY q_id, rank
    """,
    "sim_lsh_hyperplane": f"""
        WITH {_EMB_DUCK},
        bucketed AS (
            SELECT vec_id, v, norm, {_bucket_expr_duck()} AS bucket FROM emb
        ),
        q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn, bucket AS qb
              FROM bucketed WHERE vec_id < 20),
        pairs AS (
            SELECT q_id, e.vec_id AS neighbor_id,
                   round(list_dot_product(qv, e.v) / (qn * e.norm), 6) AS cos
            FROM q JOIN bucketed e
              ON e.bucket = q.qb AND e.vec_id <> q.q_id
        )
        SELECT q_id, neighbor_id, rank, cos FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM pairs)
        WHERE rank <= 3
        ORDER BY q_id, rank
    """,
    "sim_ann_ivf": f"""
        WITH {_EMB_DUCK},
        expl AS (
            SELECT label, generate_subscripts(v, 1) AS idx, unnest(v) AS x
            FROM emb
        ),
        cent AS (
            SELECT label AS cell,
                   list(m ORDER BY idx) AS cv
            FROM (SELECT label, idx, avg(x) AS m FROM expl GROUP BY label, idx)
            GROUP BY label
        ),
        cent_n AS (
            SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent
        ),
        assigned AS (
            SELECT vec_id, v, norm, cell FROM (
                SELECT e.vec_id, e.v, e.norm, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_dot_product(e.v, c.cv) / (e.norm * c.cn)
                               DESC, c.cell ASC) AS rn
                FROM emb e CROSS JOIN cent_n c)
            WHERE rn = 1
        ),
        probes AS (
            SELECT q_id, qv, qn, cell FROM (
                SELECT e.vec_id AS q_id, e.v AS qv, e.norm AS qn, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_dot_product(e.v, c.cv) / (e.norm * c.cn)
                               DESC, c.cell ASC) AS rn
                FROM emb e CROSS JOIN cent_n c
                WHERE e.vec_id < 10)
            WHERE rn <= 2
        ),
        pairs AS (
            SELECT q_id, a.vec_id AS neighbor_id,
                   round(list_dot_product(qv, a.v) / (qn * a.norm), 6) AS cos
            FROM probes p JOIN assigned a
              ON a.cell = p.cell AND a.vec_id <> p.q_id
        )
        SELECT q_id, neighbor_id, rank, cos FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM pairs)
        WHERE rank <= 3
        ORDER BY q_id, rank
    """,
}


# ---------------------------------------------------------------------------
# 4. k-means (Lloyd's) over embeddings — iterative clustering
# ---------------------------------------------------------------------------
_K = 4
_ROUNDS = 3  # assignment rounds; centroid updates after rounds 1 and 2
_SCALE = 1_000_000  # coordinates → exact integers (floor(x * 1e6))


def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, K=4, deterministic init (vectors 0..3), exactly
    3 assignment rounds — the canonical iterative-refinement algorithm
    (reference has no iterative ops; this is the LLM-pipeline extra the
    blueprint adds, SURVEY.md §2.3).

    Cross-engine determinism: coordinates become EXACT integers
    (floor(x·1e6) as BIGINT) so centroid sums are order-independent;
    distances are sequential left-fold doubles over identical integer
    inputs, bit-identical in Spark and DuckDB; argmin ties break on
    min cid via (min dist → min cid), not arg_min.

    Scale: assignment is a broadcast cross join against K=4 centroids
    (K·64 ints — trivially broadcastable at any corpus size); the update
    is one partial-aggregated groupBy per round. The per-round driver
    collect is K rows — the standard Lloyd's loop shape (MLlib does the
    same); corpus never leaves the executors.
    """
    vec = (
        load(spark, sf_dir, "embeddings")
        .selectExpr(
            "vec_id",
            f"transform(embedding, x -> bigint(floor(x * {_SCALE}D))) AS xi",
            "label",
        )
        .persist()
    )
    sums = [F.sum(F.expr(f"xi[{d}]")).alias(f"s{d}") for d in range(_DIM)]
    cent = vec.filter(F.col("vec_id") < _K).selectExpr(
        "int(vec_id) AS cid", "1L AS n", "xi AS s"
    )
    best = None
    for r in range(_ROUNDS):
        # K rows of 64 ints — literal re-broadcast each round keeps the
        # plan flat (no 3-round lineage explosion)
        cdf = spark.createDataFrame(
            [(row["cid"], row["n"], row["s"]) for row in cent.collect()],
            "cid INT, n BIGINT, s ARRAY<BIGINT>",
        )
        dist = vec.crossJoin(F.broadcast(cdf)).withColumn(
            "dist",
            F.expr(
                "aggregate(zip_with(xi, s, (x, m) -> (x - m / n) * (x - m / n)),"
                " 0D, (acc, t) -> acc + t)"
            ),
        )
        mind = dist.groupBy("vec_id").agg(F.min("dist").alias("md"))
        best = (
            dist.join(mind, "vec_id")
            .filter("dist = md")
            .groupBy("vec_id")
            .agg(F.min("cid").alias("cid"))
        )
        if r < _ROUNDS - 1:
            cent = (
                best.join(vec, "vec_id")
                .groupBy("cid")
                .agg(F.count(F.lit(1)).alias("n"), *sums)
                .selectExpr(
                    "cid", "n",
                    "array(" + ",".join(f"s{d}" for d in range(_DIM)) + ") AS s",
                )
            )
    return (
        best.join(vec, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("first_member"))
        .select(F.col("cid").alias("cluster_id"), "label", "n_vecs", "first_member")
        .orderBy("cluster_id", "label")
    )


def _kmeans_duck() -> str:
    """Generate the mirrored fixed-3-round Lloyd's as chained CTEs."""
    s_list = ", ".join(
        f"CAST(sum(v.xi[{d}]) AS BIGINT)" for d in range(1, _DIM + 1)
    )
    parts = [
        f"""vec AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(floor(x * {_SCALE}) AS BIGINT)) AS xi,
                   label
            FROM embeddings
        ),
        cent0 AS (
            SELECT CAST(vec_id AS INTEGER) AS cid, CAST(1 AS BIGINT) AS n,
                   xi AS s
            FROM vec WHERE vec_id < {_K}
        )"""
    ]
    for r in range(1, _ROUNDS + 1):
        parts.append(f"""dist{r} AS (
            SELECT v.vec_id, c.cid,
                   list_reduce(list_transform(range(1, {_DIM + 1}),
                       d -> (v.xi[d] - c.s[d] / c.n) * (v.xi[d] - c.s[d] / c.n)),
                       (a, b) -> a + b) AS dist
            FROM vec v CROSS JOIN cent{r - 1} c
        ),
        mind{r} AS (SELECT vec_id, min(dist) AS md FROM dist{r} GROUP BY vec_id),
        asn{r} AS (
            SELECT d.vec_id, min(d.cid) AS cid
            FROM dist{r} d JOIN mind{r} m
              ON d.vec_id = m.vec_id AND d.dist = m.md
            GROUP BY d.vec_id
        )""")
        if r < _ROUNDS:
            parts.append(f"""cent{r} AS (
            SELECT a.cid, CAST(count(*) AS BIGINT) AS n, [{s_list}] AS s
            FROM asn{r} a JOIN vec v ON v.vec_id = a.vec_id
            GROUP BY a.cid
        )""")
    return (
        "WITH " + ",\n        ".join(parts) + f"""
        SELECT a.cid AS cluster_id, v.label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               min(v.vec_id) AS first_member
        FROM asn{_ROUNDS} a JOIN vec v ON v.vec_id = a.vec_id
        GROUP BY a.cid, v.label
        ORDER BY cluster_id, label
    """)


QUERIES["sim_kmeans_lloyd"] = sim_kmeans_lloyd
ORACLES["sim_kmeans_lloyd"] = _kmeans_duck()


# ---------------------------------------------------------------------------
# 4. product quantization (PQ) + asymmetric-distance ANN
# ---------------------------------------------------------------------------
_PQ_M = 8  # subspaces (64 dims / 8 per sub)
_PQ_SUB = _DIM // _PQ_M
_PQ_K = 16  # centroids per subspace
_PQ_SCALE = 1_000_000  # fixed-point grid: exact integer L2 in both engines


def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI 2011): each vector is
    compressed to m=8 one-byte codes (nearest of 16 centroids per 8-dim
    subspace); queries compute a 8×16 distance table against the
    codebooks and score every database vector by table lookups only —
    the asymmetric distance computation (ADC) that makes billion-vector
    search memory-resident (8 bytes/vector here vs 256 for the raw
    floats).

    Determinism/parity: vectors land on a fixed-point integer grid
    (floor(x·1e6 + 0.5) — identical IEEE ops in both engines), codebooks
    are the subvectors of vec_id < 16 (training-free seeding; swap in
    sim_kmeans_lloyd per subspace for trained codebooks), so every
    distance is an exact BIGINT and code assignment ties break on
    centroid id via struct-min.

    Scale shape: codebooks are m×k=128 tiny rows → broadcast both to the
    encode join and the query distance-table join; encoding is one
    groupBy(vec_id, subspace) argmin; ADC is an equi-join on
    (subspace, code) — hash shuffle on a 2-int key — plus a
    per-query top-k. Nothing is quadratic in the corpus; the only
    corpus-wide state is the 8-code row per vector.
    """
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr(
            f"transform(v, x -> CAST(floor(x * {_PQ_SCALE}D + 0.5D) AS BIGINT))"
        ).alias("xi"),
    )
    js = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("j")
    sub = e.select("vec_id", "xi", js).selectExpr(
        "vec_id", "j", f"slice(xi, j * {_PQ_SUB} + 1, {_PQ_SUB}) AS sv"
    )
    cent = (
        e.filter(F.col("vec_id") < _PQ_K)
        .select(F.col("vec_id").alias("c"), "xi", js)
        .selectExpr("j", "c", f"slice(xi, j * {_PQ_SUB} + 1, {_PQ_SUB}) AS cw")
    )
    l2 = (
        "aggregate(zip_with(sv, cw, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, x) -> acc + x)"
    )
    dists = sub.join(F.broadcast(cent), "j").selectExpr(
        "vec_id", "j", "c", f"{l2} AS dist"
    )
    codes = (
        dists.groupBy("vec_id", "j")
        .agg(F.min(F.struct("dist", "c")).alias("b"))
        .selectExpr("vec_id", "j", "b.c AS code")
    )
    dt = dists.filter(F.col("vec_id") < 5).selectExpr(
        "vec_id AS qid", "j", "c", "dist"
    )
    adc = (
        codes.alias("cd")
        .join(
            F.broadcast(dt).alias("q"),
            (F.col("cd.j") == F.col("q.j")) & (F.col("cd.code") == F.col("q.c")),
        )
        .filter(F.col("cd.vec_id") != F.col("q.qid"))
        .groupBy(
            F.col("q.qid").alias("qid"), F.col("cd.vec_id").alias("vec_id")
        )
        .agg(F.sum("q.dist").alias("adist"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy("adist", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "rank", "vec_id", "adist")
        .orderBy("qid", "rank")
    )


QUERIES["sim_ann_pq"] = sim_ann_pq

ORACLES["sim_ann_pq"] = f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * {_PQ_SCALE} + 0.5)
                        AS BIGINT)) AS xi
        FROM embeddings
    ),
    js AS (SELECT unnest(range(0, {_PQ_M})) AS j),
    sub AS (
        SELECT vec_id, j,
               xi[j * {_PQ_SUB} + 1 : j * {_PQ_SUB} + {_PQ_SUB}] AS sv
        FROM e CROSS JOIN js
    ),
    cent AS (
        SELECT j, vec_id AS c,
               xi[j * {_PQ_SUB} + 1 : j * {_PQ_SUB} + {_PQ_SUB}] AS cw
        FROM e CROSS JOIN js
        WHERE vec_id < {_PQ_K}
    ),
    dists AS (
        SELECT s.vec_id, s.j, c.c,
               CAST(list_sum(list_transform(
                   generate_series(1, {_PQ_SUB}),
                   i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i])))
                   AS BIGINT) AS dist
        FROM sub s JOIN cent c ON c.j = s.j
    ),
    codes AS (
        SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY dist, c) AS rn
            FROM dists
        ) WHERE rn = 1
    ),
    dt AS (
        SELECT vec_id AS qid, j, c, dist FROM dists WHERE vec_id < 5
    ),
    adc AS (
        SELECT dt.qid, codes.vec_id, CAST(sum(dt.dist) AS BIGINT) AS adist
        FROM codes
        JOIN dt ON dt.j = codes.j AND dt.c = codes.code
        WHERE codes.vec_id <> dt.qid
        GROUP BY dt.qid, codes.vec_id
    )
    SELECT qid, rank, vec_id, adist FROM (
        SELECT qid, vec_id, adist,
               CAST(row_number() OVER (PARTITION BY qid
                                  ORDER BY adist, vec_id) AS INTEGER) AS rank
        FROM adc
    ) WHERE rank <= 10
    ORDER BY qid, rank
"""


# ---------------------------------------------------------------------------
# 5. k-NN label classification (embedding majority vote)
# ---------------------------------------------------------------------------
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding space: vec_id < 20 are the
    'unlabeled' queries, the rest is the labeled reference set; each
    query takes the majority label of its 5 nearest neighbors by cosine
    (rounded to 1e-6 — identical IEEE arithmetic in both engines — with
    vec_id as the total tie-break), ties on votes broken by smaller
    label. Emits the predicted label, the vote count, and whether the
    prediction agrees with the query's actual label (top-1 'accuracy'
    bit, aggregatable downstream).

    Scale shape: identical to sim_topk_bruteforce — broadcast the query
    block against the partitioned reference set; swap the inner scan for
    the LSH/IVF/PQ candidate joins above when the reference set is the
    100 TB side."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    ref = e.filter(F.col("vec_id") >= 20)
    pairs = F.broadcast(q).join(ref, F.lit(True)).withColumn(
        "cos", F.round(_dot("qv", "v") / (F.col("qn") * F.col("norm")), 6)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    votes = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .groupBy("q_id", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w2 = W.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("vr", F.row_number().over(w2))
        .filter(F.col("vr") == 1)
        .select(
            "q_id",
            F.col("label").alias("predicted_label"),
            "votes",
            "true_label",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("q_id")
    )


QUERIES["sim_knn_classify"] = sim_knn_classify

ORACLES["sim_knn_classify"] = """
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    normed AS (
        SELECT vec_id, label, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    ),
    pairs AS (
        SELECT q.vec_id AS q_id, q.label AS true_label,
               r.vec_id, r.label,
               round(list_sum(list_transform(generate_series(1, 64),
                         i -> q.v[i] * r.v[i])) / (q.nrm * r.nrm), 6) AS cos
        FROM normed q, normed r
        WHERE q.vec_id < 20 AND r.vec_id >= 20
    ),
    top5 AS (
        SELECT q_id, true_label, label FROM (
            SELECT q_id, true_label, label,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rank
            FROM pairs
        ) WHERE rank <= 5
    ),
    votes AS (
        SELECT q_id, true_label, label, count(*) AS votes
        FROM top5 GROUP BY q_id, true_label, label
    )
    SELECT q_id, label AS predicted_label, votes, true_label,
           label = true_label AS correct
    FROM (
        SELECT q_id, true_label, label, votes,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY votes DESC, label) AS vr
        FROM votes
    )
    WHERE vr = 1
    ORDER BY q_id
"""


# ---------------------------------------------------------------------------
# 7. hybrid retrieval: lexical rank + vector rank → reciprocal rank fusion
# ---------------------------------------------------------------------------
_RRF_K = 60           # the standard RRF damping constant (Cormack 2009)
_RRF_TERMS = ("fast", "join", "stream")  # lexical query
_RRF_QVEC = 0         # vector query: embedding of vec_id 0 (≡ doc_id 0)


def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the production retrieval shape (BM25 ∪ ANN →
    reciprocal rank fusion): a lexical ranking (query-term hit count
    over documents) and a vector ranking (cosine to a query embedding)
    are fused per document as Σ 1e6 div (60 + rank) — integer-exact, so
    the fused score hash-matches across engines (float RRF sums would
    not). Documents ranked by only one retriever get the other's
    contribution as 0, the standard missing-rank convention.

    Scale: both candidate lists are top-N reductions (lexical: docs with
    ≥1 term hit; vector: exact scan here, the bucketed ANN variants
    above at 100 TB); the global rank windows run over candidate sets,
    not the corpus, and the fusion is a join of two rank tables on
    doc id. doc_id ≡ vec_id in the fixture (parallel tables)."""
    d = load(spark, sf_dir, "documents")
    terms = ", ".join(f"'{t}'" for t in _RRF_TERMS)
    lex = (
        d.selectExpr(
            "doc_id",
            f"size(filter(array({terms}), t -> contains(text, t))) AS hits",
        )
        .filter(F.col("hits") >= 1)
    )
    from pyspark.sql import Window as W

    w_lex = W.orderBy(F.desc("hits"), F.asc("doc_id"))
    lex_r = lex.withColumn("r_lex", F.row_number().over(w_lex).cast("int"))

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    vec = (
        e.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cos", F.round(_dot("qv", "v") / (F.col("qn") * F.col("norm")), 6)
        )
    )
    w_vec = W.orderBy(F.desc("cos"), F.asc("vec_id"))
    vec_r = (
        vec.withColumn("r_vec", F.row_number().over(w_vec).cast("int"))
        .filter(F.col("r_vec") <= 100)
        .select(F.col("vec_id").alias("doc_id"), "r_vec")
    )

    fused = (
        lex_r.select("doc_id", "r_lex")
        .join(vec_r, "doc_id", "full_outer")
        .selectExpr(
            "doc_id",
            "r_lex",
            "r_vec",
            f"coalesce(1000000 div ({_RRF_K} + r_lex), 0L)"
            f" + coalesce(1000000 div ({_RRF_K} + r_vec), 0L) AS rrf_e6",
        )
    )
    return (
        fused.orderBy(F.desc("rrf_e6"), F.asc("doc_id"))
        .limit(20)
    )


QUERIES["sim_rrf_fusion"] = sim_rrf_fusion

ORACLES["sim_rrf_fusion"] = f"""
    WITH {_EMB_DUCK},
    lex AS (
        SELECT * FROM (
            SELECT doc_id,
                   len(list_filter(['fast', 'join', 'stream'],
                                   t -> contains(text, t))) AS hits
            FROM documents
        ) WHERE hits >= 1
    ),
    lex_r AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY hits DESC, doc_id)
                    AS INTEGER) AS r_lex
        FROM lex
    ),
    q AS (SELECT v AS qv, norm AS qn FROM emb WHERE vec_id = {_RRF_QVEC}),
    vec_r AS (
        SELECT doc_id, r_vec FROM (
            SELECT e.vec_id AS doc_id,
                   CAST(row_number() OVER (
                       ORDER BY round(list_dot_product(qv, e.v)
                                      / (qn * e.norm), 6) DESC,
                                e.vec_id) AS INTEGER) AS r_vec
            FROM emb e, q WHERE e.vec_id <> {_RRF_QVEC}
        ) WHERE r_vec <= 100
    )
    SELECT doc_id, r_lex, r_vec,
           CAST(coalesce(1000000 // ({_RRF_K} + r_lex), 0)
                + coalesce(1000000 // ({_RRF_K} + r_vec), 0) AS BIGINT)
               AS rrf_e6
    FROM lex_r FULL OUTER JOIN vec_r USING (doc_id)
    ORDER BY rrf_e6 DESC, doc_id
    LIMIT 20
"""


# ---------------------------------------------------------------------------
# 8. maximum inner product search via the norm-augmentation reduction
# ---------------------------------------------------------------------------
def sim_mips_maxdot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIPS (recommendation scoring: argmax q·v, where longer vectors ARE
    more relevant — cosine deliberately not wanted) computed through the
    classic norm-augmentation reduction (Bachrach 2014 / Shrivastava-Li
    asymmetric LSH): append sqrt(M² − |v|²) to every corpus vector and 0
    to the query; all augmented vectors then share norm M, so cosine
    order against the augmented corpus IS inner-product order — which
    unlocks every cosine-bucketed ANN structure above for MIPS. This
    operator ranks by the augmented cosine and emits the raw dot; the
    ORACLE ranks by the raw dot directly — the hash match is a
    cross-engine proof of the reduction's monotonicity.

    Scale: M is a 1-row broadcast aggregate; everything else is the
    brute-force shape (broadcast queries × corpus) the bucketed variants
    replace at 100 TB."""
    e = _emb(spark, sf_dir)
    m = e.agg(F.max("norm").alias("mx"))
    aug = e.crossJoin(F.broadcast(m)).selectExpr(
        "vec_id", "v", "norm",
        "concat(v, array(sqrt(mx * mx - norm * norm))) AS va",
        "mx",
    )
    q = e.filter(F.col("vec_id") < 10).selectExpr(
        "vec_id AS q_id", "concat(v, array(0D)) AS qa", "v AS qv", "norm AS qn"
    )
    pairs = (
        F.broadcast(q)
        .join(aug, F.col("vec_id") != F.col("q_id"))
        .withColumn("cos_aug", _dot("qa", "va") / (F.col("qn") * F.col("mx")))
        .withColumn("dot", F.round(_dot("qv", "v"), 6))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos_aug"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank", "dot")
        .orderBy("q_id", "rank")
    )


QUERIES["sim_mips_maxdot"] = sim_mips_maxdot

ORACLES["sim_mips_maxdot"] = f"""
    WITH {_EMB_DUCK},
    q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < 10),
    pairs AS (
        SELECT q_id, e.vec_id AS neighbor_id,
               round(list_dot_product(qv, e.v), 6) AS dot
        FROM q JOIN emb e ON e.vec_id <> q.q_id
    )
    SELECT q_id, neighbor_id, rank, dot FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY dot DESC, neighbor_id ASC) AS INTEGER) AS rank
        FROM pairs)
    WHERE rank <= 5
    ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# 9. IVF + PQ hybrid: coarse cell probe, then table-lookup (ADC) refine
# ---------------------------------------------------------------------------
_IVF_CELLS = 8  # coarse quantizer cells (training-free seeding, like PQ)


def sim_ivf_pq_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN index shape (FAISS IVFPQ): a coarse quantizer
    routes each vector to one of 8 cells (exact integer L2 argmin on
    the 1e6 fixed-point grid, cells seeded from vec_id < 8 — swap in
    kmeans-trained cells at deployment), queries probe their 2 nearest
    cells, and ONLY vectors in probed cells are scored — by PQ
    asymmetric distance (8 table lookups per vector) rather than the
    raw 64-dim dot. Combines sim_ann_ivf's candidate pruning with
    sim_ann_pq's per-candidate cost: work ≈ probed_fraction × corpus ×
    O(m) lookups, independent of dimension.

    Everything is exact BIGINT arithmetic (grid L2, ADC sums), ties
    break on (distance, id) — bit-identical across engines.

    Scale shape: cell seeds and PQ codebooks broadcast (8 + 128 tiny
    rows); assignment and encoding are broadcast joins + argmin
    groupBys; the probe restriction is an equi-join on cell; ADC is an
    equi-join on (subspace, code). Nothing quadratic, nothing wider
    than codes shuffles."""
    from pyspark.sql import Window as W

    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr(
            f"transform(v, x -> CAST(floor(x * {_PQ_SCALE}D + 0.5D) AS BIGINT))"
        ).alias("xi"),
    )
    # coarse stage: integer L2 to each of the 8 cell seeds
    cells = e.filter(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("xi").alias("cw")
    )
    l2full = (
        "aggregate(zip_with(xi, cw, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, x) -> acc + x)"
    )
    scored = e.crossJoin(F.broadcast(cells)).selectExpr(
        "vec_id", "xi", "cell", f"{l2full} AS cd"
    )
    w_assign = W.partitionBy("vec_id").orderBy("cd", "cell")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    probes = (
        scored.filter(F.col("vec_id") < 5)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= 2)
        .selectExpr("vec_id AS qid", "cell")
    )
    # PQ stage (the sim_ann_pq encode, verbatim shapes)
    js = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("j")
    sub = e.select("vec_id", "xi", js).selectExpr(
        "vec_id", "j", f"slice(xi, j * {_PQ_SUB} + 1, {_PQ_SUB}) AS sv"
    )
    cent = (
        e.filter(F.col("vec_id") < _PQ_K)
        .select(F.col("vec_id").alias("c"), "xi", js)
        .selectExpr("j", "c", f"slice(xi, j * {_PQ_SUB} + 1, {_PQ_SUB}) AS cw")
    )
    l2 = (
        "aggregate(zip_with(sv, cw, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, x) -> acc + x)"
    )
    dists = sub.join(F.broadcast(cent), "j").selectExpr(
        "vec_id", "j", "c", f"{l2} AS dist"
    )
    codes = (
        dists.groupBy("vec_id", "j")
        .agg(F.min(F.struct("dist", "c")).alias("b"))
        .selectExpr("vec_id", "j", "b.c AS code")
    )
    dt = dists.filter(F.col("vec_id") < 5).selectExpr(
        "vec_id AS qid", "j", "c", "dist"
    )
    # candidates = vectors living in a probed cell (self excluded)
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )
    adc = (
        cand.join(codes, "vec_id")
        .alias("cd")
        .join(
            F.broadcast(dt).alias("q"),
            (F.col("cd.j") == F.col("q.j"))
            & (F.col("cd.code") == F.col("q.c"))
            & (F.col("cd.qid") == F.col("q.qid")),
        )
        .groupBy(F.col("cd.qid").alias("qid"), "vec_id")
        .agg(F.sum("q.dist").alias("adist"))
    )
    w = W.partitionBy("qid").orderBy("adist", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "rank", "vec_id", "adist")
        .orderBy("qid", "rank")
    )


QUERIES["sim_ivf_pq_hybrid"] = sim_ivf_pq_hybrid

ORACLES["sim_ivf_pq_hybrid"] = f"""
    WITH {_EMB_DUCK},
    e AS (
        SELECT vec_id,
               list_transform(v, x ->
                   CAST(floor(x * {_PQ_SCALE} + 0.5) AS BIGINT)) AS xi
        FROM emb
    ),
    cells AS (
        SELECT vec_id AS cell, xi AS cw FROM e WHERE vec_id < {_IVF_CELLS}
    ),
    cscored AS (
        SELECT e.vec_id, c.cell,
               CAST(list_sum(list_transform(generate_series(1, {_DIM}),
                   i -> (e.xi[i] - c.cw[i]) * (e.xi[i] - c.cw[i])))
                   AS BIGINT) AS cd
        FROM e CROSS JOIN cells c
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cd, cell) AS rn
            FROM cscored
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS qid, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cd, cell) AS rn
            FROM cscored WHERE vec_id < 5
        ) WHERE rn <= 2
    ),
    js AS (SELECT unnest(range(0, {_PQ_M})) AS j),
    sub AS (
        SELECT vec_id, j,
               xi[j * {_PQ_SUB} + 1 : j * {_PQ_SUB} + {_PQ_SUB}] AS sv
        FROM e CROSS JOIN js
    ),
    cent AS (
        SELECT j, vec_id AS c,
               xi[j * {_PQ_SUB} + 1 : j * {_PQ_SUB} + {_PQ_SUB}] AS cw
        FROM e CROSS JOIN js
        WHERE vec_id < {_PQ_K}
    ),
    dists AS (
        SELECT s.vec_id, s.j, c.c,
               CAST(list_sum(list_transform(
                   generate_series(1, {_PQ_SUB}),
                   i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i])))
                   AS BIGINT) AS dist
        FROM sub s JOIN cent c ON c.j = s.j
    ),
    codes AS (
        SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY dist, c) AS rn
            FROM dists
        ) WHERE rn = 1
    ),
    dt AS (
        SELECT vec_id AS qid, j, c, dist FROM dists WHERE vec_id < 5
    ),
    cand AS (
        SELECT p.qid, a.vec_id
        FROM probes p JOIN assigned a USING (cell)
        WHERE a.vec_id <> p.qid
    ),
    adc AS (
        SELECT cand.qid, cand.vec_id, CAST(sum(dt.dist) AS BIGINT) AS adist
        FROM cand
        JOIN codes ON codes.vec_id = cand.vec_id
        JOIN dt ON dt.qid = cand.qid AND dt.j = codes.j
               AND dt.c = codes.code
        GROUP BY cand.qid, cand.vec_id
    )
    SELECT qid, rank, vec_id, adist FROM (
        SELECT qid, vec_id, adist,
               CAST(row_number() OVER (PARTITION BY qid
                                  ORDER BY adist, vec_id) AS INTEGER) AS rank
        FROM adc
    ) WHERE rank <= 10
    ORDER BY qid, rank
"""
