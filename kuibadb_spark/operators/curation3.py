"""Round-4 additions: the curation operators a 100 TB training-data
pipeline runs between crawl and tokenizer that the first 206 queries
did not yet cover — semantic dedup (SemDeDup), exact-substring dedup
(the Lee-et-al. "Deduplicating Training Data" shape), a hashing-trick
linear quality classifier (the fastText/CCNet filtering shape), HLL
set algebra across segments, time-decay attribution, deterministic
train/val/test splits, and IQR outlier profiling.

Registered LAST in registry._MODULES on purpose: these keys must rank
behind curation2's nine round-5-window stragglers so they cannot
displace already-planned grading slots (the round-3 discipline).

Cross-engine determinism rules used throughout (DESIGN.md #23-25):
- quantize floats to integers FIRST; every cross-row sum is then exact
  in either engine regardless of accumulation order;
- any double expression both engines must agree on is built from
  exact-integer operands with the same operation order (IEEE doubles
  are deterministic given identical operands/ops);
- char units, never octets; md5 as the only cross-engine hash;
- no ARRAY/MAP/BINARY in any final schema (driver canonicalizer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. SemDeDup: semantic dedup via cluster-then-pairwise-cosine
# ---------------------------------------------------------------------------
# Reference semantics: embedding near-dup removal the reference's dedup
# surface implies for vector columns (cf. /root/reference docs on dedup
# coverage); method per the public SemDeDup recipe (Abbas et al. 2023,
# arXiv:2303.09540): cluster embeddings, then search for near-dups only
# WITHIN a cluster — the clustering bounds the quadratic step the same
# way LSH bands do for minhash.
_SD_K = 8            # centroids; production K scales ~ N/cluster-budget
_SD_TAU2 = 0.9409    # cos >= 0.97  <=>  dot^2 >= 0.9409 * |a|^2 * |b|^2
_SD_SLICES = 4       # salt wide clusters across cogroup tasks


def sim_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: quantize each vector to
    integers (floor(x*1000 + 0.5) — from then on every dot product and
    norm is EXACT in both engines), assign to the nearest of K=8 fixed
    seed centroids (the vectors with vec_id < 8 — deterministic, no
    Lloyd iterations to drift cross-engine), then within each cluster
    count pairs with cosine >= 0.97 and the distinct higher-id vectors
    a keep-lowest policy would drop.

    Exactness: nearest-centroid argmax compares sign(dot)*dot^2/|c|^2 —
    dot^2 <= 4.1e15 < 2^53 stays exact through the double cast, and the
    single division is IEEE-identical in both engines; ties break to the
    lowest centroid id via row_number. The pair test dot^2 >= 0.9409 *
    |a|^2*|b|^2 multiplies exact integers into one rounded double each
    side — same rounding, same verdict.

    Scale shape: assignment is a broadcast of K centroid rows into a
    mapInPandas int-matmul (no shuffle); the pair stage is the
    label-sliced cogrouped blocked-matmul verify proven in
    dedup_embedding_cosine (dedup.py:370) — the quadratic step never
    leaves a cluster slice, and K grows with N in production so cluster
    size stays bounded."""
    e = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(CAST(embedding AS ARRAY<DOUBLE>),"
        " x -> CAST(floor(x * 1000.0D + 0.5D) AS BIGINT)) AS q",
    ).withColumn("n", F.expr("aggregate(q, 0L, (acc, x) -> acc + x * x)"))

    cent = [
        (int(r["vec_id"]), list(r["q"]), int(r["n"]))
        for r in e.filter(F.col("vec_id") < _SD_K).collect()
    ]  # K x 64 ints: bounded metadata, the kmeans-centroid precedent
    cent.sort()
    c_mat = np.array([c[1] for c in cent], dtype=np.int64)  # K x 64
    c_norm = np.array([c[2] for c in cent], dtype=np.int64)
    c_ids = np.array([c[0] for c in cent], dtype=np.int64)

    def _assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
            D = A @ c_mat.T                        # exact int64
            score = np.sign(D) * (D.astype(np.float64) ** 2) / c_norm
            j = np.argmax(score, axis=1)           # first max = lowest id
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "q": pdf["q"],
                 "n": pdf["n"], "cluster_id": c_ids[j]}
            )

    assigned = e.mapInPandas(
        _assign,
        "vec_id bigint, q array<bigint>, n bigint, cluster_id bigint",
    )

    S = _SD_SLICES
    a_side = assigned.withColumn(
        "sl", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(S)]))
    )
    b_side = assigned.withColumn("sl", F.pmod("vec_id", F.lit(S)).cast("bigint"))

    def _pairs(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # emits ONE pre-aggregated row per (cluster, slice) task, not the
        # raw pair list: (a) the map-side combine a pair dump would need
        # anyway, and (b) every output column stays referenced downstream
        # — Spark 4's ColumnPruning, if it drops any FlatMapCoGroups
        # output column, prunes the self-cogroup's RIGHT child to its
        # grouping keys and the UDF crashes (DESIGN.md #26). n_dropped
        # sums across tasks WITHOUT double count: a given hi lives in
        # exactly one slice (sl = hi % S) of its cluster.
        empty = pd.DataFrame(
            {"cluster_id": pd.Series(dtype="int64"),
             "n_pairs": pd.Series(dtype="int64"),
             "n_drop": pd.Series(dtype="int64")}
        )
        if left.empty or right.empty:
            return empty
        A = np.vstack(left["q"].to_numpy()).astype(np.int64)
        B = np.vstack(right["q"].to_numpy()).astype(np.int64)
        D = A @ B.T                                # exact int64
        thresh = _SD_TAU2 * np.outer(
            left["n"].to_numpy().astype(np.float64),
            right["n"].to_numpy().astype(np.float64),
        )
        ids_a = left["vec_id"].to_numpy()
        ids_b = right["vec_id"].to_numpy()
        ok = (D >= 0) & (D.astype(np.float64) ** 2 >= thresh) & (
            ids_a[:, None] < ids_b[None, :]
        )
        n_pairs = int(ok.sum())
        if not n_pairs:
            return empty
        return pd.DataFrame(
            {"cluster_id": [int(left["cluster_id"].iloc[0])],
             "n_pairs": [n_pairs],
             "n_drop": [int(ok.any(axis=0).sum())]}
        )

    pair_stats = (
        a_side.groupBy("cluster_id", "sl")
        .cogroup(b_side.groupBy("cluster_id", "sl"))
        .applyInPandas(_pairs, "cluster_id bigint, n_pairs bigint, n_drop bigint")
        .groupBy("cluster_id")
        .agg(
            F.sum("n_pairs").alias("n_dup_pairs"),
            F.sum("n_drop").alias("n_dropped"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    return (
        sizes.join(pair_stats, "cluster_id", "left")
        .selectExpr(
            "cluster_id",
            "n_vecs",
            "coalesce(n_dup_pairs, 0L) AS n_dup_pairs",
            "coalesce(n_dropped, 0L) AS n_dropped",
        )
        .orderBy("cluster_id")
    )


QUERIES["sim_semdedup_clusters"] = sim_semdedup_clusters

ORACLES["sim_semdedup_clusters"] = """
    WITH q AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))
                   AS q
        FROM embeddings
    ),
    base AS (
        SELECT vec_id, q,
               CAST(list_dot_product(q, q) AS BIGINT) AS n
        FROM q
    ),
    cent AS (
        SELECT vec_id AS c_id, q AS qc, n AS nc FROM base WHERE vec_id < 8
    ),
    scored AS (
        SELECT b.vec_id, b.q, b.n, c.c_id,
               CASE WHEN list_dot_product(b.q, c.qc) >= 0 THEN
                   CAST(list_dot_product(b.q, c.qc) AS DOUBLE)
                   * CAST(list_dot_product(b.q, c.qc) AS DOUBLE) / c.nc
               ELSE
                   - CAST(list_dot_product(b.q, c.qc) AS DOUBLE)
                   * CAST(list_dot_product(b.q, c.qc) AS DOUBLE) / c.nc
               END AS score
        FROM base b CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, q, n, c_id AS cluster_id
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY score DESC, c_id ASC) AS rk
              FROM scored)
        WHERE rk = 1
    ),
    pairs AS (
        SELECT a.cluster_id, a.vec_id AS lo, b.vec_id AS hi
        FROM assigned a JOIN assigned b
          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.q, b.q) >= 0
          AND CAST(list_dot_product(a.q, b.q) AS DOUBLE)
              * CAST(list_dot_product(a.q, b.q) AS DOUBLE)
              >= 0.9409 * CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)
    ),
    pair_stats AS (
        SELECT cluster_id, count(*) AS n_dup_pairs,
               count(DISTINCT hi) AS n_dropped
        FROM pairs GROUP BY cluster_id
    ),
    sizes AS (
        SELECT cluster_id, count(*) AS n_vecs FROM assigned GROUP BY cluster_id
    )
    SELECT s.cluster_id, s.n_vecs,
           coalesce(p.n_dup_pairs, 0) AS n_dup_pairs,
           coalesce(p.n_dropped, 0) AS n_dropped
    FROM sizes s LEFT JOIN pair_stats p ON s.cluster_id = p.cluster_id
    ORDER BY s.cluster_id
"""


# ---------------------------------------------------------------------------
# 2. exact-substring dedup: stride-50 char-gram cross-doc repeats
# ---------------------------------------------------------------------------
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit — the signal behind the
    suffix-array dedup of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499), re-expressed for
    a distributed engine: split every document into NON-overlapping
    50-char windows (stride 50 keeps the blow-up at len/50 rows, not
    len rows), find windows occurring in >= 2 distinct documents, and
    roll up per source: how many documents carry at least one shared
    span and what fraction of spans is shared.

    Scale shape: two shuffles on the same 50-gram key (group + join
    back, exchange-reused), both LINEAR in corpus size — no pair set is
    ever formed, unlike similarity dedup; this is the cheap exactness
    pass run before any fuzzy method. Char units on both engines
    (DESIGN.md #23b)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    spans = (
        d.filter(F.length("text") >= 50)
        .selectExpr(
            "doc_id",
            "source",
            "explode(transform(sequence(0, CAST((length(text) - 50) div 50"
            " AS INT)), i -> substring(text, 1 + 50*i, 50))) AS g",
        )
    )
    gstats = spans.groupBy("g").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per_doc = (
        spans.join(gstats, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_dup") > 0, 1).otherwise(0)).alias(
                "n_docs_with_dup_span"
            ),
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_dup").alias("n_dup_spans"),
        )
        .orderBy("source")
    )


QUERIES["text_substring_dedup"] = text_substring_dedup

ORACLES["text_substring_dedup"] = """
    WITH starts AS (
        SELECT doc_id, source, text,
               unnest(generate_series(1, (length(text) - 50) // 50 + 1)) AS i
        FROM documents
        WHERE length(text) >= 50
    ),
    spans AS (
        SELECT doc_id, source, substr(text, 1 + 50*(i-1), 50) AS g
        FROM starts
    ),
    gstats AS (
        SELECT g, count(DISTINCT doc_id) AS nd FROM spans GROUP BY g
    ),
    per_doc AS (
        SELECT s.doc_id, s.source,
               count(*) AS n_spans,
               sum(CASE WHEN gs.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM spans s JOIN gstats gs ON s.g = gs.g
        GROUP BY s.doc_id, s.source
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_with_dup_span,
           CAST(sum(n_spans) AS BIGINT) AS n_spans,
           CAST(sum(n_dup) AS BIGINT) AS n_dup_spans
    FROM per_doc
    GROUP BY source
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 3. hashing-trick linear quality classifier (fastText/CCNet shape)
# ---------------------------------------------------------------------------
def text_classifier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering plumbing — the fastText-style
    linear classifier over hashed bag-of-words features that CCNet-type
    pipelines run on every crawl document (Joulin et al. 2016; the
    weights here are a deterministic stand-in since no model ships in
    this container, but the data path is the real one). Per token:
    bucket = md5-hash % 1024, weight = (bucket * 2654435761) % 2001 -
    1000 (an integer in [-1000, 1000]); per doc the score is the mean
    token weight in integer milli-units (sum div n). Everything is
    integer arithmetic on a cross-engine hash, so the verdict counts
    hash-match exactly.

    Scale shape: the whole classifier is ONE row-local higher-order
    expression (split -> filter -> transform -> aggregate) — zero
    shuffle before the final per-source rollup, i.e. a pure map-side
    scoring pass; swapping in real learned weights changes the lambda
    body, not the plan."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scored = d.selectExpr(
        "doc_id",
        "source",
        r"""
        aggregate(
            transform(
                filter(split(text, '\\s+'), t -> t <> ''),
                t -> (CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)
                      % 1024 * 2654435761L) % 2001 - 1000
            ),
            0L, (acc, w) -> acc + w
        ) AS wsum
        """,
        r"size(filter(split(text, '\\s+'), t -> t <> '')) AS n_toks",
    ).filter(F.col("n_toks") > 0).selectExpr(
        "doc_id", "source", "wsum div n_toks AS score_milli", "n_toks"
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("score_milli") > 0, 1).otherwise(0)).alias(
                "n_positive"
            ),
            F.sum("score_milli").alias("sum_score_milli"),
            F.min("score_milli").alias("min_score_milli"),
            F.max("score_milli").alias("max_score_milli"),
        )
        .orderBy("source")
    )


QUERIES["text_classifier_quality"] = text_classifier_quality

ORACLES["text_classifier_quality"] = """
    WITH scored AS (
        SELECT doc_id, source,
               list_sum(list_transform(
                   list_filter(string_split_regex(text, '\\s+'),
                               t -> t <> ''),
                   t -> (CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)
                         % 1024 * 2654435761) % 2001 - 1000
               )) AS wsum,
               len(list_filter(string_split_regex(text, '\\s+'),
                               t -> t <> '')) AS n_toks
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN wsum // n_toks > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_positive,
           CAST(sum(wsum // n_toks) AS BIGINT) AS sum_score_milli,
           CAST(min(wsum // n_toks) AS BIGINT) AS min_score_milli,
           CAST(max(wsum // n_toks) AS BIGINT) AS max_score_milli
    FROM scored
    WHERE n_toks > 0
    GROUP BY source
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 4. HLL set algebra: union + inclusion-exclusion intersection of sketches
# ---------------------------------------------------------------------------
def agg_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA — the property that makes HLL the 100 TB
    distinct-count currency: registers for returned (R) and
    A-status part sets merge by register-wise max into the UNION estimate without
    rescanning either input, and inclusion-exclusion gives the
    intersection estimate (|A|+|B|-|A∪B|) from three sketches alone.
    Exact counterparts ride along as ground truth, including the exact
    intersection via a both-modes semi-grouping.

    Exactness discipline = agg_hll_handrolled's (aggregates.py:429): md5
    hash, integer rho, harmonic sum kept as an exact integer at register
    scale 2^55; the three estimates divide exact integers, and the
    inclusion-exclusion combines those three doubles identically in both
    engines before the single final round."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_returnflag", "l_partkey")
    )
    regs = (
        li.selectExpr(
            "l_returnflag AS grp",
            "l_partkey",
            "CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT) AS h",
        )
        .selectExpr("grp", "h % 64 AS bucket", "h div 64 AS rest")
        .groupBy("grp", "bucket")
        .agg(F.expr(
            "max(least(bit_count((rest & -rest) - 1) + 1, 55))").alias("m"))
    )
    union_regs = (
        regs.groupBy("bucket").agg(F.max("m").alias("m"))
        .selectExpr("'__union__' AS grp", "bucket", "m")
    )
    est = (
        regs.unionAll(union_regs)
        .groupBy("grp")
        .agg(
            F.expr("sum(shiftleft(CAST(1 AS BIGINT), 55 - m))").alias("sp"),
            F.count(F.lit(1)).alias("nr"),
        )
        .selectExpr(
            "grp",
            "0.709D * 4096 * pow(2.0D, 55)"
            " / (sp + (64 - nr) * shiftleft(CAST(1 AS BIGINT), 55)) AS est",
        )
    )
    wide = est.agg(
        F.max(F.when(F.col("grp") == "A", F.col("est"))).alias("e_air"),
        F.max(F.when(F.col("grp") == "R", F.col("est"))).alias("e_truck"),
        F.max(F.when(F.col("grp") == "__union__", F.col("est"))).alias("e_un"),
    ).selectExpr(
        "round(e_air, 4) AS hll_a",
        "round(e_truck, 4) AS hll_r",
        "round(e_un, 4) AS hll_union",
        "round(e_air + e_truck - e_un, 4) AS hll_intersection",
    )
    per_key = li.groupBy("l_partkey").agg(
        F.max(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("t"),
    )
    exact = per_key.agg(
        F.sum("a").alias("n_exact_a"),
        F.sum("t").alias("n_exact_r"),
        F.count(F.lit(1)).alias("n_exact_union"),
        F.sum(F.expr("CASE WHEN a = 1 AND t = 1 THEN 1 ELSE 0 END")).alias(
            "n_exact_intersection"
        ),
    )
    return exact.crossJoin(wide)


QUERIES["agg_hll_set_ops"] = agg_hll_set_ops

ORACLES["agg_hll_set_ops"] = """
    WITH li AS (
        SELECT l_returnflag, l_partkey FROM lineitem
        WHERE l_returnflag IN ('A', 'R')
    ),
    br AS (
        SELECT l_returnflag AS grp,
               CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
                    AS BIGINT) % 64 AS bucket,
               CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
                    AS BIGINT) // 64 AS rest
        FROM li
    ),
    regs AS (
        SELECT grp, bucket,
               max(least(bit_count((rest & -rest) - 1) + 1, 55)) AS m
        FROM br GROUP BY grp, bucket
    ),
    union_regs AS (
        SELECT '__union__' AS grp, bucket, max(m) AS m
        FROM regs GROUP BY bucket
    ),
    allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM union_regs),
    est AS (
        SELECT grp,
               CAST(0.709 AS DOUBLE) * 4096 * pow(2.0, 55)
               / (CAST(sum(CAST(1 AS BIGINT) << (55 - m)) AS BIGINT)
                  + (64 - count(*)) * (CAST(1 AS BIGINT) << 55)) AS est
        FROM allregs GROUP BY grp
    ),
    wide AS (
        SELECT round(max(CASE WHEN grp = 'A' THEN est END), 4) AS hll_a,
               round(max(CASE WHEN grp = 'R' THEN est END), 4)
                   AS hll_r,
               round(max(CASE WHEN grp = '__union__' THEN est END), 4)
                   AS hll_union,
               round(max(CASE WHEN grp = 'A' THEN est END)
                     + max(CASE WHEN grp = 'R' THEN est END)
                     - max(CASE WHEN grp = '__union__' THEN est END), 4)
                   AS hll_intersection
        FROM est
    ),
    per_key AS (
        SELECT l_partkey,
               max(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS a,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS t
        FROM li GROUP BY l_partkey
    ),
    exact AS (
        SELECT CAST(sum(a) AS BIGINT) AS n_exact_a,
               CAST(sum(t) AS BIGINT) AS n_exact_r,
               count(*) AS n_exact_union,
               CAST(sum(CASE WHEN a = 1 AND t = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_intersection
        FROM per_key
    )
    SELECT * FROM exact CROSS JOIN wide
"""


# ---------------------------------------------------------------------------
# 5. time-decay multi-touch attribution (day-banded range frames)
# ---------------------------------------------------------------------------
def ev_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution: a purchase credits its trailing-7-day
    view/click touches with weight 2^-(age in whole days) — yesterday's
    click is worth half of today's. Weights are the integers 64..1
    (2^(6-k) for day-band k), so the credit split is exact integer ppm
    arithmetic like ev_attribution_linear's (pipelines.py:727).

    Join-free shape: weight depends on BOTH rows of a (purchase, touch)
    pair, which a single range frame cannot see — but bucketing age into
    7 whole-day bands turns it into 14 banded conditional counts (7 day
    bands x view/click), each a RANGE frame over the SAME user_id
    exchange and sort: one shuffle total, no pair set, the w_trailing
    window discipline at any scale."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    tagged = e.selectExpr(
        "user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    day = 24 * 3600 * 1_000_000
    df = tagged
    for k in range(7):
        w_k = (
            W.partitionBy("user_id").orderBy("us")
            .rangeBetween(-(k + 1) * day + 1, -k * day)
        )
        df = df.withColumn(
            f"nv{k}",
            F.count(F.when(F.col("event_type") == "view", 1)).over(w_k),
        ).withColumn(
            f"nc{k}",
            F.count(F.when(F.col("event_type") == "click", 1)).over(w_k),
        )
    wv = " + ".join(f"shiftleft(CAST(1 AS BIGINT), {6 - k}) * nv{k}"
                    for k in range(7))
    wc = " + ".join(f"shiftleft(CAST(1 AS BIGINT), {6 - k}) * nc{k}"
                    for k in range(7))
    purchases = (
        df.filter(F.col("event_type") == "purchase")
        .selectExpr("event_id", f"{wv} AS wview", f"{wc} AS wclick")
        .withColumn("wsum", F.col("wview") + F.col("wclick"))
        .filter(F.col("wsum") > 0)
    )
    return purchases.selectExpr(
        "event_id",
        "(1000000 * wview) div wsum AS view_ppm",
        "(1000000 * wclick) div wsum AS click_ppm",
        "wview", "wclick",
    ).agg(
        F.count(F.lit(1)).alias("n_attributed_purchases"),
        F.sum("view_ppm").alias("view_credit_ppm_total"),
        F.sum("click_ppm").alias("click_credit_ppm_total"),
        F.sum("wview").alias("weight_view_total"),
        F.sum("wclick").alias("weight_click_total"),
    )


QUERIES["ev_attribution_time_decay"] = ev_attribution_time_decay

_TD_BANDS_DUCK = "\n".join(
    f"        , w{k} AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN "
    f"{(k + 1) * 86400000000 - 1} PRECEDING AND {k * 86400000000} PRECEDING)"
    for k in range(1, 7)
)

ORACLES["ev_attribution_time_decay"] = f"""
    WITH tagged AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    counted AS (
        SELECT event_id, event_type,
               {", ".join(
                   f"count(CASE WHEN event_type = 'view' THEN 1 END)"
                   f" OVER w{k} AS nv{k},"
                   f" count(CASE WHEN event_type = 'click' THEN 1 END)"
                   f" OVER w{k} AS nc{k}" for k in range(7))}
        FROM tagged
        WINDOW w0 AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN
                      86399999999 PRECEDING AND 0 PRECEDING)
{_TD_BANDS_DUCK}
    ),
    purchases AS (
        SELECT event_id,
               {" + ".join(f"(CAST(1 AS BIGINT) << {6 - k}) * nv{k}"
                           for k in range(7))} AS wview,
               {" + ".join(f"(CAST(1 AS BIGINT) << {6 - k}) * nc{k}"
                           for k in range(7))} AS wclick
        FROM counted WHERE event_type = 'purchase'
    ),
    credited AS (
        SELECT event_id, wview, wclick, wview + wclick AS wsum
        FROM purchases WHERE wview + wclick > 0
    )
    SELECT count(*) AS n_attributed_purchases,
           CAST(sum((1000000 * wview) // wsum) AS BIGINT)
               AS view_credit_ppm_total,
           CAST(sum((1000000 * wclick) // wsum) AS BIGINT)
               AS click_credit_ppm_total,
           CAST(sum(wview) AS BIGINT) AS weight_view_total,
           CAST(sum(wclick) AS BIGINT) AS weight_click_total
    FROM credited
"""


# ---------------------------------------------------------------------------
# 6. deterministic train/val/test split assignment
# ---------------------------------------------------------------------------
def sample_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by md5-hash bucket of doc_id —
    the split every training pipeline needs to be DETERMINISTIC (re-runs
    and late-arriving shards land in the same split; no RNG, no state).
    Reports per (split, source) doc and char totals, the balance sheet
    reviewed before a training run. Pure map + one small rollup; the
    hash is the cross-engine md5-prefix idiom (sample_hash_10pct,
    relational2.py:150)."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint") % 100
    )
    return (
        d.withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test"),
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "source")
    )


QUERIES["sample_split_assignment"] = sample_split_assignment

ORACLES["sample_split_assignment"] = """
    SELECT CASE
               WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 100 < 80 THEN 'train'
               WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 100 < 90 THEN 'val'
               ELSE 'test'
           END AS split,
           source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY split, source
"""


# ---------------------------------------------------------------------------
# 7. IQR outlier profiling (exact type-7 quartiles, integer-scaled)
# ---------------------------------------------------------------------------
def profile_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profiling per l_returnflag: quartiles of
    l_extendedprice, IQR, and the count of rows outside
    [q1 - 1.5*IQR, q3 + 1.5*IQR] — the standard numeric-column health
    check a profiler runs per ingest batch.

    Quartiles are computed BY HAND as type-7 (h = (n-1)p) over
    cent-scaled integers rather than through either engine's quantile
    function, so the interpolation convention can never diverge: the
    position arithmetic is integer (pos = (n-1)*25, lo = pos div 100,
    frac in {0,.25,.5,.75}), the two contributing ranks get exact dyadic
    coefficients, and every derived bound (1.5*IQR fences) stays an
    exact dyadic double — bit-identical cross-engine. One exchange: the
    rank window, the fence windows, and the final rollup all ride the
    same hash(l_returnflag) partitioning."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag AS flag",
        # floor(x*100 + 0.5), not CAST: l_extendedprice is a DOUBLE in
        # the fixture, and bare CAST truncates in Spark but rounds in
        # DuckDB (DESIGN.md #23a)
        "CAST(floor(l_extendedprice * 100 + 0.5D) AS BIGINT) AS cents",
    )
    wp = W.partitionBy("flag")
    ranked = (
        li.withColumn("rn", F.row_number().over(wp.orderBy("cents")))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("lo25", F.expr("((n - 1) * 25) div 100"))
        .withColumn("f25", F.expr("((n - 1) * 25) % 100 / 100.0D"))
        .withColumn("lo75", F.expr("((n - 1) * 75) div 100"))
        .withColumn("f75", F.expr("((n - 1) * 75) % 100 / 100.0D"))
    )
    q = ranked.withColumn(
        "q1",
        F.expr("""sum(CASE WHEN rn = lo25 + 1 THEN cents * (1.0D - f25)
                           WHEN rn = lo25 + 2 THEN cents * f25
                           ELSE 0.0D END) OVER (PARTITION BY flag)"""),
    ).withColumn(
        "q3",
        F.expr("""sum(CASE WHEN rn = lo75 + 1 THEN cents * (1.0D - f75)
                           WHEN rn = lo75 + 2 THEN cents * f75
                           ELSE 0.0D END) OVER (PARTITION BY flag)"""),
    )
    return (
        q.groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("q1").alias("q1_cents"),
            F.min("q3").alias("q3_cents"),
            F.sum(
                F.expr("CASE WHEN cents < q1 - 1.5D * (q3 - q1)"
                       " THEN 1 ELSE 0 END")
            ).alias("n_low_outliers"),
            F.sum(
                F.expr("CASE WHEN cents > q3 + 1.5D * (q3 - q1)"
                       " THEN 1 ELSE 0 END")
            ).alias("n_high_outliers"),
        )
        .orderBy("flag")
    )


QUERIES["profile_outlier_iqr"] = profile_outlier_iqr

ORACLES["profile_outlier_iqr"] = """
    WITH li AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    ),
    ranked AS (
        SELECT flag, cents,
               row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY flag) AS n
        FROM li
    ),
    pos AS (
        SELECT flag, cents, rn, n,
               ((n - 1) * 25) // 100 AS lo25,
               ((n - 1) * 25) % 100 / 100.0 AS f25,
               ((n - 1) * 75) // 100 AS lo75,
               ((n - 1) * 75) % 100 / 100.0 AS f75
        FROM ranked
    ),
    q AS (
        SELECT flag, cents,
               sum(CASE WHEN rn = lo25 + 1 THEN cents * (1.0 - f25)
                        WHEN rn = lo25 + 2 THEN cents * f25
                        ELSE 0.0 END) OVER (PARTITION BY flag) AS q1,
               sum(CASE WHEN rn = lo75 + 1 THEN cents * (1.0 - f75)
                        WHEN rn = lo75 + 2 THEN cents * f75
                        ELSE 0.0 END) OVER (PARTITION BY flag) AS q3
        FROM pos
    )
    SELECT flag,
           count(*) AS n_rows,
           min(q1) AS q1_cents,
           min(q3) AS q3_cents,
           CAST(sum(CASE WHEN cents < q1 - 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(sum(CASE WHEN cents > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM q
    GROUP BY flag
    ORDER BY flag
"""
