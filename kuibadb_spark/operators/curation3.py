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
            # ONE regex pass per doc: (?s).{50} emits the same
            # non-overlapping 50-char windows (floor(len/50) matches,
            # remainder dropped — identical to the sequence bound).
            # The substring(text, 1+50i, 50) spelling re-walks the
            # string to position 50i per window — O(len²/50) on the
            # text-LENGTH axis (book-length docs), measured 3.42 s vs
            # 0.26 s on 512×64KB synthetic rows; the regex scan is
            # linear AND beats the old form at sf0.1 too (0.13 vs
            # 0.25 s). Position+value equality vs the substring form
            # verified on the full sf0.01 corpus (multi-byte safe for
            # BMP text; both engines' fixtures are BMP).
            "explode(regexp_extract_all(text, '(?s).{50}', 0)) AS g",
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
    exact dyadic double — bit-identical cross-engine.

    Scale shape — HISTOGRAM selection, not row ranking: the first cut
    of this query ranked every raw row inside a partition-by-flag
    window, which at 3 flags means 3 tasks sorting everything (×100
    measured ×30). This form aggregates to a (flag, value) histogram
    first — a normal wide-parallel shuffle with map-side combine — and
    runs the rank selection over the DISTINCT-VALUE rows only
    (cumulative count brackets [cum_lo, cum_hi] locate the two
    contributing ranks), so the low-cardinality window sees the
    compressed domain, not the data. Outlier counting is a second pass
    over the same histogram against broadcast fences."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag AS flag",
        # floor(x*100 + 0.5), not CAST: l_extendedprice is a DOUBLE in
        # the fixture, and bare CAST truncates in Spark but rounds in
        # DuckDB (DESIGN.md #23a)
        "CAST(floor(l_extendedprice * 100 + 0.5D) AS BIGINT) AS cents",
    )
    hist = li.groupBy("flag", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    wp = W.partitionBy("flag")
    cum = (
        hist.withColumn("cum_hi", F.sum("cnt").over(wp.orderBy("cents")))
        .withColumn("cum_lo", F.col("cum_hi") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(wp))
        .withColumn("lo25", F.expr("((n - 1) * 25) div 100"))
        .withColumn("f25", F.expr("((n - 1) * 25) % 100 / 100.0D"))
        .withColumn("lo75", F.expr("((n - 1) * 75) div 100"))
        .withColumn("f75", F.expr("((n - 1) * 75) % 100 / 100.0D"))
    )
    # both contributing ranks of a quartile may land in the SAME
    # histogram row — add the two CASE terms per row before summing
    stats = cum.groupBy("flag").agg(
        F.max("n").alias("n_rows"),
        F.sum(F.expr(
            """CASE WHEN lo25 + 1 > cum_lo AND lo25 + 1 <= cum_hi
                    THEN cents * (1.0D - f25) ELSE 0.0D END
             + CASE WHEN lo25 + 2 > cum_lo AND lo25 + 2 <= cum_hi
                    THEN cents * f25 ELSE 0.0D END""")).alias("q1_cents"),
        F.sum(F.expr(
            """CASE WHEN lo75 + 1 > cum_lo AND lo75 + 1 <= cum_hi
                    THEN cents * (1.0D - f75) ELSE 0.0D END
             + CASE WHEN lo75 + 2 > cum_lo AND lo75 + 2 <= cum_hi
                    THEN cents * f75 ELSE 0.0D END""")).alias("q3_cents"),
    )
    return (
        hist.join(F.broadcast(stats), "flag")
        .groupBy("flag")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.min("q1_cents").alias("q1_cents"),
            F.min("q3_cents").alias("q3_cents"),
            F.sum(F.expr(
                "CASE WHEN cents < q1_cents - 1.5D * (q3_cents - q1_cents)"
                " THEN cnt ELSE 0 END")).alias("n_low_outliers"),
            F.sum(F.expr(
                "CASE WHEN cents > q3_cents + 1.5D * (q3_cents - q1_cents)"
                " THEN cnt ELSE 0 END")).alias("n_high_outliers"),
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


# ---------------------------------------------------------------------------
# 8. vocabulary growth / type-token ratio per source
# ---------------------------------------------------------------------------
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary statistics — the Heaps-law corpus health
    check (vocabulary should grow sublinearly in tokens; a source whose
    type-token ratio is near 1 is ID-like noise, near 0 is boilerplate):
    docs, tokens, distinct tokens, and the type-token ratio in exact
    integer ppm. One explode + one groupBy(source) with countDistinct —
    Spark plans the distinct as a two-level partial aggregate, so the
    token stream is never collected anywhere."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.selectExpr(
        "doc_id", "source",
        r"explode(filter(split(text, '\\s+'), t -> t <> '')) AS tok",
    )
    return (
        toks.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("vocab"),
        )
        .selectExpr(
            "source", "n_docs", "n_tokens", "vocab",
            "(1000000 * vocab) div n_tokens AS ttr_ppm",
        )
        .orderBy("source")
    )


QUERIES["text_vocab_growth"] = text_vocab_growth

ORACLES["text_vocab_growth"] = """
    WITH toks AS (
        SELECT doc_id, source,
               unnest(list_filter(string_split_regex(text, '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    agg AS (
        SELECT source,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_tokens,
               count(DISTINCT tok) AS vocab
        FROM toks GROUP BY source
    )
    SELECT source, n_docs, n_tokens, vocab,
           (1000000 * vocab) // n_tokens AS ttr_ppm
    FROM agg
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# 9. top event-type trigram paths
# ---------------------------------------------------------------------------
def ev_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step behavioral paths (event-type trigrams per user in
    time order) — the path-analysis rollup product teams read as a
    Sankey. One user_id exchange: two LEADs over the same sort produce
    the trigram row-locally, then a global count. Ties in ts break on
    event_id so the sequence is deterministic in both engines."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    tri = (
        e.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .selectExpr("concat(event_type, '>', t2, '>', t3) AS path")
    )
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(20)
    )


QUERIES["ev_path_trigrams"] = ev_path_trigrams

ORACLES["ev_path_trigrams"] = """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    tri AS (
        SELECT event_type || '>' ||
               lead(event_type, 1) OVER w || '>' ||
               lead(event_type, 2) OVER w AS path
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT path, count(*) AS n
    FROM tri WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 20
"""


# ---------------------------------------------------------------------------
# 10. audio silence runs (gaps-and-islands over frame energies)
# ---------------------------------------------------------------------------
def mm_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence detection over the fake-PCM payloads (multimodal.py's
    char-sample convention; real decoders stay import-gated): 32-sample
    non-overlapping frames, a frame is `quiet` when its integer energy
    < 310000, and consecutive quiet frames merge into runs via the
    islands trick (frame_idx - row_number over quiet frames). Per doc:
    frames, quiet frames, runs, longest run — the trim-silence /
    segment-audio preprocessing stats. Framing is row-local; the only
    shuffle is the per-doc window."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        # split('') + ascii is O(len) per doc; the sequence+substring
        # spelling used elsewhere is O(len^2) (substring(text,i,1) walks
        # to i) — measured x100: 175 s -> the linear form (same values,
        # verified incl. multi-byte chars)
        "transform(split(text, ''), c -> ascii(c)) AS s",
    )
    frames = d.selectExpr(
        "doc_id",
        "explode(transform("
        " sequence(0, greatest(CAST(floor((size(s) - 32) / 32) AS INT), 0)),"
        " f -> struct(f AS frame,"
        "   CAST(aggregate(slice(s, f * 32 + 1, 32), 0L,"
        "        (a, x) -> a + x * x) AS BIGINT) AS energy))) AS fr",
    ).select("doc_id", F.col("fr.frame").alias("frame"),
             F.col("fr.energy").alias("energy"))
    quiet = frames.filter(F.col("energy") < 310000).withColumn(
        "isl",
        F.col("frame")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("frame")),
    )
    runs = (
        quiet.groupBy("doc_id", "isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("longest_run"),
            F.sum("run_len").alias("n_quiet"),
        )
    )
    totals = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return (
        totals.join(runs, "doc_id", "left")
        .selectExpr(
            "doc_id", "n_frames",
            "coalesce(n_quiet, 0L) AS n_quiet",
            "coalesce(n_runs, 0L) AS n_runs",
            "coalesce(longest_run, 0L) AS longest_run",
        )
        .orderBy("doc_id")
    )


QUERIES["mm_silence_runs"] = mm_silence_runs

ORACLES["mm_silence_runs"] = """
    WITH samples AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text)),
                              i -> ord(substr(text, i, 1))) AS s
        FROM documents
    ),
    fidx AS (
        SELECT doc_id, s,
               unnest(generate_series(0,
                   greatest(CAST(floor((len(s) - 32) / 32.0) AS INTEGER), 0)))
                   AS frame
        FROM samples
    ),
    frames AS (
        SELECT doc_id, frame,
               CAST(list_sum(list_transform(s[frame * 32 + 1 : frame * 32 + 32],
                                            x -> x * x)) AS BIGINT) AS energy
        FROM fidx
    ),
    quiet AS (
        SELECT doc_id, frame,
               frame - row_number() OVER (
                   PARTITION BY doc_id ORDER BY frame) AS isl
        FROM frames WHERE energy < 310000
    ),
    runs AS (
        SELECT doc_id, count(*) AS run_len
        FROM quiet GROUP BY doc_id, isl
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_runs, max(run_len) AS longest_run,
               sum(run_len) AS n_quiet
        FROM runs GROUP BY doc_id
    ),
    totals AS (
        SELECT doc_id, count(*) AS n_frames FROM frames GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_frames,
           CAST(coalesce(p.n_quiet, 0) AS BIGINT) AS n_quiet,
           CAST(coalesce(p.n_runs, 0) AS BIGINT) AS n_runs,
           CAST(coalesce(p.longest_run, 0) AS BIGINT) AS longest_run
    FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# 11. CUPED-adjusted A/B read-out (exact-integer sufficient statistics)
# ---------------------------------------------------------------------------
def ev_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B purchase metric (Deng et
    al. 2013, the standard experimentation trick): per user, the
    pre-period covariate x = centi-sum of purchase value before Jan 16
    and the metric y = centi-sum after; theta = cov(x,y)/var(x) pooled,
    and the reported treatment effect is the theta-adjusted mean
    difference. Arms split by md5(user_id) % 2.

    Exactness: values are scaled to exact centi-integers FIRST, so
    every sufficient statistic (n, Σx, Σy, Σxy, Σx²) is an
    order-independent exact BIGINT (cross-products bounded ~1e13/user,
    safe to ~1e5 heavy users per arm at 2^63); theta and the adjusted
    means are then the SAME double expressions over those exact ints in
    both engines. Scale shape: one groupBy(user_id), one tiny rollup —
    the CUPED math never sees row-level data."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).selectExpr(
        "user_id",
        "CAST(ts AS TIMESTAMP) AS tts",
        "CAST(floor(value * 100 + 0.5D) AS BIGINT) AS v",
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.expr(
                "CASE WHEN tts < TIMESTAMP '2024-01-16 00:00:00'"
                " THEN v ELSE 0 END")).alias("x"),
            F.sum(F.expr(
                "CASE WHEN tts >= TIMESTAMP '2024-01-16 00:00:00'"
                " THEN v ELSE 0 END")).alias("y"),
        )
        .selectExpr(
            "CASE WHEN CAST(conv(substring(md5(CAST(user_id AS STRING)),"
            " 1, 8), 16, 10) AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm",
            "x", "y",
        )
    )
    stats = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("CASE WHEN arm = 'A' THEN 1 ELSE 0 END")).alias("na"),
        F.sum(F.expr("CASE WHEN arm = 'A' THEN x ELSE 0 END")).alias("sxa"),
        F.sum(F.expr("CASE WHEN arm = 'A' THEN y ELSE 0 END")).alias("sya"),
        F.sum(F.expr("CASE WHEN arm = 'B' THEN 1 ELSE 0 END")).alias("nb"),
        F.sum(F.expr("CASE WHEN arm = 'B' THEN x ELSE 0 END")).alias("sxb"),
        F.sum(F.expr("CASE WHEN arm = 'B' THEN y ELSE 0 END")).alias("syb"),
    )
    # identical double-expression order on both sides (all inputs exact)
    return stats.selectExpr(
        "na AS n_a",
        "nb AS n_b",
        "round(CAST(syb AS DOUBLE) / nb - CAST(sya AS DOUBLE) / na, 4)"
        " AS diff_raw_centi",
        "round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
        " / n) / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
        " * CAST(sx AS DOUBLE) / n), 6) AS theta6",
        "round((CAST(syb AS DOUBLE) / nb - CAST(sya AS DOUBLE) / na)"
        " - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
        " / n) / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
        " * CAST(sx AS DOUBLE) / n))"
        " * (CAST(sxb AS DOUBLE) / nb - CAST(sxa AS DOUBLE) / na), 4)"
        " AS diff_cuped_centi",
    )


QUERIES["ev_ab_cuped"] = ev_ab_cuped

ORACLES["ev_ab_cuped"] = """
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS tts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    per_user AS (
        SELECT user_id,
               sum(CASE WHEN tts < TIMESTAMP '2024-01-16 00:00:00'
                        THEN v ELSE 0 END) AS x,
               sum(CASE WHEN tts >= TIMESTAMP '2024-01-16 00:00:00'
                        THEN v ELSE 0 END) AS y
        FROM e GROUP BY user_id
    ),
    armed AS (
        SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                    1, 8) AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
        FROM per_user
    ),
    stats AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
               CAST(sum(CASE WHEN arm = 'A' THEN x ELSE 0 END) AS BIGINT)
                   AS sxa,
               CAST(sum(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS BIGINT)
                   AS sya,
               CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb,
               CAST(sum(CASE WHEN arm = 'B' THEN x ELSE 0 END) AS BIGINT)
                   AS sxb,
               CAST(sum(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS BIGINT)
                   AS syb
        FROM armed
    )
    SELECT na AS n_a,
           nb AS n_b,
           round(CAST(syb AS DOUBLE) / nb - CAST(sya AS DOUBLE) / na, 4)
               AS diff_raw_centi,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sy AS DOUBLE) / n)
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE) / n), 6) AS theta6,
           round((CAST(syb AS DOUBLE) / nb - CAST(sya AS DOUBLE) / na)
                 - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sy AS DOUBLE) / n)
                    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sx AS DOUBLE) / n))
                 * (CAST(sxb AS DOUBLE) / nb - CAST(sxa AS DOUBLE) / na), 4)
               AS diff_cuped_centi
    FROM stats
"""


# ---------------------------------------------------------------------------
# 12. degree distribution of the near-dup graph
# ---------------------------------------------------------------------------
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the undirected near-dup graph (same edge set
    as graph_pagerank / connected components): how many docs have k
    near-duplicates. The shape-of-the-graph sanity check run before any
    iterative graph job — a heavy right tail means a boilerplate hub
    that will dominate label propagation. Linear: degree = one
    groupBy(node) over the symmetrized edges, histogram = one tiny
    groupBy(degree); the expensive shingle pipeline is computed once."""
    from kuibadb_spark.operators.graph import _edges

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
        .select("e.src")
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


QUERIES["graph_degree_distribution"] = graph_degree_distribution

from kuibadb_spark.operators.dedup import (  # noqa: E402
    _DUP_CORPUS_DUCK as _C3_CORPUS,
    _SHINGLES_DUCK as _C3_SHINGLES,
)

ORACLES["graph_degree_distribution"] = f"""
    WITH {_C3_CORPUS},
    {_C3_SHINGLES},
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
        SELECT src FROM edges UNION ALL SELECT dst FROM edges
    ),
    deg AS (
        SELECT src, count(*) AS degree FROM sym GROUP BY src
    )
    SELECT degree, count(*) AS n_nodes
    FROM deg
    GROUP BY degree
    ORDER BY degree
"""


# ---------------------------------------------------------------------------
# 13. Benford first-digit profile
# ---------------------------------------------------------------------------
def profile_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs the
    Benford expectation — the classic fabricated-data / ingest-anomaly
    smell test a profiler runs on monetary columns. Digit extraction is
    pure integer/string arithmetic on exact cents (no log, no float
    path): first char of the BIGINT's decimal rendering, which neither
    engine sci-notates. The Benford ppm column is a shared literal
    table (the nine constants sum to exactly 1,000,000). One scan, one
    9-bucket aggregate — free at any scale."""
    o = load(spark, sf_dir, "orders").selectExpr(
        "CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT) AS cents"
    ).filter(F.col("cents") > 0)
    digits = o.selectExpr(
        "CAST(substring(CAST(cents AS STRING), 1, 1) AS INT) AS digit"
    )
    benford = (
        "CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939"
        " WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947"
        " WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END"
    )
    counted = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    total = counted.agg(F.sum("n_orders").alias("total"))
    return (
        counted.crossJoin(total)
        .selectExpr(
            "digit", "n_orders",
            "(1000000 * n_orders) div total AS obs_ppm",
            f"{benford} AS benford_ppm",
            f"abs((1000000 * n_orders) div total - {benford}) AS abs_dev_ppm",
        )
        .orderBy("digit")
    )


QUERIES["profile_benford_digits"] = profile_benford_digits

ORACLES["profile_benford_digits"] = """
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    digits AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM cents WHERE cents > 0
    ),
    counted AS (
        SELECT digit, count(*) AS n_orders FROM digits GROUP BY digit
    ),
    total AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM counted)
    SELECT digit, n_orders,
           CAST((1000000 * n_orders) // total AS BIGINT) AS obs_ppm,
           CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                      WHEN 3 THEN 124939 WHEN 4 THEN 96910
                      WHEN 5 THEN 79181 WHEN 6 THEN 66947
                      WHEN 7 THEN 57992 WHEN 8 THEN 51153
                      ELSE 45757 END AS benford_ppm,
           CAST(abs((1000000 * n_orders) // total
               - CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                            WHEN 3 THEN 124939 WHEN 4 THEN 96910
                            WHEN 5 THEN 79181 WHEN 6 THEN 66947
                            WHEN 7 THEN 57992 WHEN 8 THEN 51153
                            ELSE 45757 END) AS BIGINT) AS abs_dev_ppm
    FROM counted CROSS JOIN total
    ORDER BY digit
"""


# ---------------------------------------------------------------------------
# 14. dyadic-weight EWMA over a bounded event frame
# ---------------------------------------------------------------------------
_EW_DEPTH = 20  # frame length; weights 2^-(0..19)


def ts_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted purchase value (halving weights,
    last 20 purchases) reported at each user's latest event — the
    decayed-engagement score feature stores serve. Weights are the
    DYADIC series 2^-k, so the weighted sum over milli-scaled integers
    is exact at EVERY accumulation order (scaled by 2^19 it is a plain
    BIGINT); the normalized score divides two exact integers. A bounded
    ROWS frame needs pair-dependent weights, which no windowed sum can
    see — 20 explicit lag() terms over ONE user exchange express it
    with zero joins (the ev_attribution_time_decay discipline).

    Scale: one shuffle (user_id), 20 lags on one sort, tiny final
    filter; depth is a constant, not a data term."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).selectExpr(
        "user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(floor(value * 1000 + 0.5D) AS BIGINT) AS v",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    lag_terms = " + ".join(
        f"coalesce(lag_v{k}, 0L) * shiftleft(CAST(1 AS BIGINT), {19 - k})"
        for k in range(_EW_DEPTH)
    )
    wsum_terms = " + ".join(
        f"CASE WHEN lag_v{k} IS NOT NULL THEN"
        f" shiftleft(CAST(1 AS BIGINT), {19 - k}) ELSE 0 END"
        for k in range(_EW_DEPTH)
    )
    df = e
    for k in range(_EW_DEPTH):
        df = df.withColumn(f"lag_v{k}", F.lag("v", k).over(w))
    latest = (
        df.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.col("us").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return latest.selectExpr(
        "user_id",
        f"{lag_terms} AS ewma_scaled",
        f"{wsum_terms} AS wsum_scaled",
        f"(1000 * ({lag_terms})) div ({wsum_terms}) AS ewma_micro",
    ).orderBy("user_id")


QUERIES["ts_ewma_decay"] = ts_ewma_decay

_EW_LAGS_DUCK = ",\n               ".join(
    f"lag(v, {k}) OVER w AS lag_v{k}" for k in range(_EW_DEPTH)
)
_EW_SUM_DUCK = " + ".join(
    f"coalesce(lag_v{k}, 0) * (CAST(1 AS BIGINT) << {19 - k})"
    for k in range(_EW_DEPTH)
)
_EW_W_DUCK = " + ".join(
    f"CASE WHEN lag_v{k} IS NOT NULL THEN (CAST(1 AS BIGINT) << {19 - k})"
    f" ELSE 0 END" for k in range(_EW_DEPTH)
)

ORACLES["ts_ewma_decay"] = f"""
    WITH e AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    lagged AS (
        SELECT user_id, us, event_id,
               {_EW_LAGS_DUCK}
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    latest AS (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY us DESC, event_id DESC) AS rk
        FROM lagged
    )
    SELECT user_id,
           CAST({_EW_SUM_DUCK} AS BIGINT) AS ewma_scaled,
           CAST({_EW_W_DUCK} AS BIGINT) AS wsum_scaled,
           CAST((1000 * ({_EW_SUM_DUCK})) // ({_EW_W_DUCK}) AS BIGINT)
               AS ewma_micro
    FROM latest WHERE rk = 1
    ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 15. run-length compression stats of event-type sequences
# ---------------------------------------------------------------------------
def ev_type_rle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length structure of each user's event-type stream — how
    compressible behavior is (many long runs = bot-like repetition, the
    session-replay storage estimate AND an abuse signal). Change points
    come from one lag() on the user sort; run lengths from the
    change-point cumsum; per user: events, runs, longest run, and the
    RLE ratio in ppm. Two windows and two aggregates, all on the same
    user_id exchange."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    marked = e.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.col("event_type") != F.lag("event_type").over(w)),
            1,
        ).otherwise(0),
    ).withColumn("run_id", F.sum("chg").over(w))
    per_run = marked.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        per_run.groupBy("user_id")
        .agg(
            F.sum("run_len").alias("n_events"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("longest_run"),
        )
        .selectExpr(
            "user_id", "n_events", "n_runs", "longest_run",
            "(1000000 * n_runs) div n_events AS rle_ppm",
        )
        .orderBy("user_id")
    )


QUERIES["ev_type_rle_stats"] = ev_type_rle_stats

ORACLES["ev_type_rle_stats"] = """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    marked AS (
        SELECT user_id, us, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR event_type <> lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    runs AS (
        SELECT user_id,
               sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM marked
    ),
    per_run AS (
        SELECT user_id, run_id, count(*) AS run_len
        FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS n_events,
           count(*) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST((1000000 * count(*)) // sum(run_len) AS BIGINT) AS rle_ppm
    FROM per_run
    GROUP BY user_id
    ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 16. sliding-window HLL: trailing-24h distinct users per hour
# ---------------------------------------------------------------------------
def agg_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour distinct-user estimate at every hour — the
    sketch property agg_hll_set_ops shows across GROUPS, exercised
    across TIME: hourly HLL registers merge into any trailing window by
    register-wise max (a RANGE frame over the hour value), so the
    dashboard never rescans raw events. Exact trailing distinct rides
    along via the bounded ×24 (user, hour) expansion (the ev_dau_wau_mau
    idiom) as ground truth.

    The register grid is DENSIFIED (hours × 64 buckets) before the
    frame so a bucket inactive in hour h still carries its trailing max
    into h's estimate; grid size is hours × 64 — a metadata-scale frame
    at any corpus size (a year is 560k rows). All register arithmetic
    is the exact-integer HLL of agg_hll_handrolled."""
    e = load(spark, sf_dir, "events").selectExpr(
        "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000 AS hour",
        "user_id",
    )
    regs = (
        e.selectExpr(
            "hour",
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT) AS h",
        )
        .selectExpr("hour", "h % 64 AS bucket", "h div 64 AS rest")
        .groupBy("hour", "bucket")
        .agg(F.expr(
            "max(least(bit_count((rest & -rest) - 1) + 1, 55))").alias("m"))
    )
    bounds = e.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.selectExpr(
        "explode(sequence(h0, h1)) AS hour"
    ).selectExpr(
        "hour", "explode(sequence(0, 63)) AS bucket"
    )
    from pyspark.sql import Window as W

    dense = grid.join(regs, ["hour", "bucket"], "left")
    w24 = (
        W.partitionBy("bucket").orderBy("hour").rangeBetween(-23, 0)
    )
    est = (
        dense.withColumn("m24", F.max("m").over(w24))
        .groupBy("hour")
        .agg(
            F.expr("sum(CASE WHEN m24 IS NULL THEN"
                   " shiftleft(CAST(1 AS BIGINT), 55)"
                   " ELSE shiftleft(CAST(1 AS BIGINT), 55 - m24) END)"
                   ).alias("hll_sum_scaled"),
        )
        .selectExpr(
            "hour",
            "round(0.709D * 4096 * pow(2.0D, 55) / hll_sum_scaled, 4)"
            " AS hll_24h",
        )
    )
    exact = (
        e.distinct()
        .selectExpr("user_id", "explode(sequence(hour, hour + 23)) AS ehour")
        .distinct()
        .groupBy(F.col("ehour").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_exact_24h"))
    )
    return (
        est.join(exact, "hour", "inner")
        .join(bounds.selectExpr("h1"), F.col("hour") <= F.col("h1"))
        .select("hour", "n_exact_24h", "hll_24h")
        .orderBy("hour")
    )


QUERIES["agg_hll_sliding_distinct"] = agg_hll_sliding_distinct

ORACLES["agg_hll_sliding_distinct"] = """
    WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour,
               user_id
        FROM events
    ),
    regs AS (
        SELECT hour,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 64 AS bucket,
               max(least(bit_count(
                   ((CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                     AS BIGINT) // 64)
                    & -(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                        AS BIGINT) // 64)) - 1) + 1, 55)) AS m
        FROM e GROUP BY 1, 2
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    hours AS (
        SELECT unnest(generate_series(h0, h1)) AS hour FROM bounds
    ),
    grid AS (
        SELECT h.hour, b.bucket
        FROM hours h, (SELECT unnest(generate_series(0, 63)) AS bucket) b
    ),
    dense AS (
        SELECT g.hour, g.bucket, r.m
        FROM grid g LEFT JOIN regs r
          ON g.hour = r.hour AND g.bucket = r.bucket
    ),
    rolled AS (
        SELECT hour, bucket,
               max(m) OVER (PARTITION BY bucket ORDER BY hour
                            RANGE BETWEEN 23 PRECEDING AND CURRENT ROW) AS m24
        FROM dense
    ),
    est AS (
        SELECT hour,
               round(CAST(0.709 AS DOUBLE) * 4096 * pow(2.0, 55)
                     / CAST(sum(CASE WHEN m24 IS NULL
                                     THEN (CAST(1 AS BIGINT) << 55)
                                     ELSE (CAST(1 AS BIGINT) << (55 - m24))
                                END) AS BIGINT), 4) AS hll_24h
        FROM rolled GROUP BY hour
    ),
    expanded AS (
        SELECT DISTINCT user_id, hour + x.i AS ehour
        FROM (SELECT DISTINCT user_id, hour FROM e) u,
             (SELECT unnest(generate_series(0, 23)) AS i) x
    ),
    exact AS (
        SELECT ehour AS hour, count(*) AS n_exact_24h
        FROM expanded GROUP BY ehour
    )
    SELECT s.hour, x.n_exact_24h, s.hll_24h
    FROM est s
    JOIN exact x ON s.hour = x.hour
    JOIN bounds b ON s.hour <= b.h1
    ORDER BY s.hour
"""


# ---------------------------------------------------------------------------
# 17. funnel time-to-convert quartiles (histogram selection, minute grain)
# ---------------------------------------------------------------------------
def ev_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long signup → first purchase takes: type-7 quartiles of the
    conversion delay at minute grain, plus the exact integer mean — the
    funnel-latency read-out next to ev_funnel_signup_purchase's rates.

    Uses the histogram rank-selection shape proven in
    profile_outlier_iqr: delays quantize to whole minutes (bounded
    domain ≈ timeline span), the cumulative-count brackets locate the
    quartile ranks over DISTINCT minute values, so no window ever sorts
    per-user rows — the single-group cumsum runs over at most
    span-in-minutes rows at ANY user count."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    ).selectExpr(
        "user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias(
            "s_us"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
            "p_us"),
    )
    delays = firsts.filter(
        F.col("s_us").isNotNull() & (F.col("p_us") > F.col("s_us"))
    ).selectExpr("(p_us - s_us) div 60000000 AS mins")
    hist = delays.groupBy("mins").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.orderBy("mins")
    cum = (
        hist.withColumn("cum_hi", F.sum("cnt").over(w))
        .withColumn("cum_lo", F.col("cum_hi") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(
            W.partitionBy(F.lit(1))))
        .withColumn("lo25", F.expr("((n - 1) * 25) div 100"))
        .withColumn("f25", F.expr("((n - 1) * 25) % 100 / 100.0D"))
        .withColumn("lo50", F.expr("((n - 1) * 50) div 100"))
        .withColumn("f50", F.expr("((n - 1) * 50) % 100 / 100.0D"))
        .withColumn("lo75", F.expr("((n - 1) * 75) div 100"))
        .withColumn("f75", F.expr("((n - 1) * 75) % 100 / 100.0D"))
    )
    return cum.agg(
        F.max("n").alias("n_converted"),
        F.sum(F.expr(
            """CASE WHEN lo25 + 1 > cum_lo AND lo25 + 1 <= cum_hi
                    THEN mins * (1.0D - f25) ELSE 0.0D END
             + CASE WHEN lo25 + 2 > cum_lo AND lo25 + 2 <= cum_hi
                    THEN mins * f25 ELSE 0.0D END""")).alias("q1_min"),
        F.sum(F.expr(
            """CASE WHEN lo50 + 1 > cum_lo AND lo50 + 1 <= cum_hi
                    THEN mins * (1.0D - f50) ELSE 0.0D END
             + CASE WHEN lo50 + 2 > cum_lo AND lo50 + 2 <= cum_hi
                    THEN mins * f50 ELSE 0.0D END""")).alias("median_min"),
        F.sum(F.expr(
            """CASE WHEN lo75 + 1 > cum_lo AND lo75 + 1 <= cum_hi
                    THEN mins * (1.0D - f75) ELSE 0.0D END
             + CASE WHEN lo75 + 2 > cum_lo AND lo75 + 2 <= cum_hi
                    THEN mins * f75 ELSE 0.0D END""")).alias("q3_min"),
        F.expr("sum(mins * cnt)").alias("sum_min"),
    ).selectExpr(
        "n_converted", "q1_min", "median_min", "q3_min",
        "(1000 * sum_min) div n_converted AS mean_milli_min",
    )


QUERIES["ev_time_to_convert"] = ev_time_to_convert

ORACLES["ev_time_to_convert"] = """
    WITH e AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN us END) AS s_us,
               min(CASE WHEN event_type = 'purchase' THEN us END) AS p_us
        FROM e GROUP BY user_id
    ),
    delays AS (
        SELECT (p_us - s_us) // 60000000 AS mins
        FROM firsts WHERE s_us IS NOT NULL AND p_us > s_us
    ),
    hist AS (SELECT mins, count(*) AS cnt FROM delays GROUP BY mins),
    cum AS (
        SELECT mins, cnt,
               sum(cnt) OVER (ORDER BY mins
                              ROWS UNBOUNDED PRECEDING) AS cum_hi,
               sum(cnt) OVER (ORDER BY mins
                              ROWS UNBOUNDED PRECEDING) - cnt AS cum_lo,
               sum(cnt) OVER () AS n
        FROM hist
    ),
    pos AS (
        SELECT *,
               ((n - 1) * 25) // 100 AS lo25, ((n - 1) * 25) % 100 / 100.0 AS f25,
               ((n - 1) * 50) // 100 AS lo50, ((n - 1) * 50) % 100 / 100.0 AS f50,
               ((n - 1) * 75) // 100 AS lo75, ((n - 1) * 75) % 100 / 100.0 AS f75
        FROM cum
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converted,
           sum(CASE WHEN lo25 + 1 > cum_lo AND lo25 + 1 <= cum_hi
                    THEN mins * (1.0 - f25) ELSE 0.0 END
             + CASE WHEN lo25 + 2 > cum_lo AND lo25 + 2 <= cum_hi
                    THEN mins * f25 ELSE 0.0 END) AS q1_min,
           sum(CASE WHEN lo50 + 1 > cum_lo AND lo50 + 1 <= cum_hi
                    THEN mins * (1.0 - f50) ELSE 0.0 END
             + CASE WHEN lo50 + 2 > cum_lo AND lo50 + 2 <= cum_hi
                    THEN mins * f50 ELSE 0.0 END) AS median_min,
           sum(CASE WHEN lo75 + 1 > cum_lo AND lo75 + 1 <= cum_hi
                    THEN mins * (1.0 - f75) ELSE 0.0 END
             + CASE WHEN lo75 + 2 > cum_lo AND lo75 + 2 <= cum_hi
                    THEN mins * f75 ELSE 0.0 END) AS q3_min,
           CAST((1000 * sum(mins * cnt)) // max(n) AS BIGINT)
               AS mean_milli_min
    FROM pos
"""


# ---------------------------------------------------------------------------
# 18. cohort LTV triangle (cumulative revenue by signup cohort x age)
# ---------------------------------------------------------------------------
def ev_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LTV triangle: users cohorted by signup week, purchase
    revenue accumulated by weeks-since-signup — finance's retention
    read-out (each cohort row is a revenue curve; flattening curves =
    decaying cohorts). Revenue is exact centi-integers; the cumulative
    pass is a window over the (cohort, age) GRID (weeks × weeks — a
    metadata-scale frame at any user count), partitioned by cohort
    week. Two shuffles: user join, grid aggregate."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(floor(value * 100 + 0.5D) AS BIGINT) AS cents",
    )
    signups = e.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("us").alias("s_us")).selectExpr(
        "user_id", "s_us div 604800000000 AS cohort_wk", "s_us"
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("us") >= F.col("s_us"))
        .selectExpr(
            "cohort_wk",
            "(us - s_us) div 604800000000 AS age_wk",
            "cents",
        )
        .groupBy("cohort_wk", "age_wk")
        .agg(F.sum("cents").alias("wk_cents"))
    )
    cohort_sizes = signups.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w = W.partitionBy("cohort_wk").orderBy("age_wk")
    return (
        rev.withColumn("cum_cents", F.sum("wk_cents").over(
            w.rowsBetween(W.unboundedPreceding, 0)))
        .join(cohort_sizes, "cohort_wk")
        .selectExpr(
            "cohort_wk", "age_wk", "n_users", "wk_cents", "cum_cents",
            "cum_cents div n_users AS ltv_cents_per_user",
        )
        .orderBy("cohort_wk", "age_wk")
    )


QUERIES["ev_cohort_ltv_curve"] = ev_cohort_ltv_curve

ORACLES["ev_cohort_ltv_curve"] = """
    WITH e AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    signups AS (
        SELECT user_id, min(us) // 604800000000 AS cohort_wk,
               min(us) AS s_us
        FROM e WHERE event_type = 'signup' GROUP BY user_id
    ),
    rev AS (
        SELECT s.cohort_wk, (p.us - s.s_us) // 604800000000 AS age_wk,
               CAST(sum(p.cents) AS BIGINT) AS wk_cents
        FROM e p JOIN signups s ON p.user_id = s.user_id
        WHERE p.event_type = 'purchase' AND p.us >= s.s_us
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_wk, count(*) AS n_users FROM signups GROUP BY cohort_wk
    ),
    cum AS (
        SELECT cohort_wk, age_wk, wk_cents,
               CAST(sum(wk_cents) OVER (PARTITION BY cohort_wk ORDER BY age_wk
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_cents
        FROM rev
    )
    SELECT c.cohort_wk, c.age_wk, z.n_users, c.wk_cents, c.cum_cents,
           c.cum_cents // z.n_users AS ltv_cents_per_user
    FROM cum c JOIN sizes z ON c.cohort_wk = z.cohort_wk
    ORDER BY c.cohort_wk, c.age_wk
"""


# ---------------------------------------------------------------------------
# 19. MAD-based robust anomaly detection (two-level histogram selection)
# ---------------------------------------------------------------------------
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counting per event type: median absolute
    deviation (MAD) instead of ev_anomaly_zscore's mean/stddev — the
    estimator outliers cannot poison (a z-score inflates its own stddev
    and hides its tail; the 50% breakdown point of MAD does not).
    Flag |x - median| > 3 * 1.4826 * MAD (the normal-consistency
    convention).

    Everything stays INTEGER: values quantize to cents, the median is
    selected in DOUBLED units (med2 = 2*median is exact for both parity
    classes of n), deviations dev = |2x - med2| are integers, the MAD
    selects from the deviation histogram in doubled units again (mad4 =
    4*MAD), and the flag |x-med| > 3*1.4826*MAD cross-multiplies to the
    integer inequality 20000*dev > 3*14826*mad4 — no float ever appears. Both medians
    run the histogram rank-selection shape (distinct-value windows, the
    profile_outlier_iqr discipline), so nothing sorts raw rows."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).selectExpr(
        "event_type AS typ",
        "CAST(floor(value * 100 + 0.5D) AS BIGINT) AS cents",
    )
    h1 = e.groupBy("typ", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    wt = W.partitionBy("typ")

    def _med2(hist, valcol, out):
        """2x the type-7 median of `valcol` over a (typ, val, cnt)
        histogram, as an exact BIGINT column named `out`."""
        cum = (
            hist.withColumn("cum_hi", F.sum("cnt").over(
                wt.orderBy(valcol)))
            .withColumn("cum_lo", F.col("cum_hi") - F.col("cnt"))
            .withColumn("n", F.sum("cnt").over(wt))
            .withColumn("lo", F.expr("((n - 1) * 50) div 100"))
            .withColumn("odd", F.expr("((n - 1) * 50) % 100"))
        )
        return cum.groupBy("typ").agg(
            F.max("n").alias("n"),
            F.sum(F.expr(
                f"""CASE WHEN lo + 1 > cum_lo AND lo + 1 <= cum_hi
                       THEN {valcol} * (CASE WHEN odd = 0 THEN 2 ELSE 1 END)
                       ELSE 0 END
                 + CASE WHEN odd <> 0 AND lo + 2 > cum_lo
                            AND lo + 2 <= cum_hi
                       THEN {valcol} ELSE 0 END""")).alias(out),
        )

    med = _med2(h1, "cents", "med2")
    h2 = (
        h1.join(F.broadcast(med.select("typ", "med2")), "typ")
        .selectExpr("typ", "abs(2 * cents - med2) AS dev", "cnt")
        .groupBy("typ", "dev")
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = _med2(h2, "dev", "mad4").withColumnRenamed("n", "n_dev")
    flags = (
        h2.join(F.broadcast(mad.select("typ", "mad4")), "typ")
        .groupBy("typ")
        .agg(F.sum(F.expr(
            "CASE WHEN 20000 * dev > 3 * 14826 * mad4 THEN cnt"
            " ELSE 0 END")).alias("n_anomalies"))
    )
    return (
        med.join(mad.select("typ", "mad4"), "typ")
        .join(flags, "typ")
        .select("typ", "n", "med2", "mad4", "n_anomalies")
        .orderBy("typ")
    )


QUERIES["ev_anomaly_mad"] = ev_anomaly_mad

ORACLES["ev_anomaly_mad"] = """
    WITH e AS (
        SELECT event_type AS typ,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    h1 AS (SELECT typ, cents, count(*) AS cnt FROM e GROUP BY typ, cents),
    c1 AS (
        SELECT typ, cents, cnt,
               sum(cnt) OVER (PARTITION BY typ ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum_hi,
               sum(cnt) OVER (PARTITION BY typ ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) - cnt AS cum_lo,
               sum(cnt) OVER (PARTITION BY typ) AS n
        FROM h1
    ),
    p1 AS (
        SELECT *, ((n - 1) * 50) // 100 AS lo, ((n - 1) * 50) % 100 AS odd
        FROM c1
    ),
    med AS (
        SELECT typ, max(n) AS n,
               CAST(sum(CASE WHEN lo + 1 > cum_lo AND lo + 1 <= cum_hi
                        THEN cents * (CASE WHEN odd = 0 THEN 2 ELSE 1 END)
                        ELSE 0 END
                  + CASE WHEN odd <> 0 AND lo + 2 > cum_lo
                             AND lo + 2 <= cum_hi
                        THEN cents ELSE 0 END) AS BIGINT) AS med2
        FROM p1 GROUP BY typ
    ),
    h2 AS (
        SELECT h.typ, abs(2 * h.cents - m.med2) AS dev,
               CAST(sum(h.cnt) AS BIGINT) AS cnt
        FROM h1 h JOIN med m ON h.typ = m.typ
        GROUP BY 1, 2
    ),
    c2 AS (
        SELECT typ, dev, cnt,
               sum(cnt) OVER (PARTITION BY typ ORDER BY dev
                              ROWS UNBOUNDED PRECEDING) AS cum_hi,
               sum(cnt) OVER (PARTITION BY typ ORDER BY dev
                              ROWS UNBOUNDED PRECEDING) - cnt AS cum_lo,
               sum(cnt) OVER (PARTITION BY typ) AS n
        FROM h2
    ),
    p2 AS (
        SELECT *, ((n - 1) * 50) // 100 AS lo, ((n - 1) * 50) % 100 AS odd
        FROM c2
    ),
    mad AS (
        SELECT typ,
               CAST(sum(CASE WHEN lo + 1 > cum_lo AND lo + 1 <= cum_hi
                        THEN dev * (CASE WHEN odd = 0 THEN 2 ELSE 1 END)
                        ELSE 0 END
                  + CASE WHEN odd <> 0 AND lo + 2 > cum_lo
                             AND lo + 2 <= cum_hi
                        THEN dev ELSE 0 END) AS BIGINT) AS mad4
        FROM p2 GROUP BY typ
    ),
    flags AS (
        SELECT h.typ,
               CAST(sum(CASE WHEN 20000 * h.dev > 3 * 14826 * d.mad4
                             THEN h.cnt ELSE 0 END) AS BIGINT)
                   AS n_anomalies
        FROM h2 h JOIN mad d ON h.typ = d.typ
        GROUP BY h.typ
    )
    SELECT m.typ, CAST(m.n AS BIGINT) AS n, m.med2, d.mad4, f.n_anomalies
    FROM med m JOIN mad d ON m.typ = d.typ JOIN flags f ON m.typ = f.typ
    ORDER BY m.typ
"""


# ---------------------------------------------------------------------------
# 20. approximate kNN graph build (the graph-ANN index construction step)
# ---------------------------------------------------------------------------
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the in-cluster top-3 kNN edge list for EVERY vector — the
    construction step of graph-based ANN indexes (and of kNN-graph
    clustering), distinct from sim_knn_classify's few-query probe: here
    the whole corpus is both query and target. Candidates come from the
    SemDeDup cluster assignment (sim_semdedup_clusters' exact-integer
    argmax over the vec_id<8 seeds); each (cluster, slice) cogroup task
    scores its block with one integer matmul and emits only its local
    top-3 per query, so the global window ranks ≤ 3·S candidate rows
    per vector, never the full pair set.

    Cosines divide an exact-integer dot by sqrt of an exact-integer
    product — the same double expression in both engines; ranking
    tie-breaks on neighbor id. Output is the integer ppm edge list."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(CAST(embedding AS ARRAY<DOUBLE>),"
        " x -> CAST(floor(x * 1000.0D + 0.5D) AS BIGINT)) AS q",
    ).withColumn("n", F.expr("aggregate(q, 0L, (acc, x) -> acc + x * x)"))

    cent = [
        (int(r["vec_id"]), list(r["q"]), int(r["n"]))
        for r in e.filter(F.col("vec_id") < _SD_K).collect()
    ]
    cent.sort()
    c_mat = np.array([c[1] for c in cent], dtype=np.int64)
    c_norm = np.array([c[2] for c in cent], dtype=np.int64)
    c_ids = np.array([c[0] for c in cent], dtype=np.int64)

    def _assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
            D = A @ c_mat.T
            score = np.sign(D) * (D.astype(np.float64) ** 2) / c_norm
            j = np.argmax(score, axis=1)
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

    def _topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"cluster_id": pd.Series(dtype="int64"),
             "src": pd.Series(dtype="int64"),
             "dst": pd.Series(dtype="int64"),
             "cos_ppm": pd.Series(dtype="int64")}
        )
        if left.empty or right.empty:
            return empty
        A = np.vstack(left["q"].to_numpy()).astype(np.int64)
        B = np.vstack(right["q"].to_numpy()).astype(np.int64)
        D = (A @ B.T).astype(np.float64)
        na = left["n"].to_numpy().astype(np.float64)
        nb = right["n"].to_numpy().astype(np.float64)
        cos = D / np.sqrt(na[:, None] * nb[None, :])
        ids_a = left["vec_id"].to_numpy()
        ids_b = right["vec_id"].to_numpy()
        # rank in PPM units (the output grain), not raw cos: the global
        # window merges per-task candidates by (cos_ppm desc, dst asc),
        # so the local cut must use the identical order or a raw-cos
        # tie-at-ppm could drop the id the oracle keeps
        ppm_m = (np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)).astype(
            np.int64
        )
        self_mask = ids_a[:, None] == ids_b[None, :]
        ppm_m[self_mask] = -(2 * 10**6)  # below any real cosine
        out = []
        k = min(3, ppm_m.shape[1])
        for i in range(ppm_m.shape[0]):
            row = ppm_m[i]
            order = np.lexsort((ids_b, -row))[:k]
            for j in order:
                if row[j] <= -(2 * 10**6):
                    continue
                out.append((int(left["cluster_id"].iloc[0]),
                            int(ids_a[i]), int(ids_b[j]), int(row[j])))
        if not out:
            return empty
        return pd.DataFrame(out, columns=["cluster_id", "src", "dst",
                                          "cos_ppm"])

    cands = (
        a_side.groupBy("cluster_id", "sl")
        .cogroup(b_side.groupBy("cluster_id", "sl"))
        .applyInPandas(
            _topk,
            "cluster_id bigint, src bigint, dst bigint, cos_ppm bigint",
        )
    )
    w = W.partitionBy("src").orderBy(F.desc("cos_ppm"), F.asc("dst"))
    return (
        cands.withColumn(
            "rank", F.row_number().over(w).cast("bigint")  # duck rn = i64
        )
        .filter(F.col("rank") <= 3)
        .select("cluster_id", "src", "rank", "dst", "cos_ppm")
        .orderBy("src", "rank")
    )


QUERIES["sim_knn_graph"] = sim_knn_graph

ORACLES["sim_knn_graph"] = """
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
        SELECT a.cluster_id, a.vec_id AS src, b.vec_id AS dst,
               CAST(list_dot_product(a.q, b.q) AS DOUBLE)
               / sqrt(CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS cos
        FROM assigned a JOIN assigned b
          ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT cluster_id, src, dst,
               CAST(CASE WHEN cos >= 0
                         THEN floor(cos * 1000000 + 0.5)
                         ELSE -floor(-cos * 1000000 + 0.5) END AS BIGINT)
                   AS cos_ppm,
               row_number() OVER (
                   PARTITION BY src
                   ORDER BY CAST(CASE WHEN cos >= 0
                            THEN floor(cos * 1000000 + 0.5)
                            ELSE -floor(-cos * 1000000 + 0.5) END AS BIGINT)
                            DESC, dst ASC) AS rank
        FROM pairs
    )
    SELECT cluster_id, src, rank, dst, cos_ppm
    FROM ranked WHERE rank <= 3
    ORDER BY src, rank
"""


# ---------------------------------------------------------------------------
# 21. Kaplan-Meier retention survival curve
# ---------------------------------------------------------------------------
def ev_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of SESSION DURATIONS: how long a
    10-minute-gap session survives before going idle, with sessions
    still open at the end of the timeline right-censored — the duration
    analysis a product team reads as "50% of sessions last >= X min".
    (User-level churn is degenerate in this fixture — nearly every user
    is active to the last day — so the session is the survival subject.)

    Numerics: S(t) = Π (1 - d_t/n_t) as exp of an ORDERED running sum
    of ln terms — cumulative windows accumulate in frame order, so both
    engines add the same doubles in the same sequence; ln/exp are
    libm-level (scalar.py rule), so the output rounds to 4. The
    duration-grain table is bounded by the longest session in minutes,
    so every window here is metadata-scale; the 1-row horizon broadcast
    is a whitelisted scalar cross (plan_audit)."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = 10 * 60 * 1_000_000
    sess = (
        e.withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > gap),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
    )
    horizon = e.agg(F.max("us").alias("max_us"))
    obs = sess.crossJoin(F.broadcast(horizon)).selectExpr(
        "(e_us - s_us) div 60000000 AS dur_min",
        f"CASE WHEN max_us - e_us <= {gap} THEN 1 ELSE 0 END AS censored",
    )
    by_dur = obs.groupBy("dur_min").agg(
        F.sum(F.expr("1 - censored")).alias("deaths"),
        F.sum("censored").alias("n_censored"),
    )
    w_rev = W.orderBy(F.desc("dur_min")).rowsBetween(
        W.unboundedPreceding, 0
    )
    w_fwd = W.orderBy("dur_min").rowsBetween(W.unboundedPreceding, 0)
    curve = (
        by_dur.withColumn(
            "n_at_risk", F.sum(F.expr("deaths + n_censored")).over(w_rev)
        )
        .filter(F.col("deaths") > 0)
        .withColumn(
            "term",
            F.expr("CASE WHEN deaths < n_at_risk THEN"
                   " ln(1.0D - CAST(deaths AS DOUBLE) / n_at_risk)"
                   " ELSE NULL END"),
        )
        .withColumn("cum_ln", F.sum("term").over(w_fwd))
    )
    return curve.selectExpr(
        "dur_min",
        "n_at_risk",
        "deaths",
        "CASE WHEN deaths < n_at_risk THEN round(exp(cum_ln), 4)"
        " ELSE 0.0D END AS survival4",
    ).orderBy("dur_min")


QUERIES["ev_survival_km"] = ev_survival_km

ORACLES["ev_survival_km"] = """
    WITH e AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    marked AS (
        SELECT user_id, us,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 600000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sids AS (
        SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    ),
    sess AS (
        SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
        FROM sids GROUP BY user_id, sid
    ),
    horizon AS (SELECT max(us) AS max_us FROM e),
    obs AS (
        SELECT (e_us - s_us) // 60000000 AS dur_min,
               CASE WHEN max_us - e_us <= 600000000 THEN 1 ELSE 0 END
                   AS censored
        FROM sess CROSS JOIN horizon
    ),
    by_dur AS (
        SELECT dur_min,
               CAST(sum(1 - censored) AS BIGINT) AS deaths,
               CAST(sum(censored) AS BIGINT) AS n_censored
        FROM obs GROUP BY dur_min
    ),
    risk AS (
        SELECT dur_min, deaths,
               CAST(sum(deaths + n_censored) OVER (
                   ORDER BY dur_min DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
        FROM by_dur
    ),
    curve AS (
        SELECT dur_min, deaths, n_at_risk,
               sum(CASE WHEN deaths < n_at_risk THEN
                       ln(1.0 - CAST(deaths AS DOUBLE) / n_at_risk)
                   ELSE NULL END) OVER (
                   ORDER BY dur_min ROWS UNBOUNDED PRECEDING) AS cum_ln
        FROM risk WHERE deaths > 0
    )
    SELECT dur_min, n_at_risk, deaths,
           CASE WHEN deaths < n_at_risk THEN round(exp(cum_ln), 4)
                ELSE 0.0 END AS survival4
    FROM curve
    ORDER BY dur_min
"""


# ---------------------------------------------------------------------------
# 22. LSH bucket-size observability (the hot-bucket audit)
# ---------------------------------------------------------------------------
def dedup_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational observability for every banded-LSH operator in this
    repo: per MinHash band, the bucket count, the largest bucket, how
    many buckets exceed the hot-bucket cap (8), and the candidate-pair
    bill Σ sz·(sz-1)/2 those buckets would generate — the number an
    operator reads BEFORE running a dedup pass to know whether a
    boilerplate hub is about to explode the join. Same signature
    pipeline as dedup_minhash_lsh (dedup.py:234 — one md5 per shingle,
    universal-hash family, 4 bands × 3 rows); the stats are one extra
    tiny aggregate on the band table, all integers."""
    from kuibadb_spark.operators.dedup import (
        _BANDS, _K, _P, _dup_corpus,
    )

    c = _dup_corpus(spark, sf_dir)
    toks = c.withColumn("w", F.split("text", r"\s+"))
    sh = toks.select(
        "doc_id",
        F.explode_outer(
            F.expr(
                "CASE WHEN size(w) < 3 THEN array() "
                "ELSE transform(sequence(1, size(w) - 2), "
                "i -> concat_ws(' ', element_at(w, i), element_at(w, i+1),"
                " element_at(w, i+2))) END"
            )
        ).alias("shingle"),
    ).filter(F.col("shingle").isNotNull())
    hashed = sh.select(
        "doc_id",
        (F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
         % _P).alias("ha"),
        (F.conv(F.substring(F.md5("shingle"), 9, 8), 16, 10).cast("bigint")
         % _P).alias("hb"),
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("ha") + i * F.col("hb")) % _P).alias(f"h{i}")
            for i in range(_K)
        ]
    )
    band_exprs = ", ".join(
        f"{j}, concat_ws(':', h{3*j}, h{3*j+1}, h{3*j+2})"
        for j in range(_BANDS)
    )
    bands = sig.selectExpr(
        "doc_id",
        f"stack({_BANDS}, {band_exprs}) AS (band_idx, band_hash)",
    )
    buckets = bands.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        buckets.groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket"),
            F.sum(F.expr("CASE WHEN sz >= 8 THEN 1 ELSE 0 END")).alias(
                "n_hot_buckets"),
            F.sum(F.expr("sz * (sz - 1) div 2")).alias("candidate_pairs"),
        )
        .selectExpr("CAST(band_idx AS INT) AS band_idx", "n_buckets",
                    "max_bucket", "n_hot_buckets", "candidate_pairs")
        .orderBy("band_idx")
    )


QUERIES["dedup_lsh_bucket_stats"] = dedup_lsh_bucket_stats

from kuibadb_spark.operators.dedup import (  # noqa: E402
    _BAND_ROWS as _C3_BAND_ROWS,
    _SHINGLES_DUCK as _C3_SH,
    _SIG_COLS as _C3_SIG_COLS,
)
from kuibadb_spark.operators.dedup import _P as _C3_P  # noqa: E402

ORACLES["dedup_lsh_bucket_stats"] = f"""
    WITH {_C3_CORPUS},
    {_C3_SH},
    hashed AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {_C3_P}
                   AS ha,
               CAST('0x' || substr(md5(shingle), 9, 8) AS BIGINT) % {_C3_P}
                   AS hb
        FROM shingles
    ),
    sig AS (
        SELECT doc_id,
           {_C3_SIG_COLS}
        FROM hashed GROUP BY doc_id
    ),
    bands AS ({_C3_BAND_ROWS}),
    buckets AS (
        SELECT band_idx, band_hash, count(*) AS sz
        FROM bands GROUP BY band_idx, band_hash
    )
    SELECT CAST(band_idx AS INTEGER) AS band_idx,
           count(*) AS n_buckets,
           CAST(max(sz) AS BIGINT) AS max_bucket,
           CAST(sum(CASE WHEN sz >= 8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hot_buckets,
           CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM buckets
    GROUP BY band_idx
    ORDER BY band_idx
"""
