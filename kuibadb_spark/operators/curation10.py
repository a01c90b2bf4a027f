"""Round-4 batch 5: sparse lexical similarity, absorbing-state
analysis, cross-document watermark detection, survey-design
allocation, small-sample ranking bounds, retention curve fitting, and
corpus language-mix entropy.

Registered after curation9 in registry._MODULES (rounds 4/5 grading
windows undisturbed; gradable from round 6). Determinism rules are
curation5-9's.
"""

from __future__ import annotations

from statistics import NormalDist

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.operators.dedup import _DUP_CORPUS_DUCK, _dup_corpus

QUERIES: dict = {}
ORACLES: dict = {}


def _micro(x: float) -> int:
    import math

    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


# ---------------------------------------------------------------------------
# 1. tf-idf cosine near-dup pairs (sparse lexical similarity join)
# ---------------------------------------------------------------------------
_TFIDF_DF_CAP = 50


def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse tf-idf cosine similarity join — the lexical twin of
    dedup_embedding_cosine: docs as tf·idf vectors over their tokens,
    pair candidates from the inverted index (shared-token equi-join),
    dot products accumulated as exact integers (idf quantized to 1e3,
    so Σ(w_a·w_b) stays far from 2^63 at any corpus size). Tokens with
    df > 50 are dropped from the index — the standard stop-token cut
    that bounds posting lists (the same 100 TB lever as every LSH
    bucket cap); norms keep ALL terms so the cut only affects recall,
    not the scores of surviving pairs... here norms use the same capped
    vocabulary so Spark and the oracle agree exactly. Top 20 by cosine
    via TakeOrderedAndProject."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tf = (
        d.selectExpr("doc_id", r"explode(split(text, '\\s+')) AS tok")
        .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("nd"))
    df_t = (
        tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        .filter(f"df <= {_TFIDF_DF_CAP}")
        .join(F.broadcast(n_docs), F.expr("true"))
        .selectExpr(
            "tok", "df",
            "CAST(round(ln(CAST(nd AS DOUBLE) / df) * 1000.0D) AS BIGINT)"
            " AS idf_k",
        )
    )
    w = tf.join(df_t, "tok").selectExpr(
        "doc_id", "tok", "tf * idf_k AS w"
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.expr("w * w")).alias("nsq"))
    dots = (
        w.selectExpr("tok", "doc_id AS doc_a", "w AS wa")
        .join(w.selectExpr("tok", "doc_id AS doc_b", "w AS wb"), "tok")
        .filter("doc_a < doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.expr("wa * wb")).alias("dot"))
    )
    scored = (
        dots.join(norms.selectExpr("doc_id AS doc_a", "nsq AS na"), "doc_a")
        .join(norms.selectExpr("doc_id AS doc_b", "nsq AS nb"), "doc_b")
        .selectExpr(
            "doc_a", "doc_b",
            "round(CAST(dot AS DOUBLE)"
            " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)"
            " AS cos6",
        )
    )
    top = scored.orderBy(
        F.desc("cos6"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(20)
    wr = W.orderBy(F.desc("cos6"), F.asc("doc_a"), F.asc("doc_b"))
    return (
        top.withColumn("rank", F.row_number().over(wr).cast("int"))
        .select("rank", "doc_a", "doc_b", "cos6")
        .orderBy("rank")
    )


QUERIES["text_tfidf_cosine_pairs"] = text_tfidf_cosine_pairs

ORACLES["text_tfidf_cosine_pairs"] = f"""
    WITH tf AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
        FROM documents
    ),
    tfc AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM tf GROUP BY doc_id, tok
    ),
    dft AS (
        SELECT tok,
               CAST(round(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                    / COUNT(*)) * 1000.0) AS BIGINT) AS idf_k
        FROM tfc GROUP BY tok
        HAVING COUNT(*) <= {_TFIDF_DF_CAP}
    ),
    w AS (
        SELECT t.doc_id, t.tok, t.tf * d.idf_k AS w
        FROM tfc t JOIN dft d USING (tok)
    ),
    norms AS (
        SELECT doc_id, SUM(w * w) AS nsq FROM w GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
        FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
        SELECT doc_a, doc_b,
               round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))),
               6) AS cos6
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b
    )
    SELECT CAST(rn AS INT) AS rank, doc_a, doc_b, cos6 FROM (
        SELECT *, row_number() OVER (
            ORDER BY cos6 DESC, doc_a ASC, doc_b ASC) AS rn
        FROM scored
    ) WHERE rn <= 20
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 2. Markov absorbing-state analysis
# ---------------------------------------------------------------------------
_ABS_ROUNDS = 4


def ev_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-state analysis of the event-type chain: treating
    'purchase' as the success absorber (probability 1) and 'error' as
    the failure absorber (0), what is each transient state's
    probability of eventually converting? Four unrolled value-iteration
    rounds in exact ppm integers — p(s) ← Σ_t P(s,t)·p(t) with the
    absorbers pinned each round — the funnel-diagnosis number behind
    'a view is worth X conversions'. Same metadata-scale frames as
    ev_markov_stationary."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("nxt", F.lead("event_type").over(wseq))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = trans.groupBy("src").agg(F.sum("c").alias("t"))
    tm = trans.join(totals, "src").localCheckpoint(eager=True)
    pin = ("CASE WHEN event_type = 'purchase' THEN 1000000"
           " WHEN event_type = 'error' THEN 0 ELSE {} END")
    p = (
        tm.select(F.col("src").alias("event_type")).distinct()
        .selectExpr("event_type",
                    f"CAST({pin.format(0)} AS BIGINT) AS p")
        .localCheckpoint(eager=True)
    )
    for _ in range(_ABS_ROUNDS):
        nxt = (
            tm.join(p, tm.dst == p.event_type)
            .selectExpr("src", "c * p DIV t AS part")
            .groupBy("src")
            .agg(F.sum("part").alias("raw"))
            .selectExpr("src AS event_type",
                        f"CAST({pin.format('raw')} AS BIGINT) AS p")
        )
        p = nxt.localCheckpoint(eager=True)
    return p.selectExpr("event_type", "p AS absorb_ppm").orderBy("event_type")


QUERIES["ev_markov_absorption"] = ev_markov_absorption

_ABS_ROUND_DUCK = """
    r{r} AS MATERIALIZED (
        SELECT src AS event_type,
               CAST(CASE WHEN src = 'purchase' THEN 1000000
                    WHEN src = 'error' THEN 0
                    ELSE raw END AS BIGINT) AS p
        FROM (
            SELECT tm.src, SUM(tm.c * d.p // tm.t) AS raw
            FROM tm JOIN r{p} d ON tm.dst = d.event_type
            GROUP BY tm.src
        )
    )
"""

ORACLES["ev_markov_absorption"] = f"""
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS dst
        FROM events
    ),
    trans AS (
        SELECT src, dst, COUNT(*) AS c FROM seq
        WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tm AS MATERIALIZED (
        SELECT t.src, t.dst, t.c, tt.t
        FROM trans t JOIN (SELECT src, SUM(c) AS t FROM trans GROUP BY src) tt
          USING (src)
    ),
    r0 AS MATERIALIZED (
        SELECT DISTINCT src AS event_type,
               CAST(CASE WHEN src = 'purchase' THEN 1000000
                    WHEN src = 'error' THEN 0 ELSE 0 END AS BIGINT) AS p
        FROM tm
    ),
    {",".join(_ABS_ROUND_DUCK.format(r=i + 1, p=i)
              for i in range(_ABS_ROUNDS))}
    SELECT event_type, p AS absorb_ppm
    FROM r{_ABS_ROUNDS}
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 3. cross-document watermark/boilerplate tile detection
# ---------------------------------------------------------------------------
def mm_watermark_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark/logo detection across a near-duplicate image corpus:
    hash fixed 32-byte content tiles per payload, flag tiles appearing
    in >= 2 DISTINCT documents (a graphic stamped onto many images),
    and report each affected doc's boilerplate-tile fraction — the
    multimodal twin of text_line_dedup's cross-document chunk removal.
    One explode (linear in bytes), one count-distinct per tile hash,
    one semi-style count join back."""
    c = _dup_corpus(spark, sf_dir)
    tiles = (
        c.selectExpr("doc_id", "hex(encode(text, 'UTF-8')) AS hx")
        .filter("length(hx) >= 64")
        .selectExpr(
            "doc_id",
            # ONE regex pass per payload: .{64} emits the same
            # non-overlapping 64-char hex tiles (remainder dropped,
            # identical to the DIV bound; hex is pure ASCII so no
            # unicode caveat). The old md5(substring(hx, t*64+1, 64))
            # re-walked the hex string from position 0 per tile —
            # O(len²/32) per payload on the LENGTH axis; the regex scan
            # is linear and measured 0.12 s vs 0.88 s (let-bound
            # split/slice) on 512×128KB-hex rows, value-identical.
            "explode(transform(regexp_extract_all(hx, '.{64}', 0),"
            " w -> md5(w))) AS tile_hash",
        )
    )
    shared = (
        tiles.groupBy("tile_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter("nd >= 2")
        .select("tile_hash")
    )
    marked = tiles.join(shared, "tile_hash", "semi")
    per_doc = tiles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tiles"))
    hit = marked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared"))
    return (
        per_doc.join(hit, "doc_id")
        .selectExpr(
            "doc_id", "n_tiles", "n_shared",
            "n_shared * 1000000 DIV n_tiles AS shared_ppm",
        )
        .orderBy("doc_id")
    )


QUERIES["mm_watermark_tiles"] = mm_watermark_tiles

ORACLES["mm_watermark_tiles"] = f"""
    WITH {_DUP_CORPUS_DUCK},
    tiles AS (
        SELECT doc_id,
               md5(substr(hx, t * 64 + 1, 64)) AS tile_hash
        FROM (
            SELECT doc_id, hex(encode(text)) AS hx FROM corpus
            WHERE length(hex(encode(text))) >= 64
        ),
        LATERAL (SELECT unnest(generate_series(0, (length(hx) // 64) - 1))
                 AS t)
    ),
    shared AS (
        SELECT tile_hash FROM tiles
        GROUP BY tile_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per_doc AS (
        SELECT doc_id, COUNT(*) AS n_tiles FROM tiles GROUP BY doc_id
    ),
    hit AS (
        SELECT t.doc_id, COUNT(*) AS n_shared
        FROM tiles t WHERE EXISTS (
            SELECT 1 FROM shared s WHERE s.tile_hash = t.tile_hash)
        GROUP BY t.doc_id
    )
    SELECT p.doc_id, p.n_tiles, h.n_shared,
           CAST(h.n_shared * 1000000 // p.n_tiles AS BIGINT) AS shared_ppm
    FROM per_doc p JOIN hit h USING (doc_id)
    ORDER BY p.doc_id
"""


# ---------------------------------------------------------------------------
# 4. Neyman optimal stratified allocation
# ---------------------------------------------------------------------------
_NEYMAN_BUDGET = 1000


def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation: split a 1000-row sampling budget
    across event-type strata proportionally to N_h·S_h — big AND noisy
    strata get more samples, the design that minimizes the estimator's
    variance at fixed cost (vs sample_stratified's equal rates). S_h
    comes from exact integer moment sums; N_h·S_h is rounded to an
    integer weight FIRST so the allocation shares are exact integer
    ratios (no cross-row double sums)."""
    s = (
        load(spark, sf_dir, "events")
        .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS v")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum(F.expr("v * v")).alias("svv"),
        )
        .selectExpr(
            "event_type", "n",
            # N_h * S_h, rounded to integer cents before any cross-row sum
            "CAST(round(CAST(n AS DOUBLE) * sqrt((CAST(n AS DOUBLE)"
            " * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT) AS ns",
        )
    )
    wall = W.orderBy("event_type").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        s.select(
            "event_type", "n", "ns",
            F.sum("ns").over(wall).alias("tot"),
        )
        .selectExpr(
            "event_type", "n", "ns AS n_times_std_cents",
            f"ns * {_NEYMAN_BUDGET} DIV tot AS n_allocated",
        )
        .orderBy("event_type")
    )


QUERIES["sample_stratified_neyman"] = sample_stratified_neyman

ORACLES["sample_stratified_neyman"] = f"""
    WITH s AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(round(value * 100) AS BIGINT)) AS sv,
               SUM(CAST(round(value * 100) AS BIGINT)
                   * CAST(round(value * 100) AS BIGINT)) AS svv
        FROM events GROUP BY event_type
    ),
    w AS (
        SELECT event_type, n,
               CAST(round(CAST(n AS DOUBLE) * sqrt((CAST(n AS DOUBLE)
                    * CAST(svv AS DOUBLE)
                    - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT)
                   AS ns
        FROM s
    )
    SELECT event_type, n, ns AS n_times_std_cents,
           CAST(ns * {_NEYMAN_BUDGET} // (SUM(ns) OVER ()) AS BIGINT)
               AS n_allocated
    FROM w
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 5. Wilson lower-bound ranking
# ---------------------------------------------------------------------------
_WILSON_Z = _micro(NormalDist().inv_cdf(0.975)) / 1e6


def ev_wilson_lower_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower bounds on per-type conversion rates — the
    small-sample-safe ranking statistic (the 'Reddit sort'): a type
    with 3/4 hits must NOT outrank one with 700/1000. One double
    expression per row from exact integer counts, z embedded at import;
    output ranked by the bound."""
    counts = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CASE WHEN value >= 250.0D THEN 1 ELSE 0 END AS hit",
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("hit").alias("x"))
    )
    z = _WILSON_Z
    expr = (
        f"round(((CAST(x AS DOUBLE) / n) + {z!r}D * {z!r}D / (2.0D * n)"
        f" - {z!r}D * sqrt((CAST(x AS DOUBLE) / n)"
        f" * (1.0D - CAST(x AS DOUBLE) / n) / n"
        f" + {z!r}D * {z!r}D / (4.0D * n * n)))"
        f" / (1.0D + {z!r}D * {z!r}D / n), 6)"
    )
    wr = W.orderBy(F.desc("wilson_lb6"), F.asc("event_type"))
    return (
        counts.selectExpr(
            "event_type", "n", "x",
            "x * 1000000 DIV n AS p_ppm",
            f"{expr} AS wilson_lb6",
        )
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .select("rank", "event_type", "n", "x", "p_ppm", "wilson_lb6")
        .orderBy("rank")
    )


QUERIES["ev_wilson_lower_bound"] = ev_wilson_lower_bound

_WZ = _WILSON_Z
ORACLES["ev_wilson_lower_bound"] = f"""
    WITH counts AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(CASE WHEN value >= 250.0 THEN 1 ELSE 0 END) AS x
        FROM events GROUP BY event_type
    ),
    scored AS (
        SELECT event_type,
               CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
               CAST(x * 1000000 // n AS BIGINT) AS p_ppm,
               round(((CAST(x AS DOUBLE) / n) + {_WZ!r} * {_WZ!r} / (2.0 * n)
               - {_WZ!r} * sqrt((CAST(x AS DOUBLE) / n)
               * (1.0 - CAST(x AS DOUBLE) / n) / n
               + {_WZ!r} * {_WZ!r} / (4.0 * n * n)))
               / (1.0 + {_WZ!r} * {_WZ!r} / n), 6) AS wilson_lb6
        FROM counts
    )
    SELECT CAST(row_number() OVER (ORDER BY wilson_lb6 DESC, event_type ASC)
                AS INT) AS rank,
           event_type, n, x, p_ppm, wilson_lb6
    FROM scored
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 6. retention half-life (log-linear decay fit)
# ---------------------------------------------------------------------------
def ev_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: fit ln(retention_d) = a + b·d over days
    1-14 for the pooled week-one signup cohort and report the decay
    slope and implied half-life — the single number behind 'how fast do
    users churn'. Retention rates are exact integer ratios; each ln is
    quantized to a 1e6 integer BEFORE the OLS moment sums, so the
    closed-form slope is exact integer arithmetic with one final
    double conversion. Days with zero actives are excluded (ln
    undefined), n_days reports the fit's support."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.expr("date_trunc('day', MIN(ts))").alias("d0"))
    # cohort: users whose first-ever event falls in the data's first 7
    # days — derived as a dense_rank over distinct first-days (no
    # min-date broadcast, no BNLJ)
    wday = W.orderBy("d0")
    d0rank = (
        first.select("d0").distinct()
        .withColumn("dr", F.dense_rank().over(wday))
    )
    cohort = (
        first.join(d0rank, "d0").filter("dr <= 7")
        .select("user_id", "d0")
    )
    active = (
        ev.selectExpr("user_id", "date_trunc('day', ts) AS d").distinct()
        .join(cohort, "user_id")
        .selectExpr("user_id", "datediff(d, d0) AS age")
        .filter("age BETWEEN 1 AND 14")
        .groupBy("age")
        .agg(F.countDistinct("user_id").alias("act"))
    )
    n_cohort = cohort.groupBy().agg(
        F.countDistinct("user_id").alias("nc"))
    pts = (
        active.join(F.broadcast(n_cohort), F.expr("true"))
        .filter("act > 0")
        .selectExpr(
            "CAST(age AS BIGINT) AS d",
            "CAST(round(ln(CAST(act AS DOUBLE) / nc) * 1000000.0D)"
            " AS BIGINT) AS y",
        )
    )
    return (
        pts.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("d").alias("sd"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("d * y")).alias("sdy"),
            F.sum(F.expr("d * d")).alias("sdd"),
        )
        .selectExpr(
            "n_days",
            # OLS slope in micro-ln per day: exact ints, one divide
            "CAST(round(CAST(n_days * sdy - sd * sy AS DOUBLE)"
            " / CAST(n_days * sdd - sd * sd AS DOUBLE)) AS BIGINT)"
            " AS slope_micro_per_day",
            # half-life = -ln(2)/b in days, x100
            "CAST(round(-693147.18055994531D"
            " / (CAST(n_days * sdy - sd * sy AS DOUBLE)"
            " / CAST(n_days * sdd - sd * sd AS DOUBLE)) * 100.0D) AS BIGINT)"
            " AS halflife_days_x100",
        )
    )


QUERIES["ev_retention_halflife"] = ev_retention_halflife

ORACLES["ev_retention_halflife"] = """
    WITH first AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS d0
        FROM events GROUP BY user_id
    ),
    d0rank AS (
        SELECT d0, dense_rank() OVER (ORDER BY d0) AS dr
        FROM (SELECT DISTINCT d0 FROM first)
    ),
    cohort AS (
        SELECT f.user_id, f.d0 FROM first f JOIN d0rank r USING (d0)
        WHERE r.dr <= 7
    ),
    active AS (
        SELECT datediff('day', c.d0, a.d) AS age,
               COUNT(DISTINCT a.user_id) AS act
        FROM (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
              FROM events) a
        JOIN cohort c USING (user_id)
        WHERE datediff('day', c.d0, a.d) BETWEEN 1 AND 14
        GROUP BY datediff('day', c.d0, a.d)
    ),
    pts AS (
        SELECT CAST(age AS BIGINT) AS d,
               CAST(round(ln(CAST(act AS DOUBLE)
                    / (SELECT COUNT(DISTINCT user_id) FROM cohort))
                    * 1000000.0) AS BIGINT) AS y
        FROM active WHERE act > 0
    ),
    sums AS (
        SELECT COUNT(*) AS n_days, SUM(d) AS sd, SUM(y) AS sy,
               SUM(d * y) AS sdy, SUM(d * d) AS sdd
        FROM pts
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(round(CAST(n_days * sdy - sd * sy AS DOUBLE)
                / CAST(n_days * sdd - sd * sd AS DOUBLE)) AS BIGINT)
               AS slope_micro_per_day,
           CAST(round(-693147.18055994531
                / (CAST(n_days * sdy - sd * sy AS DOUBLE)
                / CAST(n_days * sdd - sd * sd AS DOUBLE)) * 100.0) AS BIGINT)
               AS halflife_days_x100
    FROM sums
"""


# ---------------------------------------------------------------------------
# 7. per-source language-mix entropy
# ---------------------------------------------------------------------------
def text_source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix entropy per source — is a source monolingual or
    mixed? — using the integer bit-length log2 (the mm_byte_entropy /
    dsir trick): e = Σ_lang c·(ilog2(n)−ilog2(c)), zero for single-
    language sources, growing with mix. The mixture-weighting input a
    multilingual pipeline reads next to the per-source scorecard. One
    tiny groupBy chain, no floats anywhere."""
    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    )
    wall = (
        W.partitionBy("source")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    ilog2 = "length(bin(1 + {})) - 1"
    return (
        counts.withColumn("n", F.sum("c").over(wall))
        .selectExpr(
            "source", "c", "n",
            f"c * (({ilog2.format('n')}) - ({ilog2.format('c')})) AS e",
        )
        .groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.sum("e").alias("entropy_sum"),
            F.expr("100 * SUM(e) DIV MAX(n)").alias("entropy_x100"),
        )
        .orderBy("source")
    )


QUERIES["text_source_lang_entropy"] = text_source_lang_entropy

ORACLES["text_source_lang_entropy"] = """
    WITH counts AS (
        SELECT source, lang, COUNT(*) AS c
        FROM documents GROUP BY source, lang
    ),
    wn AS (
        SELECT source, c,
               CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM counts
    ),
    scored AS (
        SELECT source, c, n,
               c * ((length(printf('%b', 1 + n)) - 1)
                  - (length(printf('%b', 1 + c)) - 1)) AS e
        FROM wn
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_langs,
           CAST(SUM(e) AS BIGINT) AS entropy_sum,
           CAST(100 * SUM(e) // MAX(n) AS BIGINT) AS entropy_x100
    FROM scored
    GROUP BY source
    ORDER BY source
"""
