"""Round-4 batch 3: multiple-testing control, Markov steady state,
funnel sensitivity, corpus novelty, systematic importance resampling,
multiprobe LSH, moving-average crossover signals, and shot keyframes.

Registered after curation7 in registry._MODULES (rounds 4/5 windows
undisturbed; gradable from round 6). Determinism rules are
curation5-7's: integers first, bounded windows, identical final double
expressions, constants embedded as identical literals from Python.
"""

from __future__ import annotations

from statistics import NormalDist

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load
from kuibadb_spark.operators.similarity import (
    _EMB_DUCK,
    _bucket_expr_duck,
    _bucket_expr_spark,
    _dot,
    _emb,
    _N_PLANES,
)

QUERIES: dict = {}
ORACLES: dict = {}


def _micro(x: float) -> int:
    import math

    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


# ---------------------------------------------------------------------------
# 1. Holm-Bonferroni step-down multiple-testing control
# ---------------------------------------------------------------------------
_HB_M = 5  # event types under test
# two-sided normal critical values for alpha = 0.05 / k, k = 1..m,
# embedded as identical 1e6-integer literals (stdlib NormalDist —
# evaluated once at import, same bits both engines)
_HB_CRIT = {
    k: _micro(NormalDist().inv_cdf(1 - 0.05 / (2 * k)))
    for k in range(1, _HB_M + 1)
}
_HB_THRESH = 250.0


def ev_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm-Bonferroni step-down control over the 5 per-event-type A/B
    two-proportion z tests (arm = user parity, success = value >= 250):
    tests rank by |z| descending and test i compares against
    alpha/(m-i+1); rejection stops at the first failure (the step-down
    rule, implemented as a running MIN over pass flags — no iteration).
    Counts are exact integers; each z is one pooled-proportion double
    expression; critical values are import-time literals. The family-
    wise error control every multi-metric experiment readout needs."""
    e = load(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a",
        f"CASE WHEN value >= {_HB_THRESH}D THEN 1 ELSE 0 END AS hit",
    )
    counts = e.groupBy("event_type").agg(
        F.sum("is_a").alias("n_a"),
        F.sum(F.expr("1 - is_a")).alias("n_b"),
        F.sum(F.expr("is_a * hit")).alias("x_a"),
        F.sum(F.expr("(1 - is_a) * hit")).alias("x_b"),
    )
    z = counts.selectExpr(
        "event_type", "n_a", "n_b", "x_a", "x_b",
        # z = (pa - pb) / sqrt(p(1-p)(1/na + 1/nb)), pooled p; a pooled
        # rate of exactly 0 or 1 has zero variance — define z = 0 there
        # (no evidence of a difference), avoiding the 0/0
        "CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN 0.0D ELSE"
        " round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)"
        " / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))"
        " * (1.0D - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))"
        " * (1.0D / n_a + 1.0D / n_b)), 6) END AS z6",
    )
    crit_case = " ".join(
        f"WHEN {i} THEN {_HB_CRIT[_HB_M - i + 1]}"
        for i in range(1, _HB_M + 1)
    )
    wrank = W.orderBy(F.desc(F.abs(F.col("z6"))), F.asc("event_type"))
    wstep = (
        W.orderBy(F.desc(F.abs(F.col("z6"))), F.asc("event_type"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    ranked = z.select(
        "event_type", "z6",
        F.row_number().over(wrank).cast("int").alias("rank"),
    ).selectExpr(
        "event_type", "z6", "rank",
        f"CASE rank {crit_case} END AS crit_micro",
        "CASE WHEN CAST(round(abs(z6) * 1000000.0D) AS BIGINT) >="
        f" (CASE rank {crit_case} END) THEN 1 ELSE 0 END AS pass_own",
    )
    return (
        ranked.select(
            "event_type", "z6", "rank", "crit_micro",
            F.min("pass_own").over(wstep).cast("int").alias("reject"),
        )
        .orderBy("rank")
    )


QUERIES["ev_holm_bonferroni"] = ev_holm_bonferroni

_HB_CRIT_CASE = " ".join(
    f"WHEN {i} THEN {_HB_CRIT[_HB_M - i + 1]}" for i in range(1, _HB_M + 1)
)

ORACLES["ev_holm_bonferroni"] = f"""
    WITH e AS (
        SELECT event_type,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a,
               CASE WHEN value >= {_HB_THRESH} THEN 1 ELSE 0 END AS hit
        FROM events
    ),
    counts AS (
        SELECT event_type,
               SUM(is_a) AS n_a, SUM(1 - is_a) AS n_b,
               SUM(is_a * hit) AS x_a, SUM((1 - is_a) * hit) AS x_b
        FROM e GROUP BY event_type
    ),
    z AS (
        SELECT event_type,
               CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN 0.0 ELSE
               round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
               / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
               * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
               * (1.0 / n_a + 1.0 / n_b)), 6) END AS z6
        FROM counts
    ),
    ranked AS (
        SELECT event_type, z6,
               CAST(row_number() OVER (ORDER BY abs(z6) DESC, event_type ASC)
                    AS INT) AS rank
        FROM z
    ),
    flags AS (
        SELECT *,
               CASE rank {_HB_CRIT_CASE} END AS crit_micro,
               CASE WHEN CAST(round(abs(z6) * 1000000.0) AS BIGINT) >=
                    (CASE rank {_HB_CRIT_CASE} END) THEN 1 ELSE 0 END
                   AS pass_own
        FROM ranked
    )
    SELECT event_type, z6, rank, crit_micro,
           CAST(MIN(pass_own) OVER (ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
               AS reject
    FROM flags
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 2. Markov-chain stationary distribution (4 power iterations)
# ---------------------------------------------------------------------------
_MK_ROUNDS = 4


def ev_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type transition
    chain by 4 unrolled power iterations in exact ppm integers: each
    round pushes the mass vector through the transition counts
    (d·c // t per edge, the integer-truncating matvec) and renormalizes
    to 1e6. The chain has |types| states, so every frame after the one
    transition-count groupBy is metadata-sized; iterations
    localCheckpoint (tiny frames, truncated lineage). The output pairs
    the fixpoint against the empirical type share — converged chains
    should roughly agree, and the delta is the mixing diagnostic."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                              "event_type")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("nxt", F.lead("event_type").over(wseq))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = trans.groupBy("src").agg(F.sum("c").alias("t"))
    tm = trans.join(totals, "src").localCheckpoint(eager=True)
    m = tm.select("src").distinct().count()
    d = (
        tm.select(F.col("src").alias("event_type")).distinct()
        .withColumn("p", F.lit(1000000 // m).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_MK_ROUNDS):
        raw = (
            tm.join(d, tm.src == d.event_type)
            .selectExpr("dst", "p * c DIV t AS part")
            .groupBy("dst")
            .agg(F.sum("part").alias("raw"))
        )
        tot = W.orderBy("dst").rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
        d = (
            raw.select(
                F.col("dst").alias("event_type"),
                F.expr("raw * 1000000").alias("num"),
                F.sum("raw").over(tot).alias("den"),
            )
            .selectExpr("event_type", "num DIV den AS p")
            .localCheckpoint(eager=True)
        )
    emp = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    wemp = W.orderBy("event_type").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    emp_ppm = emp.select(
        "event_type",
        F.expr("n * 1000000").alias("num"),
        F.sum("n").over(wemp).alias("den"),
    ).selectExpr("event_type", "num DIV den AS empirical_ppm")
    return (
        d.selectExpr("event_type", "p AS stationary_ppm")
        .join(emp_ppm, "event_type")
        .selectExpr("event_type", "stationary_ppm", "empirical_ppm",
                    "abs(stationary_ppm - empirical_ppm) AS delta_ppm")
        .orderBy("event_type")
    )


QUERIES["ev_markov_stationary"] = ev_markov_stationary

_MK_ROUND_DUCK = """
    raw{r} AS MATERIALIZED (
        SELECT tm.dst, SUM(d.p * tm.c // tm.t) AS raw
        FROM tm JOIN d{p} d ON tm.src = d.event_type
        GROUP BY tm.dst
    ),
    d{r} AS MATERIALIZED (
        SELECT dst AS event_type,
               CAST(raw * 1000000 // (SUM(raw) OVER ()) AS BIGINT) AS p
        FROM raw{r}
    )
"""

ORACLES["ev_markov_stationary"] = f"""
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
    d0 AS MATERIALIZED (
        SELECT DISTINCT src AS event_type,
               CAST(1000000 // (SELECT COUNT(DISTINCT src) FROM tm)
                    AS BIGINT) AS p
        FROM tm
    ),
    {",".join(_MK_ROUND_DUCK.format(r=i + 1, p=i)
              for i in range(_MK_ROUNDS))},
    emp AS (
        SELECT event_type,
               CAST(COUNT(*) * 1000000 // (SUM(COUNT(*)) OVER ()) AS BIGINT)
                   AS empirical_ppm
        FROM events GROUP BY event_type
    )
    SELECT d.event_type, d.p AS stationary_ppm, emp.empirical_ppm,
           abs(d.p - emp.empirical_ppm) AS delta_ppm
    FROM d{_MK_ROUNDS} d JOIN emp USING (event_type)
    ORDER BY d.event_type
"""


# ---------------------------------------------------------------------------
# 3. funnel deadline sensitivity
# ---------------------------------------------------------------------------
_FUNNEL_DEADLINES_H = [1, 6, 24]


def ev_funnel_deadline_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion at three attribution deadlines (1 h,
    6 h, 24 h) from ONE per-user pass: each user's first signup and
    first subsequent purchase reduce to one row, then a 3-element
    explode fans the deadlines — the windowing-sensitivity table a
    funnel owner reads before committing to a deadline. Exact integer
    microsecond delays; one shuffle to the per-user aggregate."""
    ev = load(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.expr("unix_micros(CAST(ts AS TIMESTAMP))"))
             .alias("su_us"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id",
                F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("p_us"))
        .join(su, "user_id")
        .filter("p_us >= su_us")
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"), F.max("su_us").alias("su_us"))
    )
    base = su.join(
        pu.selectExpr("user_id", "p_us - su_us AS delay_us"),
        "user_id", "left",
    )
    fanned = base.selectExpr(
        "user_id", "delay_us",
        "explode(array({})) AS deadline_h".format(
            ", ".join(str(h) for h in _FUNNEL_DEADLINES_H)),
    )
    return (
        fanned.groupBy("deadline_h")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(F.expr(
                "CASE WHEN delay_us IS NOT NULL AND"
                " delay_us <= deadline_h * 3600000000 THEN 1 ELSE 0 END"
            )).alias("n_converted"),
        )
        .selectExpr(
            "CAST(deadline_h AS INT) AS deadline_h", "n_signups",
            "n_converted",
            "n_converted * 1000000 DIV n_signups AS cvr_ppm",
        )
        .orderBy("deadline_h")
    )


QUERIES["ev_funnel_deadline_sensitivity"] = ev_funnel_deadline_sensitivity

ORACLES["ev_funnel_deadline_sensitivity"] = f"""
    WITH su AS (
        SELECT user_id, MIN(epoch_us(ts)) AS su_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) - MAX(su.su_us) AS delay_us
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.su_us
        GROUP BY e.user_id
    ),
    base AS (
        SELECT su.user_id, pu.delay_us FROM su LEFT JOIN pu USING (user_id)
    ),
    fanned AS (
        SELECT user_id, delay_us, unnest([{", ".join(
            str(h) for h in _FUNNEL_DEADLINES_H)}]) AS deadline_h
        FROM base
    )
    SELECT CAST(deadline_h AS INT) AS deadline_h,
           COUNT(*) AS n_signups,
           CAST(SUM(CASE WHEN delay_us IS NOT NULL AND
                delay_us <= deadline_h * 3600000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN delay_us IS NOT NULL AND
                delay_us <= deadline_h * 3600000000 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS cvr_ppm
    FROM fanned
    GROUP BY deadline_h
    ORDER BY deadline_h
"""


# ---------------------------------------------------------------------------
# 4. n-gram novelty of a crawl increment
# ---------------------------------------------------------------------------
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-level novelty of a crawl increment: treating even doc_ids
    as the existing corpus and odd as the incoming batch, what fraction
    of each source's incoming 3-gram instances was never seen before?
    The marginal-value metric behind 'is this crawl still adding
    information' (the corpus-growth twin of dedup_incremental_crawl's
    doc-level verdicts). One anti-join on the shingle key against the
    distinct old-shingle set — bucketed by content, never all-pairs."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.withColumn("w", F.split("text", r"\s+"))
    sh = toks.selectExpr(
        "doc_id", "source",
        "explode(CASE WHEN size(w) < 3 THEN array() "
        "ELSE transform(sequence(1, size(w) - 2), "
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i+1),"
        " element_at(w, i+2))) END) AS shingle",
    )
    old = sh.filter("doc_id % 2 = 0").select("shingle").distinct()
    new = sh.filter("doc_id % 2 = 1")
    novel = new.join(old, "shingle", "anti")
    tot = new.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    nov = novel.groupBy("source").agg(F.count(F.lit(1)).alias("n_novel"))
    return (
        tot.join(nov, "source", "left")
        .selectExpr(
            "source", "n_shingles",
            "COALESCE(n_novel, 0) AS n_novel",
            "COALESCE(n_novel, 0) * 1000000 DIV n_shingles AS novelty_ppm",
        )
        .orderBy("source")
    )


QUERIES["text_ngram_novelty"] = text_ngram_novelty

ORACLES["text_ngram_novelty"] = """
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(text, '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM toks
    ),
    old AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
    new_sh AS (SELECT * FROM sh WHERE doc_id % 2 = 1),
    tot AS (
        SELECT source, COUNT(*) AS n_shingles FROM new_sh GROUP BY source
    ),
    nov AS (
        SELECT source, COUNT(*) AS n_novel
        FROM new_sh n WHERE NOT EXISTS (
            SELECT 1 FROM old o WHERE o.shingle = n.shingle)
        GROUP BY source
    )
    SELECT t.source, t.n_shingles,
           COALESCE(n.n_novel, 0) AS n_novel,
           CAST(COALESCE(n.n_novel, 0) * 1000000 // t.n_shingles AS BIGINT)
               AS novelty_ppm
    FROM tot t LEFT JOIN nov n USING (source)
    ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# 5. systematic importance resampling
# ---------------------------------------------------------------------------
_SIR_N = 30


def sample_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (low-variance) importance resampling, per source: draw
    N=30 equally-spaced points over the cumulative weight axis and give
    each doc one copy per point landing in its weight interval — the
    particle-filter resampler, fully deterministic and ROW-LOCAL once
    each doc knows its cumulative offset: copies = ((cum+w)·N)//W −
    (cum·N)//W, no point-vs-interval join at all. Weights are n_chars
    (the byte-proportional sampling a mixture pipeline uses); windows
    are per-source cumulative sums."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    wcum = (
        W.partitionBy("source").orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wall = (
        W.partitionBy("source").orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    out = d.select(
        "source", "doc_id", F.col("n_chars").alias("w"),
        F.coalesce(F.sum("n_chars").over(wcum), F.lit(0)).alias("cum"),
        F.sum("n_chars").over(wall).alias("tw"),
    ).selectExpr(
        "source", "doc_id", "w",
        f"((cum + w) * {_SIR_N}) DIV tw - (cum * {_SIR_N}) DIV tw"
        " AS n_copies",
    )
    return out.filter("n_copies >= 1").orderBy("source", "doc_id")


QUERIES["sample_importance_resampling"] = sample_importance_resampling

ORACLES["sample_importance_resampling"] = f"""
    WITH cums AS (
        SELECT source, doc_id, n_chars AS w,
               COALESCE(SUM(n_chars) OVER (PARTITION BY source
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum,
               SUM(n_chars) OVER (PARTITION BY source) AS tw
        FROM documents
    )
    SELECT source, doc_id, w,
           CAST(((cum + w) * {_SIR_N}) // tw - (cum * {_SIR_N}) // tw
                AS BIGINT) AS n_copies
    FROM cums
    WHERE ((cum + w) * {_SIR_N}) // tw - (cum * {_SIR_N}) // tw >= 1
    ORDER BY source, doc_id
"""


# ---------------------------------------------------------------------------
# 6. multiprobe hyperplane LSH
# ---------------------------------------------------------------------------
def sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH (Lv et al. 2007): instead of more hash tables,
    each query ALSO probes the 8 buckets at Hamming distance 1 from its
    own (flip one hyperplane sign) — the buckets a near-boundary
    neighbor most likely fell into. 9 probes per query explode
    row-locally, then ONE equi-join on the bucket key; top-3 re-rank by
    exact cosine. The memory-free recall lever for bucketed ANN — same
    bucket function as sim_lsh_hyperplane, so recall gains are directly
    comparable."""
    e = _emb(spark, sf_dir).withColumn("bucket", F.expr(_bucket_expr_spark()))
    probes = ", ".join(
        ["bucket"] + [f"bucket ^ {1 << b}" for b in range(_N_PLANES)]
    )
    q = (
        e.filter(F.col("vec_id") < 20)
        .selectExpr("vec_id AS q_id", "v AS qv", "norm AS qn",
                    f"explode(array({probes})) AS probe")
    )
    # no distinct needed: the 9 probe values are pairwise distinct, so
    # each candidate's bucket matches at most one probe row
    cand = (
        q.join(e, q.probe == e.bucket)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", "qn", "vec_id", "v", "norm")
        .withColumn(
            "cos", F.round(_dot("qv", "v") / (F.col("qn") * F.col("norm")), 6)
        )
    )
    wtop = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wtop))
        .filter("rank <= 3")
        .selectExpr("q_id", "vec_id AS neighbor_id",
                    "CAST(rank AS INT) AS rank", "cos")
        .orderBy("q_id", "rank")
    )


QUERIES["sim_ann_multiprobe"] = sim_ann_multiprobe

ORACLES["sim_ann_multiprobe"] = f"""
    WITH {_EMB_DUCK},
    bucketed AS (
        SELECT vec_id, v, norm, {_bucket_expr_duck()} AS bucket FROM emb
    ),
    q AS (
        SELECT vec_id AS q_id, v AS qv, norm AS qn,
               unnest([bucket{"".join(
                   f", xor(bucket, {1 << b})" for b in range(_N_PLANES))}])
                   AS probe
        FROM bucketed WHERE vec_id < 20
    ),
    cand AS (
        SELECT q.q_id, e.vec_id,
               round(list_dot_product(q.qv, e.v) / (q.qn * e.norm), 6) AS cos
        FROM q JOIN bucketed e ON e.bucket = q.probe
        WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank, cos
    FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, vec_id ASC) AS rank
        FROM cand
    ) WHERE rank <= 3
    ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# 7. moving-average crossover signals
# ---------------------------------------------------------------------------
def ts_ma_crossover_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow moving-average crossover detection on per-type daily
    volume — the classic trend-change signal (3-day vs 9-day MA):
    'golden' when the fast average crosses above the slow, 'death' when
    below. The comparison is exact cross-multiplied integers
    (sum3·3 > sum9 ⇔ avg3 > avg9), signals need full 9-day history
    (row 9+), and a crossover is a strict sign flip vs the previous
    day. Bounded per-type windows over the daily series."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w3 = W.partitionBy("event_type").orderBy("d").rowsBetween(-2, 0)
    w9 = W.partitionBy("event_type").orderBy("d").rowsBetween(-8, 0)
    wn = W.partitionBy("event_type").orderBy("d")
    sig = daily.select(
        "event_type", "d",
        F.sum("c").over(w3).alias("s3"),
        F.sum("c").over(w9).alias("s9"),
        F.row_number().over(wn).alias("rn"),
    ).filter("rn >= 9").selectExpr(
        "event_type", "d",
        "CASE WHEN s3 * 3 > s9 THEN 1 WHEN s3 * 3 < s9 THEN -1 ELSE 0 END"
        " AS sig",
    )
    wl = W.partitionBy("event_type").orderBy("d")
    return (
        sig.withColumn("prev", F.lag("sig").over(wl))
        .filter("prev IS NOT NULL AND sig != 0 AND prev != 0"
                " AND sig != prev")
        .selectExpr(
            "event_type", "d",
            "CASE WHEN sig = 1 THEN 'golden' ELSE 'death' END AS crossover",
        )
        .orderBy("event_type", "d")
    )


QUERIES["ts_ma_crossover_signals"] = ts_ma_crossover_signals

ORACLES["ts_ma_crossover_signals"] = """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               COUNT(*) AS c
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    sig AS (
        SELECT event_type, d,
               CASE WHEN s3 * 3 > s9 THEN 1 WHEN s3 * 3 < s9 THEN -1
                    ELSE 0 END AS sig
        FROM (
            SELECT event_type, d,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS s9,
                   row_number() OVER (PARTITION BY event_type ORDER BY d)
                       AS rn
            FROM daily
        ) WHERE rn >= 9
    )
    SELECT event_type, d,
           CASE WHEN sig = 1 THEN 'golden' ELSE 'death' END AS crossover
    FROM (
        SELECT *, LAG(sig) OVER (PARTITION BY event_type ORDER BY d) AS prev
        FROM sig
    )
    WHERE prev IS NOT NULL AND sig <> 0 AND prev <> 0 AND sig <> prev
    ORDER BY event_type, d
"""


# ---------------------------------------------------------------------------
# 8. per-shot keyframe selection
# ---------------------------------------------------------------------------
def mm_shot_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shot keyframe selection — the step after mm_scene_cuts in a
    video curation pipeline: segment each payload's 64-byte 'frame'
    stream at the scene-cut boundaries (same cut rule: |Δ| > 25% of the
    per-doc mean frame sum, exact cross-multiplied integers), then keep
    each shot's maximum-energy frame as its representative. Segment ids
    are a running sum of cut flags; keyframes are per-(doc, shot)
    argmax windows. Decode is the documented deterministic stub; every
    window partitions by doc (bounded frames per doc)."""
    from kuibadb_spark.operators.multimodal import _payloads

    p = _payloads(spark, sf_dir)
    frames = (
        p.filter(F.col("doc_id") < 50)
        .selectExpr(
            "doc_id",
            # split('')+ascii is O(len); the sequence+substring(s,i,1)
            # spelling re-walks the string to i per sample — O(len^2) in
            # payload length, the axis that grows at multimodal scale
            # (mm_silence_runs measured the swap at 175 s -> 29.5 s x100)
            "transform(split(CAST(payload AS STRING), ''), c -> ascii(c))"
            " AS s",
        )
        .filter(F.expr("size(s) >= 64"))
        .selectExpr(
            "doc_id",
            "explode(transform(sequence(0, (size(s) div 64) - 1),"
            " f -> struct(f AS frame,"
            "  CAST(aggregate(slice(s, f * 64 + 1, 64), 0L, (a, x) -> a + x)"
            "  AS BIGINT) AS fsum))) AS fr",
        )
        .select("doc_id", F.col("fr.frame").alias("frame"),
                F.col("fr.fsum").alias("fsum"))
    )
    w = W.partitionBy("doc_id").orderBy("frame")
    wdoc = W.partitionBy("doc_id")
    cuts = (
        frames.withColumn("prev", F.lag("fsum").over(w))
        .withColumn("mean_num", F.sum("fsum").over(wdoc))
        .withColumn("nf", F.count(F.lit(1)).over(wdoc))
        .withColumn(
            "is_cut",
            F.expr("CASE WHEN prev IS NOT NULL AND"
                   " 4 * nf * abs(fsum - prev) > mean_num"
                   " THEN 1 ELSE 0 END"),
        )
        .withColumn(
            "shot",
            F.sum("is_cut").over(
                W.partitionBy("doc_id").orderBy("frame")
                .rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    wpick = W.partitionBy("doc_id", "shot").orderBy(
        F.desc("fsum"), F.asc("frame"))
    return (
        cuts.withColumn("rn", F.row_number().over(wpick))
        .filter("rn = 1")
        .groupBy("doc_id")
        .agg(
            F.max(F.expr("shot + 1")).alias("n_shots"),
            F.count(F.lit(1)).alias("n_keyframes"),
            F.min(F.expr("CASE WHEN shot = 0 THEN frame END"))
            .alias("first_keyframe"),
            F.sum("fsum").alias("keyframe_energy_sum"),
        )
        .orderBy("doc_id")
    )


QUERIES["mm_shot_keyframes"] = mm_shot_keyframes

ORACLES["mm_shot_keyframes"] = """
    WITH payloads AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 50
    ),
    chars AS (
        SELECT doc_id, length(text) AS n, text FROM payloads
        WHERE length(text) >= 64
    ),
    frames AS (
        SELECT doc_id, f AS frame,
               CAST(list_sum(list_transform(
                   generate_series(f * 64 + 1, f * 64 + 64),
                   i -> ord(substr(text, i, 1)))) AS BIGINT) AS fsum
        FROM (
            SELECT doc_id, n, text,
                   unnest(generate_series(0, (n // 64) - 1)) AS f
            FROM chars
        )
    ),
    cuts AS (
        SELECT doc_id, frame, fsum,
               CASE WHEN prev IS NOT NULL AND
                    4 * nf * abs(fsum - prev) > mean_num
                    THEN 1 ELSE 0 END AS is_cut
        FROM (
            SELECT doc_id, frame, fsum,
                   LAG(fsum) OVER (PARTITION BY doc_id ORDER BY frame)
                       AS prev,
                   SUM(fsum) OVER (PARTITION BY doc_id) AS mean_num,
                   COUNT(*) OVER (PARTITION BY doc_id) AS nf
            FROM frames
        )
    ),
    shots AS (
        SELECT doc_id, frame, fsum,
               SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot
        FROM cuts
    ),
    keyframes AS (
        SELECT doc_id, shot, frame, fsum FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id, shot
                       ORDER BY fsum DESC, frame ASC) AS rn
            FROM shots
        ) WHERE rn = 1
    )
    SELECT doc_id,
           CAST(MAX(shot + 1) AS BIGINT) AS n_shots,
           COUNT(*) AS n_keyframes,
           CAST(MIN(CASE WHEN shot = 0 THEN frame END) AS BIGINT)
               AS first_keyframe,
           CAST(SUM(fsum) AS BIGINT) AS keyframe_energy_sum
    FROM keyframes
    GROUP BY doc_id
    ORDER BY doc_id
"""
