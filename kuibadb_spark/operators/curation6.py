"""Round-4 batch 1: the statistical-testing / robust-measurement layer —
Mann-Whitney U rank-sum test, stratified average-treatment-effect,
Wald's SPRT sequential decision, two-sample Kolmogorov-Smirnov,
an exact quantized Pearson correlation matrix, a missingness/cardinality
data-quality audit, Theil-Sen robust trend, an integer periodogram
(dominant-cycle detection), LTTB visual downsampling, and a
Laspeyres price index.

Registered after curation5 in registry._MODULES so these keys rank
behind every previously-registered unverified key: round 4's planned
50-key grading window (aggregates/curation/multimodal/pipelines/graph/
recursive) and round 5's 50 (curation2 tail + curation3/4/5) are not
displaced; these keys become driver-gradable from round 6.

Cross-engine determinism rules (DESIGN.md #23-25) used throughout:
- quantize to integers FIRST (counts, cents, 1e3/1e6-scaled trig and
  log constants); cross-row sums are then exact in either engine
  regardless of accumulation order;
- when an exact integer product would cross 2^63 (the correlation
  matrix's n*Sxy), convert the EXACT integer sums to double and do the
  arithmetic in IEEE doubles with the identical operand/op order on
  both sides — same inputs, same ops, same bits;
- rank positions come from value-block histograms (the Gini /
  outlier_iqr trick) so no window ever scales with row count, only
  with distinct-value count;
- day/hour indexes are dense_rank-derived, never min-date broadcasts —
  no BroadcastNestedLoopJoin enters any plan;
- no ARRAY/MAP/BINARY/STRUCT in any final schema (driver
  canonicalizer, preflight gate 1b).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


def _r6(x: float) -> int:
    """Python-side half-away-from-zero rounding to 1e6 units (python's
    round() is banker's — wrong half rule for embedding as a constant)."""
    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


# ---------------------------------------------------------------------------
# 1. Mann-Whitney U rank-sum test (A/B on a non-normal metric)
# ---------------------------------------------------------------------------
def ev_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test per event type: arm A = even user_id, arm B =
    odd (the fixture's A/B convention). The rank-sum is computed over
    VALUE BLOCKS, not rows: group by cents value, and a tie block of
    size m starting after B_prev smaller observations contributes
    m_A * (2*B_prev + m + 1) to 2*R_A — the midrank identity, exact,
    with the window running over distinct cents values (bounded) rather
    than events. z uses the normal approximation without tie correction
    (documented; both engines compute the identical expression).

    Scale: one shuffle to the (event_type, cents) histogram, then a
    per-type window over distinct values — row count never enters a
    window. All integers until the single final z expression."""
    e = load(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(round(value * 100) AS BIGINT) AS cents",
        "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a",
    )
    blocks = e.groupBy("event_type", "cents").agg(
        F.sum("is_a").alias("ma"),
        F.sum(F.expr("1 - is_a")).alias("mb"),
    )
    wprev = (
        W.partitionBy("event_type").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = blocks.withColumn(
        "b_prev", F.coalesce(F.sum(F.expr("ma + mb")).over(wprev), F.lit(0))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.sum("ma").alias("n_a"),
            F.sum("mb").alias("n_b"),
            F.sum(F.expr("ma * (2 * b_prev + (ma + mb) + 1)")).alias("r2a"),
        )
        .selectExpr(
            "event_type",
            "n_a",
            "n_b",
            "r2a - n_a * (n_a + 1) AS u2_a",
            # z from the 2x-scaled U: z = (U - nA*nB/2) / sqrt(var)
            "round((CAST(r2a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a * n_b AS DOUBLE))"
            " / (2.0D * sqrt(CAST(n_a * n_b * (n_a + n_b + 1) AS DOUBLE) / 12.0D)),"
            " 6) AS z6",
        )
        .orderBy("event_type")
    )


QUERIES["ev_mannwhitney_u"] = ev_mannwhitney_u

ORACLES["ev_mannwhitney_u"] = """
    WITH e AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
        FROM events
    ),
    blocks AS (
        SELECT event_type, cents,
               SUM(is_a) AS ma, SUM(1 - is_a) AS mb
        FROM e GROUP BY event_type, cents
    ),
    ranked AS (
        SELECT *,
               COALESCE(SUM(ma + mb) OVER (
                   PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS b_prev
        FROM blocks
    ),
    agg AS (
        SELECT event_type,
               SUM(ma) AS n_a, SUM(mb) AS n_b,
               SUM(ma * (2 * b_prev + (ma + mb) + 1)) AS r2a
        FROM ranked GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           round((CAST(r2a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a * n_b AS DOUBLE))
                 / (2.0 * sqrt(CAST(n_a * n_b * (n_a + n_b + 1) AS DOUBLE) / 12.0)),
                 6) AS z6
    FROM agg
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 2. Stratified average treatment effect (post-stratification)
# ---------------------------------------------------------------------------
def ev_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified ATE: treated = odd user_id (the DiD convention),
    outcome = purchase value in cents, strata = activity deciles. The
    decile boundary is computed on the ACTIVITY-VALUE HISTOGRAM (users
    per event-count block; stratum = cum_before*10 // n_users), so all
    users tied on activity share a stratum and the window runs over
    distinct activity counts — deterministic without a per-user global
    sort, and scale-safe at any user cardinality. Strata missing an arm
    are excluded (no counterfactual there). The ALL row (stratum -1)
    integer-sums the per-stratum micro-cent effects weighted by stratum
    size, then divides once — one double expression per output row."""
    ev = load(spark, sf_dir, "events")
    act = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    blocks = act.groupBy("n_ev").agg(F.count(F.lit(1)).alias("m"))
    wprev = W.orderBy("n_ev").rowsBetween(W.unboundedPreceding, -1)
    wall = W.orderBy("n_ev").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    strata = blocks.select(
        "n_ev",
        # integer division, NOT double-divide-then-cast: DuckDB's
        # double->BIGINT cast rounds while Spark's truncates
        (
            (F.coalesce(F.sum("m").over(wprev), F.lit(0)) * 10)
            .cast("bigint")
        ).alias("cum10"),
        F.sum("m").over(wall).alias("n_total"),
    ).selectExpr("n_ev", "cum10 DIV n_total AS stratum")
    users = (
        act.join(strata, "n_ev")
        .selectExpr("user_id", "stratum",
                    "CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treated")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .selectExpr("user_id", "CAST(round(value * 100) AS BIGINT) AS cents")
        .join(users, "user_id")
    )
    per = (
        purch.groupBy("stratum")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.expr("CASE WHEN treated = 1 THEN 1 ELSE 0 END")).alias("cnt_t"),
            F.sum(F.expr("CASE WHEN treated = 0 THEN 1 ELSE 0 END")).alias("cnt_c"),
            F.sum(F.expr("CASE WHEN treated = 1 THEN cents ELSE 0 END")).alias("sum_t"),
            F.sum(F.expr("CASE WHEN treated = 0 THEN cents ELSE 0 END")).alias("sum_c"),
        )
        .filter("cnt_t > 0 AND cnt_c > 0")
        .withColumn(
            "diff_microcents",
            F.expr(
                "CAST(round((CAST(sum_t AS DOUBLE) / cnt_t"
                " - CAST(sum_c AS DOUBLE) / cnt_c) * 1000000.0D) AS BIGINT)"
            ),
        )
    )
    total = per.agg(
        F.sum("n_users").alias("n_users"),
        F.sum("cnt_t").alias("cnt_t"),
        F.sum("cnt_c").alias("cnt_c"),
        F.expr(
            "CAST(round(CAST(SUM(n_users * diff_microcents) AS DOUBLE)"
            " / SUM(n_users)) AS BIGINT)"
        ).alias("diff_microcents"),
    ).selectExpr(
        "CAST(-1 AS BIGINT) AS stratum", "n_users", "cnt_t", "cnt_c",
        "diff_microcents",
    )
    return (
        per.select("stratum", "n_users", "cnt_t", "cnt_c", "diff_microcents")
        .unionAll(total)
        .orderBy("stratum")
    )


QUERIES["ev_stratified_ate"] = ev_stratified_ate

ORACLES["ev_stratified_ate"] = """
    WITH act AS (
        SELECT user_id, COUNT(*) AS n_ev FROM events GROUP BY user_id
    ),
    blocks AS (SELECT n_ev, COUNT(*) AS m FROM act GROUP BY n_ev),
    strata AS (
        SELECT n_ev,
               CAST(COALESCE(SUM(m) OVER (ORDER BY n_ev
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 10 // SUM(m) OVER () AS BIGINT) AS stratum
        FROM blocks
    ),
    users AS (
        SELECT a.user_id, s.stratum,
               CASE WHEN a.user_id % 2 = 1 THEN 1 ELSE 0 END AS treated
        FROM act a JOIN strata s USING (n_ev)
    ),
    purch AS (
        SELECT u.stratum, u.treated, u.user_id,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN users u USING (user_id)
        WHERE e.event_type = 'purchase'
    ),
    per AS (
        SELECT stratum,
               COUNT(DISTINCT user_id) AS n_users,
               SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS cnt_t,
               SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS cnt_c,
               SUM(CASE WHEN treated = 1 THEN cents ELSE 0 END) AS sum_t,
               SUM(CASE WHEN treated = 0 THEN cents ELSE 0 END) AS sum_c
        FROM purch GROUP BY stratum
    ),
    kept AS (
        SELECT stratum, n_users,
               CAST(cnt_t AS BIGINT) AS cnt_t,
               CAST(cnt_c AS BIGINT) AS cnt_c,
               CAST(round((CAST(sum_t AS DOUBLE) / cnt_t
                    - CAST(sum_c AS DOUBLE) / cnt_c) * 1000000.0) AS BIGINT)
                   AS diff_microcents
        FROM per WHERE cnt_t > 0 AND cnt_c > 0
    )
    SELECT stratum, n_users, cnt_t, cnt_c, diff_microcents FROM kept
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(SUM(n_users) AS BIGINT),
           CAST(SUM(cnt_t) AS BIGINT), CAST(SUM(cnt_c) AS BIGINT),
           CAST(round(CAST(SUM(n_users * diff_microcents) AS DOUBLE)
                / SUM(n_users)) AS BIGINT)
    FROM kept
    ORDER BY stratum
"""


# ---------------------------------------------------------------------------
# 3. Wald's SPRT: sequential A/B decision
# ---------------------------------------------------------------------------
# log-likelihood-ratio increments in 1e6 units, embedded as identical
# integer literals on both sides (H0: p=0.4, H1: p=0.5, alpha=beta=0.05)
_SPRT_INC1 = _r6(math.log(0.5 / 0.4))          # observation >= threshold
_SPRT_INC0 = _r6(math.log(0.5 / 0.6))          # observation <  threshold
_SPRT_BOUND = _r6(math.log(0.95 / 0.05))       # ln(19), symmetric bounds
_SPRT_THRESH = 250.0


def ev_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability-ratio test per variant: purchases
    arrive in time order; each contributes an integer-quantized LLR
    increment for 'value >= 250' under H1: p=0.5 vs H0: p=0.4; the test
    stops at the first crossing of ±ln(19). The cumulative sum is a
    per-variant ordered window — inherently sequential semantics (the
    decision depends on arrival order), bounded by the variant count,
    exactly like the reference's cumulative scan shapes; at production
    scale the cumsum shards by (variant, day) with per-shard carryover.
    All integers; crossing selection is a deterministic (cum-ordered)
    row_number."""
    p = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .selectExpr(
            "CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant",
            "ts", "event_id",
            f"CASE WHEN value >= {_SPRT_THRESH}D THEN {_SPRT_INC1}L"
            f" ELSE {_SPRT_INC0}L END AS inc",
        )
    )
    wcum = (
        W.partitionBy("variant").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = p.select(
        "variant", "ts", "event_id",
        F.sum("inc").over(wcum).alias("llr"),
        F.count(F.lit(1)).over(wcum).alias("n"),
    )
    wfirst = W.partitionBy("variant").orderBy("ts", "event_id")
    crossing = (
        cum.filter(F.abs("llr") >= _SPRT_BOUND)
        .withColumn("rn", F.row_number().over(wfirst))
        .filter("rn = 1")
        .select("variant", F.col("n").alias("n_cross"),
                F.col("llr").alias("llr_cross"))
    )
    final = cum.groupBy("variant").agg(
        F.max("n").alias("n_total"),
        F.max_by("llr", "n").alias("llr_final"),
    )
    return (
        final.join(crossing, "variant", "left")
        .selectExpr(
            "variant",
            "CASE WHEN llr_cross IS NULL THEN 'continue'"
            " WHEN llr_cross > 0 THEN 'accept_h1' ELSE 'accept_h0' END"
            " AS decision",
            "COALESCE(n_cross, n_total) AS n_obs",
            "COALESCE(llr_cross, llr_final) AS llr_micro",
        )
        .orderBy("variant")
    )


QUERIES["ev_sprt_decision"] = ev_sprt_decision

ORACLES["ev_sprt_decision"] = f"""
    WITH p AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
               ts, event_id,
               CASE WHEN value >= {_SPRT_THRESH} THEN {_SPRT_INC1}
                    ELSE {_SPRT_INC0} END AS inc
        FROM events WHERE event_type = 'purchase'
    ),
    cum AS (
        SELECT variant, ts, event_id,
               SUM(inc) OVER w AS llr,
               COUNT(*) OVER w AS n
        FROM p
        WINDOW w AS (PARTITION BY variant ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    crossing AS (
        SELECT variant, n AS n_cross, llr AS llr_cross
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY variant ORDER BY ts, event_id) AS rn
            FROM cum WHERE abs(llr) >= {_SPRT_BOUND}
        ) WHERE rn = 1
    ),
    final AS (
        SELECT variant, MAX(n) AS n_total,
               arg_max(llr, n) AS llr_final
        FROM cum GROUP BY variant
    )
    SELECT f.variant,
           CASE WHEN c.llr_cross IS NULL THEN 'continue'
                WHEN c.llr_cross > 0 THEN 'accept_h1' ELSE 'accept_h0' END
               AS decision,
           CAST(COALESCE(c.n_cross, f.n_total) AS BIGINT) AS n_obs,
           CAST(COALESCE(c.llr_cross, f.llr_final) AS BIGINT) AS llr_micro
    FROM final f LEFT JOIN crossing c ON f.variant = c.variant
    ORDER BY f.variant
"""


# ---------------------------------------------------------------------------
# 4. Two-sample Kolmogorov-Smirnov test
# ---------------------------------------------------------------------------
_KS_PAIRS = [("view", "click"), ("view", "purchase"), ("click", "purchase")]


def profile_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS over event-value distributions for three fixed
    type pairs. D = max |ECDF_a - ECDF_b| computed in exact integers:
    per distinct cents value, |cumA*nB - cumB*nA| — the ECDF difference
    scaled by nA*nB. The window runs over the (pair, cents) histogram
    (distinct values), never rows. The 5% critical value
    c = 1.358*sqrt((nA+nB)/(nA*nB)) is one double expression; the
    reject flag compares the two ppm integers."""
    e = load(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(round(value * 100) AS BIGINT) AS cents"
    )
    parts = []
    for a, b in _KS_PAIRS:
        parts.append(
            e.filter(F.col("event_type").isin([a, b])).selectExpr(
                f"'{a}_vs_{b}' AS pair",
                "cents",
                f"CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END AS is_a",
            )
        )
    u = parts[0].unionAll(parts[1]).unionAll(parts[2])
    blocks = u.groupBy("pair", "cents").agg(
        F.sum("is_a").alias("a_cnt"),
        F.sum(F.expr("1 - is_a")).alias("b_cnt"),
    )
    wcum = (
        W.partitionBy("pair").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wall = (
        W.partitionBy("pair").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    ecdf = blocks.select(
        "pair",
        F.sum("a_cnt").over(wcum).alias("cum_a"),
        F.sum("b_cnt").over(wcum).alias("cum_b"),
        F.sum("a_cnt").over(wall).alias("n_a"),
        F.sum("b_cnt").over(wall).alias("n_b"),
    )
    return (
        ecdf.groupBy("pair")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(F.abs(F.expr("cum_a * n_b - cum_b * n_a"))).alias("dmax"),
        )
        .selectExpr(
            "pair", "n_a", "n_b",
            "dmax * 1000000 DIV (n_a * n_b) AS d_ppm",
            "CAST(round(1358000.0D * sqrt(CAST(n_a + n_b AS DOUBLE)"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))) AS BIGINT)"
            " AS crit_ppm",
            "CAST(CASE WHEN dmax * 1000000 DIV (n_a * n_b) >"
            " CAST(round(1358000.0D * sqrt(CAST(n_a + n_b AS DOUBLE)"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))) AS BIGINT)"
            " THEN 1 ELSE 0 END AS INT) AS reject_5pct",
        )
        .orderBy("pair")
    )


QUERIES["profile_ks_test"] = profile_ks_test

_KS_UNION = " UNION ALL ".join(
    f"""SELECT '{a}_vs_{b}' AS pair,
            CAST(round(value * 100) AS BIGINT) AS cents,
            CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END AS is_a
        FROM events WHERE event_type IN ('{a}', '{b}')"""
    for a, b in _KS_PAIRS
)

ORACLES["profile_ks_test"] = f"""
    WITH u AS ({_KS_UNION}),
    blocks AS (
        SELECT pair, cents, SUM(is_a) AS a_cnt, SUM(1 - is_a) AS b_cnt
        FROM u GROUP BY pair, cents
    ),
    ecdf AS (
        SELECT pair,
               SUM(a_cnt) OVER wc AS cum_a,
               SUM(b_cnt) OVER wc AS cum_b,
               SUM(a_cnt) OVER wa AS n_a,
               SUM(b_cnt) OVER wa AS n_b
        FROM blocks
        WINDOW wc AS (PARTITION BY pair ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wa AS (PARTITION BY pair ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
    ),
    agg AS (
        SELECT pair, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
               MAX(abs(cum_a * n_b - cum_b * n_a)) AS dmax
        FROM ecdf GROUP BY pair
    )
    SELECT pair,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(dmax * 1000000 // (n_a * n_b) AS BIGINT) AS d_ppm,
           CAST(round(1358000.0 * sqrt(CAST(n_a + n_b AS DOUBLE)
                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))) AS BIGINT)
               AS crit_ppm,
           CAST(CASE WHEN dmax * 1000000 // (n_a * n_b) >
                CAST(round(1358000.0 * sqrt(CAST(n_a + n_b AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))
                     AS BIGINT)
                THEN 1 ELSE 0 END AS INT) AS reject_5pct
    FROM agg
    ORDER BY pair
"""


# ---------------------------------------------------------------------------
# 5. Pearson correlation matrix (quantized-exact sums)
# ---------------------------------------------------------------------------
_CORR_PAIRS = [
    ("qty", "price"), ("qty", "disc"), ("qty", "tax"),
    ("price", "disc"), ("price", "tax"), ("disc", "tax"),
]


def profile_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over lineitem's numeric columns in
    ONE aggregate pass: quantize to integers (whole quantity, dollar
    price, pct discount/tax), accumulate the 14 moment sums exactly,
    then evaluate each corr as a single double expression from the
    exact integers. n*Sxy can cross 2^63, so the FINAL arithmetic runs
    in IEEE doubles — identical exact-integer inputs and operand order
    give identical bits in both engines. One full scan, one reduce, no
    shuffle of data rows — the textbook map-side-combine shape."""
    li = load(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(round(l_extendedprice) AS BIGINT) AS e",
        "CAST(round(l_discount * 100) AS BIGINT) AS d",
        "CAST(round(l_tax * 100) AS BIGINT) AS t",
    )
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"s_{c}") for c in ("q", "e", "d", "t")],
        *[
            F.sum(F.expr(f"{a} * {b}")).alias(f"s_{a}{b}")
            for a, b in [("q", "q"), ("e", "e"), ("d", "d"), ("t", "t"),
                         ("q", "e"), ("q", "d"), ("q", "t"),
                         ("e", "d"), ("e", "t"), ("d", "t")]
        ],
    )
    short = {"qty": "q", "price": "e", "disc": "d", "tax": "t"}

    def corr_expr(x: str, y: str) -> str:
        a, b = short[x], short[y]
        return (
            f"CAST(round((CAST(n AS DOUBLE) * CAST(s_{a}{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / (sqrt(CAST(n AS DOUBLE) * CAST(s_{a}{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * CAST(s_{b}{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
            f" * 1000000.0D) AS BIGINT)"
        )

    stack_args = ", ".join(
        f"'{x}_{y}', {corr_expr(x, y)}" for x, y in _CORR_PAIRS
    )
    return (
        sums.selectExpr(
            "n", f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (pair, corr_ppm)"
        )
        .select("pair", "n", "corr_ppm")
        .orderBy("pair")
    )


QUERIES["profile_corr_matrix"] = profile_corr_matrix


def _corr_duck(x: str, y: str) -> str:
    short = {"qty": "q", "price": "e", "disc": "d", "tax": "t"}
    a, b = short[x], short[y]
    return (
        f"CAST(round((CAST(n AS DOUBLE) * CAST(s_{a}{b} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        f" / (sqrt(CAST(n AS DOUBLE) * CAST(s_{a}{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        f" * sqrt(CAST(n AS DOUBLE) * CAST(s_{b}{b} AS DOUBLE)"
        f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        f" * 1000000.0) AS BIGINT)"
    )


ORACLES["profile_corr_matrix"] = f"""
    WITH li AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(round(l_extendedprice) AS BIGINT) AS e,
               CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(round(l_tax * 100) AS BIGINT) AS t
        FROM lineitem
    ),
    sums AS (
        SELECT COUNT(*) AS n,
               SUM(q) AS s_q, SUM(e) AS s_e, SUM(d) AS s_d, SUM(t) AS s_t,
               SUM(q*q) AS s_qq, SUM(e*e) AS s_ee, SUM(d*d) AS s_dd,
               SUM(t*t) AS s_tt, SUM(q*e) AS s_qe, SUM(q*d) AS s_qd,
               SUM(q*t) AS s_qt, SUM(e*d) AS s_ed, SUM(e*t) AS s_et,
               SUM(d*t) AS s_dt
        FROM li
    )
    {" UNION ALL ".join(
        f"SELECT '{x}_{y}' AS pair, n, {_corr_duck(x, y)} AS corr_ppm FROM sums"
        for x, y in _CORR_PAIRS
    )}
    ORDER BY pair
"""


# ---------------------------------------------------------------------------
# 6. Missingness / cardinality data-quality audit
# ---------------------------------------------------------------------------
_AUDIT_COLS = [
    "event_id", "ts", "user_id", "event_type", "value", "props",
]


def profile_missingness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality audit of events: null count, exact
    distinct count, fill rate in ppm — the first screen a curation
    pipeline runs on a new table. One aggregate pass; the multi-distinct
    expands to Spark's standard expand-and-aggregate plan (same shape
    the graded agg_multi_distinct pins)."""
    c = load(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col in _AUDIT_COLS:
        aggs.append(F.sum(F.expr(
            f"CASE WHEN {col} IS NULL THEN 1 ELSE 0 END")).alias(f"null_{col}"))
        aggs.append(F.countDistinct(col).alias(f"dist_{col}"))
    sums = c.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', null_{col}, dist_{col}" for col in _AUDIT_COLS
    )
    return (
        sums.selectExpr(
            "n_rows",
            f"stack({len(_AUDIT_COLS)}, {stack_args})"
            " AS (column_name, n_null, n_distinct)",
        )
        .selectExpr(
            "column_name", "n_rows", "n_null", "n_distinct",
            "(n_rows - n_null) * 1000000 DIV n_rows AS fill_ppm",
        )
        .orderBy("column_name")
    )


QUERIES["profile_missingness_audit"] = profile_missingness_audit

ORACLES["profile_missingness_audit"] = f"""
    WITH sums AS (
        SELECT COUNT(*) AS n_rows,
               {", ".join(
                   f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
                   f" AS null_{c}, COUNT(DISTINCT {c}) AS dist_{c}"
                   for c in _AUDIT_COLS)}
        FROM events
    )
    {" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n_rows,"
        f" CAST(null_{c} AS BIGINT) AS n_null,"
        f" dist_{c} AS n_distinct,"
        f" CAST((n_rows - null_{c}) * 1000000 // n_rows AS BIGINT)"
        f" AS fill_ppm FROM sums"
        for c in _AUDIT_COLS)}
    ORDER BY column_name
"""


# ---------------------------------------------------------------------------
# 7. Theil-Sen robust trend estimator
# ---------------------------------------------------------------------------
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of daily event volume per type: the median of
    all pairwise slopes — the robust trend a monitoring pipeline
    prefers over OLS (29% outlier breakdown). x is the dense-rank day
    index (gaps collapse; documented), the pair join is a per-type
    self-join over the DAILY series — days², bounded by the retention
    window, never by event volume — and the median is a deterministic
    rank selection on ppm-quantized integer slopes (2x units so the
    even-count midpoint stays integer)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "x",
            (F.dense_rank().over(
                W.partitionBy("event_type").orderBy("d")) - 1).cast("bigint"),
        )
        .select("event_type", "x", "c")
    )
    b = daily.selectExpr("event_type", "x AS xj", "c AS cj")
    pairs = daily.join(b, "event_type").filter("xj > x").selectExpr(
        "event_type",
        "CAST(round((cj - c) * 1000000.0D / (xj - x)) AS BIGINT) AS slope_ppm",
        "x", "xj",
    )
    wrank = W.partitionBy("event_type").orderBy("slope_ppm", "x", "xj")
    wall = (
        W.partitionBy("event_type").orderBy("slope_ppm")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    ranked = pairs.select(
        "event_type", "slope_ppm",
        F.row_number().over(wrank).cast("bigint").alias("r"),
        F.count(F.lit(1)).over(wall).alias("np"),
    )
    return (
        ranked.filter("r = (np + 1) DIV 2 OR r = (np + 2) DIV 2")
        .groupBy("event_type")
        .agg(
            F.max("np").alias("n_pairs"),
            F.expr(
                "SUM(slope_ppm) * CASE WHEN MIN(r) = MAX(r) THEN 2 ELSE 1 END"
            ).alias("median_slope_ppm_x2"),
        )
        .orderBy("event_type")
    )


QUERIES["ts_theil_sen_trend"] = ts_theil_sen_trend

ORACLES["ts_theil_sen_trend"] = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS c
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    idx AS (
        SELECT event_type,
               CAST(dense_rank() OVER (
                   PARTITION BY event_type ORDER BY d) - 1 AS BIGINT) AS x,
               c
        FROM daily
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(round((b.c - a.c) * 1000000.0 / (b.x - a.x)) AS BIGINT)
                   AS slope_ppm,
               a.x AS x, b.x AS xj
        FROM idx a JOIN idx b
          ON a.event_type = b.event_type AND b.x > a.x
    ),
    ranked AS (
        SELECT event_type, slope_ppm,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY slope_ppm, x, xj) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS np
        FROM pairs
    )
    SELECT event_type, MAX(np) AS n_pairs,
           CAST(SUM(slope_ppm) * CASE WHEN MIN(r) = MAX(r) THEN 2 ELSE 1 END
                AS BIGINT) AS median_slope_ppm_x2
    FROM ranked
    WHERE r = (np + 1) // 2 OR r = (np + 2) // 2
    GROUP BY event_type
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 8. Integer periodogram: dominant-cycle detection
# ---------------------------------------------------------------------------
_PERIODS = list(range(2, 11))
# cos/sin lookup quantized to 1e3, keyed (period, t mod period) — embedded
# as identical integer literals in both engines
_TRIG_ROWS = [
    (p, r,
     int(math.floor(abs(math.cos(2 * math.pi * r / p)) * 1e3 + 0.5))
     * (1 if math.cos(2 * math.pi * r / p) >= 0 else -1),
     int(math.floor(abs(math.sin(2 * math.pi * r / p)) * 1e3 + 0.5))
     * (1 if math.sin(2 * math.pi * r / p) >= 0 else -1))
    for p in _PERIODS for r in range(p)
]


def ts_periodogram_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant cycle per event type via an integer periodogram: power
    at period p is Sc²+Ss² with Sc = Σ y_t·cos(2πt/p) — the trig values
    quantized to 1e3 integers keyed (p, t mod p) and joined as a tiny
    broadcast lookup (54 rows), so the whole sweep is one equi-join and
    one exact integer aggregation per (type, period). The peak is a
    deterministic argmax (power desc, p asc). Detects e.g. weekly
    seasonality in daily series without any FFT dependency."""
    trig_values = ", ".join(f"({p}, {r}, {c}, {s})" for p, r, c, s in _TRIG_ROWS)
    spark_trig = F.broadcast(
        spark.sql(
            f"SELECT col1 AS p, col2 AS r, col3 AS cq, col4 AS sq"
            f" FROM VALUES {trig_values}"
        )
    )
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "t",
            (F.dense_rank().over(
                W.partitionBy("event_type").orderBy("d")) - 1).cast("bigint"),
        )
    )
    # explode the period list row-locally, THEN equi-join the trig
    # lookup on (p, t % p): `r = t % p` as a join condition mixes both
    # sides and would plan as a nested-loop join
    fanned = daily.select(
        "event_type", "c", "t",
        F.explode(F.array(*[F.lit(p) for p in _PERIODS])).alias("p"),
    ).withColumn("r", F.expr("CAST(t % p AS INT)"))
    power = (
        fanned.join(spark_trig, ["p", "r"])
        .groupBy("event_type", "p")
        .agg(
            F.sum(F.expr("c * cq")).alias("sc"),
            F.sum(F.expr("c * sq")).alias("ss"),
        )
        .selectExpr("event_type", "p", "sc * sc + ss * ss AS power")
    )
    wbest = W.partitionBy("event_type").orderBy(F.desc("power"), F.asc("p"))
    return (
        power.withColumn("rn", F.row_number().over(wbest))
        .filter("rn = 1")
        .selectExpr("event_type", "CAST(p AS INT) AS best_period", "power")
        .orderBy("event_type")
    )


QUERIES["ts_periodogram_peak"] = ts_periodogram_peak

ORACLES["ts_periodogram_peak"] = f"""
    WITH trig(p, r, cq, sq) AS (
        VALUES {", ".join(f"({p}, {r}, {c}, {s})" for p, r, c, s in _TRIG_ROWS)}
    ),
    daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS c
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    idx AS (
        SELECT event_type,
               CAST(dense_rank() OVER (
                   PARTITION BY event_type ORDER BY d) - 1 AS BIGINT) AS t,
               c
        FROM daily
    ),
    power AS (
        SELECT i.event_type, tr.p,
               CAST(SUM(i.c * tr.cq) * SUM(i.c * tr.cq)
                    + SUM(i.c * tr.sq) * SUM(i.c * tr.sq) AS BIGINT) AS power
        FROM idx i JOIN trig tr ON tr.r = i.t % tr.p
        GROUP BY i.event_type, tr.p
    )
    SELECT event_type, CAST(p AS INT) AS best_period, power
    FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                   ORDER BY power DESC, p) AS rn
        FROM power
    ) WHERE rn = 1
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 9. LTTB visual downsampling (fixed-anchor variant)
# ---------------------------------------------------------------------------
_LTTB_BUCKET = 24


def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of the hourly event
    series (Steinarsson 2013) — the dashboard decimation algorithm:
    keep, per bucket, the point forming the largest triangle with its
    neighbor buckets. This is the FIXED-ANCHOR variant: anchors are the
    neighbor buckets' centroids rather than the previously-selected
    point, which removes the sequential dependency (classic LTTB is a
    left-to-right scan) and makes every bucket independently parallel —
    the standard distributed adaptation; selection quality is within
    one point of sequential LTTB on smooth series. The triangle area is
    cross-multiplied into exact integers (scaled by np²·nn, constant
    within a bucket, so the per-bucket argmax is unaffected). First and
    last buckets keep their endpoint, as LTTB requires."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn(
            "x", (F.dense_rank().over(W.orderBy("h")) - 1).cast("bigint")
        )
        .withColumn("bucket", F.expr(f"x DIV {_LTTB_BUCKET}"))
    )
    baggs = hourly.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    maxb = baggs.agg(F.max("bucket").alias("mb"))
    prev = baggs.selectExpr(
        "bucket + 1 AS bucket", "n AS np", "sx AS ax", "sy AS ay")
    nxt = baggs.selectExpr(
        "bucket - 1 AS bucket", "n AS nn", "sx AS cx", "sy AS cy")
    interior = (
        hourly.join(prev, "bucket").join(nxt, "bucket")
        .selectExpr(
            "bucket", "x", "h", "y",
            "abs((x * np - ax) * (cy * np - ay * nn)"
            " - (cx * np - ax * nn) * (y * np - ay)) AS score",
        )
    )
    wpick = W.partitionBy("bucket").orderBy(F.desc("score"), F.asc("x"))
    picked = (
        interior.withColumn("rn", F.row_number().over(wpick))
        .filter("rn = 1")
        .select("bucket", "x", "h", "y")
    )
    wfirst = W.partitionBy("bucket").orderBy("x")
    wlast = W.partitionBy("bucket").orderBy(F.desc("x"))
    first_pt = (
        hourly.filter("bucket = 0")
        .withColumn("rn", F.row_number().over(wfirst))
        .filter("rn = 1").select("bucket", "x", "h", "y")
    )
    last_pt = (
        hourly.join(F.broadcast(maxb), F.expr("bucket = mb"))
        .withColumn("rn", F.row_number().over(wlast))
        .filter("rn = 1").select("bucket", "x", "h", "y")
    )
    return first_pt.unionAll(picked).unionAll(last_pt).orderBy("x")


QUERIES["ts_lttb_downsample"] = ts_lttb_downsample

ORACLES["ts_lttb_downsample"] = f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS y
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    idx AS (
        SELECT h, y,
               CAST(dense_rank() OVER (ORDER BY h) - 1 AS BIGINT) AS x
        FROM hourly
    ),
    pts AS (SELECT *, x // {_LTTB_BUCKET} AS bucket FROM idx),
    baggs AS (
        SELECT bucket, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy
        FROM pts GROUP BY bucket
    ),
    interior AS (
        SELECT p.bucket, p.x, p.h, p.y,
               abs((p.x * pr.n - pr.sx) * (nx.sy * pr.n - pr.sy * nx.n)
                   - (nx.sx * pr.n - pr.sx * nx.n) * (p.y * pr.n - pr.sy))
                   AS score
        FROM pts p
        JOIN baggs pr ON pr.bucket = p.bucket - 1
        JOIN baggs nx ON nx.bucket = p.bucket + 1
    ),
    picked AS (
        SELECT bucket, x, h, y FROM (
            SELECT *, row_number() OVER (PARTITION BY bucket
                       ORDER BY score DESC, x) AS rn
            FROM interior
        ) WHERE rn = 1
    ),
    first_pt AS (
        SELECT bucket, x, h, y FROM (
            SELECT *, row_number() OVER (ORDER BY x) AS rn
            FROM pts WHERE bucket = 0
        ) WHERE rn = 1
    ),
    last_pt AS (
        SELECT bucket, x, h, y FROM (
            SELECT *, row_number() OVER (ORDER BY x DESC) AS rn
            FROM pts WHERE bucket = (SELECT MAX(bucket) FROM baggs)
        ) WHERE rn = 1
    )
    SELECT * FROM first_pt
    UNION ALL SELECT * FROM picked
    UNION ALL SELECT * FROM last_pt
    ORDER BY x
"""


# ---------------------------------------------------------------------------
# 10. Laspeyres price index
# ---------------------------------------------------------------------------
def agg_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per order year: Σ p_t·q₀ / Σ p₀·q₀ over
    parts traded in BOTH the base year (the data's first year) and year
    t, with p = cents unit price (part-year revenue / quantity) and
    q₀ = base-year quantity. Both sums are exact integer (cents ×
    whole units) per year; the index is one double expression in basis
    points. Plan: lineitem⋈orders on orderkey (the fact join), part-year
    prices grouped once, then a partkey equi-join against the base-year
    slice — every join keyed, no broadcast of unbounded sides."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"
    )
    o = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "year(o_orderdate) AS yr"
    )
    py = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_partkey", "yr")
        .agg(
            F.expr(
                "CAST(round(100.0D * SUM(l_extendedprice) / SUM(l_quantity))"
                " AS BIGINT)"
            ).alias("price_c"),
            F.expr("CAST(SUM(l_quantity) AS BIGINT)").alias("qty"),
        )
    )
    base_yr = py.agg(F.min("yr").alias("byr"))
    base = (
        py.join(F.broadcast(base_yr), F.expr("yr = byr"))
        .selectExpr("l_partkey", "price_c AS p0", "qty AS q0")
    )
    return (
        py.join(base, "l_partkey")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.expr("price_c * q0")).alias("num"),
            F.sum(F.expr("p0 * q0")).alias("den"),
        )
        .selectExpr(
            "yr", "n_parts",
            "CAST(round(CAST(num AS DOUBLE) * 10000.0D"
            " / CAST(den AS DOUBLE)) AS BIGINT) AS index_bp",
        )
        .orderBy("yr")
    )


QUERIES["agg_price_index_laspeyres"] = agg_price_index_laspeyres

ORACLES["agg_price_index_laspeyres"] = """
    WITH py AS (
        SELECT l_partkey, year(o_orderdate) AS yr,
               CAST(round(100.0 * SUM(l_extendedprice) / SUM(l_quantity))
                    AS BIGINT) AS price_c,
               CAST(SUM(l_quantity) AS BIGINT) AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_partkey, year(o_orderdate)
    ),
    base AS (
        SELECT l_partkey, price_c AS p0, qty AS q0
        FROM py WHERE yr = (SELECT MIN(yr) FROM py)
    )
    SELECT CAST(py.yr AS INT) AS yr, COUNT(*) AS n_parts,
           CAST(round(CAST(SUM(py.price_c * base.q0) AS DOUBLE) * 10000.0
                / CAST(SUM(base.p0 * base.q0) AS DOUBLE)) AS BIGINT)
               AS index_bp
    FROM py JOIN base USING (l_partkey)
    GROUP BY py.yr
    ORDER BY py.yr
"""
