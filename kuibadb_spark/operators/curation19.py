"""Round-8 batch 2: OCR/garbage screens, engagement stickiness,
production split auditing, graph reciprocity, and declared-vs-detected
language QA.

Registered after curation18 in registry._MODULES (freeze discipline).
Determinism: every verdict is exact integer arithmetic (counts, ppm
DIV, fixed-order argmax chains); no doubles anywhere.

Reference parity: analytic surface beyond the reference grammar
(sql.lalrpop:314-318), per SURVEY.md §2.3 / LLM-extension rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kuibadb_spark.catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# 1. OCR/garbage artifact screen
# ---------------------------------------------------------------------------
def text_ocr_artifact_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garbage-text screen for OCR/extraction artifacts — the row-local
    rule stack a crawl-ingest pipeline runs before any model-based
    quality scoring: per document, the non-alphabetic character share,
    the digit share, and the longest IDENTICAL-token run (OCR loops and
    boilerplate stutters repeat tokens); rolled up per source with
    flagged-document rates. All thresholds are integer
    cross-multiplications (share·len vs count·1e3), so the verdict bit
    is exact in both engines.

    Flag rule: non-alpha share > 300/1e3 OR digit share > 200/1e3 OR a
    token repeated ≥ 4 times consecutively.

    Scale shape: entirely row-local folds over the token array (one
    pass, no per-position substring re-walks — lengthprobe entry), one
    partial-aggregated groupBy(source).
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "source",
        "text",
        "split(text, ' ') AS w",
        "length(text) AS n_chars_t",
        "length(regexp_replace(text, '[a-zA-Z ]', '')) AS n_nonalpha",
        "length(regexp_replace(text, '[^0-9]', '')) AS n_digit",
    )
    # longest identical-token run: fold (prev, run, best) over tokens —
    # an O(tokens) row-local scan encoded as one aggregate() lambda
    runs = d.selectExpr(
        "doc_id",
        "source",
        "n_chars_t",
        "n_nonalpha",
        "n_digit",
        "aggregate(w, struct(CAST('' AS STRING) AS prev,"
        " CAST(0 AS INT) AS run, CAST(0 AS INT) AS best),"
        " (acc, t) -> struct(t AS prev,"
        "  CASE WHEN t = acc.prev THEN acc.run + 1 ELSE 1 END AS run,"
        "  GREATEST(acc.best,"
        "   CASE WHEN t = acc.prev THEN acc.run + 1 ELSE 1 END) AS best),"
        " acc -> acc.best) AS max_run",
    )
    flagged = runs.selectExpr(
        "source",
        "CAST(n_nonalpha * 1000 > 300 * n_chars_t"
        " OR n_digit * 1000 > 200 * n_chars_t"
        " OR max_run >= 4 AS INT) AS flagged",
        "max_run",
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("flagged").alias("n_flagged"),
            F.max("max_run").alias("worst_token_run"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_flagged",
            "n_flagged * 1000000 DIV n_docs AS flagged_ppm",
            "worst_token_run",
        )
        .orderBy("source")
    )


QUERIES["text_ocr_artifact_screen"] = text_ocr_artifact_screen

def _ocr_oracle() -> str:
    # The identical-token-run scan is a row-local fold in Spark; the
    # DuckDB mirror uses the gaps-and-islands form over the unnested
    # token list (i - row_number per token value = run id).
    return """
    WITH d AS (
        SELECT doc_id, source,
               string_split(text, ' ') AS w,
               length(text) AS n_chars_t,
               length(regexp_replace(text, '[a-zA-Z ]', '', 'g'))
                   AS n_nonalpha,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
        FROM documents
    ),
    toks AS (
        SELECT doc_id, w[i] AS tok, i
        FROM d, unnest(generate_series(1, len(w))) t(i)
    ),
    islands AS (
        SELECT doc_id, tok,
               i - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY i)
                   AS grp
        FROM toks
    ),
    runs AS (
        SELECT doc_id, CAST(MAX(run_len) AS INT) AS max_run
        FROM (
            SELECT doc_id, COUNT(*) AS run_len
            FROM islands GROUP BY doc_id, tok, grp
        ) GROUP BY doc_id
    ),
    flagged AS (
        SELECT d.source,
               CASE WHEN d.n_nonalpha * 1000 > 300 * d.n_chars_t
                      OR d.n_digit * 1000 > 200 * d.n_chars_t
                      OR r.max_run >= 4 THEN 1 ELSE 0 END AS flagged,
               r.max_run
        FROM d JOIN runs r USING (doc_id)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           CAST(SUM(flagged) * 1000000 // COUNT(*) AS BIGINT)
               AS flagged_ppm,
           MAX(max_run) AS worst_token_run
    FROM flagged
    GROUP BY source
    ORDER BY source
"""


ORACLES["text_ocr_artifact_screen"] = _ocr_oracle()


# ---------------------------------------------------------------------------
# 2. DAU/WAU stickiness
# ---------------------------------------------------------------------------
def ev_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day engagement stickiness: daily active users over the ISO
    week's weekly active users (calendar-week WAU, the standard
    product read) in ppm. A falling ratio with flat WAU = the same
    crowd logging in less often.

    Scale shape: two partial-aggregated distinct-aggregations (day,
    week) over (user, bucket) pairs and one broadcast-able equi-join
    on the week key — output is calendar-bounded ([time] class), no
    windows.
    """
    ev = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "CAST(date_trunc('day', ts) AS DATE) AS d",
        "CAST(date_trunc('week', ts) AS DATE) AS wk",
    )
    dau = ev.groupBy("d", "wk").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = ev.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "wk")
        .selectExpr(
            "d",
            "wk",
            "dau",
            "wau",
            "dau * 1000000 DIV wau AS stickiness_ppm",
        )
        .orderBy("d")
    )


QUERIES["ev_dau_wau_stickiness"] = ev_dau_wau_stickiness

ORACLES["ev_dau_wau_stickiness"] = """
    WITH ev AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    dau AS (
        SELECT d, wk, COUNT(DISTINCT user_id) AS dau
        FROM ev GROUP BY d, wk
    ),
    wau AS (
        SELECT wk, COUNT(DISTINCT user_id) AS wau FROM ev GROUP BY wk
    )
    SELECT d, dau.wk AS wk, dau, wau,
           CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN wau USING (wk)
    ORDER BY d
"""


# ---------------------------------------------------------------------------
# 3. hash-boundary split audit
# ---------------------------------------------------------------------------
def sample_boundary_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production train/val/test assignment: md5(doc_id) hex-prefix
    bucketing into 100 cells → 80/10/10 — stable under corpus growth
    (a document's split never changes when others arrive, unlike
    row_number slicing) and engine-portable (md5 is bit-identical
    everywhere). Output: per (source, split) counts and the split's
    share of the source in ppm — the balance audit that catches a
    biased id scheme before training does.

    Scale shape: one row-local hash + one partial-aggregated
    groupBy(source, split); 3 rows per source at any corpus size.
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "source",
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4),"
        " 16, 10) AS BIGINT) % 100 AS cell",
    ).selectExpr(
        "source",
        "CASE WHEN cell < 80 THEN 'train' WHEN cell < 90 THEN 'val'"
        " ELSE 'test' END AS split",
    )
    per = d.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    return (
        per.join(tot, "source")
        .selectExpr(
            "source",
            "split",
            "n_docs",
            "n_docs * 1000000 DIV n_src AS share_ppm",
        )
        .orderBy("source", "split")
    )


QUERIES["sample_boundary_hash_split"] = sample_boundary_hash_split

ORACLES["sample_boundary_hash_split"] = """
    WITH d AS (
        SELECT source,
               CASE WHEN cell < 80 THEN 'train' WHEN cell < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT source,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                        AS BIGINT) % 100 AS cell
            FROM documents
        )
    ),
    per AS (
        SELECT source, split, COUNT(*) AS n_docs
        FROM d GROUP BY source, split
    ),
    tot AS (
        SELECT source, COUNT(*) AS n_src FROM d GROUP BY source
    )
    SELECT per.source, split, n_docs,
           CAST(n_docs * 1000000 // n_src AS BIGINT) AS share_ppm
    FROM per JOIN tot ON per.source = tot.source
    ORDER BY per.source, split
"""


# ---------------------------------------------------------------------------
# 4. kNN graph reciprocity
# ---------------------------------------------------------------------------
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the kNN co-activity graph: the share of directed
    edges whose reverse edge also survived the top-10 truncation.
    High reciprocity = mutual cores (communities); low = asymmetric
    hub attachment (celebrities, bots). One number + the edge counts
    behind it.

    Scale shape: the shared capped kNN builder, then ONE self
    equi-join on the reversed key pair and a 1-row aggregate; no
    windows beyond the builder's own partitioned ones. The builder
    feeds both join sides, so it is materialized ONCE via an eager
    localCheckpoint (round-8 ADVICE; see graph_degree_assortativity's
    note — degree-bounded edge list, clearCache-immune).
    """
    from kuibadb_spark.operators.curation7 import _knn_graph

    sym = _knn_graph(spark, sf_dir).localCheckpoint(eager=True)
    rev = sym.selectExpr("dst AS src", "src AS dst", "1 AS has_rev")
    return (
        sym.join(rev, ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.count("has_rev").alias("n_reciprocal"),
        )
        .selectExpr(
            "n_edges",
            "n_reciprocal",
            "n_reciprocal * 1000000 DIV n_edges AS reciprocity_ppm",
        )
    )


QUERIES["graph_reciprocity"] = graph_reciprocity


def _recip_oracle() -> str:
    from kuibadb_spark.operators.curation7 import _KNN_GRAPH_DUCK

    return f"""
    WITH {_KNN_GRAPH_DUCK}
    SELECT COUNT(*) AS n_edges,
           CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reciprocal,
           CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS reciprocity_ppm
    FROM sym e
    LEFT JOIN sym r ON r.src = e.dst AND r.dst = e.src
"""


ORACLES["graph_reciprocity"] = _recip_oracle()


# ---------------------------------------------------------------------------
# 5. declared-vs-detected language mismatch
# ---------------------------------------------------------------------------
_STOP = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
    "zh": ("的", "了", "是", "在", "和"),
}


def text_lang_mismatch_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-language QA: stopword-vote language detection (the
    classic cheap lang-id: count occurrences of each language's
    top stopwords, argmax with a fixed language order on ties /
    'und' when no list scores) against the corpus's DECLARED lang
    column, rolled up per source × declared lang with the mismatch
    rate. The audit that catches mislabeled crawls before they skew a
    language-balanced mixture. (On the synthetic fixture the text is
    English-ish for every declared lang, so non-en rows read as
    mismatches — exactly what the screen is for.)

    Scale shape: row-local token filters (5 fixed IN-lists, one pass
    each over the token array), one groupBy(source, lang). Votes and
    verdicts are exact integers.
    """
    d = load(spark, sf_dir, "documents").selectExpr(
        "source", "lang", "split(text, ' ') AS w"
    )
    votes = d.selectExpr(
        "source",
        "lang",
        *[
            f"size(filter(w, t -> t IN {tuple(toks)!r})) AS v_{lg}".replace(
                "'", "'"
            )
            for lg, toks in _STOP.items()
        ],
    )
    guess = (
        "CASE WHEN v_en = 0 AND v_de = 0 AND v_fr = 0 AND v_es = 0"
        " AND v_zh = 0 THEN 'und'"
        " WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es"
        " AND v_en >= v_zh THEN 'en'"
        " WHEN v_de >= v_fr AND v_de >= v_es AND v_de >= v_zh THEN 'de'"
        " WHEN v_fr >= v_es AND v_fr >= v_zh THEN 'fr'"
        " WHEN v_es >= v_zh THEN 'es' ELSE 'zh' END"
    )
    return (
        votes.selectExpr(
            "source",
            "lang",
            f"CAST({guess} != lang AS INT) AS mismatch",
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("mismatch").alias("n_mismatch"),
        )
        .selectExpr(
            "source",
            "lang",
            "n_docs",
            "n_mismatch",
            "n_mismatch * 1000000 DIV n_docs AS mismatch_ppm",
        )
        .orderBy("source", "lang")
    )


QUERIES["text_lang_mismatch_screen"] = text_lang_mismatch_screen


def _lang_oracle() -> str:
    votes = ",\n               ".join(
        "len(list_filter(w, t -> t IN ({}))) AS v_{}".format(
            ", ".join(f"'{t}'" for t in toks), lg
        )
        for lg, toks in _STOP.items()
    )
    guess = (
        "CASE WHEN v_en = 0 AND v_de = 0 AND v_fr = 0 AND v_es = 0"
        " AND v_zh = 0 THEN 'und'"
        " WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es"
        " AND v_en >= v_zh THEN 'en'"
        " WHEN v_de >= v_fr AND v_de >= v_es AND v_de >= v_zh THEN 'de'"
        " WHEN v_fr >= v_es AND v_fr >= v_zh THEN 'fr'"
        " WHEN v_es >= v_zh THEN 'es' ELSE 'zh' END"
    )
    return f"""
    WITH d AS (
        SELECT source, lang, string_split(text, ' ') AS w FROM documents
    ),
    votes AS (
        SELECT source, lang,
               {votes}
        FROM d
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN {guess} != lang THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mismatch,
           CAST(SUM(CASE WHEN {guess} != lang THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS mismatch_ppm
    FROM votes
    GROUP BY source, lang
    ORDER BY source, lang
"""


ORACLES["text_lang_mismatch_screen"] = _lang_oracle()
