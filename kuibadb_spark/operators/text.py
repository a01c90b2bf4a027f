"""Text-analysis operators over `documents` — the training-data-pipeline
surface (BASELINE.json north star): language-ID heuristic, quality
scoring, token statistics, and document fingerprinting.

All computation is JVM-side expressions (split/regexp/aggregate/
higher-order fns) — no Python in the row path. Ratios are single
divisions of integer counts (no float-summation order issues), rounded
for stable cross-engine hashing.

Scale notes: everything here is embarrassingly parallel per-document
(narrow transforms after the scan — no shuffle except the final
aggregations, which are standard partial-agg groupBys). Literal stopword
tables ship with the plan (broadcast by value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kuibadb_spark.catalog import load

# Per-language "stopword" tables for the n-gram/stopword lang-ID heuristic.
# With the synthetic fixture vocabulary these are arbitrary but fixed; for
# real corpora, swap in real stopword lists — the operator shape is the
# contract (literal lookup tables + argmax over per-language scores).
_STOP = {
    "de": ("data", "row", "group", "window"),
    "en": ("the", "a", "fast", "order", "table"),
    "es": ("slow", "agg", "value", "line"),
    "fr": ("scan", "batch", "merge", "stream"),
    "zh": ("join", "small", "customer", "key"),
}
_LANGS = sorted(_STOP)


def _score_exprs_spark() -> list[str]:
    out = []
    for lang in _LANGS:
        lits = ", ".join(f"'{w}'" for w in _STOP[lang])
        out.append(
            f"size(filter(toks, t -> t IN ({lits}))) / CAST(size(toks) AS DOUBLE)"
            f" AS s_{lang}"
        )
    return out


def _score_exprs_duck() -> list[str]:
    out = []
    for lang in _LANGS:
        lits = ", ".join(f"'{w}'" for w in _STOP[lang])
        out.append(
            f"len(list_filter(toks, t -> t IN ({lits})))"
            f" / CAST(len(toks) AS DOUBLE) AS s_{lang}"
        )
    return out


def _argmax_sql() -> str:
    m = "greatest(" + ", ".join(f"s_{l}" for l in _LANGS) + ")"
    branches = " ".join(f"WHEN s_{l} = {m} THEN '{l}'" for l in _LANGS)
    return f"CASE {branches} END"


# ---------------------------------------------------------------------------
# 1. language ID: per-language stopword-hit scores → argmax
# ---------------------------------------------------------------------------
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.selectExpr("doc_id", "lang", r"split(text, '\\s+') AS toks")
    scored = toks.selectExpr("doc_id", "lang", *_score_exprs_spark())
    pred = scored.selectExpr(
        "doc_id", "lang", f"{_argmax_sql()} AS predicted_lang"
    )
    return (
        pred.groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


# ---------------------------------------------------------------------------
# 2. quality scoring: length / token / stopword / uniqueness signals
# ---------------------------------------------------------------------------
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    q = d.selectExpr(
        "doc_id",
        "lang",
        "n_chars",
        r"split(text, '\\s+') AS toks",
        "length(text) AS text_len",
    ).selectExpr(
        "doc_id",
        "lang",
        "n_chars",
        "text_len",
        "size(toks) AS n_toks",
        "size(array_distinct(toks)) AS n_uniq",
        "size(filter(toks, t -> t IN ('the', 'a'))) AS n_stop",
        "aggregate(toks, 0, (acc, t) -> acc + length(t)) AS tok_chars",
    )
    return (
        q.selectExpr(
            "doc_id",
            "lang",
            "n_toks",
            "round(n_uniq / CAST(n_toks AS DOUBLE), 6) AS uniq_ratio",
            "round(n_stop / CAST(n_toks AS DOUBLE), 6) AS stop_ratio",
            "round(tok_chars / CAST(n_toks AS DOUBLE), 6) AS avg_tok_len",
            "CASE WHEN n_toks >= 20 AND n_uniq / CAST(n_toks AS DOUBLE) > 0.3"
            " THEN true ELSE false END AS keep",
        )
        .filter(F.col("doc_id") < 200)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# 3. token statistics per source (whitespace + regex word tokens + hapax)
# ---------------------------------------------------------------------------
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_doc = d.selectExpr(
        "doc_id",
        "source",
        r"size(split(text, '\\s+')) AS ws_toks",
        r"size(regexp_extract_all(text, '[a-z]+', 0)) AS re_toks",
        # GPT-2-style BPE pre-tokenizer shape: a leading space binds to the
        # following word/number run; other rune runs stand alone
        r"size(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+', 0))"
        " AS bpe_toks",
        "length(text) AS chars",
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_toks").alias("total_ws_toks"),
            F.sum("re_toks").alias("total_re_toks"),
            F.sum("bpe_toks").alias("total_bpe_toks"),
            F.sum("chars").alias("total_chars"),
            F.expr("(sum(ws_toks) * 1000) div count(1)").alias("toks_per_doc_e3"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# 4. fingerprinting: token-multiset-invariant id (catches reorderings)
# ---------------------------------------------------------------------------
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    # synthesize reordered copies: token-reversed text, same multiset
    rev = d.filter(F.col("doc_id") % 5 == 0).selectExpr(
        "doc_id + 1000000 AS doc_id",
        r"array_join(reverse(split(text, '\\s+')), ' ') AS text",
    )
    corpus = d.unionAll(rev)
    fp = corpus.selectExpr(
        "doc_id",
        # OpenRefine-style fingerprint: sorted distinct lowered tokens
        r"md5(array_join(array_sort(array_distinct(split(lower(text), '\\s+'))),"
        r" ' ')) AS fingerprint",
        # position-sensitive content hash (reorderings differ here)
        "md5(text) AS exact_hash",
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("exact_hash").alias("n_distinct_texts"),
            F.min("doc_id").alias("kept_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("kept_doc_id")
    )


# ---------------------------------------------------------------------------
# 5. TF-IDF: corpus-wide document frequencies → top-3 terms per doc
# ---------------------------------------------------------------------------
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic TF-IDF with smoothed idf = ln((N+1)/(df+1)). Ranking orders
    by the ROUNDED score (ties then broken by token) so the top-3 choice
    can't flip on a last-ulp ln() difference between engines.

    Scale: tf is one partial-aggregated shuffle on (doc_id, tok); df is a
    re-aggregation of tf (already small); N is a single-row broadcast. The
    top-k window partitions by doc_id — same shuffle key as tf, and the
    doc filter prunes before the window."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", F.explode(F.split("text", r"\s+")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.filter(F.col("doc_id") % 100 == 0)
        .join(df, "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tfidf")
        .orderBy("doc_id", "rnk")
    )


# ---------------------------------------------------------------------------
# 6. percentile length-band curation: keep docs inside the P05–P95 token-
#    count band (the standard outlier trim before training)
# ---------------------------------------------------------------------------
def text_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", r"size(split(text, '\\s+')) AS n_toks"
    )
    band = d.agg(
        F.expr("percentile(n_toks, 0.05)").alias("p05"),
        F.expr("percentile(n_toks, 0.95)").alias("p95"),
    )
    return (
        d.crossJoin(F.broadcast(band))
        .withColumn(
            "kept", (F.col("n_toks") >= F.col("p05")) & (F.col("n_toks") <= F.col("p95"))
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("n_dropped"),
        )
        .orderBy("lang")
    )


QUERIES = {
    "text_lang_id": text_lang_id,
    "text_quality": text_quality,
    "text_token_stats": text_token_stats,
    "text_fingerprint": text_fingerprint,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_length_band_filter": text_length_band_filter,
}

_SCORES_DUCK = ", ".join(_score_exprs_duck())

ORACLES = {
    "text_lang_id": f"""
        WITH toks AS (
            SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks
            FROM documents
        ), scored AS (
            SELECT doc_id, lang, {_SCORES_DUCK} FROM toks
        ), pred AS (
            SELECT doc_id, lang, {_argmax_sql()} AS predicted_lang FROM scored
        )
        SELECT lang, predicted_lang, count(*) AS n_docs
        FROM pred
        GROUP BY lang, predicted_lang
        ORDER BY lang, predicted_lang
    """,
    "text_quality": """
        WITH t AS (
            SELECT doc_id, lang, n_chars,
                   string_split_regex(text, '\\s+') AS toks
            FROM documents
        ), q AS (
            SELECT doc_id, lang,
                   len(toks) AS n_toks,
                   len(list_distinct(toks)) AS n_uniq,
                   len(list_filter(toks, t -> t IN ('the', 'a'))) AS n_stop,
                   list_sum(list_transform(toks, t -> length(t))) AS tok_chars
            FROM t
        )
        SELECT doc_id, lang,
               CAST(n_toks AS INTEGER) AS n_toks,
               round(n_uniq / CAST(n_toks AS DOUBLE), 6) AS uniq_ratio,
               round(n_stop / CAST(n_toks AS DOUBLE), 6) AS stop_ratio,
               round(tok_chars / CAST(n_toks AS DOUBLE), 6) AS avg_tok_len,
               (n_toks >= 20 AND n_uniq / CAST(n_toks AS DOUBLE) > 0.3) AS keep
        FROM q
        WHERE doc_id < 200
        ORDER BY doc_id
    """,
    "text_token_stats": """
        WITH per_doc AS (
            SELECT doc_id, source,
                   len(string_split_regex(text, '\\s+')) AS ws_toks,
                   len(regexp_extract_all(text, '[a-z]+')) AS re_toks,
                   len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+'))
                       AS bpe_toks,
                   length(text) AS chars
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(ws_toks) AS BIGINT) AS total_ws_toks,
               CAST(sum(re_toks) AS BIGINT) AS total_re_toks,
               CAST(sum(bpe_toks) AS BIGINT) AS total_bpe_toks,
               CAST(sum(chars) AS BIGINT) AS total_chars,
               CAST((sum(ws_toks) * 1000) // count(*) AS BIGINT) AS toks_per_doc_e3
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
    "text_tfidf_top_terms": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents
        ),
        tf AS (
            SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
        ),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
            SELECT doc_id, tok,
                   round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
            FROM tf JOIN df USING (tok) CROSS JOIN n
            WHERE doc_id % 100 = 0
        ),
        ranked AS (
            SELECT doc_id, tok, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, tok) AS rnk
            FROM scored
        )
        SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, tok, tfidf
        FROM ranked WHERE rnk <= 3
        ORDER BY doc_id, rnk
    """,
    "text_length_band_filter": """
        WITH d AS (
            SELECT doc_id, lang,
                   len(string_split_regex(text, '\\s+')) AS n_toks
            FROM documents
        ),
        band AS (
            SELECT quantile_cont(n_toks, 0.05) AS p05,
                   quantile_cont(n_toks, 0.95) AS p95
            FROM d
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN n_toks >= p05 AND n_toks <= p95
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN n_toks >= p05 AND n_toks <= p95
                        THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        FROM d CROSS JOIN band
        GROUP BY lang
        ORDER BY lang
    """,
    "text_fingerprint": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000,
                   array_to_string(list_reverse(string_split_regex(text, '\\s+')), ' ')
            FROM documents WHERE doc_id % 5 = 0
        ), fp AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       string_split_regex(lower(text), '\\s+'))), ' ')) AS fingerprint,
                   md5(text) AS exact_hash
            FROM corpus
        )
        SELECT fingerprint, count(*) AS n_docs,
               count(DISTINCT exact_hash) AS n_distinct_texts,
               min(doc_id) AS kept_doc_id
        FROM fp
        GROUP BY fingerprint
        HAVING count(*) > 1
        ORDER BY kept_doc_id
    """,
}


# ---------------------------------------------------------------------------
# full-text search: inverted postings + conjunctive query, integer tf-idf
# ---------------------------------------------------------------------------
_FTS_TERMS = ("hash", "join", "stream")


def text_search_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean full-text search: docs containing ALL query terms, ranked
    by tf·idf. The postings list (doc_id, term, tf) IS the inverted
    index — built by one explode+groupBy; the conjunctive query is a
    HAVING count(term)=|q| over postings restricted to query terms.

    idf is the EXACT integer (1e6·N) div df — cross-engine-stable where
    ln(N/df) is not, and rank-order-equivalent for a fixed N (both are
    monotone decreasing in df).

    Scale: the term filter hits the scan (predicate on the exploded
    token), so postings are built only for query terms — the shuffle is
    |q| terms × matching docs, not the corpus vocabulary. df and N are
    K-row broadcasts. At 100 TB one would persist the full postings
    table partitioned by term and skip straight to the join; the query
    side of the plan is identical."""
    docs = load(spark, sf_dir, "documents")
    terms = ", ".join(f"'{t}'" for t in _FTS_TERMS)
    postings = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .filter(F.expr(f"term IN ({terms})"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # df computed INLINE with a count() window over term: a separate
    # df_t = postings.groupBy(term) subtree is NOT exchange-reusable
    # (column pruning specializes each consumer's scan), so the whole
    # scan+explode pipeline ran once per consumer — 6 scans in the final
    # plan, measured 0.62s -> 0.48s at sf0.1. The window shares the
    # postings exchange; the corpus is scanned exactly once.
    wt = Window.partitionBy("term")
    return (
        postings.withColumn("df", F.count(F.lit(1)).over(wt))
        .crossJoin(F.broadcast(n))
        .withColumn("w", F.expr("tf * ((1000000 * n_docs) div df)"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("w").alias("score"))
        .filter(F.col("n_terms") == len(_FTS_TERMS))
        .select("doc_id", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


QUERIES["text_search_conjunctive"] = text_search_conjunctive
ORACLES["text_search_conjunctive"] = f"""
    WITH postings AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS term
            FROM documents
        )
        WHERE term IN ({", ".join(f"'{t}'" for t in _FTS_TERMS)})
        GROUP BY doc_id, term
    ),
    df_t AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT doc_id,
           CAST(sum(tf * ((1000000 * n_docs) // df)) AS BIGINT) AS score
    FROM postings JOIN df_t USING (term) CROSS JOIN n
    GROUP BY doc_id
    HAVING count(*) = {len(_FTS_TERMS)}
    ORDER BY score DESC, doc_id
    LIMIT 20
"""


# ---------------------------------------------------------------------------
# repetition quality rule: duplicate word-trigram ratio per document
# ---------------------------------------------------------------------------
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-repetitive documents by duplicate word-trigram ratio — the
    Gopher-style repetition rule used to cull boilerplate/spam from
    training corpora. Entirely per-row array math (sequence →
    transform → array_distinct): zero shuffles before the final top-k,
    and the trigram arrays never materialize outside the row —
    at 100 TB this runs at scan speed."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            "doc_id",
            r"split(lower(text), '\\s+') AS toks",
        )
        .filter(F.expr("size(toks) >= 3"))
        .selectExpr(
            "doc_id",
            "transform(sequence(0, size(toks) - 3),"
            " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS tg",
        )
        .selectExpr(
            "doc_id",
            "size(tg) AS n_tg",
            "size(tg) - size(array_distinct(tg)) AS n_dup",
        )
        .selectExpr(
            "doc_id", "n_tg", "n_dup",
            "(bigint(n_dup) * 1000000) div n_tg AS rep_e6",
        )
        .orderBy(F.desc("rep_e6"), "doc_id")
        .limit(20)
    )


QUERIES["text_repetition"] = text_repetition
ORACLES["text_repetition"] = r"""
    WITH tg AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tg
        FROM (
            SELECT doc_id,
                   string_split_regex(lower(text), '\s+') AS toks
            FROM documents
        )
        WHERE len(toks) >= 3
    )
    SELECT doc_id,
           CAST(len(tg) AS INTEGER) AS n_tg,
           CAST(len(tg) - len(list_distinct(tg)) AS INTEGER) AS n_dup,
           CAST((CAST(len(tg) - len(list_distinct(tg)) AS BIGINT) * 1000000)
                // len(tg) AS BIGINT) AS rep_e6
    FROM tg
    ORDER BY rep_e6 DESC, doc_id
    LIMIT 20
"""


# ---------------------------------------------------------------------------
# BPE merge candidates: most frequent adjacent token pairs
# ---------------------------------------------------------------------------
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE vocabulary induction: count adjacent token
    pairs across the corpus and rank merge candidates. Pure row-local
    array math (zip tokens with their own tail) before one
    partial-agged groupBy — at 100 TB the pair explosion is linear in
    corpus tokens, the same cost as reading the text."""
    docs = load(spark, sf_dir, "documents")
    pairs = docs.selectExpr(
        r"split(lower(text), '\\s+') AS toks"
    ).selectExpr(
        "explode(zip_with(slice(toks, 1, size(toks) - 1),"
        " slice(toks, 2, size(toks) - 1),"
        " (a, b) -> concat(a, ' ', b))) AS pair"
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


QUERIES["text_bpe_merge_candidates"] = text_bpe_merge_candidates
ORACLES["text_bpe_merge_candidates"] = r"""
    WITH toks AS (
        SELECT string_split_regex(lower(text), '\s+') AS toks FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 0)),
                   i -> toks[i] || ' ' || toks[i+1])) AS pair
        FROM toks
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
"""


# --------------------------------------------------------------------------
# token co-occurrence PMI (integer-log, window of 2)
# --------------------------------------------------------------------------
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence statistics — the counting pass behind
    word2vec/GloVe/collocation extraction: adjacent (window=1) ordered
    token pairs counted corpus-wide, scored by an integer PMI proxy
    ilog2(c_ab · N) − ilog2(c_a · c_b) with ilog2 = bit-length − 1 (the
    same branch-free integer log2 as text_dsir_importance — exact in
    both engines where float log drifts). Top-50 pairs by (score, pair).

    Shape: one row-local bigram explode, three partial-agg groupBys
    (pair, left unigram, right unigram); unigram count tables are
    vocabulary-bounded → broadcast joins; TakeOrdered top-k. The pair
    count table is the only corpus-proportional shuffle."""
    d = load(spark, sf_dir, "documents")
    arr = d.withColumn("w", F.split("text", r"\s+")).select(
        F.expr(
            "CASE WHEN size(w) < 2 THEN array() "
            "ELSE transform(sequence(1, size(w) - 1), "
            "i -> struct(element_at(w, i) AS ta, element_at(w, i+1) AS tb))"
            " END"
        ).alias("ps")
    ).repartition(d.sparkSession.sparkContext.defaultParallelism)
    pairs = (
        arr.select(F.explode_outer("ps").alias("p"))
        .filter(F.col("p").isNotNull())
        .select("p.ta", "p.tb")
    )
    c_ab = pairs.groupBy("ta", "tb").agg(F.count(F.lit(1)).alias("n_ab"))
    c_a = pairs.groupBy("ta").agg(F.count(F.lit(1)).alias("n_a"))
    c_b = pairs.groupBy("tb").agg(F.count(F.lit(1)).alias("n_b"))
    n = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    ilog2 = "length(bin({})) - 1"
    return (
        c_ab.join(F.broadcast(c_a), "ta")
        .join(F.broadcast(c_b), "tb")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "ta",
            "tb",
            "n_ab",
            f"({ilog2.format('n_ab * n_total')})"
            f" - ({ilog2.format('n_a * n_b')}) AS pmi_i",
        )
        .orderBy(F.desc("pmi_i"), "ta", "tb")
        .limit(50)
    )


QUERIES["text_cooccurrence_pmi"] = text_cooccurrence_pmi

ORACLES["text_cooccurrence_pmi"] = r"""
    WITH pairs AS (
        SELECT w[i] AS ta, w[i + 1] AS tb
        FROM (
            SELECT string_split_regex(text, '\s+') AS w FROM documents
        ), LATERAL (
            SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
        )
    ),
    c_ab AS (SELECT ta, tb, count(*) AS n_ab FROM pairs GROUP BY ta, tb),
    c_a AS (SELECT ta, count(*) AS n_a FROM pairs GROUP BY ta),
    c_b AS (SELECT tb, count(*) AS n_b FROM pairs GROUP BY tb),
    n AS (SELECT count(*) AS n_total FROM pairs)
    SELECT ta, tb, n_ab,
           CAST((length(printf('%b', n_ab * n_total)) - 1)
              - (length(printf('%b', n_a * n_b)) - 1) AS INTEGER) AS pmi_i
    FROM c_ab
    JOIN c_a USING (ta)
    JOIN c_b USING (tb)
    CROSS JOIN n
    ORDER BY pmi_i DESC, ta, tb
    LIMIT 50
"""


# --------------------------------------------------------------------------
# normalization pipeline: the tokenizer-prep cleaning map
# --------------------------------------------------------------------------
def text_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-tokenization cleaning map every corpus goes through:
    lowercase → collapse whitespace → drop stopword tokens → emit the
    cleaned text plus before/after token counts. Entirely row-local
    regexp/array expressions (the pure map-stage shape — at 100 TB this
    is read→transform→write with zero shuffle); the identical regex
    dialect runs in DuckDB, so the cleaned strings hash-match exactly."""
    stop = "('the','a','of','and','to','in','is','it','for','on')"
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("lc", F.expr(r"regexp_replace(lower(text), '\\s+', ' ')"))
        .withColumn("toks", F.expr("split(lc, ' ')"))
        .withColumn("kept", F.expr(f"filter(toks, t -> t NOT IN {stop})"))
        .selectExpr(
            "doc_id",
            "size(toks) AS n_tokens_raw",
            "size(kept) AS n_tokens_clean",
            "size(toks) - size(kept) AS n_stopwords",
            "array_join(kept, ' ') AS clean_text",
        )
        .filter(F.col("doc_id") < 200)
        .orderBy("doc_id")
    )


QUERIES["text_normalize_pipeline"] = text_normalize_pipeline

ORACLES["text_normalize_pipeline"] = r"""
    WITH cleaned AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')
                   AS toks
        FROM documents
    ),
    kept AS (
        SELECT doc_id, toks,
               list_filter(toks, t -> t NOT IN
                   ('the','a','of','and','to','in','is','it','for','on'))
                   AS kt
        FROM cleaned
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens_raw,
           CAST(len(kt) AS INTEGER) AS n_tokens_clean,
           CAST(len(toks) - len(kt) AS INTEGER) AS n_stopwords,
           array_to_string(kt, ' ') AS clean_text
    FROM kept
    WHERE doc_id < 200
    ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Zipf rank-frequency analysis
# --------------------------------------------------------------------------
def text_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rank-frequency table (the Zipf diagnostic run on every new
    corpus): token counts ranked by (count DESC, token), with the
    rank×count product — near-constant under Zipf's law — as an exact
    integer. One explode + one partial-aggregated groupBy; the rank is
    a TakeOrdered-style top-30, not a global window."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(30)
    )
    w = Window.orderBy(F.desc("n"), "tok")
    return counts.withColumn("rank", F.row_number().over(w)).selectExpr(
        "rank", "tok", "n", "rank * n AS zipf_product"
    )


QUERIES["text_zipf_rank_frequency"] = text_zipf_rank_frequency

ORACLES["text_zipf_rank_frequency"] = r"""
    SELECT rank, tok, n, rank * n AS zipf_product
    FROM (
        SELECT tok, n, CAST(row_number() OVER (ORDER BY n DESC, tok) AS INTEGER) AS rank
        FROM (
            SELECT tok, count(*) AS n
            FROM (
                SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents
            )
            GROUP BY tok
        )
    )
    WHERE rank <= 30
    ORDER BY rank
"""


# --------------------------------------------------------------------------
# feature hashing (the hashing trick): docs → fixed-width int vectors
# --------------------------------------------------------------------------
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick featurizer (Weinberger et al. 2009): each
    document projected into a FIXED 16-bucket integer count vector by
    hashing tokens — no vocabulary to build, no dictionary to ship, the
    width never grows with the corpus; the reason it's THE map-side
    featurizer at 100 TB. Row-local: tokens hash to buckets inside an
    aggregate lambda building the histogram array in one pass; the
    emitted vector is integer-exact and array-ordered."""
    d = load(spark, sf_dir, "documents")
    b = 16
    return (
        d.withColumn("toks", F.split(F.lower("text"), r"\s+"))
        .selectExpr(
            "doc_id",
            "size(toks) AS n_tokens",
            "aggregate(toks,"
            f" array_repeat(0L, {b}),"
            " (acc, t) -> transform(acc, (v, i) ->"
            "   v + CASE WHEN CAST(conv(substring(md5(t), 1, 8), 16, 10)"
            f"        AS BIGINT) % {b} = i THEN 1L ELSE 0L END))"
            " AS fvec_arr",
        )
        # CSV at the boundary — driver comparator can't hash array cells
        .selectExpr("doc_id", "n_tokens", "array_join(fvec_arr, ',') AS fvec")
        .filter(F.col("doc_id") < 100)
        .orderBy("doc_id")
    )


QUERIES["text_feature_hashing"] = text_feature_hashing

ORACLES["text_feature_hashing"] = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        FROM documents
        WHERE doc_id < 100
    ),
    hashed AS (
        SELECT doc_id, len(toks) AS n_tokens,
               list_transform(toks, t ->
                   CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 16) AS hs
        FROM toks
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           array_to_string(list_transform(generate_series(0, 15), i ->
               CAST(len(list_filter(hs, h -> h = i)) AS BIGINT)), ',') AS fvec
    FROM hashed
    ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# line-level (chunk) dedup: strip text repeated ACROSS documents
# --------------------------------------------------------------------------
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal, the CCNet/RefinedWeb
    line-level dedup pass: text repeated verbatim in ≥2 documents
    (headers, footers, license blurbs) is stripped from every document.
    The fixture's documents are flat token streams with no newlines, so
    a "line" is a 10-token chunk — the operator shape (chunk → corpus
    count → mark → per-doc reassembly stats) is the contract.

    Scale shape: chunking is row-local (sequence+slice, one explode);
    the corpus count is ONE partial-aggregated shuffle on the chunk key,
    and the mark-join reuses that same exchange (equi-join on the
    groupBy key — no broadcast needed, so adversarially large boilerplate
    sets don't OOM a broadcast). Per-doc stats are a second narrow
    groupBy on doc_id. At 100 TB chunks would carry a hash, not the
    text, across the wire — here the chunk doubles as its own key so
    the oracle stays engine-independent."""
    d = load(spark, sf_dir, "documents")
    chunks = d.selectExpr("doc_id", "split(text, ' ') AS w").selectExpr(
        "doc_id",
        "posexplode(transform(sequence(0, CAST(ceil(size(w)/10.0) AS INT) - 1),"
        " i -> array_join(slice(w, i*10+1, 10), ' '))) AS (idx, chunk)",
    )
    counts = chunks.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return (
        chunks.join(counts, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunks"),
            F.count_if(F.col("n_docs") >= 2).cast("int").alias("n_boiler_chunks"),
            F.sum(
                F.when(F.col("n_docs") < 2, F.size(F.split("chunk", " ")))
                .otherwise(0)
            ).cast("bigint").alias("kept_tokens"),
        )
        .filter(F.col("n_boiler_chunks") > 0)
        .orderBy("doc_id")
    )


QUERIES["text_line_dedup"] = text_line_dedup

ORACLES["text_line_dedup"] = r"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (
        SELECT doc_id, i AS idx,
               array_to_string(w[i*10+1:i*10+10], ' ') AS chunk
        FROM t, unnest(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS u(i)
    ),
    counts AS (
        SELECT chunk, count(DISTINCT doc_id) AS n_docs FROM c GROUP BY chunk
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_chunks,
           CAST(count_if(n_docs >= 2) AS INTEGER) AS n_boiler_chunks,
           CAST(sum(CASE WHEN n_docs < 2
                         THEN len(string_split(c.chunk, ' ')) ELSE 0 END)
                AS BIGINT) AS kept_tokens
    FROM c JOIN counts USING (chunk)
    GROUP BY doc_id
    HAVING CAST(count_if(n_docs >= 2) AS INTEGER) > 0
    ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# BPE step 2: apply the top merge candidates to the corpus
# --------------------------------------------------------------------------
def text_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second step of BPE vocabulary induction: take the top-3 merge
    candidates from the global pair count (text_bpe_merge_candidates'
    ranking, deterministic tiebreak) and apply them to every document,
    reporting the per-doc token-count reduction. The merge table is a
    1-row broadcast (the induced vocabulary rides with the plan at any
    corpus size); application is a row-local fold of string replaces
    over the space-padded token stream — leftmost non-overlapping, the
    same replace() semantics in both engines.

    True BPE re-counts pairs after each merge (adaptive); this operator
    applies one ranked batch — the shape of one training round (the
    iterative driver loop is sim_kmeans_lloyd's pattern applied here)."""
    docs = load(spark, sf_dir, "documents")
    pairs = docs.selectExpr(r"split(lower(text), '\\s+') AS toks").selectExpr(
        "explode(zip_with(slice(toks, 1, size(toks) - 1),"
        " slice(toks, 2, size(toks) - 1),"
        " (a, b) -> concat(a, ' ', b))) AS pair"
    )
    top3 = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(3)
        # rank order survives the aggregate: sort (n asc, pair desc)
        # structs, then reverse → (n desc, pair asc), project the pair
        .agg(F.expr("array_sort(collect_list(struct(n, pair)))").alias("ms"))
        .selectExpr(
            "reverse(transform(ms, s -> s.pair)) AS merges"
        )
    )
    return (
        docs.crossJoin(F.broadcast(top3))
        .selectExpr(
            "doc_id",
            "size(split(lower(text), '\\\\s+')) AS n_tokens",
            "aggregate(merges,"
            " concat(' ', lower(text), ' '),"
            " (acc, m) -> replace(acc, concat(' ', m, ' '),"
            "                     concat(' ', replace(m, ' ', '_'), ' ')))"
            " AS merged",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "size(split(trim(merged), ' ')) AS n_after",
            "n_tokens - size(split(trim(merged), ' ')) AS n_merged",
        )
        .filter(F.col("n_merged") > 0)
        .orderBy("doc_id")
    )


QUERIES["text_bpe_apply_merges"] = text_bpe_apply_merges
ORACLES["text_bpe_apply_merges"] = r"""
    WITH toks AS (
        SELECT string_split_regex(lower(text), '\s+') AS toks FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 0)),
                   i -> toks[i] || ' ' || toks[i+1])) AS pair
        FROM toks
    ),
    top3 AS (
        SELECT pair, count(*) AS n FROM pairs GROUP BY pair
        ORDER BY n DESC, pair LIMIT 3
    ),
    mt AS (
        SELECT list_transform(
                   list_reverse(list_sort(list(struct_pack(n := n, pair := pair)))),
                   s -> s.pair) AS merges
        FROM top3
    ),
    applied AS (
        SELECT doc_id,
               CAST(len(string_split_regex(lower(text), '\s+')) AS INTEGER)
                   AS n_tokens,
               list_reduce(
                   list_prepend(' ' || lower(text) || ' ', merges),
                   (acc, m) -> replace(acc, ' ' || m || ' ',
                                       ' ' || replace(m, ' ', '_') || ' ')
               ) AS merged
        FROM documents, mt
    )
    SELECT doc_id, n_tokens,
           CAST(len(string_split(trim(merged), ' ')) AS INTEGER) AS n_after,
           CAST(n_tokens - len(string_split(trim(merged), ' ')) AS INTEGER)
               AS n_merged
    FROM applied
    WHERE n_tokens - len(string_split(trim(merged), ' ')) > 0
    ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# BPE step 3: ADAPTIVE training rounds (argmax merge, re-count, repeat)
# --------------------------------------------------------------------------
_BPE_ROUNDS = 3


def text_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True (adaptive) BPE training for 3 rounds: each round counts
    adjacent pairs on the CURRENT token stream, merges the argmax pair
    corpus-wide, and re-counts — unlike text_bpe_apply_merges, whose
    batch is ranked once. Output: (round, pair, n) — the induced merge
    table, the actual artifact a tokenizer trainer ships.

    Driver discipline: the per-round collect is ONE row (the argmax
    merge — same bounded pattern as sim_kmeans_lloyd's K centroids);
    the corpus never leaves the executors. Each round is one pair
    explode + partial-aggregated count; merge application is row-local
    string replace on the space-padded stream (leftmost non-overlapping
    in both engines — adjacent repeats of the merged pair share their
    separator space and only collapse on a later round, the documented
    padded-string caveat)."""
    cur = load(spark, sf_dir, "documents").selectExpr(
        "concat(' ', lower(text), ' ') AS s"
    )
    out_rows = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        top = (
            cur.selectExpr("split(trim(s), ' ') AS toks")
            .selectExpr(
                "explode(zip_with(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1),"
                " (a, b) -> concat(a, ' ', b))) AS pair"
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()[0]
        )
        out_rows.append((rnd, top["pair"], top["n"]))
        pair = top["pair"].replace("'", "''")
        cur = cur.selectExpr(
            f"replace(s, concat(' ', '{pair}', ' '),"
            f" concat(' ', replace('{pair}', ' ', '_'), ' ')) AS s"
        )
    return spark.createDataFrame(out_rows, "round INT, pair STRING, n BIGINT")


QUERIES["text_bpe_train_rounds"] = text_bpe_train_rounds

_BPE_PAIRS_DUCK = """
    SELECT unnest(list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> toks[i] || ' ' || toks[i+1])) AS pair
    FROM (SELECT string_split(trim({src}), ' ') AS toks FROM {tbl})
"""

ORACLES["text_bpe_train_rounds"] = f"""
    WITH d0 AS (SELECT ' ' || lower(text) || ' ' AS s FROM documents),
    m1 AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM ({_BPE_PAIRS_DUCK.format(src='s', tbl='d0')})
        GROUP BY pair ORDER BY n DESC, pair LIMIT 1
    ),
    d1 AS (
        SELECT replace(s, ' ' || pair || ' ',
                       ' ' || replace(pair, ' ', '_') || ' ') AS s
        FROM d0, m1
    ),
    m2 AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM ({_BPE_PAIRS_DUCK.format(src='s', tbl='d1')})
        GROUP BY pair ORDER BY n DESC, pair LIMIT 1
    ),
    d2 AS (
        SELECT replace(s, ' ' || pair || ' ',
                       ' ' || replace(pair, ' ', '_') || ' ') AS s
        FROM d1, m2
    ),
    m3 AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM ({_BPE_PAIRS_DUCK.format(src='s', tbl='d2')})
        GROUP BY pair ORDER BY n DESC, pair LIMIT 1
    )
    SELECT CAST(1 AS INTEGER) AS round, pair, n FROM m1
    UNION ALL SELECT 2, pair, n FROM m2
    UNION ALL SELECT 3, pair, n FROM m3
    ORDER BY round
"""
