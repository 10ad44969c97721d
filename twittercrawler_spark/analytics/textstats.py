"""Text-analysis operators over the documents table: language ID, quality
scoring, token counting, document fingerprinting.

These are the training-data-pipeline text stages; the reference's analogs
are its ad-hoc text ops (keyword matching `pages/Visualization.py:17-37`,
text normalization `pages/Preprocess_scripts/PreprocessDump.py:84-89`,
per-user text aggregation `pages/Visualization.py:99-102`), generalized to
corpus-quality primitives.

Everything is built-in expressions (JVM-side, whole-stage codegen) — no
Python in the hot path. All derived floats are round(…, 6) on identical
integer inputs → exact cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import SHINGLES_SQL, base_hash32, t, t_split, word_shingles

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, sql: str | None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


# ---------------------------------------------------------------------------
# Language ID: stopword-evidence voting (n-gram heuristic family). A token
# match against a per-language stopword list is one vote; argmax with
# deterministic tie-break; no evidence → 'und'.
_STOPWORDS = [
    ("en", "the"),
    ("en", "a"),
    ("en", "of"),
    ("en", "and"),
    ("es", "el"),
    ("es", "la"),
    ("es", "de"),
    ("de", "der"),
    ("de", "die"),
    ("de", "und"),
]
_SW_ROWS = ", ".join(f"('{lang}', '{w}')" for lang, w in _STOPWORDS)


@q(
    "lang_id_heuristic",
    f"""
    WITH sw(slang, w) AS (VALUES {_SW_ROWS}),
    tok AS (
      SELECT DISTINCT doc_id, tk FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tk
        FROM documents) u
      WHERE tk <> ''),
    votes AS (
      SELECT doc_id, slang, CAST(count(*) AS BIGINT) AS n
      FROM tok JOIN sw ON tk = w GROUP BY 1, 2),
    best AS (
      SELECT doc_id, slang,
             row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, slang) AS rk
      FROM votes)
    SELECT d.doc_id, coalesce(b.slang, 'und') AS lang_pred
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rk = 1
    """,
)
def lang_id_heuristic(spark: SparkSession, sf: str) -> DataFrame:
    # Map-only: the vote for language L is |distinct doc tokens ∩ L's
    # stopword list| (array_intersect dedups both sides), so the whole
    # argmax evaluates per row inside codegen — no token-stream explode, no
    # shuffle at all. At corpus scale the alternative (explode + distinct +
    # join) pushes every distinct (doc, token) pair through an exchange just
    # to throw away all non-stopword tokens; this plan reads (doc_id, text)
    # and writes one row per doc, full stop. Tie-break parity with the
    # oracle's (n DESC, slang ASC): langs are sorted, so max over
    # struct(n, -idx) picks the largest vote then the alphabetically
    # smallest language; n = 0 for every language → 'und'.
    d = t_split(spark, sf, "documents")
    langs = sorted({lang for lang, _ in _STOPWORDS})
    toks = F.split(F.lower("text"), r"\s+")
    cand = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        toks,
                        F.array(
                            *[F.lit(w) for lang, w in _STOPWORDS if lang == sl]
                        ),
                    )
                ).alias("n"),
                F.lit(-i).alias("negidx"),
            )
            for i, sl in enumerate(langs)
        ]
    )
    best = F.array_max(cand)
    lang_arr = F.array(*[F.lit(sl) for sl in langs])
    return d.select(
        "doc_id",
        F.when(
            best["n"] > 0, F.element_at(lang_arr, -best["negidx"] + F.lit(1))
        )
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: token counts, type/token ratio, mean token length,
# stopword ratio, composite score — all integer-derived then rounded.
_EN_STOP_ARR = "['the', 'a', 'of', 'and']"


@q(
    "quality_score",
    f"""
    WITH tok AS (
      SELECT doc_id, tk FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tk
        FROM documents) u
      WHERE tk <> ''),
    s AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT tk) AS BIGINT) AS n_types,
             CAST(sum(length(tk)) AS BIGINT) AS chars_in_tokens,
             CAST(sum(CASE WHEN list_contains({_EN_STOP_ARR}, tk)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
      FROM tok GROUP BY 1)
    SELECT doc_id, n_tokens, n_types,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(chars_in_tokens AS DOUBLE) / n_tokens, 6) AS avg_token_len,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           round(0.5 * (CAST(n_types AS DOUBLE) / n_tokens) +
                 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens), 6) AS quality
    FROM s
    """,
)
def quality_score(spark: SparkSession, sf: str) -> DataFrame:
    d = t_split(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tk")
    ).filter(F.col("tk") != "")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and"]])
    s = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tk").alias("n_types"),
        F.sum(F.length("tk")).cast("bigint").alias("chars_in_tokens"),
        F.sum(F.when(F.array_contains(stop, F.col("tk")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stop"),
    )
    ttr = F.col("n_types").cast("double") / F.col("n_tokens")
    avl = F.col("chars_in_tokens").cast("double") / F.col("n_tokens")
    sr = F.col("n_stop").cast("double") / F.col("n_tokens")
    return s.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(ttr, 6).alias("ttr"),
        F.round(avl, 6).alias("avg_token_len"),
        F.round(sr, 6).alias("stop_ratio"),
        F.round(0.5 * ttr + 0.5 * sr, 6).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + BPE-ish regex tokens (letter runs,
# digit runs, single punctuation) — the pre-tokenizer shape real BPE uses.
_TOK_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


@q(
    "token_stats",
    f"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_TOK_RE}')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = t_split(spark, sf, "documents")
    ws = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_TOK_RE), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics: top-k word-3grams by document frequency
# (distinct per doc), with a total-order tie-break so top-k is engine- and
# partitioning-independent. orderBy+limit plans as TakeOrderedAndProject —
# map-side partial top-k, no single-partition window.
TOP_NGRAMS_K = 50


@q(
    "top_ngrams",
    f"""
    WITH sh AS ({SHINGLES_SQL}),
    cnt AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
    SELECT s, df FROM (
      SELECT s, df, row_number() OVER (ORDER BY df DESC, s) AS rk FROM cnt) x
    WHERE rk <= {TOP_NGRAMS_K}
    """,
)
def top_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    d = t_split(spark, sf, "documents")
    sh = d.select("doc_id", F.explode(word_shingles(F.col("text"))).alias("s"))
    cnt = sh.groupBy("s").agg(F.count("*").alias("df"))
    return cnt.orderBy(F.desc("df"), F.asc("s")).limit(TOP_NGRAMS_K)


# ---------------------------------------------------------------------------
# Per-language document-length distribution: exact rank-based percentiles
# (value at ceil(q·n), an explicit total order incl. doc_id tie-break) so
# both engines pick the identical element — engine quantile functions
# disagree on interpolation, rank-based selection cannot.
@q(
    "doc_length_percentiles",
    """
    WITH r AS (
      SELECT lang, n_chars, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS cnt
      FROM documents)
    SELECT lang, CAST(max(cnt) AS BIGINT) AS n,
           CAST(max(CASE WHEN rk = CAST(ceil(0.5 * cnt) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS p50_chars,
           CAST(max(CASE WHEN rk = CAST(ceil(0.9 * cnt) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS p90_chars
    FROM r GROUP BY lang
    """,
)
def doc_length_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("lang")
    r = d.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wc).alias("cnt"),
    )
    def _at(q: float) -> F.Column:
        return F.max(
            F.when(
                F.col("rk") == F.ceil(F.lit(q) * F.col("cnt")).cast("bigint"),
                F.col("n_chars"),
            )
        ).cast("bigint")

    return r.groupBy("lang").agg(
        F.max("cnt").cast("bigint").alias("n"),
        _at(0.5).alias("p50_chars"),
        _at(0.9).alias("p90_chars"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: whole-doc content hash of whitespace-normalized
# text + MinHash-style minimum shingle hash (the winnowing-family
# fingerprint; rolling-hash analog over word 3-grams).
@q(
    "doc_fingerprint",
    f"""
    WITH sh AS ({SHINGLES_SQL}),
    mn AS (
      SELECT doc_id,
             min(CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS fp_min
      FROM sh GROUP BY 1)
    SELECT d.doc_id,
           md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) AS fp_md5,
           mn.fp_min
    FROM documents d JOIN mn ON d.doc_id = mn.doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    # explode keeps the per-shingle md5 inside whole-stage codegen (an
    # array_min-over-transform variant measured 2× SLOWER — higher-order
    # functions interpret their lambda, including the md5). min() is
    # duplicate-insensitive, so the non-distinct gram array skips the
    # array_distinct pass while matching the oracle's DISTINCT formulation.
    d = t_split(spark, sf, "documents")
    mn = (
        d.select(
            "doc_id", F.explode(word_shingles(F.col("text"), distinct=False)).alias("s")
        )
        .groupBy("doc_id")
        .agg(F.min(base_hash32(F.col("s"))).alias("fp_min"))
    )
    return d.join(mn, "doc_id").select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp_md5"),
        "fp_min",
    )


# ---------------------------------------------------------------------------
# PII scrubbing: redact emails / IPv4s / phone-shaped numbers before a corpus
# ships to training. Patterns are written in the dialect subset shared by
# Java regex (Spark) and RE2 (DuckDB) — no backrefs, no lookaround — so both
# engines produce byte-identical redactions. Counts are taken on the
# ORIGINAL text per pattern; the clean text applies the chain sequentially
# (email → ip → phone).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b"


@q(
    "pii_scrub",
    f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone
    FROM documents
    """,
)
def pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Redact emails, IPv4 addresses and phone-shaped numbers.

    The reference stores raw tweet JSON verbatim (PreprocessDump.py writes
    user screen names and urls through unmodified); a training-data pipeline
    must scrub instead. Scale shape: pure per-row JVM regexp expressions
    inside whole-stage codegen — no shuffle, no Python; a 100 TB corpus
    scrubs at scan speed. Counts come from the pre-redaction text so the
    three totals are auditable independent of chain order.
    """
    d = t_split(spark, sf, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
            _PII_IP,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL)).cast("bigint").alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(_PII_IP)).cast("bigint").alias("n_ip"),
        F.regexp_count(F.col("text"), F.lit(_PII_PHONE)).cast("bigint").alias("n_phone"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per language: term frequency per (lang, term) joined with
# corpus document frequency, weighted tf·ln(1 + N/df), top-5 per language.
@q(
    "tfidf_top_terms",
    r"""
    WITH tok AS (
      SELECT doc_id, lang, tk FROM (
        SELECT doc_id, lang,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS tk
        FROM documents) WHERE tk <> ''),
    tf AS (SELECT lang, tk, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT tk, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
      SELECT lang, tf.tk AS term, tf.tf AS tf,
             round(tf.tf * ln(1.0 + CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.tk = df.tk CROSS JOIN nd)
    SELECT lang, term, tf, tfidf FROM (
      SELECT w.*, row_number() OVER (
        PARTITION BY lang ORDER BY tfidf DESC, term) AS rn FROM w)
    WHERE rn <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 TF-IDF terms per language.

    Scale shape: tf and df are both partial+final aggs over the token
    explode keyed by token — the df pass piggybacks the same shuffle key;
    the corpus size N is a 1-row broadcast; the final top-5 window runs
    over PRE-AGGREGATED (lang, term) rows (vocab-sized, not corpus-sized),
    partitioned by lang with a total order (rounded weight DESC, term) so
    ties are engine-independent. ln(1 + N/df) is computed on identical
    doubles in both engines; the weight is rounded to 6 before ordering so
    the rank itself is parity-stable.
    """
    d = t_split(spark, sf, "documents")
    tok = (
        d.select(
            "doc_id", "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tk")
        )
        .filter(F.col("tk") != "")
    )
    tf = tok.groupBy("lang", F.col("tk").alias("term")).agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df = tok.groupBy(F.col("tk").alias("d_term")).agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    nd = d.agg(F.count("*").alias("n_docs"))  # 1 row
    w = (
        tf.join(df, F.col("term") == F.col("d_term"))
        .join(F.broadcast(nd))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.lit(1.0) + F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("term"))
    )
    return (
        w.withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .select("lang", "term", "tf", "tfidf")
    )


# ---------------------------------------------------------------------------
# PMI collocations: adjacent-bigram pointwise mutual information, top-K.
# The association form of the n-gram layer (top_ngrams ranks raw frequency;
# PMI ranks how much MORE often a pair co-occurs than its parts predict —
# the phrase-mining signal a tokenizer/vocab pipeline uses).
#
# Scale shape: unigram and bigram counts are two partial+final aggregations
# keyed by token / pair; the two count joins are hash joins on the token
# key (vocab-sized build sides, corpus never re-shuffled); the corpus
# totals are a 1-row broadcast; top-K is TakeOrderedAndProject. The PMI is
# evaluated as a SUM OF LOGS (ln c_ab + 2 ln T − ln B − ln c_a − ln c_b):
# the product form c_ab·T²/(B·c_a·c_b) overflows BIGINT at web-corpus T,
# the log form never does — identical expression in both engines, rounded
# to 6 before the rank so ordering is parity-stable.
PMI_MIN_COUNT = 5
PMI_TOPK = 30


@q(
    "pmi_bigrams",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents),
    uni AS (
      SELECT tk, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(w) AS tk FROM w) GROUP BY 1),
    big AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM (
        SELECT w[i] AS a, w[i+1] AS b
        FROM w, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS g(i))
      GROUP BY 1, 2),
    tot AS (
      SELECT CAST((SELECT sum(c) FROM uni) AS BIGINT) AS t_tok,
             CAST((SELECT sum(c_ab) FROM big) AS BIGINT) AS t_big)
    SELECT a, b, c_ab,
           round(ln(CAST(c_ab AS DOUBLE)) + 2 * ln(CAST(t_tok AS DOUBLE))
                 - ln(CAST(t_big AS DOUBLE)) - ln(CAST(ua.c AS DOUBLE))
                 - ln(CAST(ub.c AS DOUBLE)), 6) AS pmi
    FROM big
    JOIN uni ua ON ua.tk = a
    JOIN uni ub ON ub.tk = b
    CROSS JOIN tot
    WHERE c_ab >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, a, b LIMIT {PMI_TOPK}
    """,
)
def pmi_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    d = t_split(spark, sf, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    w = d.select("doc_id", toks.alias("w"))
    uni = (
        w.select(F.explode("w").alias("tk"))
        .groupBy("tk")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    pair_idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        pair_idx,
        lambda i: F.struct(
            F.element_at("w", i.cast("int")).alias("a"),
            F.element_at("w", (i + 1).cast("int")).alias("b"),
        ),
    )
    big = (
        w.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COUNT)
    )
    tot = F.broadcast(
        uni.agg(F.sum("c").cast("bigint").alias("t_tok")).join(
            w.select(
                F.greatest(F.size("w") - 1, F.lit(0)).cast("bigint").alias("nb")
            ).agg(F.sum("nb").cast("bigint").alias("t_big"))
        )
    )
    ua = uni.select(F.col("tk").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tk").alias("b"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log(F.col("c_ab").cast("double"))
        + 2 * F.log(F.col("t_tok").cast("double"))
        - F.log(F.col("t_big").cast("double"))
        - F.log(F.col("c_a").cast("double"))
        - F.log(F.col("c_b").cast("double")),
        6,
    )
    return (
        big.join(ua, "a")
        .join(ub, "b")
        .join(tot)
        .select("a", "b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(PMI_TOPK)
    )


# ---------------------------------------------------------------------------
# Rare-token ratio — the fraction of a document's (BPE-ish) tokens whose
# whole-corpus frequency is <= RARE_CF_MAX: a standard quality/noise signal
# (gibberish, OCR damage, and boilerplate-free spam skew heavily toward
# corpus-rare tokens). Complements quality_score's doc-local ratios with a
# corpus-global signal.
RARE_CF_MAX = 2


@q(
    "rare_token_ratio",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK_RE}')) AS tk
      FROM documents),
    dt AS (SELECT doc_id, tk, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    freq AS (SELECT tk, CAST(sum(c) AS BIGINT) AS cf FROM dt GROUP BY 1)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN cf <= {RARE_CF_MAX} THEN c ELSE 0 END) AS BIGINT)
             AS n_rare,
           round(CAST(sum(CASE WHEN cf <= {RARE_CF_MAX} THEN c ELSE 0 END) AS DOUBLE)
                 / sum(c), 6) AS rare_ratio
    FROM dt JOIN freq USING (tk)
    GROUP BY 1
    """,
)
def rare_token_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc token count, rare-token count, and rare ratio.

    Scale shape: tokens collapse to (doc_id, token, count) grain BEFORE
    anything shuffles (partial+final hash agg), so the token-keyed join
    back to the global frequency table moves one row per DISTINCT token
    per doc, not one per occurrence. Head tokens ("the") still key-skew
    that join — one row per document on a single key — which is exactly
    what AQE's skew-join split (on in the session) handles by splitting
    the hot key's partitions; the frequency side is 1 row per key, so
    replicating it across splits is free. Docs with zero tokens drop out
    (inner join) in both engines by construction."""
    d = t_split(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOK_RE), 0)
        ).alias("tk"),
    )
    dt = tok.groupBy("doc_id", "tk").agg(F.count("*").cast("bigint").alias("c"))
    # dt feeds the model build AND the score-back join; a lazy checkpoint
    # tokenizes the corpus once instead of twice (A/B at sf0.1: 1.12 s vs
    # 1.28 s min-of-4). The stored grain is (doc, type, count) — the same
    # rows both consumers shuffle, so storage tracks shuffle volume.
    dt = dt.localCheckpoint(eager=False)
    freq = dt.groupBy("tk").agg(F.sum("c").cast("bigint").alias("cf"))
    rare_c = F.when(F.col("cf") <= RARE_CF_MAX, F.col("c")).otherwise(F.lit(0))
    return (
        dt.join(freq, "tk")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(rare_c).cast("bigint").alias("n_rare"),
            F.round(
                F.sum(rare_c).cast("double") / F.sum("c"), 6
            ).alias("rare_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM surprisal — mean per-token negative log-probability of each
# document under the corpus's own unigram model (MLE, no smoothing needed:
# every scored token is in the vocabulary by construction). The standard
# LM-based quality/novelty signal a pretraining pipeline runs right after
# rare_token_ratio: boilerplate scores low (head tokens), gibberish scores
# high. Cross-engine determinism: ln() runs over EXACT BIGINT counts and is
# quantized to an integer grid at the DISTINCT-token grain, which makes the
# order-dependent per-doc aggregation exact integer math in both engines.
# The one remaining float surface is the round() per vocabulary entry: each
# engine's libm log is not correctly rounded, so a ~1-ulp divergence landing
# within an ulp of a .5 grid boundary could still flip one unit — the coarse
# 1e4 quantum (0.1 milli-nat) keeps boundaries ~1e-11 away from any 1-ulp
# drift rather than guaranteeing impossibility.
@q(
    "unigram_surprisal",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK_RE}')) AS tk
      FROM documents),
    dt AS (SELECT doc_id, tk, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    freq AS (SELECT tk, CAST(sum(c) AS BIGINT) AS cf FROM dt GROUP BY 1),
    tot AS (SELECT CAST(sum(cf) AS BIGINT) AS t_tok FROM freq),
    s AS (
      SELECT tk,
             CAST(round((ln(CAST(t_tok AS DOUBLE)) - ln(CAST(cf AS DOUBLE)))
                        * 10000) AS BIGINT) AS su
      FROM freq CROSS JOIN tot)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(CAST(sum(c * su) AS DOUBLE) / 10000 / sum(c), 6)
             AS mean_surprisal
    FROM dt JOIN s USING (tk)
    GROUP BY 1
    """,
)
def unigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc token count and mean unigram surprisal (nats).

    Scale shape: tokens collapse to (doc_id, token, count) grain before
    anything shuffles (same as rare_token_ratio); the model itself — the
    vocabulary-grain frequency table with 0.1-milli-nat integer surprisals
    — is what joins back, and the corpus total attaches to it as the
    sanctioned 1-row broadcast. Head-token key skew on the join back is
    AQE skew-split territory; the quantization makes the per-doc
    aggregation order-independent exact BIGINT math (the round() per
    vocabulary entry is the one float surface — see the oracle comment on
    the quantum choice). Docs with zero tokens drop out (inner join) in
    both engines by construction."""
    d = t_split(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOK_RE), 0)
        ).alias("tk"),
    )
    dt = tok.groupBy("doc_id", "tk").agg(F.count("*").cast("bigint").alias("c"))
    # dt feeds the model build AND the score-back join; a lazy checkpoint
    # tokenizes the corpus once instead of twice (A/B at sf0.1: 1.12 s vs
    # 1.28 s min-of-4). The stored grain is (doc, type, count) — the same
    # rows both consumers shuffle, so storage tracks shuffle volume.
    dt = dt.localCheckpoint(eager=False)
    freq = dt.groupBy("tk").agg(F.sum("c").cast("bigint").alias("cf"))
    tot = F.broadcast(freq.agg(F.sum("cf").cast("bigint").alias("t_tok")))
    su = F.round(
        (F.log(F.col("t_tok").cast("double")) - F.log(F.col("cf").cast("double")))
        * 10000
    ).cast("bigint")
    s = freq.join(tot).select("tk", su.alias("su"))
    return (
        dt.join(s, "tk")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * F.col("su")).cast("double")
                / 10000
                / F.sum("c"),
                6,
            ).alias("mean_surprisal"),
        )
    )
