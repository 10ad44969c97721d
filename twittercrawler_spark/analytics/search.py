"""Lexical retrieval over the documents corpus: BM25 top-k and a
skew-safe inverted index.

The reference's only retrieval is the Twitter search API call itself
(`/root/reference/pages/Crawler.py:80-117` — the query string is shipped
to the service) and substring filters over fetched text
(`pages/Postprocess_scripts/*`). A self-hosted corpus needs the
server-side equivalents: a ranked keyword search (BM25) and the index
structure that serves it (term → posting list). Both are expressed so the
corpus-scale relation shuffles once on its natural key and per-term skew
(stopword posting lists) is bounded by construction.

Cross-engine determinism: tf/df/dl are exact BIGINTs; avgdl is an exact
integer division (sum(dl)/N on exact longs in both engines); the one
floating-point expression per (doc, term) is computed identically in both
engines (same literals, same operand order — the tfidf_top_terms
precedent), rounded to 6 and accumulated in DECIMAL so summation order
cannot perturb the total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import t_split

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, sql: str | None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


#: the fixed search query (a literal dim — broadcast by construction)
BM25_TERMS = ("scan", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

_TERMS_SQL = ", ".join(f"'{w}'" for w in BM25_TERMS)
_TOK = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# BM25 ranked retrieval, top-k documents for a fixed term set.
#
# Scale shape: the token explode is filtered to the query terms BEFORE the
# tf aggregation, so the shuffled relation is |docs containing a query
# term| × |query terms| — not the corpus token stream. df falls out of tf
# with a 3-row aggregate (broadcast back), doc length is a codegen
# expression (no second explode), and N/avgdl are a 1-row broadcast. The
# final top-k is a global orderBy+limit → TakeOrderedAndProject (per-task
# heaps, no single-partition sort).
@q(
    "bm25_search",
    f"""
    WITH d AS (
      SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS dl FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
    tok AS (
      SELECT doc_id, tk FROM (
        SELECT doc_id, unnest({_TOK}) AS tk FROM documents)
      WHERE tk IN ({_TERMS_SQL})),
    tf AS (
      SELECT doc_id, tk, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2),
    df AS (
      SELECT tk, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
               (tf * ({BM25_K1} + 1.0)) /
               (tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl / (CAST(sum_dl AS DOUBLE) / n_docs))),
               6) AS DECIMAL(18,6)) AS s
      FROM tf
      JOIN df USING (tk)
      JOIN d ON d.doc_id = tf.doc_id
      CROSS JOIN stats),
    total AS (
      SELECT doc_id, CAST(sum(s) AS DOUBLE) AS score
      FROM scored GROUP BY 1)
    SELECT doc_id, score FROM total
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    # ONE pass over the text: doc length and the per-query-term counts are
    # per-row array expressions (|query terms| is a literal handful), so
    # the corpus is tokenized once into a narrow checkpointed frame —
    # previously dl, stats, and tf each re-scanned and re-split the text
    # (4 documents scans -> 1; interleaved A/B at sf0.1 min-of-4: 0.90 s
    # vs 1.14 s, results identical). The (doc_id, tk, tf) relation the
    # oracle aggregates falls out of an inline explode of the nonzero
    # per-term counts — row count |docs containing a query term| ×
    # |query terms|, same as before, but from the narrow frame.
    docs = t_split(spark, sf, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    def _count_of(term):
        # one-arg lambda per term (a two-arg lambda would be given the
        # element INDEX as its second argument by F.filter)
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("bigint")

    tf_cols = [_count_of(t).alias(f"_tf_{i}") for i, t in enumerate(BM25_TERMS)]
    perdoc = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), *tf_cols
    ).localCheckpoint(eager=False)
    d = perdoc.select("doc_id", "dl")
    stats = perdoc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    entries = F.array(
        *[
            F.struct(F.lit(t).alias("tk"), F.col(f"_tf_{i}").alias("tf"))
            for i, t in enumerate(BM25_TERMS)
        ]
    )
    tf = (
        perdoc.select("doc_id", F.explode(entries).alias("e"))
        .filter(F.col("e.tf") > 0)
        .select("doc_id", F.col("e.tk").alias("tk"), F.col("e.tf").alias("tf"))
    )
    df_ = tf.groupBy("tk").agg(F.count("*").cast("bigint").alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(df_), "tk")
        .join(d, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_norm, 6).cast("decimal(18,6)").alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s").cast("double").alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Inverted index with bounded posting lists — term → (df, first-K postings
# by doc_id). The build is TWO-LEVEL on a doc_id salt, and — critically —
# NO aggregation buffer is ever unbounded: per-(term, salt) the min-K ids
# are taken with a rank window FIRST (WindowExec streams a sorted,
# spillable run; it never materializes the group), so the level-1
# collect_list sees at most POST_K rows per group, and level 2 flattens at
# most POST_SALTS arrays of POST_K. A flat `collect_list` per (term, salt)
# would still buffer a stopword's ~n/POST_SALTS posting subset in ONE
# aggregation buffer at the 10^10-doc design point — the exact OOM the
# two-phase shape exists to prevent. df stays exact via per-(term, salt)
# counts on the same shuffle key. Same decomposition as the crawl
# scheduler's two-phase per-host top-k (frontier/scheduler.py).
POST_K = 20
POST_SALTS = 64


@q(
    "inverted_index",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, tk FROM (
        SELECT doc_id, unnest({_TOK}) AS tk FROM documents)),
    df AS (SELECT tk, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1),
    top AS (
      SELECT tk, doc_id,
             row_number() OVER (PARTITION BY tk ORDER BY doc_id) AS rn
      FROM tok)
    SELECT top.tk AS term, df.df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM top JOIN df USING (tk) WHERE rn <= {POST_K}
    GROUP BY 1, 2
    """,
)
def inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    docs = t_split(spark, sf, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    tok = docs.select("doc_id", F.explode(toks).alias("tk")).distinct().select(
        F.col("tk").alias("term"),
        F.pmod("doc_id", F.lit(POST_SALTS)).alias("salt"),
        "doc_id",
    )
    counts = tok.groupBy("term", "salt").agg(F.count("*").cast("bigint").alias("n"))
    rn = F.row_number().over(
        Window.partitionBy("term", "salt").orderBy("doc_id")
    )
    topk = tok.withColumn("rn", rn).filter(F.col("rn") <= POST_K)
    lvl1 = topk.groupBy("term", "salt").agg(
        F.sort_array(F.collect_list("doc_id")).alias("arr")  # ≤ POST_K rows
    ).join(counts, ["term", "salt"])
    return lvl1.groupBy("term").agg(
        F.sum("n").cast("bigint").alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array(F.flatten(F.collect_list("arr"))), 1, POST_K),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    )
