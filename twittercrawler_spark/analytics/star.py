"""Star-schema analytics operators (SURVEY.md §2 A/J/P/W/F series).

Each reference operator is re-expressed as an idiomatic Spark DataFrame
program over the driver's TPC-H-ish tables, with a DuckDB oracle twin.
Citations point at the reference implementation the operator re-creates
(`/root/reference/...`).

Scale notes (all queries):
* broadcast hints are applied ONLY to fixed-cardinality dimensions
  (nation, region, literal dimension frames, nation-keyed aggregates) —
  tables whose size never grows with SF. SF-scaled tables (customer, part,
  supplier) carry NO hint: at test scale Catalyst's size-based selection
  broadcasts them anyway (parquet stats < autoBroadcastJoinThreshold,
  pinned by tests/test_plans.py), while at the 100× design point the same
  code degrades gracefully to a sort-merge join instead of forcing an OOM
  broadcast (VERDICT r2 "what's wrong" #1);
* aggregations are plain ``groupBy`` so Catalyst plans partial+final hash
  aggregation (map-side combine) automatically;
* top-k per key is a window over a TOTAL order (unique tie-break) so results
  are task-order independent at any parallelism;
* filters sit directly on scans → parquet predicate pushdown + column
  pruning (verified via .explain in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import dbl6, dec, t

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
# A1/A14 — grouped counts (reference create_counts_df, PreprocessDump.py:21-34)
@q(
    "event_type_counts",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type",
)
def event_type_counts(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "events").groupBy("event_type").agg(F.count("*").alias("n"))


# A2 — distinct/dedup (GenerateUserUseridDict.py:44-58 list-membership dedup)
@q("distinct_users", "SELECT DISTINCT user_id FROM events")
def distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "events").select("user_id").distinct()


# A4/F9 — histogram bucketing (get_age_interval, Functions.py:52-53)
@q(
    "price_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000 AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    """,
)
def price_histogram(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.withColumn(
            "bucket_lo",
            (F.floor(F.col("o_totalprice") / 50000.0).cast("bigint") * 50000),
        )
        .groupBy("bucket_lo")
        .agg(F.count("*").alias("n"))
    )


# A5 — two-level counts + window share (Page__Location_Based_...py:34-62)
@q(
    "segment_nation_share",
    """
    WITH c AS (
      SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2)
    SELECT n_name, c_mktsegment, n,
           round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY n_name) AS DOUBLE), 6) AS share
    FROM c
    """,
)
def segment_nation_share(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    n = F.broadcast(t(spark, sf, "nation"))
    counts = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("n_name")
    return counts.withColumn(
        "share", F.round(F.col("n").cast("double") / F.sum("n").over(w).cast("double"), 6)
    )


# A6 — weighted ratio aggregate (Page__Location_Based_...py:71-93): per order
# status, nation-weighted order share where the weight is the nation's
# positive account balance mass (the electorate analog).
@q(
    "weighted_status_ratio",
    """
    WITH w AS (
      SELECT c_nationkey AS nk,
             CAST(sum(CAST(greatest(c_acctbal, 0) AS DECIMAL(12,2))) AS DOUBLE) AS wt
      FROM customer GROUP BY 1),
    cnt AS (
      SELECT c_nationkey AS nk, o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
    tot AS (SELECT nk, CAST(sum(n) AS BIGINT) AS nt FROM cnt GROUP BY 1)
    SELECT status,
           round(sum(cnt.n * w.wt) / sum(tot.nt * w.wt), 6) AS ratio
    FROM cnt JOIN w USING (nk) JOIN tot USING (nk)
    GROUP BY status
    """,
)
def weighted_status_ratio(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    w = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.sum(dec(F.greatest(F.col("c_acctbal"), F.lit(0)))).cast("double").alias("wt")
    )
    cnt = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("n"))
    )
    tot = cnt.groupBy("nk").agg(F.sum("n").alias("nt"))
    return (
        cnt.join(F.broadcast(w), "nk")
        .join(F.broadcast(tot), "nk")
        .groupBy("status")
        .agg(
            F.round(
                F.sum(F.col("n") * F.col("wt")) / F.sum(F.col("nt") * F.col("wt")), 6
            ).alias("ratio")
        )
    )


# A8 — argmax with margin over top-2 (getStance, Stance_Detection.py:164-202)
@q(
    "user_top_event_margin",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
      FROM c)
    SELECT a.user_id,
           CASE WHEN a.n - coalesce(b.n, 0) >= 2 THEN a.event_type
                ELSE 'Unknown' END AS verdict
    FROM r a LEFT JOIN r b ON a.user_id = b.user_id AND b.rk = 2
    WHERE a.rk = 1
    """,
)
def user_top_event_margin(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        t(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    r = c.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    a = r.filter(F.col("rk") == 1).select("user_id", "event_type", "n")
    b = r.filter(F.col("rk") == 2).select("user_id", F.col("n").alias("n2"))
    return a.join(b, "user_id", "left").select(
        "user_id",
        F.when(
            F.col("n") - F.coalesce(F.col("n2"), F.lit(0)) >= 2, F.col("event_type")
        )
        .otherwise(F.lit("Unknown"))
        .alias("verdict"),
    )


# A9 — argmax per group (User Based Dashboard.py:297-304); explicit
# row_number total order so ties can't flip between engines.
@q(
    "richest_customer_per_nation",
    """
    SELECT n_name, c_name AS top_customer
    FROM (
      SELECT n_name, c_name,
             row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer JOIN nation ON c_nationkey = n_nationkey) x
    WHERE rk = 1
    """,
)
def richest_customer_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    n = F.broadcast(t(spark, sf, "nation"))
    j = c.join(n, c.c_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("n_name", F.col("c_name").alias("top_customer"))
    )


# A10 — conditional 4-way counts in one pass (Page__Location_...py:99-160)
@q(
    "conditional_counts",
    """
    SELECT CAST(sum(CASE WHEN c_acctbal > 0 AND c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS pos_building,
           CAST(sum(CASE WHEN c_acctbal > 0 AND c_mktsegment <> 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS pos_other,
           CAST(sum(CASE WHEN c_acctbal <= 0 AND c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_building,
           CAST(sum(CASE WHEN c_acctbal <= 0 AND c_mktsegment <> 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_other
    FROM customer
    """,
)
def conditional_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    pos = F.col("c_acctbal") > 0
    bld = F.col("c_mktsegment") == "BUILDING"
    s = lambda cond, name: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)  # noqa: E731
    return c.agg(
        s(pos & bld, "pos_building"),
        s(pos & ~bld, "pos_other"),
        s(~pos & bld, "nonpos_building"),
        s(~pos & ~bld, "nonpos_other"),
    )


# A12 — collect_list per group (Visualization.py:99-102), made deterministic
# by sorting and serializing to a string.
@q(
    "doc_ids_by_lang",
    """
    SELECT lang,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY lang
    """,
)
def doc_ids_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ",",
        ).alias("doc_ids"),
        F.count("*").alias("n"),
    )


# A13 — mean per group (User Based Dashboard.py:359-367)
@q(
    "avg_acctbal_by_nation",
    """
    SELECT n_name, round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_bal,
           CAST(count(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def avg_acctbal_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    n = F.broadcast(t(spark, sf, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(dec("c_acctbal")).cast("double") / F.count("*"), 6
            ).alias("avg_bal"),
            F.count("*").alias("n"),
        )
    )


# A14 — count(*) totals per source (PreprocessDump.py:170,214)
@q(
    "table_counts",
    """
    SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS n FROM orders
    UNION ALL SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'events', CAST(count(*) AS BIGINT) FROM events
    UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT) FROM documents
    """,
)
def table_counts(spark: SparkSession, sf: str) -> DataFrame:
    parts = []
    for name in ["orders", "lineitem", "events", "documents"]:
        parts.append(
            t(spark, sf, name).agg(
                F.lit(name).alias("tbl"), F.count("*").alias("n")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# J1 — enrichment join with left-miss tolerance (Crawler.py:101-118):
# a hash join replaces the nested-loop scan of includes.users. customer is
# SF-scaled → no forced broadcast; AQE picks BHJ while it fits.
@q(
    "event_customer_enrich",
    """
    SELECT event_id, user_id,
           coalesce(c_name, 'missing') AS c_name,
           coalesce(c_mktsegment, 'missing') AS segment
    FROM events LEFT JOIN customer ON user_id = c_custkey
    """,
)
def event_customer_enrich(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    c = t(spark, sf, "customer")
    return e.join(c, e.user_id == c.c_custkey, "left").select(
        "event_id",
        "user_id",
        F.coalesce("c_name", F.lit("missing")).alias("c_name"),
        F.coalesce("c_mktsegment", F.lit("missing")).alias("segment"),
    )


# J2/U2 — keyword-topic theta join with multi-label fan-out + 'other'
# fallback (what_isit_about, PreprocessDump.py:62-79,237-268).
_TOPICS = [
    ("engine", ["spark", "query"]),
    ("ops", ["join", "merge", "scan"]),
    ("stream", ["stream", "window", "batch"]),
]

_TOPIC_SQL_ROWS = ", ".join(
    f"('{tp}', '{kw}')" for tp, kws in _TOPICS for kw in kws
)


@q(
    "doc_topics",
    f"""
    WITH topics(topic, kw) AS (VALUES {_TOPIC_SQL_ROWS}),
    hit AS (
      SELECT DISTINCT doc_id, topic
      FROM documents JOIN topics ON contains(lower(text), kw))
    SELECT doc_id, topic FROM hit
    UNION ALL
    SELECT doc_id, 'other' AS topic FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = d.doc_id)
    """,
)
def doc_topics(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    rows = [(tp, kw) for tp, kws in _TOPICS for kw in kws]
    topics = F.broadcast(
        spark.createDataFrame(rows, "topic string, kw string")
    )
    hit = (
        d.join(topics, F.contains(F.lower(d.text), topics.kw))
        .select("doc_id", "topic")
        .distinct()
    )
    other = d.join(hit.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit("other").alias("topic")
    )
    return hit.unionByName(other)


# J3/W3 — ordered first-match alias join (Cansin_Location_Detection.py:122-177):
# the reference scans an ordered dict and breaks on first hit; here the order
# is an explicit rank column and first-match is row_number()=1.
_ALIASES = [
    ("E", "e-class", 1),
    ("ECONOMY", "economy-class", 2),
    ("PROMO", "promo-class", 3),
    ("SMALL", "compact-class", 4),
    ("STANDARD", "standard-class", 5),
    ("LARGE", "large-class", 6),
]
_ALIAS_SQL_ROWS = ", ".join(f"('{a}', '{b}', {r})" for a, b, r in _ALIASES)


@q(
    "part_class_first_match",
    f"""
    WITH aliases(alias, base, rank) AS (VALUES {_ALIAS_SQL_ROWS}),
    m AS (
      SELECT p_partkey, base,
             row_number() OVER (PARTITION BY p_partkey ORDER BY rank) AS rk
      FROM part JOIN aliases ON contains(p_type, alias))
    SELECT p_partkey, base FROM m WHERE rk = 1
    UNION ALL
    SELECT p_partkey, 'unmatched' AS base FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM aliases a WHERE contains(p.p_type, a.alias))
    """,
)
def part_class_first_match(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    al = F.broadcast(
        spark.createDataFrame(_ALIASES, "alias string, base string, rank int")
    )
    m = p.join(al, F.contains(p.p_type, F.col("alias")))
    w = Window.partitionBy("p_partkey").orderBy("rank")
    first = (
        m.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_partkey", "base")
    )
    unmatched = p.join(
        m.select("p_partkey").distinct(), "p_partkey", "left_anti"
    ).select("p_partkey", F.lit("unmatched").alias("base"))
    return first.unionByName(unmatched)


# J4 — substring-vote join (gender vote, Postprocess Functions.py:7-31)
_NAME_DIM = [
    ("red", "M"),
    ("blue", "F"),
    ("green", "M"),
    ("small", "F"),
    ("big", "M"),
    ("ring", "F"),
    ("bolt", "M"),
]
_NAME_SQL_ROWS = ", ".join(f"('{n}', '{g}')" for n, g in _NAME_DIM)


@q(
    "part_name_vote",
    f"""
    WITH names(nm, g) AS (VALUES {_NAME_SQL_ROWS}),
    v AS (
      SELECT p_partkey,
             CAST(sum(CASE WHEN g = 'M' THEN 1 ELSE 0 END) AS BIGINT) AS m,
             CAST(sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f
      FROM part JOIN names ON contains(lower(p_name), nm)
      GROUP BY 1)
    SELECT p.p_partkey,
           CASE WHEN v.m > v.f THEN 'M' WHEN v.f > v.m THEN 'F'
                ELSE 'unknown' END AS vote
    FROM part p LEFT JOIN v ON p.p_partkey = v.p_partkey
    """,
)
def part_name_vote(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    names = F.broadcast(spark.createDataFrame(_NAME_DIM, "nm string, g string"))
    v = (
        p.join(names, F.contains(F.lower(p.p_name), names.nm))
        .groupBy("p_partkey")
        .agg(
            F.sum(F.when(F.col("g") == "M", 1).otherwise(0)).cast("bigint").alias("m"),
            F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).cast("bigint").alias("f"),
        )
    )
    return p.join(v, "p_partkey", "left").select(
        "p_partkey",
        F.when(F.col("m") > F.col("f"), "M")
        .when(F.col("f") > F.col("m"), "F")
        .otherwise("unknown")
        .alias("vote"),
    )


# J8/P6 — seen-set anti-join (the core dedup primitive;
# GenerateUserUseridDict.py:53-56, Cansin_Location_Detection.py:107-117)
@q(
    "events_unknown_users",
    """
    SELECT event_id, user_id FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def events_unknown_users(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    c = t(spark, sf, "customer")
    return e.join(
        c.select(F.col("c_custkey").alias("user_id")), "user_id", "left_anti"
    ).select("event_id", "user_id")


# semi join — membership probe, positive form of J8
@q(
    "orders_with_big_lineitem",
    """
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
    """,
)
def orders_with_big_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 45)
    return o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_semi"
    ).select("o_orderkey", "o_totalprice")


# W2 — per-key top-k (the per-host fetch quota analog, Crawler.py:80,208)
@q(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) x
    WHERE rk <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


# W4/F8 — tumbling minute buckets (TemporalAnalysis.py:7-18); the reference
# truncates ISO strings, we truncate timestamps.
@q(
    "events_per_minute",
    """
    SELECT date_trunc('minute', ts) AS bucket, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def events_per_minute(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


# Gap-based sessionization (batch twin of streaming/windows.py
# stream_sessionize; the reference's temporal bucketing generalized).
# Exact-microsecond gap arithmetic in both engines.
@q(
    "session_windows",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events),
    m AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM o),
    s AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM m)
    SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(count(*) AS DOUBLE) / max(sess_id), 6) AS events_per_session
    FROM s GROUP BY user_id
    """,
)
def session_windows(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; session tz is UTC, so the cast is a no-op
    # reinterpretation matching DuckDB's epoch_us on the naive value
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | (us - prev > 1_800_000_000), 1).otherwise(0)
    s = e.withColumn(
        "sess_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return s.groupBy("user_id").agg(
        F.max("sess_id").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(F.count("*").cast("double") / F.max("sess_id"), 6).alias(
            "events_per_session"
        ),
    )


# S4 — JSON field extraction (the reference parses whole JSON lines with
# json.loads / ast.literal_eval, PreprocessDump.py:202-211; here the field
# access is a JSON-path expression pushed through codegen).
@q(
    "props_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(count(*) OVER (PARTITION BY CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_freq
    FROM events
    """,
)
def props_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select("event_id", k.alias("k")).withColumn(
        "k_freq", F.count("*").over(Window.partitionBy("k"))
    )


# F3 — the EXACT referenced-tweet fallback chain (PreprocessDump.py:289-322):
# 4 levels over a nested record — (1) v2 `referenced_tweets` string: id from
# the text after "id=", type from the type token; (2) v1
# `retweeted_status.id` → retweet; (3) v1 `quoted_status.id` → quote;
# (4) (NULL, NULL). The nested input is synthesized DETERMINISTICALLY from
# the events table in BOTH engines (click → v2 string, view → v1 retweet
# struct, purchase → v1 quote struct, signup/error → empty), so the oracle
# differentially tests the chain itself, level by level. The Spark side
# builds a real nested STRUCT column and coalesces over struct-field access
# — the shape the reference's try/except fallback walks.
# Documented divergence (SURVEY §7.4): the reference maps "replied_to" →
# "quote" (inversion bug, PreprocessDump.py:299-303); we implement the
# documented-intended mapping replied_to→reply / retweeted→retweet /
# quoted→quote in BOTH engines.
@q(
    "referenced_tweet_extract",
    """
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_type = 'click' THEN
               'type=' || (CASE event_id % 3 WHEN 0 THEN 'replied_to'
                                             WHEN 1 THEN 'retweeted'
                                             ELSE 'quoted' END)
               || ' id=' || CAST(event_id * 7 AS VARCHAR)
             END AS referenced_tweets,
             CASE WHEN event_type = 'view' THEN user_id * 3 END AS rs_id,
             CASE WHEN event_type = 'purchase' THEN user_id * 5 END AS qs_id
      FROM events)
    SELECT event_id,
           CASE WHEN referenced_tweets IS NOT NULL THEN
                  CASE WHEN contains(referenced_tweets, 'replied_to') THEN 'reply'
                       WHEN contains(referenced_tweets, 'retweeted') THEN 'retweet'
                       WHEN contains(referenced_tweets, 'quoted') THEN 'quote'
                  END
                WHEN rs_id IS NOT NULL THEN 'retweet'
                WHEN qs_id IS NOT NULL THEN 'quote'
           END AS ref_type,
           coalesce(
             CASE WHEN referenced_tweets IS NOT NULL
                  THEN CAST(regexp_extract(referenced_tweets, 'id=([0-9]+)', 1) AS BIGINT)
             END,
             rs_id, qs_id) AS ref_id
    FROM src
    """,
)
def referenced_tweet_extract(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    # synthesize the nested record the reference walks: a v2 string field
    # plus two v1 struct fields (retweeted_status / quoted_status)
    v2 = F.when(
        F.col("event_type") == "click",
        F.concat(
            F.lit("type="),
            F.element_at(
                F.array(F.lit("replied_to"), F.lit("retweeted"), F.lit("quoted")),
                (F.pmod(F.col("event_id"), F.lit(3)) + 1).cast("int"),
            ),
            F.lit(" id="),
            (F.col("event_id") * 7).cast("string"),
        ),
    )
    nested = e.select(
        "event_id",
        F.struct(
            v2.alias("referenced_tweets"),
            F.struct(
                F.when(F.col("event_type") == "view", F.col("user_id") * 3).alias("id")
            ).alias("retweeted_status"),
            F.struct(
                F.when(F.col("event_type") == "purchase", F.col("user_id") * 5).alias("id")
            ).alias("quoted_status"),
        ).alias("tw"),
    )
    rt = F.col("tw.referenced_tweets")
    ref_type = F.when(
        rt.isNotNull(),
        F.when(rt.contains("replied_to"), "reply")
        .when(rt.contains("retweeted"), "retweet")
        .when(rt.contains("quoted"), "quote"),
    ).otherwise(
        F.when(F.col("tw.retweeted_status.id").isNotNull(), "retweet").when(
            F.col("tw.quoted_status.id").isNotNull(), "quote"
        )
    )
    ref_id = F.coalesce(
        F.when(rt.isNotNull(), F.regexp_extract(rt, r"id=([0-9]+)", 1).cast("bigint")),
        F.col("tw.retweeted_status.id"),
        F.col("tw.quoted_status.id"),
    )
    return nested.select("event_id", ref_type.alias("ref_type"), ref_id.alias("ref_id"))


# A1 render — the reference's multi-indexed (topic × lang) counts frame
# (create_counts_df, PreprocessDump.py:21-34): groupBy().pivot().count()
# with the pivot values pinned (no discovery pass — at scale an unpinned
# pivot means an extra distinct job over the fact table).
_LANGS = ["de", "en", "es", "fr", "zh"]


@q(
    "doc_topic_lang_pivot",
    f"""
    WITH topics(topic, kw) AS (VALUES {_TOPIC_SQL_ROWS}),
    hit AS (
      SELECT DISTINCT doc_id, topic
      FROM documents JOIN topics ON contains(lower(text), kw)),
    allt AS (
      SELECT doc_id, topic FROM hit
      UNION ALL
      SELECT doc_id, 'other' AS topic FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = d.doc_id)),
    j AS (SELECT a.topic, d.lang FROM allt a JOIN documents d USING (doc_id))
    SELECT topic,
           {", ".join(
               f"CAST(sum(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT) AS {lg}"
               for lg in _LANGS
           )}
    FROM j GROUP BY topic
    """,
)
def doc_topic_lang_pivot(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    topics = doc_topics(spark, sf)
    j = topics.join(d.select("doc_id", "lang"), "doc_id")
    out = j.groupBy("topic").pivot("lang", _LANGS).count().na.fill(0)
    return out.select("topic", *[F.col(lg).cast("bigint").alias(lg) for lg in _LANGS])


# Grouping sets: ROLLUP over the dimension chain (not in the reference —
# Catalyst gives it free; included for engine completeness, SURVEY §2.4).
@q(
    "rollup_revenue",
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")  # SF-scaled: AQE decides the join side
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region"))
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
        )
    )


# CUBE twin of rollup_revenue (SURVEY §2.4 names both): all four grouping
# sets — (region, nation), (region), (nation), () — in one pass.
@q(
    "cube_revenue",
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, n_name)
    """,
)
def cube_revenue(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")  # SF-scaled: AQE decides the join side
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region"))
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
    )
    return (
        j.cube("r_name", "n_name")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
        )
    )


# As-of join — each event matched to the user's most recent order at or
# before the event time. Spark has no ASOF JOIN operator; the scalable
# composition is the union-of-streams trick: tag both inputs, sort within
# user by (time, tag), and carry the last non-null order key forward with a
# running window — ONE shuffle on the join key, no per-row range probe, no
# n×m range join. Ties: orders sort before events at the same timestamp
# ("at or before"), and equal-timestamp orders resolve to the max orderkey.
@q(
    "events_asof_orders",
    """
    SELECT e.event_id, e.user_id,
           (SELECT o.o_orderkey FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_orderkey
    FROM events e
    """,
)
def events_asof_orders(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events").select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("okey"),
        "event_id",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    u = o.unionByName(e)
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "kind", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("last_orderkey", F.last("okey", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", F.col("uid").alias("user_id"), "last_orderkey")
    )


# Deterministic stratified sampling — per-language keep-rates applied via
# the shared content hash (training-data curation: rebalance a corpus
# without RNG, reproducible across engines, partitionings and reruns).
_SAMPLE_RATES = [("en", 80), ("de", 50), ("fr", 50), ("es", 25), ("zh", 10)]
_RATE_SQL_ROWS = ", ".join(f"('{lg}', {r})" for lg, r in _SAMPLE_RATES)


@q(
    "stratified_sample",
    f"""
    WITH rates(lang, keep_pct) AS (VALUES {_RATE_SQL_ROWS})
    SELECT doc_id, d.lang
    FROM documents d JOIN rates USING (lang)
    WHERE CAST('0x' || substr(md5(d.lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 100 < keep_pct
    """,
)
def stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    from ._util import base_hash32

    d = t(spark, sf, "documents")
    rates = F.broadcast(
        spark.createDataFrame(_SAMPLE_RATES, "lang string, keep_pct int")
    )
    key = base_hash32(
        F.concat(F.col("lang"), F.lit(":"), F.col("doc_id").cast("string"))
    )
    return (
        d.join(rates, "lang")
        .filter(F.pmod(key, F.lit(100)) < F.col("keep_pct"))
        .select("doc_id", "lang")
    )


# set ops — EXCEPT (SURVEY §2.6): customers with no orders at all.
# DataFrame.subtract IS SQL's EXCEPT DISTINCT (plans as distinct + left-anti
# join), so the set semantics match the oracle for ANY input multiplicity —
# the previous exceptAll(distinct()).distinct() composition was only
# equivalent while the left side happened to be duplicate-free.
@q(
    "customers_never_active",
    """
    SELECT c_custkey AS id FROM customer
    EXCEPT
    SELECT user_id AS id FROM events
    """,
)
def customers_never_active(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("id"))
    e = t(spark, sf, "events").select(F.col("user_id").alias("id"))
    return c.subtract(e)


# per-type value statistics over the events stream's numeric payload —
# decimal-exact sums, rounded doubles (the cross-engine money discipline)
@q(
    "event_value_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean
    FROM events GROUP BY event_type
    """,
)
def event_value_stats(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    s = F.sum(F.col("value").cast("decimal(18,6)"))
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        s.cast("double").alias("total"),
        F.round(s.cast("double") / F.count("*"), 6).alias("mean"),
    )


# set ops — union + distinct (SURVEY §2.6)
@q(
    "all_known_ids",
    """
    SELECT DISTINCT id FROM (
      SELECT user_id AS id FROM events
      UNION ALL SELECT c_custkey AS id FROM customer) u
    """,
)
def all_known_ids(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events").select(F.col("user_id").alias("id"))
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("id"))
    return e.unionByName(c).distinct()


# F-series — scalar string/number functions in one projection
# (remove_new_lines/preprocess_text PreprocessDump.py:84-89, lower/contains,
# split/trim Functions.py:100-112, buckets Functions.py:52-53). The
# whitespace chain is the reference's SINGLE-PASS str.replace contract:
# replace() in both engines is one left-to-right non-overlapping pass.
@q(
    "doc_projection",
    """
    SELECT doc_id,
           length(text) AS n_chars_computed,
           substr(lower(text), 1, 40) AS head40,
           CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens_ws,
           trim(replace(replace(replace(replace(text, chr(10), ' '),
                chr(13), ' '), chr(9), ' '), '  ', ' ')) AS text_norm,
           CAST(floor(n_chars / 100.0) AS BIGINT) * 100 AS chars_bucket,
           CASE WHEN contains(text, 'spark') THEN 1 ELSE 0 END AS mentions_spark
    FROM documents
    """,
)
def doc_projection(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    norm = F.trim(
        F.replace(
            F.replace(
                F.replace(
                    F.replace(F.col("text"), F.lit("\n"), F.lit(" ")),
                    F.lit("\r"),
                    F.lit(" "),
                ),
                F.lit("\t"),
                F.lit(" "),
            ),
            F.lit("  "),
            F.lit(" "),
        )
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        F.substring(F.lower("text"), 1, 40).alias("head40"),
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tokens_ws"),
        norm.alias("text_norm"),
        (F.floor(F.col("n_chars") / 100.0).cast("bigint") * 100).alias("chars_bucket"),
        F.when(F.contains("text", F.lit("spark")), 1).otherwise(0).alias("mentions_spark"),
    )


# A11 — keyword mention counts (count_occurances, Visualization.py:17-37) —
# note the reference's sum_mask_numpy counts non-nulls (documented bug); we
# implement the intended semantics.
_KWS = ["spark", "join", "stream", "hash", "window"]
_KW_ROWS = ", ".join(f"('{k}')" for k in _KWS)


@q(
    "keyword_mentions",
    f"""
    WITH kws(kw) AS (VALUES {_KW_ROWS})
    SELECT kw,
           CAST(sum(CASE WHEN contains(lower(text), kw) THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
    FROM kws CROSS JOIN documents
    GROUP BY kw
    """,
)
def keyword_mentions(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    kws = F.broadcast(spark.createDataFrame([(k,) for k in _KWS], "kw string"))
    return (
        kws.crossJoin(d)
        .groupBy("kw")
        .agg(
            F.sum(F.when(F.contains(F.lower("text"), F.col("kw")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs")
        )
    )


# --- TPC-H-style headline joins -------------------------------------------
# Q1 flavor — the flagship aggregation (exact decimal, then double).
@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.round(F.sum(dec("l_quantity")).cast("double") / F.count("*"), 6).alias("avg_qty"),
        F.round(F.sum(dec("l_extendedprice")).cast("double") / F.count("*"), 6).alias(
            "avg_price"
        ),
        F.count("*").alias("count_order"),
    )


# Q3 flavor — shipping priority: fact-fact join + top-10 by exact-decimal
# revenue with unique tie-break.
@q(
    "shipping_priority_top10",
    """
    WITH r AS (
      SELECT o_orderkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS rev
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey)
    SELECT o_orderkey, CAST(rev AS DOUBLE) AS revenue FROM (
      SELECT o_orderkey, rev,
             row_number() OVER (ORDER BY rev DESC, o_orderkey) AS rk
      FROM r) x
    WHERE rk <= 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    r = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(rev).alias("rev"))
    )
    # top-k of a large input must never be a partition-less window (all rows
    # to ONE task); orderBy+limit plans as TakeOrderedAndProject — map-side
    # partial top-10 per partition, then a 10-row merge on the driver side
    return (
        r.orderBy(F.desc("rev"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("rev").cast("double").alias("revenue"))
    )


# Q2 flavor — correlated scalar subquery (min per correlation key). Written
# AS SQL on purpose: Catalyst decorrelates the subquery into an aggregate +
# join (no per-row re-execution), which is the engine feature under test.
@q(
    "cheapest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders o
    WHERE o_totalprice = (SELECT min(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def cheapest_order_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    # the temp-view name is derived from the sf dir so concurrent/interleaved
    # invocations against different scale factors can never clobber each
    # other's view (every other query in the suite is side-effect free)
    import hashlib as _hl

    view = f"orders_v_{_hl.md5(sf.encode()).hexdigest()[:12]}"
    t(spark, sf, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        FROM {view} o
        WHERE o_totalprice = (SELECT min(o2.o_totalprice) FROM {view} o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


# Q7 flavor — bilateral trade volume: the same nation dim joined TWICE under
# different roles (supplier side, customer side), per-year aggregation.
@q(
    "bilateral_trade_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def bilateral_trade_volume(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    s = t(spark, sf, "supplier")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    )
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)  # supplier/customer: SF-scaled,
        .join(c, o.o_custkey == c.c_custkey)   # no forced broadcast

        .join(n1, F.col("s_nationkey") == F.col("nk1"))
        .join(n2, F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("o_orderdate").cast("bigint").alias("yr")
        )
        .agg(F.sum(rev).cast("double").alias("volume"))
    )


# Q13 flavor — outer join then distribution-of-counts: customers bucketed
# by how many orders they have (including the zero bucket, which only an
# OUTER join can produce); two-level aggregation.
@q(
    "customer_order_distribution",
    """
    WITH c AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1)
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs
    FROM c GROUP BY 1
    """,
)
def customer_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_custs"))


# Q16 flavor — count(DISTINCT) per group: Catalyst plans the distinct
# aggregate as the expand + two-phase aggregation (partial distinct
# map-side), a different physical shape from plain hash aggregation.
@q(
    "suppliers_per_parttype",
    """
    SELECT p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
    FROM part JOIN lineitem ON p_partkey = l_partkey
    GROUP BY 1
    """,
)
def suppliers_per_parttype(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")  # SF-scaled: AQE decides the join side
    li = t(spark, sf, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
    )


# Q5 flavor — multi-way dim chain join; Catalyst broadcast-plans the whole
# dim chain, only the two fact tables shuffle.
@q(
    "revenue_by_nation",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    r = t(spark, sf, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = t(spark, sf, "nation")
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    # only the fixed-cardinality nation⋈region chain is hinted; customer and
    # supplier are SF-scaled, so the planner sizes those join sides itself
    dims = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == F.col("n_nationkey"),
    )
    return (
        o.join(dims, o.o_custkey == F.col("c_custkey"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Order-priority checking (TPC-H Q4 shape): EXISTS-correlated semi join from
# a date-windowed fact slice. Scale shape: the filter reaches the orders
# scan (date pushdown), the semi join keys on orderkey (linear shuffle),
# and the final groupBy is over 5 priority values (map-side combinable).
@q(
    "order_priority_check",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
)
def order_priority_check(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Priority shipment counts (TPC-H Q12 shape): conditional two-way counts
# over a date-windowed fact⋈fact join. orders is SF-scaled — no broadcast
# hint; AQE sizes the join sides (VERDICT r2 anti-pattern #1 rule).
@q(
    "priority_shipment_counts",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    GROUP BY 1
    """,
)
def priority_shipment_counts(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Minimum-cost supplier per part (TPC-H Q2 shape, supply costs derived from
# lineitem since the driver schema has no partsupp). Scale shape: cost is a
# (partkey, suppkey)-keyed aggregation (linear); the region dim chain is
# broadcast; the per-part argmin is a window over a total order — supplier
# is SF-scaled so its join side is AQE-decided, never force-broadcast.
@q(
    "min_cost_supplier_per_part",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS c
      FROM lineitem GROUP BY 1, 2),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    pc AS (
      SELECT p.p_partkey, p.p_type, e.s_name, e.s_acctbal, e.n_name, c.c,
             row_number() OVER (
               PARTITION BY p.p_partkey
               ORDER BY c.c, e.s_name, e.s_suppkey) AS rn
      FROM part p
      JOIN cost c ON c.l_partkey = p.p_partkey
      JOIN eu e ON e.s_suppkey = c.l_suppkey
      WHERE p.p_size >= 30)
    SELECT p_partkey, p_type, s_name AS cheapest_supplier,
           n_name AS supplier_nation, round(c, 6) AS min_cost,
           round(s_acctbal, 2) AS supplier_acctbal
    FROM pc WHERE rn = 1
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("c"))
    )
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        t(spark, sf, "supplier")
        .join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf, "part").filter(F.col("p_size") >= 30)
    pc = (
        p.join(cost, cost["l_partkey"] == p["p_partkey"])
        .join(eu, eu["s_suppkey"] == F.col("l_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy("c", "s_name", "s_suppkey")
    return (
        pc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_type",
            F.col("s_name").alias("cheapest_supplier"),
            F.col("n_name").alias("supplier_nation"),
            F.round("c", 6).alias("min_cost"),
            F.round("s_acctbal", 2).alias("supplier_acctbal"),
        )
    )


# Q10 flavor — returned-item reporting: which customers returned the most
# revenue in a quarter. Fact⋈fact⋈dim star join, global top-20.
@q(
    "returned_item_top20",
    """
    WITH r AS (
      SELECT c_custkey, c_name, n_name,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS rev,
             round(max(c_acctbal), 2) AS acctbal
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY 1, 2, 3)
    SELECT c_custkey, c_name, n_name,
           CAST(rev AS DOUBLE) AS revenue, acctbal FROM (
      SELECT *, row_number() OVER (ORDER BY rev DESC, c_custkey) AS rk FROM r) x
    WHERE rk <= 20
    """,
)
def returned_item_top20(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, top 20.

    Scale shape: lineitem filters on returnflag and orders on the date range
    BEFORE the fact⋈fact join (both predicates reach the scans); customer is
    SF-scaled so carries no forced broadcast (AQE decides); nation is a
    fixed-cardinality dim and is hinted. The global top-20 is
    orderBy+limit ⇒ TakeOrderedAndProject, never a one-task window.
    """
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(t(spark, sf, "nation"))
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("rev"), F.round(F.max("c_acctbal"), 2).alias("acctbal"))
    )
    return (
        r.orderBy(F.desc("rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name",
            F.col("rev").cast("double").alias("revenue"), "acctbal",
        )
    )


# Q18 flavor — large-volume customers: orders whose total quantity clears a
# threshold (agg-filtered semi join back to the fact), then customer detail.
@q(
    "large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_date,
           round(o_totalprice, 2) AS total_price,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 shape: customers holding orders above a quantity threshold.

    Scale shape: the IN-subquery is a partial-agg (map-side combine) over
    lineitem keyed by l_orderkey, filtered, then a LEFT SEMI join back to
    orders on the same key — the two lineitem passes share the orderkey
    shuffle key so AQE/exchange reuse applies; no decorrelation gymnastics,
    no row explosion. Customer is SF-scaled: no forced broadcast.
    """
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )


# Range join — follow-on activity within one hour of each signup event.
# Spark has no RANGE JOIN operator; the naive non-equi join plans as a
# BroadcastNestedLoopJoin (all-pairs per user). The scalable composition is
# time-bucketing with bucket width == range width: every in-range partner of
# a probe lies in the probe's hour-bucket or the next one, so the probe side
# is exploded to exactly those two bucket keys and the join is a plain
# (user_id, bucket) EQUI join, followed by the exact range filter.
@q(
    "signup_followon_1h",
    """
    WITH s AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup')
    SELECT s.event_id, s.user_id,
           CAST(count(e.event_id) AS BIGINT) AS n_follow,
           round(coalesce(sum(e.value), 0), 6) AS follow_value
    FROM s LEFT JOIN events e
      ON e.user_id = s.user_id
     AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
)
def signup_followon_1h(spark: SparkSession, sf: str) -> DataFrame:
    """Per-signup follow-on event count/value inside a 1-hour window.

    Scale shape: candidate pairs are bounded by per-(user, hour) event
    density — never all-pairs-per-user; the shuffle key (user_id, bucket)
    is high-cardinality and time-spread, so no skew hot-spot; the 2× probe
    duplication is on the FILTERED signup side only. The oracle states the
    same semantics as the textbook non-equi join.
    """
    ev = t(spark, sf, "events")
    bucket = F.floor(F.unix_timestamp("ts") / 3600)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            F.col("user_id").alias("s_uid"),
            F.col("ts").alias("s_ts"),
            F.explode(F.array(bucket, bucket + 1)).alias("jb"),
        )
    )
    e = ev.select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_uid"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("e_value"),
        bucket.alias("e_bucket"),
    )
    in_range = (F.col("e_ts") > F.col("s_ts")) & (
        F.col("e_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")
    )
    joined = s.join(
        e,
        (F.col("s_uid") == F.col("e_uid")) & (F.col("jb") == F.col("e_bucket")),
        "left",
    )
    return joined.groupBy("event_id", F.col("s_uid").alias("user_id")).agg(
        F.count(F.when(in_range, F.col("e_id"))).cast("bigint").alias("n_follow"),
        F.round(
            F.coalesce(F.sum(F.when(in_range, F.col("e_value"))), F.lit(0.0)), 6
        ).alias("follow_value"),
    )


# ---------------------------------------------------------------------------
# Round-3 Q-shape widening: the remaining distinct TPC-H access patterns the
# suite had no representative for. All follow the suite-wide determinism
# rules (_util module docstring): DECIMAL(12,2) money math, round(x, 6) on
# derived doubles, total-order tie-breaks.


# Q6 flavor — pure scan-filter-aggregate: the canonical predicate-pushdown /
# column-pruning showcase. No join, no window: one partial+final agg over a
# scan that reads exactly 4 columns with all three filters pushed to parquet.
@q(
    "forecast_revenue_delta",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Q6 shape: what-if revenue from discount removal.

    Scale shape: filters sit directly on the scan (shipdate range, discount
    band, quantity cap all reach PushedFilters), ReadSchema is the 4 used
    columns, and the single scalar agg is partial+final — at 100 TB this is
    a map-side-combine scan job with a 1-row shuffle.
    """
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


# Q14 flavor — conditional-share aggregate: one pass computes both the
# conditional numerator and the unconditional denominator (no second scan,
# no self-join).
@q(
    "promo_revenue_share",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (1.00 - CAST(l_discount AS DECIMAL(12,2)))
                   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 shape: promo revenue as a share of the month's total.

    Scale shape: the month filter prunes lineitem BEFORE the join; part is
    SF-scaled so it carries no forced broadcast (AQE decides); numerator and
    denominator are two aggregates of ONE groupBy-less agg — a single
    shuffle-to-one-row job, not two passes.
    """
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == p.p_partkey)
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_pct")
    )


# Q15 flavor — max-equality against an aggregated view: top revenue supplier
# kept WITH ties (scalar-max semi filter, not a LIMIT 1).
@q(
    "top_supplier_by_revenue",
    """
    WITH r AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM r JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM r)
    """,
)
def top_supplier_by_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: supplier(s) with the quarter's maximum revenue.

    Scale shape: revenue-per-supplier is one partial+final agg; the scalar
    max is an agg OF that agg (1 row, broadcast by construction) — ties are
    preserved by the equality filter, unlike an ORDER BY/LIMIT 1 plan which
    would both break ties arbitrarily and funnel through a single task.
    The max-equality compare happens in DECIMAL (exact), cast to double
    only for output.
    """
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    r = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("tr"))
    )
    mx = r.agg(F.max("tr").alias("mx"))  # 1 row — broadcast is size-correct
    return (
        r.join(F.broadcast(mx), F.col("tr") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("tr").cast("double").alias("total_rev")
        )
    )


# Q17 flavor — decorrelated per-key average: quantity below 20% of the
# part's own mean. The correlated scalar subquery becomes an agg + equi-join.
@q(
    "small_qty_avg_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_type = 'ECONOMY' AND p_size <= 10
      AND l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                           FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def small_qty_avg_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 shape: revenue lost to small-quantity orders of small parts.

    Scale shape: the correlated AVG decorrelates into a second lineitem agg
    keyed by l_partkey — the SAME shuffle key as the main join, so the two
    passes share an exchange under reuse; the filtered part side prunes
    first. avg(l_quantity) is exact cross-engine: quantities are
    integer-valued doubles, their sum is exact, and both engines divide the
    exact sum by the count.
    """
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10)
    )
    pa = (
        li.groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / 7.0, 6
            ).alias("avg_yearly")
        )
    )


# Q19 flavor — OR-of-ANDs theta bands across both join sides: three
# (brand, size-band, quantity-band) disjuncts evaluated post-join.
@q(
    "discounted_revenue_bands",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def discounted_revenue_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: discounted revenue over disjunctive brand/size/qty bands.

    Scale shape: the part-only disjunction (brand ∈ {12,23,15} with its size
    bands) and the lineitem-only envelope (l_quantity BETWEEN 1 AND 30) are
    stated as EXPLICIT pre-join filters so both reach the parquet scans —
    Catalyst does not derive the per-side envelopes from a cross-side OR on
    its own; the exact three-way disjunct then runs post-join on the
    pre-pruned pairs.
    """
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    p = t(spark, sf, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15))
    )
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# Q9 flavor — multi-join profit rollup: pattern-filtered part, fact joined to
# part+supplier+nation, profit = revenue minus a quantity-scaled cost proxy
# (the driver schema has no partsupp table; 60% of retail price stands in
# for supply cost), grouped by nation x year.
@q(
    "profit_by_nation_year",
    """
    SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS yr,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1.00 - CAST(l_discount AS DECIMAL(12,2)))
                  - CAST(p_retailprice AS DECIMAL(12,2)) *
                    CAST(0.60 AS DECIMAL(4,2)) *
                    CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and ship year.

    Scale shape: the p_name pattern prunes part before the fact join (the
    LIKE is pushed as a string-contains scan filter); nation is the only
    broadcast-hinted side (fixed 25 rows); part/supplier are SF-scaled and
    AQE-decided. All money math stays in DECIMAL until the final cast, so
    the profit sum is bit-exact across engines.
    """
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_name").contains("widget"))
    s = t(spark, sf, "supplier")
    n = F.broadcast(t(spark, sf, "nation"))
    profit = dec("l_extendedprice") * (
        F.lit(1.00).cast("decimal(12,2)") - dec("l_discount")
    ) - dec("p_retailprice") * F.lit(0.60).cast("decimal(4,2)") * dec("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# Q11 flavor — group-total vs global-scalar threshold: per-part traded value
# filtered against a fraction of the ALL-parts total (HAVING against an
# aggregate of the same aggregation).
@q(
    "important_stock_parts",
    """
    WITH v AS (
      SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
      FROM lineitem GROUP BY 1)
    SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS val
    FROM v
    WHERE val > (SELECT CAST(0.00055 AS DECIMAL(7,5)) * sum(val) FROM v)
    """,
)
def important_stock_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape: parts whose traded value exceeds 0.1% of the global total.

    Scale shape: one partial+final agg builds the per-part values; the
    global threshold is an agg OF that agg (1 row, broadcast by size); the
    comparison stays in DECIMAL (exact both engines) and only the output is
    cast to double. No second scan of lineitem.
    """
    li = t(spark, sf, "lineitem")
    v = li.groupBy("l_partkey").agg(F.sum(dec("l_extendedprice")).alias("val"))
    thr = v.agg(
        (F.lit(0.00055).cast("decimal(7,5)") * F.sum("val")).alias("thr")
    )  # 1 row
    return (
        v.join(F.broadcast(thr), F.col("val") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("partkey"), F.col("val").cast("double").alias("val")
        )
    )


# Q21 flavor — EXISTS + NOT EXISTS composition on the SAME fact: suppliers
# who were the sole latest shipper in multi-supplier finished orders. The
# two correlated quantifiers decorrelate into a LEFT SEMI and a LEFT ANTI
# self-join sharing one shuffle key.
@q(
    "sole_late_shipper_ranking",
    """
    SELECT s_suppkey, s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY 1, 2
    ORDER BY n_orders DESC, s_suppkey
    LIMIT 20
    """,
)
def sole_late_shipper_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: EXISTS/NOT EXISTS pair over the same fact table.

    Scale shape: both quantifiers join lineitem-to-lineitem on l_orderkey —
    the SAME shuffle key back to back, so the exchange is reused; the anti
    join carries the (suppkey differs AND ships later) residual as a join
    condition, never a cartesian. The final top-20 is a total order
    (n_orders DESC, s_suppkey) → TakeOrderedAndProject, deterministic under
    any parallelism.
    """
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("y_orderkey"),
        F.col("l_suppkey").alias("y_suppkey"),
        F.col("l_shipdate").alias("y_shipdate"),
    )
    cand = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("y_orderkey"))
        & (F.col("l_suppkey") != F.col("y_suppkey"))
        & (F.col("y_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    agg = (
        cand.join(
            o.select(F.col("o_orderkey")), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count_distinct(F.col("l_orderkey")).cast("bigint").alias("n_orders"))
    )
    return agg.orderBy(F.col("n_orders").desc(), F.col("s_suppkey")).limit(20)


# Q22 flavor — global-scalar threshold + anti join: customers richer than
# the positive-balance average with no RECENT order (anti join against a
# date-filtered orders projection), rolled up by nation.
@q(
    "idle_rich_customers",
    """
    WITH ab AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             / count(*) AS thr
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer, ab
    WHERE c_acctbal > thr
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY 1
    """,
)
def idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no recent orders.

    Scale shape: the threshold is exact-sum(DECIMAL)/count — one double
    division on exact operands, bit-identical across engines (a naive
    avg(double) would be summation-order dependent); the scalar is a 1-row
    broadcast; the NOT EXISTS is a LEFT ANTI join against the orders
    custkey projection (shuffle on o_custkey, no driver collection).
    """
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(dec("c_acctbal")).cast("double") / F.count("*")
            ).alias("thr")
        )
    )  # 1 row
    return (
        c.join(F.broadcast(thr), F.col("c_acctbal") > F.col("thr"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


# Q8 flavor — national market share: one nation's fraction of regional
# import revenue per order year.
@q(
    "nation_market_share",
    """
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             sn.n_name AS supp_nation,
             CAST(l_extendedprice AS DECIMAL(12,2)) *
               (1.00 - CAST(l_discount AS DECIMAL(12,2))) AS rev
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA')
    SELECT yr,
           round(CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3'
                                        THEN rev END), 0) AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY yr
    """,
)
def nation_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 shape: NATION_3's share of ASIA-customer revenue per year.

    Scale shape: region+nation are fixed-cardinality broadcasts; the
    customer-region filter prunes the orders side BEFORE the fact join;
    customer/supplier stay AQE-decided (SF-scaled, no forced hint). Both
    numerator and denominator accumulate in DECIMAL over the same rows —
    one pass, no second scan for the total — and divide once as doubles,
    rounded to 6 in both engines.
    """
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    s = t(spark, sf, "supplier")
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey")))
    sn = F.broadcast(
        n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    rev = dec("l_extendedprice") * (F.lit(1.00).cast("decimal(12,2)") - dec("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.col("supp_nation"),
            rev.alias("rev"),
        )
    )
    num = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rev"))),
        F.lit(0).cast("decimal(22,2)"),
    )
    return base.groupBy("yr").agg(
        F.round(num.cast("double") / F.sum("rev").cast("double"), 6).alias("mkt_share")
    )


# Q20 flavor — dominant-supplier detection: suppliers holding more than a
# fixed fraction of some widget-part's shipped quantity in a date window
# (the driver schema has no partsupp, so the availqty threshold of TPC-H
# Q20 becomes a share-of-part-volume threshold over lineitem itself).
@q(
    "dominant_part_suppliers",
    """
    WITH vol AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS q
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%widget%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2),
    tot AS (
      SELECT l_partkey, CAST(sum(q) AS DECIMAL(22,2)) AS tq
      FROM vol GROUP BY 1)
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominant_parts
    FROM vol
    JOIN tot USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE q * 100 > tq * 30
    GROUP BY 1, 2
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape: suppliers with >30% of a filtered part's windowed volume.

    Scale shape: the name pattern + ship-date window prune the fact scan
    (both pushed to parquet); the per-(part,supp) and per-part volumes are
    two aggregations over the SAME l_partkey shuffle key, so the
    share-threshold join is co-partitioned (no extra exchange); the
    threshold compare is integer-scaled DECIMAL (q*100 > tq*30), never a
    float ratio. supplier stays AQE-decided.
    """
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = t(spark, sf, "part").filter(F.col("p_name").contains("widget"))
    s = t(spark, sf, "supplier")
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("decimal(22,2)").alias("q"))
    )
    tot = vol.groupBy("l_partkey").agg(F.sum("q").cast("decimal(22,2)").alias("tq"))
    return (
        vol.join(tot, "l_partkey")
        .filter(F.col("q") * 100 > F.col("tq") * 30)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("bigint").alias("n_dominant_parts"))
    )


# Outlier detection — per-type z-score flagging from exact moment sums.
# The data-quality gate an events pipeline runs before training on
# behavioral signals. mean and variance derive from DECIMAL sums of value
# and value² (exact in both engines; a naive avg(double)/stddev(double)
# is summation-order dependent and engine-divergent), so the one float
# expression per row — the z itself — is computed on identical operands.
ZSCORE_THRESHOLD = 3.0


@q(
    "anomaly_zscore_events",
    f"""
    WITH stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(12,2)) *
                      CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
      FROM events GROUP BY 1)
    SELECT event_id, event_type, value, z FROM (
      SELECT event_id, e.event_type AS event_type, value,
             CASE WHEN sqrt((s2 - s1 * s1 / n) / n) > 0
                  THEN round((value - s1 / n) /
                             sqrt((s2 - s1 * s1 / n) / n), 6) END AS z
      FROM events e JOIN stats USING (event_type)) t
    WHERE abs(z) > {ZSCORE_THRESHOLD}
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf: str) -> DataFrame:
    """Events whose value sits more than 3σ from their type's mean.

    Scale shape: the moment sums are ONE partial+final aggregation over
    the fact scan (5 groups); the per-row z pass joins the 5-row stats
    frame back as a broadcast — the fact table is scanned twice but never
    shuffled. Population σ (the /n form) so both engines share the exact
    formula.
    """
    ev = t(spark, sf, "events")
    stats = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec("value")).cast("double").alias("s1"),
        F.sum(dec("value") * dec("value")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n"))
    # std == 0 (degenerate group) must yield NULL-and-filtered, not an ANSI
    # divide-by-zero crash — mirrors the oracle's NULL division semantics
    z = F.when(std > 0, F.round((F.col("value") - mean) / std, 6))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > ZSCORE_THRESHOLD)
    )


# Data-profiling report — per-column null/distinct/extrema over the events
# table in ONE scan (the reference eyeballs DataFrame dumps; a pipeline
# needs the machine-readable profile before every training run).
@q(
    "events_column_profile",
    """
    WITH p AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(user_id) AS BIGINT) AS null_user,
             CAST(count(DISTINCT user_id) AS BIGINT) AS d_user,
             CAST(count(*) - count(event_type) AS BIGINT) AS null_type,
             CAST(count(DISTINCT event_type) AS BIGINT) AS d_type,
             CAST(count(*) - count(value) AS BIGINT) AS null_value,
             CAST(count(DISTINCT value) AS BIGINT) AS d_value,
             round(min(value), 6) AS min_value,
             round(max(value), 6) AS max_value
      FROM events)
    SELECT col, n_rows, n_null, n_distinct, vmin, vmax FROM (
      SELECT 'user_id' AS col, n_rows, null_user AS n_null, d_user AS n_distinct,
             CAST(NULL AS DOUBLE) AS vmin, CAST(NULL AS DOUBLE) AS vmax FROM p
      UNION ALL
      SELECT 'event_type', n_rows, null_type, d_type, NULL, NULL FROM p
      UNION ALL
      SELECT 'value', n_rows, null_value, d_value, min_value, max_value FROM p)
    """,
)
def events_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """One-scan column profile: (column, rows, nulls, distincts, extrema).

    Scale shape: all metrics are ONE aggregation over one scan — Spark
    plans the multi-count(DISTINCT) with Expand + two-phase partial
    aggregation (each distinct key space shuffled once, map-side combined);
    the 3-row unpivot is a driver-free selectExpr over the 1-row result.
    """
    ev = t(spark, sf, "events")
    p = ev.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (F.count("*") - F.count("user_id")).cast("bigint").alias("null_user"),
        F.countDistinct("user_id").cast("bigint").alias("d_user"),
        (F.count("*") - F.count("event_type")).cast("bigint").alias("null_type"),
        F.countDistinct("event_type").cast("bigint").alias("d_type"),
        (F.count("*") - F.count("value")).cast("bigint").alias("null_value"),
        F.countDistinct("value").cast("bigint").alias("d_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
    null_d = F.lit(None).cast("double")
    rows = [
        p.select(
            F.lit("user_id").alias("col"), "n_rows",
            F.col("null_user").alias("n_null"),
            F.col("d_user").alias("n_distinct"),
            null_d.alias("vmin"), null_d.alias("vmax"),
        ),
        p.select(
            F.lit("event_type").alias("col"), "n_rows",
            F.col("null_type").alias("n_null"),
            F.col("d_type").alias("n_distinct"),
            null_d.alias("vmin"), null_d.alias("vmax"),
        ),
        p.select(
            F.lit("value").alias("col"), "n_rows",
            F.col("null_value").alias("n_null"),
            F.col("d_value").alias("n_distinct"),
            F.col("min_value").alias("vmin"), F.col("max_value").alias("vmax"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# Deterministic weighted sampling without replacement (A-ExpJ / Efraimidis–
# Spirakis): each doc draws a hash-uniform u and keeps key = ln(u)/w; the
# K LARGEST keys are a weight-proportional sample — reproducible across
# engines, partitionings and reruns because u comes from the shared md5
# hash, not an RNG. The curation move for "sample 10M docs proportional to
# length" without a shuffle: the top-K is TakeOrderedAndProject (per-task
# heaps), the only global exchange is K rows.
WSAMPLE_K = 25


@q(
    "weighted_sample_topk",
    f"""
    WITH keyed AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
             ln((CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8)
                      AS BIGINT) + 0.5) / 4294967296.0)
               / n_chars AS k_raw
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, w, round(k_raw, 6) + 0.0 AS k FROM keyed
    ORDER BY k_raw DESC, doc_id LIMIT {WSAMPLE_K}
    """,
)
def weighted_sample_topk(spark: SparkSession, sf: str) -> DataFrame:
    from ._util import base_hash32

    d = t(spark, sf, "documents").filter(F.col("n_chars") > 0)
    u = (
        base_hash32(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) + 0.5
    ) / F.lit(4294967296.0)
    # ordered at FULL double precision (identical bits in both engines);
    # rounding only the DISPLAYED key — a rounded sort key would collapse
    # long documents' keys into doc_id-ordered ties, silently destroying
    # weight-proportionality for exactly the docs the sample targets.
    # + 0.0 collapses IEEE -0.0 to 0.0 (engines format them differently)
    k_raw = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("double").alias("w"),
            k_raw.alias("k_raw"),
        )
        .orderBy(F.col("k_raw").desc(), "doc_id")
        .limit(WSAMPLE_K)
        .select("doc_id", "w", (F.round("k_raw", 6) + F.lit(0.0)).alias("k"))
    )


# Exact-k deterministic sample per stratum — the companion to the
# rate-based stratified_sample: every language contributes EXACTLY k docs
# (or all of them, if fewer), chosen by the shared hash order so the
# sample is reproducible across engines, partitionings and reruns.
GROUP_SAMPLE_K = 10


@q(
    "group_sample_exact_k",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT), doc_id) AS rn
      FROM documents)
    WHERE rn <= {GROUP_SAMPLE_K}
    """,
)
def group_sample_exact_k(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly k docs per language, by hash order (deterministic uniform).

    Scale shape: one window partitioned by the stratum key; a stratum at
    web scale can be corpus-sized, so the skew treatment when k ≪ group
    is the same two-phase decomposition the scheduler and inverted_index
    use — documented here, single-phase at this k because the window is
    partitioned (never partition-less) and the sort spills."""
    from ._util import base_hash32

    d = t(spark, sf, "documents")
    h = base_hash32(F.concat(F.lit("gs:"), F.col("doc_id").cast("string")))
    rn = F.row_number().over(Window.partitionBy("lang").orderBy(h, "doc_id"))
    return (
        d.select("doc_id", "lang", rn.alias("rn"))
        .filter(F.col("rn") <= GROUP_SAMPLE_K)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# §2.6 set-ops completion — INTERSECT (the reference composes member lists
# with Python set intersection when cross-referencing id dictionaries,
# GenerateUserUseridDict.py:44-58; union and EXCEPT live above). DataFrame
# .intersect IS SQL's INTERSECT DISTINCT (plans as distinct + left-semi),
# mirroring the subtract/EXCEPT note at customers_never_active.
@q(
    "acctbal_nation_intersect",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey
    FROM customer WHERE c_acctbal > 7500
    INTERSECT
    SELECT CAST(s_nationkey AS BIGINT) FROM supplier WHERE s_acctbal > 7500
    """,
)
def acctbal_nation_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Nations that have BOTH a rich customer and a rich supplier.

    Scale shape: both sides filter at the scan (predicate pushdown), then
    one shuffle each on the single projected key; intersect's left-semi
    join runs on key-only relations — no wide rows move."""
    c = (
        t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 7500)
        .select(F.col("c_nationkey").cast("bigint").alias("nationkey"))
    )
    s = (
        t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 7500)
        .select(F.col("s_nationkey").cast("bigint").alias("nationkey"))
    )
    return c.intersect(s)


# ---------------------------------------------------------------------------
# W-series completion — NTILE quantile bucketing (the reference buckets
# users into engagement quartiles by sorted position, Functions.py age/
# interval bucketing generalized to rank-relative buckets). ntile(4) over a
# TOTAL order (price, then unique orderkey) is engine-deterministic: both
# Spark and DuckDB implement SQL-standard ntile (first n_rows % k buckets
# take the extra row), so identical orders give identical buckets.
@q(
    "order_price_quartiles",
    """
    WITH x AS (
      SELECT o_orderpriority, o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders)
    SELECT o_orderpriority, quartile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM x GROUP BY 1, 2
    """,
)
def order_price_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-priority price quartile boundaries (n, lo, hi per bucket).

    Scale shape: the window partitions by o_orderpriority (bounded
    cardinality but large groups at SF — the sort within each partition
    spills to disk rather than OOM); the follow-on groupBy is partial+final
    hash agg on (priority, quartile), 20 output rows."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-safe COUNT(DISTINCT) — per-type distinct users, written as the
# explicit two-phase shape (distinct on the PAIR, then count per group).
# Rationale: count(DISTINCT x) defeats map-side combine — every raw
# (group, x) row must reach the group's reducer, so one hot group (a viral
# event_type at web scale) serializes on a single task. Phase 1 shuffles on
# the well-spread COMPOSITE key (event_type, user_id) — hot groups fan out
# across the cluster — and phase 2 counts pair-rows, which partial-aggs
# map-side. Same trick as the scheduler's two-level offsets and
# inverted_index's salt, using the natural composite key as the salt.
@q(
    "distinct_users_per_type",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def distinct_users_per_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    pairs = ev.select("event_type", "user_id").distinct()
    return pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the selective grouping-set list ((region), (nation))
# that neither ROLLUP (hierarchical prefixes) nor CUBE (every subset) can
# express without computing unwanted sets: two independent one-dimension
# summaries in ONE pass over the join. Catalyst plans it as a single
# Expand + hash agg — one scan, one shuffle — where two separate GROUP BYs
# would scan and shuffle twice. The `grouping()` marker (SQL-standard,
# identical in DuckDB) disambiguates a genuine NULL dimension value from
# the aggregate row.
@q(
    "grouping_sets_revenue",
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           CAST(grouping(r_name) AS BIGINT) AS g_region,
           CAST(grouping(n_name) AS BIGINT) AS g_nation,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name))
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")  # SF-scaled: AQE decides the join side
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region"))
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
    )
    return (
        j.groupingSets([["r_name"], ["n_name"]], "r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("bigint").alias("g_region"),
            F.grouping("n_name").cast("bigint").alias("g_nation"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "g_region",
            "g_nation",
            "revenue",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# Fuzzy string-match join — edit-distance (Levenshtein) matching of a
# small query catalog against part names: the standard entity-resolution /
# near-identical-title matching step (the reference's keyword matching,
# Functions.py contains(), generalized from exact substring to bounded
# edit distance). Both engines implement classic Levenshtein, so the
# distance — and therefore the match set — is integer-exact.
_FUZZY_NAMES = ("red widgit", "blu bolt", "small gearr", "hot gizmmo")
_FUZZY_MAX_DIST = 2


@q(
    "part_name_fuzzy_match",
    f"""
    WITH qd AS (SELECT unnest({list(_FUZZY_NAMES)!r}::VARCHAR[]) AS qname)
    SELECT qname, p_partkey, p_name,
           CAST(levenshtein(p_name, qname) AS BIGINT) AS dist
    FROM part JOIN qd ON levenshtein(p_name, qname) <= {_FUZZY_MAX_DIST}
    """,
)
def part_name_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    """Parts whose names are within edit distance 2 of a catalog entry.

    Scale shape: the catalog is a literal dimension (broadcast by
    construction) and the predicate is non-equi, so the plan is the
    sanctioned broadcast nested-loop against a FIXED-cardinality side —
    cost is |part| x |catalog| distance evaluations, embarrassingly
    parallel over part splits, no shuffle. At a real 10^4+-entry catalog
    the composition switches to a length-bucketed / n-gram-prefilter
    equi-join (the dedup_ngram_jaccard shape) — the literal-dim BNLJ is
    only sanctioned because the catalog is dimension-sized."""
    p = t(spark, sf, "part")
    qd = F.broadcast(
        spark.createDataFrame([(x,) for x in _FUZZY_NAMES], "qname string")
    )
    d = F.levenshtein(F.col("p_name"), F.col("qname"))
    return (
        p.join(qd, d <= _FUZZY_MAX_DIST)
        .select(
            "qname",
            "p_partkey",
            "p_name",
            d.cast("bigint").alias("dist"),
        )
    )
