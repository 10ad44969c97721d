"""Structured Streaming equivalents of the reference's poor-man's streaming
(SURVEY.md §2.9).

The reference's streaming surface is: an unbounded crawl loop with periodic
flush (pages/Crawler.py:54-59,127-146), live per-minute counters
(pages/Postprocess_scripts/TemporalAnalysis.py:7-18 fed by
pages/Visualization.py:87-91), and queue-polled live stats
(pages/Preprocess.py:267-274). Here those are real streams:

* ``stream_minute_counts`` — file-source stream → event-time tumbling window
  + watermark → sink. ``trigger(availableNow=True)`` drains the backlog and
  stops: the micro-batch analog of the reference's bounded crawl session.
* ``stream_sessionize`` — ``applyInPandasWithState`` per-user session
  aggregation with a processing-time timeout: the custom-stateful-operator
  pattern (gap-based sessions, GroupState lifecycle, Arrow batches).

Batch twins of both live in the analytics registry with DuckDB oracles
(events_per_minute, session_windows); the streaming tests assert
stream-result == batch-result on the same input, which is the exactly-once
contract a production run relies on.

Scale: the streaming state store is keyed by (window) / (user) — both
bounded; watermarks bound state retention; file sources at 100 TB become
Kafka/object-store listings with the same plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800


def stream_minute_counts(
    spark: SparkSession, events_dir: str, checkpoint_dir: str, query_name: str
):
    """Per-minute event counts as a streaming query on a file source.

    Output mode is ``complete`` so the memory-sink table equals the batch
    twin exactly (the stream==batch test contract). In complete mode the
    watermark neither drops late rows nor evicts window state — every
    window is retained and re-emitted. A production deployment with a real
    sink would run ``update``/``append`` mode, where this same 10-minute
    watermark bounds state and drops late data; here it only documents the
    intended production lateness budget.
    """
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        # event-time machinery requires TIMESTAMP (not NTZ); session tz is
        # UTC so the cast is a pure reinterpretation
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n")
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_minute_counts_append(
    spark: SparkSession, events_dir: str, checkpoint_dir: str, query_name: str
):
    """Append-mode twin of :func:`stream_minute_counts` with LIVE watermark
    semantics: a window is emitted exactly once, after the watermark passes
    its end; its state is then evicted and any later row for it is DROPPED
    (`tests/test_streaming.py` proves the drop). This is the bounded-state
    production contract — the complete-mode twin exists only so the memory
    sink can equal the batch result. (Empirically, update mode in this Spark
    version does NOT drop watermark-late rows for window aggregations — the
    watermark guarantee is one-directional — which is exactly why this
    append-mode path, where the drop is required for correctness, is the one
    the engine documents as the late-data story.)
    """
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "n")
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def batch_minute_counts(spark: SparkSession, events_dir: str) -> DataFrame:
    """Batch twin of :func:`stream_minute_counts` (same plan, bounded)."""
    return (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 minute").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n")
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionizer: emits a session row whenever a >gap break is
    seen in event time; keeps the open session in GroupState; a timeout
    flushes the final open session."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
        return

    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
    ts_list.sort()
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = None, None, 0

    out_rows: list[tuple[int, int, int]] = []
    for t_us in ts_list:
        if start_us is None:
            start_us, last_us, n = t_us, t_us, 1
        elif t_us - last_us > SESSION_GAP_SECONDS * 1_000_000:
            out_rows.append((start_us, last_us, n))
            start_us, last_us, n = t_us, t_us, 1
        else:
            last_us, n = t_us, n + 1
    if start_us is not None:
        state.update((start_us, last_us, n))
        state.setTimeoutDuration(10_000)
    if out_rows:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_rows),
                "session_start": [pd.Timestamp(a, unit="us") for a, _, _ in out_rows],
                "session_end": [pd.Timestamp(b, unit="us") for _, b, _ in out_rows],
                "n_events": [c for _, _, c in out_rows],
            }
        )


def stream_sessionize(
    spark: SparkSession, events_dir: str, checkpoint_dir: str, query_name: str
):
    """Per-user gap sessions via applyInPandasWithState (custom stateful op)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_exact(
    spark: SparkSession, docs_dir: str, checkpoint_dir: str, query_name: str
):
    """Streaming exact dedup: unbounded ``dropDuplicates`` on the content
    hash — the streaming twin of the batch ``dedup_exact`` operator, for a
    pipeline that dedups documents AS THEY ARRIVE instead of in passes.

    Exactly-once contract (asserted by test): across all micro-batches, ONE
    survivor per distinct content hash, each survivor a member of its hash
    group. WHICH member survives is not specified: cross-batch it is the
    earlier batch, within a micro-batch it is whichever row the partitioned
    aggregation sees first — so the invariant is the survivor SET per hash,
    not the batch twin's min-doc_id choice.

    Scale: the dedup state store holds one row per DISTINCT content hash
    (bounded by distinct content, not stream length); on a cluster it backs
    onto the RocksDB state store and the key is the 128-bit md5 — the same
    seen-set shape as the crawl frontier, expressed as a built-in stateful
    operator instead of a custom one.
    """
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .withColumn("hh", F.md5("text"))
        .dropDuplicates(["hh"])
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_curation(
    spark: SparkSession, docs_dir: str, checkpoint_dir: str, query_name: str
):
    """Streaming twin of the batch ``curation_pipeline`` gate: language
    filter → per-doc quality features → quality gate → streaming exact
    dedup, applied to documents AS THEY ARRIVE.

    The batch pass computes quality via explode + groupBy (the distributed
    shape for unbounded docs); the streaming twin computes the SAME numbers
    within-row with array expressions (size / array_distinct / filter) —
    stateless per document, so the only streaming state is the dedup
    store: one row per distinct content hash, exactly the crawl frontier's
    seen-set shape. Gate constants are shared with the batch operator, so
    the two stay in lockstep by construction.

    Contract (asserted by test): every emitted row passes the gates with
    feature values identical to the batch formula, and across micro-batches
    the emitted set holds ONE survivor per distinct content hash, the hash
    set equal to the batch-gated hash set.
    """
    from ..analytics.curation import CUR_LANG, CUR_MIN_QUALITY, CUR_MIN_TOKENS

    schema = spark.read.parquet(docs_dir).schema
    tk = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and"]])
    n_tok = F.size("tk").cast("bigint")
    n_stop = F.size(F.filter(F.col("tk"), lambda x: F.array_contains(stop, x)))
    quality = F.round(
        0.5 * (F.size(F.array_distinct("tk")).cast("double") / F.size("tk"))
        + 0.5 * (n_stop.cast("double") / F.size("tk")),
        6,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .filter(F.col("lang") == CUR_LANG)
        .withColumn("tk", tk)
        .withColumn("n_tokens", n_tok)
        .withColumn("quality", quality)
        .drop("tk")
        .filter(
            (F.col("n_tokens") >= CUR_MIN_TOKENS)
            & (F.col("quality") >= CUR_MIN_QUALITY)
        )
        .withColumn("hh", F.md5("text"))
        .dropDuplicates(["hh"])
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_followon_join(
    spark: SparkSession, events_dir: str, checkpoint_dir: str, query_name: str
):
    """Watermarked stream-stream range join: each signup event joined to
    the same user's follow-on events inside 1 hour — the streaming twin of
    the batch ``signup_followon_1h`` range join (inner form: emitted rows
    are the (signup, follow-on) PAIRS).

    This is the one Structured Streaming join class with unbounded state
    risk, made safe the standard way: BOTH sides carry an event-time
    watermark and the join condition carries an explicit event-time range
    (`e_ts BETWEEN s_ts AND s_ts + 1h`), so Spark derives a state-eviction
    bound for each side (a signup can be dropped once the event watermark
    passes its ts + 1h, and vice versa) instead of buffering the streams
    forever. State is keyed by (user, time-range) — bounded by in-flight
    windows, not stream length.

    Contract (asserted by test): with the backlog drained, the emitted pair
    set equals the batch inner range join's pair set on the same input —
    exactly-once across micro-batches even though matching rows arrive in
    DIFFERENT batches.
    """
    schema = spark.read.parquet(events_dir).schema

    def _src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )

    s = (
        _src()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("s_id"),
            F.col("user_id").alias("s_uid"),
            F.col("ts").cast("timestamp").alias("s_ts"),
        )
        .withWatermark("s_ts", "2 hours")
    )
    e = (
        _src()
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_uid"),
            F.col("ts").cast("timestamp").alias("e_ts"),
            F.col("value").alias("e_value"),
        )
        .withWatermark("e_ts", "2 hours")
    )
    j = s.join(
        e,
        F.expr(
            "s_uid = e_uid AND e_ts > s_ts AND e_ts <= s_ts + INTERVAL 1 HOUR"
        ),
    )
    return (
        j.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_to_files(
    spark: SparkSession, docs_dir: str, checkpoint_dir: str, out_dir: str
):
    """:func:`stream_dedup_exact` with a durable parquet sink — the form a
    restartable production run uses. The memory-sink variant cannot prove
    restart semantics (its table dies with the query); this one can: the
    dedup state (one row per distinct content hash) and the source progress
    both live in the checkpoint, so a NEW invocation with the same
    checkpoint resumes exactly — already-processed files are not re-read,
    and content whose hash was seen before the stop is still dropped after
    it. That is the streaming twin of the crawl warehouse's
    committed-round resume (sources/tables.py)."""
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .withColumn("hh", F.md5("text"))
        .dropDuplicates(["hh"])
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
