"""Time-series operators: rolling range-frame aggregates and gap-filled
resampling (LOCF).

The reference's only temporal machinery is per-bucket truncation of ISO
timestamp strings for dashboard plots
(`/root/reference/pages/Postprocess_scripts/TemporalAnalysis.py:7-18`);
its dashboard time-series silently skip empty buckets and it has no
rolling statistics at all. These are the two general forms a web-scale
events pipeline needs beyond the existing bucketing (events_per_minute),
sessionization (session_windows / stream twin) and as-of join
(events_asof_orders): a time-RANGE rolling aggregate and a dense
resample-with-carry-forward. Both shuffle the events relation ONCE on
user_id and do all per-key work in window passes.

Timestamps cross the engine boundary as epoch seconds/microseconds
(Spark ``unix_micros`` == DuckDB ``epoch_us``): exact BIGINTs, so the
driver's value hash cannot be bitten by timezone or formatting drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import dec, t

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, sql: str | None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


def _us(col: str) -> F.Column:
    """Epoch micros of a parquet TIMESTAMP_NTZ column. The session timezone
    is pinned UTC (session.py), so the NTZ→TZ cast is identity-in-UTC and
    equals DuckDB's ``epoch_us`` over the same naive value."""
    return F.unix_micros(F.col(col).cast("timestamp"))


# ---------------------------------------------------------------------------
# Rolling 1-hour mean per user — a RANGE frame over epoch seconds, so two
# events in the same second share an identical frame in both engines (row
# frames would tie-break by task order). The sum runs in DECIMAL so the
# windowed accumulation order cannot perturb the float result.
#
# Scale shape: one shuffle on user_id; the RANGE frame is evaluated by
# Spark's WindowExec with a sliding frame pointer (each row advances the
# frame bounds monotonically — O(n) per partition, not O(n·w)). No
# self-join against a time-bucketed copy (the signup_followon_1h shape) is
# needed because the frame is per-key contiguous.
ROLL_WINDOW_S = 3600


@q(
    "rolling_event_avg_1h",
    f"""
    WITH ev AS (
      SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec, value
      FROM events)
    SELECT event_id, user_id, sec,
           CAST(count(*) OVER w AS BIGINT) AS n_win,
           round(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                 / (count(*) OVER w), 6) AS avg_1h
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN {ROLL_WINDOW_S - 1} PRECEDING AND CURRENT ROW)
    """,
)
def rolling_event_avg_1h(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").select(
        "event_id",
        "user_id",
        (_us("ts") / F.lit(1000000)).cast("bigint").alias("sec"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-(ROLL_WINDOW_S - 1), Window.currentRow)
    )
    n = F.count("*").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "sec",
        n.cast("bigint").alias("n_win"),
        F.round(F.sum(dec("value")).over(w).cast("double") / n, 6).alias("avg_1h"),
    )


# ---------------------------------------------------------------------------
# Dense resample + LOCF gap fill: each user's activity re-gridded to a
# complete 1-hour lattice between their first and last event, with empty
# buckets emitted as n=0 and the last observed per-bucket mean carried
# forward. The dashboards the reference draws skip empty buckets entirely;
# a forecasting/feature pipeline needs the dense grid.
#
# Scale shape: the lattice is generated per user with `sequence` + explode
# (bounded by that user's own time span — no global calendar table, no
# cross join), left-joined to the per-bucket aggregate on the SAME
# (user_id, bucket) key the aggregate was shuffled by, then one LOCF
# window (last non-null ignoreNulls) per user. Three narrow stages, all
# keyed by user_id.
RESAMPLE_S = 3600


@q(
    "events_resample_locf",
    f"""
    WITH ev AS (
      SELECT user_id, (epoch_us(ts) // 1000000) // {RESAMPLE_S} AS bucket, value
      FROM events),
    agg AS (
      SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                   / count(*), 6) AS mean_value
      FROM ev GROUP BY 1, 2),
    span AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM ev GROUP BY 1),
    grid AS (
      SELECT user_id, g.bucket
      FROM span, unnest(generate_series(b0, b1)) AS g(bucket))
    SELECT g.user_id, g.bucket * {RESAMPLE_S} AS bucket_start_s,
           coalesce(a.n, 0) AS n,
           last_value(a.mean_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_mean
    FROM grid g LEFT JOIN agg a
      ON a.user_id = g.user_id AND a.bucket = g.bucket
    """,
)
def events_resample_locf(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").select(
        "user_id",
        ((_us("ts") / F.lit(1000000)).cast("bigint") / F.lit(RESAMPLE_S))
        .cast("bigint")
        .alias("bucket"),
        "value",
    )
    agg = ev.groupBy("user_id", "bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum(dec("value")).cast("double") / F.count("*"), 6).alias(
            "mean_value"
        ),
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select("user_id", F.explode(F.sequence("b0", "b1")).alias("bucket"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            (F.col("bucket") * RESAMPLE_S).alias("bucket_start_s"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.last("mean_value", ignorenulls=True).over(w).alias("locf_mean"),
        )
    )
