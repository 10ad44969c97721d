"""Structured Streaming ≡ batch on the same input (SURVEY.md §2.9).

The streaming windowed aggregation and the stateful sessionizer must agree
with their batch twins — the exactly-once contract a production run relies
on. File source + availableNow trigger drains the fixture and stops.
"""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from twittercrawler_spark.streaming.windows import (
    SESSION_GAP_SECONDS,
    batch_minute_counts,
    stream_minute_counts,
    stream_sessionize,
)

def drain(q, timeout=240):
    """Wait until the availableNow query has consumed its backlog, then stop.

    availableNow queries don't always self-terminate promptly with a memory
    sink; polling status avoids burning the whole awaitTermination budget.
    """
    import time

    t0 = time.time()
    while q.isActive and time.time() - t0 < timeout:
        s = q.status
        if not s["isDataAvailable"] and not s["isTriggerActive"] and q.lastProgress:
            break
        time.sleep(1)
    if q.isActive:
        q.stop()
    q.awaitTermination(60)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-source streams need a DIRECTORY; stage the fixture file into one."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "part-0.parquet")
    return str(d)


def test_stream_minute_counts_equals_batch(spark, tmp_path, events_dir):
    q = stream_minute_counts(spark, events_dir, str(tmp_path / "ckpt"), "mcounts")
    drain(q)
    got = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in spark.table("mcounts").collect()
    }
    want = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in batch_minute_counts(spark, events_dir).collect()
    }
    assert len(got) > 0
    assert got == want


def test_stream_sessionize_closed_sessions_match_batch(spark, tmp_path, events_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    q = stream_sessionize(spark, events_dir, str(tmp_path / "ckpt2"), "sessions")
    drain(q)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.table("sessions").collect()
    }

    # batch oracle: same gap rule; the stream (availableNow) never flushes
    # each user's final OPEN session, so compare closed sessions only
    e = spark.read.parquet(events_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | (us - prev > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0)
    sessions = (
        e.withColumn(
            "sess_id",
            F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    last = sessions.groupBy("user_id").agg(F.max("sess_id").alias("last_id"))
    key = lambda r: (r["user_id"], r["session_start"], r["session_end"])  # noqa: E731
    all_sessions = {key(r): r["n_events"] for r in sessions.join(last, "user_id").collect()}
    closed = {
        key(r): r["n_events"]
        for r in sessions.join(last, "user_id")
        .filter(F.col("sess_id") != F.col("last_id"))
        .collect()
    }
    # every CLOSED session must be streamed exactly; each user's final open
    # session may or may not have been flushed by the processing-time
    # timeout before availableNow drained — so: closed ⊆ got ⊆ all
    assert len(closed) > 0
    assert set(closed.items()) <= set(got.items())
    assert set(got.items()) <= set(all_sessions.items())


@pytest.mark.parametrize("name", ["session_windows"])
def test_batch_twin_registered(name):
    from twittercrawler_spark.analytics import ALL_ORACLES, ALL_QUERIES

    assert name in ALL_QUERIES and name in ALL_ORACLES


def test_append_mode_watermark_drops_late_rows(spark, tmp_path):
    """The production (append-mode) contract: a window is emitted exactly
    once after the watermark passes it, its state is evicted, and a row
    arriving later for that window is dropped — bounded state, principled
    late-data story."""
    import os as _os
    import time as _time

    from twittercrawler_spark.streaming.windows import stream_minute_counts_append

    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late_events"
    d.mkdir()

    def write(name, stamps):
        tbl = pa.table(
            {"ts": pa.array([dt.datetime(2023, 3, 1, *s) for s in stamps],
                            type=pa.timestamp("us"))}
        )
        pq.write_table(tbl, str(d / name))

    # file 1 establishes max event time 11:00 → watermark 10:50; file 2's
    # on-time row advances the watermark and FINALIZES the 10:00 window
    # (append emits it, state evicted); file 3's 10:00:30 row arrives after
    # finalization → guaranteed drop. (The watermark is a lower bound: a
    # late row landing in the same batch that finalizes its window may still
    # be absorbed — the guarantee attaches at emission, hence three files.)
    write("f1.parquet", [(10, 0, 0), (11, 0, 0)])
    write("f2.parquet", [(11, 2, 0)])
    write("f3.parquet", [(10, 0, 30), (11, 3, 0)])
    # force file-source ordering: strictly increasing mtimes
    now = _time.time()
    for i, fn in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        _os.utime(str(d / fn), (now - 300 + i * 100, now - 300 + i * 100))

    q = stream_minute_counts_append(spark, str(d), str(tmp_path / "ck"), "late_wm")
    drain(q)
    rows = spark.table("late_wm").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(str(r["bucket"]), []).append(r["n"])
    # the 10:00 window finalized with n=1 when the watermark (10:50) passed
    # it; the late 10:00:30 row was dropped, never bumping it to 2
    assert by_bucket == {"2023-03-01 10:00:00": [1]}, by_bucket
    # and the state operator recorded the watermark-drop
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped >= 1, [p["stateOperators"] for p in q.recentProgress]


def test_stream_dedup_exact_one_survivor_per_hash(spark, tmp_path):
    """Streaming dedup keeps exactly one survivor per distinct content hash
    across micro-batches (duplicates split across files so state must carry
    between batches), each survivor a member of its hash group."""
    from twittercrawler_spark.streaming.windows import stream_dedup_exact

    rows_by_file = [
        [(1, "alpha text"), (2, "beta text")],
        [(3, "alpha text"), (4, "gamma text")],   # dup of file-0 content
        [(5, "beta text"), (6, "alpha text")],    # dups of both earlier files
    ]
    d = tmp_path / "docs_stream"
    d.mkdir()
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(
            str(d / f"f{i}.parquet")
        )
    # file-source needs a flat dir of files; stage the parts
    import glob
    import shutil

    flat = tmp_path / "docs_flat"
    flat.mkdir()
    for i, part in enumerate(sorted(glob.glob(str(d / "f*" / "*.parquet")))):
        shutil.copy(part, flat / f"part-{i}.parquet")

    q = stream_dedup_exact(spark, str(flat), str(tmp_path / "ck_dd"), "dd_stream")
    drain(q)
    out = spark.table("dd_stream").collect()
    groups = {"alpha text": {1, 3, 6}, "beta text": {2, 5}, "gamma text": {4}}
    assert len(out) == 3  # one survivor per distinct content
    for r in out:
        assert r["doc_id"] in groups[r["text"]]
    assert {r["text"] for r in out} == set(groups)


def test_stream_curation_matches_batch_gate(spark, tmp_path):
    """Streaming curation emits exactly the batch gate's survivors: every
    emitted row passes lang/token/quality gates with feature values equal to
    the batch formula (DuckDB-computed), one survivor per content hash, and
    the emitted hash set equals the batch-gated hash set (duplicates split
    across micro-batch files so dedup state must carry between batches)."""
    import duckdb

    from twittercrawler_spark.streaming.windows import stream_curation
    from twittercrawler_spark.analytics.curation import (
        CUR_LANG,
        CUR_MIN_QUALITY,
        CUR_MIN_TOKENS,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flat = tmp_path / "docs_flat"
    flat.mkdir()
    # 3 files -> 3 micro-batches (maxFilesPerTrigger=1); duplicate an en doc
    # into a LATER file so the cross-batch dedup state is exercised
    parts = src.randomSplit([1.0, 1.0, 1.0], seed=7)
    dup = src.filter(F.col("lang") == CUR_LANG).orderBy("doc_id").limit(1)
    parts[2] = parts[2].unionByName(
        dup.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    import glob
    import shutil

    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(tmp_path / f"f{i}.parquet"))
        part = glob.glob(str(tmp_path / f"f{i}.parquet" / "*.parquet"))[0]
        shutil.copy(part, flat / f"part-{i}.parquet")

    q = stream_curation(spark, str(flat), str(tmp_path / "ck_cur"), "cur_stream")
    drain(q)
    out = spark.table("cur_stream").toPandas()

    gated = duckdb.sql(
        f"""
        WITH cand AS (
          SELECT doc_id, text FROM read_parquet('{flat}/*.parquet')
          WHERE lang = '{CUR_LANG}'),
        tok AS (
          SELECT doc_id, tk FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tk
            FROM cand) u
          WHERE tk <> ''),
        feat AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 round(0.5 * (CAST(count(DISTINCT tk) AS DOUBLE) / count(*)) +
                       0.5 * (CAST(sum(CASE WHEN tk IN ('the','a','of','and')
                                            THEN 1 ELSE 0 END) AS DOUBLE)
                              / count(*)), 6) AS quality
          FROM tok GROUP BY 1)
        SELECT c.doc_id, md5(c.text) AS hh, f.n_tokens, f.quality
        FROM cand c JOIN feat f USING (doc_id)
        WHERE f.n_tokens >= {CUR_MIN_TOKENS} AND f.quality >= {CUR_MIN_QUALITY}
        """
    ).df()

    # one survivor per hash; hash sets equal
    assert out["hh"].is_unique
    assert set(out["hh"]) == set(gated["hh"])
    # survivors are members of their gated group with batch-identical features
    merged = out.merge(gated, on=["doc_id", "hh"], suffixes=("_s", "_b"))
    assert len(merged) == len(out)
    assert (merged["n_tokens_s"] == merged["n_tokens_b"]).all()
    assert (abs(merged["quality_s"] - merged["quality_b"]) < 1e-9).all()
    # the injected cross-batch duplicate did NOT survive twice
    assert (out["doc_id"] < 1_000_000).all()


def test_stream_followon_join_matches_batch_pairs(spark, tmp_path):
    """The watermarked stream-stream range join emits exactly the batch
    inner range join's (signup, follow-on) pair set, with matching rows
    deliberately split across micro-batches so the join state must buffer
    one side until the partner arrives, and boundary rows prove the strict
    `>` / inclusive `<= +1h` range ends."""
    import datetime as dt

    from twittercrawler_spark.streaming.windows import stream_followon_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def row(eid, ts_min, uid, etype, value=1.0):
        return (eid, t0 + dt.timedelta(minutes=ts_min), uid, etype, value, "{}")

    # file 0: signups; file 1: some follows; file 2: cross-batch follows
    rows_by_file = [
        [row(1, 0, 10, "signup"), row(2, 120, 10, "signup"),
         row(3, 0, 20, "signup")],
        [row(4, 30, 10, "click"),      # match signup 1
         row(5, 61, 10, "click"),      # 61 min: out of range for signup 1
         row(6, 0, 20, "click")],      # equal ts: strict > excludes
        [row(7, 60, 10, "view"),       # exactly +1h: inclusive end, match 1
         row(8, 150, 10, "view"),      # match signup 2
         row(9, 45, 20, "view")],      # match signup 3
    ]
    cols = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    d = tmp_path / "ev_parts"
    d.mkdir()
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            str(d / f"f{i}.parquet")
        )
    import glob
    import shutil

    flat = tmp_path / "ev_flat"
    flat.mkdir()
    for i, part in enumerate(sorted(glob.glob(str(d / "f*" / "*.parquet")))):
        shutil.copy(part, flat / f"part-{i}.parquet")

    q = stream_followon_join(spark, str(flat), str(tmp_path / "ck_ssj"), "ssj_stream")
    drain(q)
    got = {(r["s_id"], r["e_id"]) for r in spark.table("ssj_stream").collect()}

    # batch truth, computed directly from the fixture rows
    allr = [r for rows in rows_by_file for r in rows]
    signups = [r for r in allr if r[3] == "signup"]
    expected = {
        (s[0], e[0])
        for s in signups
        for e in allr
        if e[2] == s[2]
        and e[1] > s[1]
        and e[1] <= s[1] + dt.timedelta(hours=1)
    }
    assert expected == {(1, 4), (1, 7), (2, 8), (3, 9)}  # fixture sanity
    assert got == expected


def test_stream_dedup_survives_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart exactly-once: drain a backlog, STOP the query, add
    late files (duplicating pre-stop content), start a NEW query on the
    same checkpoint. The durable sink must hold exactly one survivor per
    distinct content across both invocations — pre-stop hashes stay
    deduplicated after the restart (state recovered from checkpoint) and
    pre-stop files are not re-emitted (source progress recovered)."""
    from twittercrawler_spark.streaming.windows import stream_dedup_to_files

    flat = tmp_path / "docs"
    flat.mkdir()

    def put(i, rows):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"stage{i}"))
        import glob
        import shutil

        for j, part in enumerate(
            glob.glob(str(tmp_path / f"stage{i}" / "*.parquet"))
        ):
            shutil.copy(part, flat / f"part-{i}-{j}.parquet")

    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    put(0, [(1, "alpha"), (2, "beta")])
    put(1, [(3, "alpha"), (4, "gamma")])
    q1 = stream_dedup_to_files(spark, str(flat), ck, out)
    drain(q1)
    phase1 = {r["text"]: r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert set(phase1) == {"alpha", "beta", "gamma"}

    # late arrivals: dups of phase-1 content plus genuinely new content
    put(2, [(5, "beta"), (6, "delta")])
    put(3, [(7, "alpha"), (8, "delta")])
    q2 = stream_dedup_to_files(spark, str(flat), ck, out)
    drain(q2)
    rows = spark.read.parquet(out).collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    # exactly one survivor per distinct content across the restart
    assert {t: len(v) for t, v in by_text.items()} == {
        "alpha": 1, "beta": 1, "gamma": 1, "delta": 1,
    }
    # pre-stop survivors unchanged (no re-emission of old files)
    assert by_text["alpha"] == [phase1["alpha"]]
    assert by_text["beta"] == [phase1["beta"]]
    assert by_text["gamma"] == [phase1["gamma"]]
    assert by_text["delta"][0] in (6, 8)
