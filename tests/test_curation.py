"""Curation composition pass + IVF ANN (analytics/curation.py, similarity.py)."""

import duckdb
import pytest

from tests.conftest import SF_DIR
from twittercrawler_spark.analytics import ALL_ORACLES, ALL_QUERIES
from twittercrawler_spark.analytics.curation import CUR_MIN_TOKENS


def _long_en(core: str, n: int = CUR_MIN_TOKENS + 10) -> str:
    # passes both gates: enough tokens, and 'the' every other token keeps
    # stop_ratio (hence quality) high
    return " ".join(f"the {core}{i}" for i in range(n // 2 + 1))


def test_curation_pipeline_dirty_input(spark, tmp_path):
    """Exact duplicates collapse to one survivor, short / low-quality / non-en
    docs are gated out — verified against the DuckDB oracle on the SAME
    handmade dirty input (sf0.001+ has no exact dups, so this input is the
    only gate exercising the dedup stage end-to-end)."""
    dup_text = _long_en("dup")
    rows = [
        (1, dup_text, "en", "srcA", len(dup_text)),
        (2, dup_text, "en", "srcA", len(dup_text)),  # exact duplicate of 1
        (3, dup_text, "en", "srcB", len(dup_text)),  # duplicate across sources
        (4, _long_en("uniq"), "en", "srcA", 10),
        (5, "the short one", "en", "srcA", 13),  # under the token gate
        (6, "zzz " * 60, "en", "srcB", 240),  # low quality: one repeated token
        (7, _long_en("de"), "de", "srcA", 10),  # language-gated out
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, cols).coalesce(1).write.parquet(path)

    got = {
        r["source"]: r.asDict()
        for r in ALL_QUERIES["curation_pipeline"](spark, str(tmp_path)).collect()
    }
    # srcA: candidates 1,2,4,5,6(no:srcB),7(no) -> en srcA = 1,2,4,5; kept = min-id dup (1) + 4
    assert got["srcA"]["n_candidates"] == 4
    assert got["srcA"]["n_kept"] == 2
    # srcB: en candidates 3,6; doc 3's text canon is doc 1 -> dropped; 6 low quality
    assert got["srcB"]["n_candidates"] == 2
    assert got["srcB"]["n_kept"] == 0

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    oracle = {
        r[0]: r for r in con.execute(ALL_ORACLES["curation_pipeline"]).fetchall()
    }
    for src, row in got.items():
        o = oracle[src]
        assert (
            row["n_candidates"], row["n_kept"], row["n_tokens_kept"]
        ) == (o[1], o[2], o[3]), src
        if o[4] is None:
            assert row["avg_quality_kept"] is None
        else:
            assert row["avg_quality_kept"] == pytest.approx(o[4], abs=1e-6)


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=4 over ~sqrt(n) cells must recover a meaningful slice
    of the exact top-k (recall measured 0.34 at sf0.001; bound set at half),
    and every pair it does return carries the exact brute-force cosine."""
    knn = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ALL_QUERIES["knn_bruteforce"](spark, SF_DIR).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ALL_QUERIES["ann_ivf"](spark, SF_DIR).collect()
    }
    hits = set(knn) & set(ivf)
    assert len(hits) / len(knn) >= 0.15
    for pair in hits:
        assert ivf[pair] == knn[pair], pair
    # the refined index (2 Lloyd rounds, top-2 multi-assignment, nprobe=6)
    # must clear the flagship recall bar (measured 0.80 at sf0.001; bound
    # leaves margin for testdata regeneration)
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["ann_ivf_refined"](spark, SF_DIR).collect()
    }
    assert len(refined & set(knn)) / len(knn) >= 0.7


def test_ann_ivf_refined_recall_at_sf01(spark):
    """The sf0.1 recall pin (VERDICT r4 #5): the refined index's recall at
    the 2,000-vector corpus, where nprobe·A covers a smaller cell fraction
    than the deliberately generous sf0.001 fixture (A·nprobe/C ≈ 27% here
    vs ~100% there — the documented fixed-absolute-knob scale trade).
    Measured 0.74 (2026-08-21); bound 0.65 leaves testdata-regeneration
    margin. Every returned pair must carry the exact brute-force cosine."""
    sf01 = "/root/testdata/sf0.1"
    import os

    if not os.path.isdir(sf01):  # driver boxes always have it; be explicit
        import pytest as _pytest

        _pytest.skip("sf0.1 testdata not present")
    knn = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ALL_QUERIES["knn_bruteforce"](spark, sf01).collect()
    }
    refined = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ALL_QUERIES["ann_ivf_refined"](spark, sf01).collect()
    }
    hits = set(knn) & set(refined)
    assert len(hits) / len(knn) >= 0.65
    for pair in hits:
        assert refined[pair] == knn[pair], pair


def test_shingle_dedup_catches_short_documents(spark, tmp_path):
    """Docs with < 3 tokens get their whole normalized text as the single
    shingle feature (both engines), so identical tweet-length docs are
    caught by the shingle-based dedup family — without the fallback they
    had NO features and could never pair."""
    rows = [
        (1, "hello world", "en", "s", 11),
        (2, "hello world", "en", "s", 11),   # identical 2-token doc
        (3, "hello", "en", "s", 5),          # identical 1-token doc
        (4, "hello", "en", "s", 5),
        (5, "totally different", "en", "s", 17),
        (6, " ", "en", "s", 1),              # whitespace-only: no feature
    ]
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.parquet(path)

    got = {
        (r["x"], r["y"])
        for r in ALL_QUERIES["dedup_minhash_lsh"](spark, str(tmp_path)).collect()
    }
    assert {(1, 2), (3, 4)} <= got
    sim = {
        (r["x"], r["y"])
        for r in ALL_QUERIES["dedup_simhash"](spark, str(tmp_path)).collect()
    }
    assert {(1, 2), (3, 4)} <= sim

    # oracle parity on the same dirty input
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = {(r[0], r[1]) for r in con.execute(ALL_ORACLES["dedup_minhash_lsh"]).fetchall()}
    assert got == want
    want_sim = {(r[0], r[1]) for r in con.execute(ALL_ORACLES["dedup_simhash"]).fetchall()}
    assert sim == want_sim


def test_pack_token_shards_plan_has_no_unpartitioned_window(spark):
    """No Window node in the packing plan may have an empty partition spec:
    at 10^10 documents a single-partition window is the job tail. The
    level-2 prefix sum is an intra super-group window + broadcast theta-join
    over the super-group totals precisely so this stays true (a constant
    partition key does NOT count — Catalyst folds it back to an empty spec
    and Spark warns at runtime)."""
    import re

    df = ALL_QUERIES["pack_token_shards"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan  # non-vacuous: the intra windows must be there
    for m in re.finditer(r"Window \[[^\]]*\](.*)", plan):
        rest = m.group(1)
        # physical Window prints: Window [exprs], [partitionSpec], [orderSpec]
        assert re.search(r",\s*\[[^\]]+\]\s*,", rest), (
            "unpartitioned Window in pack_token_shards plan:\n" + plan
        )
