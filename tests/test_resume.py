"""Checkpoint/resume: a run interrupted mid-crawl resumes to the identical
final state (SURVEY.md §5.3) — the stronger replacement for the reference's
saving_period flush (pages/Crawler.py:51-52,127-146)."""

import shutil

import pytest

from twittercrawler_spark.frontier.crawl import fetch_log, run_crawl, run_round
from twittercrawler_spark.frontier.simulator import CrawlConfig
from twittercrawler_spark.sources.tables import Warehouse

CFG = CrawlConfig(per_host_per_round=2, rounds=4, num_buckets=8)


def _final_state(spark, wh):
    log = [
        (r["round"], r["seq"], r["url"]) for r in fetch_log(spark, wh).collect()
    ]
    seen = sorted(r["url"] for r in wh.read(spark, "seen").collect())
    return log, seen


def test_resume_equals_uninterrupted(spark, corpus_dir, tmp_path):
    paths = [f"{corpus_dir}/{n}.parquet" for n in ("pages", "seeds", "robots")]

    # uninterrupted run
    wh_full = run_crawl(spark, str(tmp_path / "full"), *paths, CFG)
    full_state = _final_state(spark, wh_full)

    # interrupted: run only 2 of 4 rounds, then resume via run_crawl
    part_cfg = CrawlConfig(**{**CFG.__dict__, "rounds": 2})
    wh_dir = str(tmp_path / "resumed")
    run_crawl(spark, wh_dir, *paths, part_cfg)
    wh_resumed = run_crawl(spark, wh_dir, *paths, CFG)
    assert _final_state(spark, wh_resumed) == full_state


def test_uncommitted_round_is_invisible_and_rerun(spark, corpus_dir, tmp_path):
    """Simulate a crash after data write but before commit: orphan round dirs
    are invisible; re-running the round overwrites them and converges."""
    paths = [f"{corpus_dir}/{n}.parquet" for n in ("pages", "seeds", "robots")]
    wh_dir = str(tmp_path / "crashy")
    cfg2 = CrawlConfig(**{**CFG.__dict__, "rounds": 2})
    wh = run_crawl(spark, wh_dir, *paths, cfg2)
    assert wh.last_round() == 2

    # "crash" while writing round 3: data present, commit absent
    run_round(spark, wh, CFG, 3)
    manifest_rounds = wh.committed_rounds()
    wh_crashed = Warehouse(wh_dir)
    # roll back the manifest to simulate dying before commit(3)
    import json, os

    m = wh_crashed._load_manifest()
    m["rounds"] = [r for r in m["rounds"] if r["round"] <= 2]
    with open(wh_crashed._manifest_path, "w") as f:
        json.dump(m, f)
    assert wh_crashed.last_round() == 2
    assert wh_crashed.read(spark, "fetch_log").filter("round = 3").count() == 0

    # resume re-runs round 3 and 4; compare with clean run
    wh_resumed = run_crawl(spark, wh_dir, *paths, CFG)
    wh_clean = run_crawl(spark, str(tmp_path / "clean"), *paths, CFG)
    assert _final_state(spark, wh_resumed) == _final_state(spark, wh_clean)


def test_main_path_failure_joins_sidecar_thread_and_aborts_round(
    spark, corpus_dir, tmp_path
):
    """A failure on the round's main path must propagate promptly (bounded
    join of the overlapped seen+sidecar thread), and the failed round must
    stay INVISIBLE — resume re-runs it cleanly (atomic commit contract)."""
    import time as _time

    import pytest

    from twittercrawler_spark.frontier.crawl import run_crawl, run_round
    from twittercrawler_spark.frontier.simulator import CrawlConfig
    from twittercrawler_spark.sources.tables import Warehouse

    cfg = CrawlConfig(per_host_per_round=2, rounds=1, num_buckets=8)
    paths = [f"{corpus_dir}/{n}.parquet" for n in ("pages", "seeds", "robots")]
    wh = run_crawl(spark, str(tmp_path / "wh"), *paths, cfg)
    assert wh.last_round() == 1

    orig_write = Warehouse.write

    def failing_write(self, name, df, rnd, **kw):
        if name == "fetch_log":
            raise RuntimeError("injected fetch_log failure")
        return orig_write(self, name, df, rnd, **kw)

    Warehouse.write = failing_write
    try:
        t0 = _time.time()
        with pytest.raises(RuntimeError, match="injected fetch_log failure"):
            run_round(spark, wh, cfg, 2)
        assert _time.time() - t0 < 120, "failure path must not hang on the thread"
    finally:
        Warehouse.write = orig_write
    assert wh.last_round() == 1  # round 2 never became visible

    # exact resume: the crashed round re-runs from committed state
    cfg2 = CrawlConfig(per_host_per_round=2, rounds=2, num_buckets=8)
    wh2 = run_crawl(spark, str(tmp_path / "wh"), *paths, cfg2)
    assert wh2.last_round() == 2
