"""Parity at a politeness-pressure scale: more hosts, more rounds, a
budget small enough that the hot host (≈50% of the corpus) stays
backlogged the whole run.

The module-scoped suite in test_crawl_parity.py proves the three
contracts on a 400-page / 12-host / 4-round corpus. This run stresses the
parts of the engine whose bugs only show under pressure: the per-host
politeness quota enforced over MANY rounds (the hot host must be throttled
to exactly per_host_per_round fetches every round while the priority-decay
re-ranking churns beneath it), the two-phase top-k under real host skew,
and the seen-set as it grows across 6 incremental Bloom-sidecar updates.
Assertions are the same byte-exact contracts: identical fetch order,
identical final seen membership, identical extracted-text bytes.
"""

import hashlib

import pytest

from twittercrawler_spark.frontier.crawl import fetch_log, run_crawl
from twittercrawler_spark.frontier.simulator import CrawlConfig, simulate

from tests.test_crawl_parity import _load_sim_inputs

CFG = CrawlConfig(per_host_per_round=3, rounds=6, priority_decay=0.8, num_buckets=16)


@pytest.fixture(scope="module")
def big_corpus_dir(tmp_path_factory):
    from twittercrawler_spark.sources.corpus import generate_corpus

    d = tmp_path_factory.mktemp("corpus_big")
    generate_corpus(str(d), n_pages=5000, n_hosts=120, n_seeds=8, seed=7)
    return str(d)


@pytest.fixture(scope="module")
def outputs(spark, big_corpus_dir, tmp_path_factory):
    wh_dir = str(tmp_path_factory.mktemp("warehouse_big"))
    wh = run_crawl(
        spark,
        wh_dir,
        f"{big_corpus_dir}/pages.parquet",
        f"{big_corpus_dir}/seeds.parquet",
        f"{big_corpus_dir}/robots.parquet",
        CFG,
    )
    pages, seeds, robots = _load_sim_inputs(big_corpus_dir)
    sim = simulate(pages, seeds, robots, CFG)
    return spark, wh, sim


def test_fetch_order_parity_at_scale(outputs):
    spark, wh, sim = outputs
    eng = [
        (r["round"], r["seq"], r["url"], r["host"])
        for r in fetch_log(spark, wh).select("round", "seq", "url", "host").collect()
    ]
    ref = [(r["round"], r["seq"], r["url"], r["host"]) for r in sim.fetch_log]
    assert len(eng) >= CFG.rounds * CFG.per_host_per_round  # multi-round run
    assert eng == ref


def test_politeness_budget_enforced_every_round(outputs):
    """No (round, host) may exceed the per-host quota, and the hot host
    must be AT the quota every round — i.e. the budget is actually binding
    under skew, not vacuously satisfied."""
    spark, wh, sim = outputs
    per = {}
    for r in fetch_log(spark, wh).select("round", "host").collect():
        per[(r["round"], r["host"])] = per.get((r["round"], r["host"]), 0) + 1
    assert max(per.values()) <= CFG.per_host_per_round
    # round 1 fetches only the hot host's single seed; from round 2 on its
    # discovered backlog keeps the quota binding every round
    hot_rounds = {rnd: n for (rnd, h), n in per.items() if h == "hot.example.com"}
    assert set(hot_rounds) == set(range(1, CFG.rounds + 1))
    assert all(
        hot_rounds[rnd] == CFG.per_host_per_round
        for rnd in range(2, CFG.rounds + 1)
    )


def test_seen_set_parity_at_scale(outputs):
    spark, wh, sim = outputs
    eng_seen = {r["url"] for r in wh.read(spark, "seen").select("url").collect()}
    assert eng_seen == sim.seen


def test_text_md5_parity_at_scale(outputs):
    """Byte parity via per-url md5 (hash computed Spark-side, reference
    hashes computed locally) — same contract as the small suite without
    shipping every text body through collect."""
    from pyspark.sql import functions as F

    spark, wh, sim = outputs
    eng = {
        r["url"]: r["h"]
        for r in fetch_log(spark, wh)
        .select("url", F.md5(F.col("text").cast("binary")).alias("h"))
        .collect()
    }
    ref = {
        r["url"]: (
            None
            if r["text"] is None
            else hashlib.md5(r["text"].encode("utf-8")).hexdigest()
        )
        for r in sim.fetch_log
    }
    assert eng == ref
