"""Bloom prefilter + exact anti-join seen-set (frontier/seen.py)."""

import numpy as np

from twittercrawler_spark.frontier.seen import NumpyBloom, build_bloom_sidecar, filter_unseen


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**60, size=5000, dtype=np.int64)
    bloom = NumpyBloom.sized_for(len(keys), fpp=0.01)
    bloom.add(keys)
    assert bloom.maybe_contains(keys).all()


def test_bloom_fpp_bounded():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**60, size=5000, dtype=np.int64)
    others = rng.integers(0, 2**60, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, keys)
    bloom = NumpyBloom.sized_for(len(keys), fpp=0.01)
    bloom.add(keys)
    fp = bloom.maybe_contains(others).mean()
    assert fp < 0.03, fp


def test_bloom_roundtrip_bytes():
    keys = np.arange(100, dtype=np.int64) * 1_000_003
    bloom = NumpyBloom.sized_for(100)
    bloom.add(keys)
    clone = NumpyBloom.from_bytes(bloom.m, bloom.k, bloom.to_bytes())
    assert clone.maybe_contains(keys).all()


def test_filter_unseen_exact(spark):
    from twittercrawler_spark.functions.urls import url_hash64

    def row(u):
        return (u, url_hash64(u), url_hash64(u) % 4)

    seen_urls = [f"http://h{i % 5}.com/p/{i}" for i in range(0, 200, 2)]
    cand_urls = [f"http://h{i % 5}.com/p/{i}" for i in range(150, 250)]
    seen = spark.createDataFrame([row(u) for u in seen_urls], ["url", "url_hash", "host_bucket"])
    cands = spark.createDataFrame([row(u) for u in cand_urls], ["url", "url_hash", "host_bucket"])
    sidecar = build_bloom_sidecar(seen)
    got = {r["url"] for r in filter_unseen(spark, cands, seen, sidecar).collect()}
    expected = set(cand_urls) - set(seen_urls)
    assert got == expected

    # degenerate paths
    got2 = {r["url"] for r in filter_unseen(spark, cands, seen, None).collect()}
    assert got2 == expected
    got3 = {r["url"] for r in filter_unseen(spark, cands, None, None).collect()}
    assert got3 == set(cand_urls)
