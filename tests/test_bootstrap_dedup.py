"""Bootstrap's defensive canonical-URL dedup (frontier/crawl.py).

Two raw spellings that canonicalize identically must collapse to ONE
pages_canon row — the earliest (warc_ts, url_raw) — by a computed rule,
not task order. The dedup is probe-gated: a url-only scan finds the
collision set first, so clean corpora skip the dedup shuffle and small
collision sets are routed through a broadcast split; both that path and
the full-window fallback (collision set beyond broadcast scale) must
produce the same survivors.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from twittercrawler_spark.frontier import crawl
from twittercrawler_spark.frontier.simulator import CrawlConfig
from twittercrawler_spark.sources.tables import Warehouse

_TS = datetime.datetime(2024, 1, 1)


def _write(path, rows, cols):
    arrays = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
    types = {
        "url": pa.string(),
        "warc_ts": pa.timestamp("us"),
        "html": pa.binary(),
        "text": pa.string(),
        "lang": pa.string(),
        "priority": pa.float64(),
        "host": pa.string(),
        "disallow_prefix": pa.string(),
    }
    tbl = pa.table({c: pa.array(arrays[c], type=types[c]) for c in cols})
    pq.write_table(tbl, path)


def _corpus(tmp_path, collide: bool):
    ts = lambda s: _TS + datetime.timedelta(seconds=s)  # noqa: E731
    pages = [
        # collision group 1: three spellings of http://a.test/x — the
        # earliest warc_ts (20) wins regardless of row order
        ("HTTP://A.test:80/x#frag", ts(40), b"<p>late</p>", "late", "en"),
        ("http://a.test/x", ts(20), b"<p>win</p>", "win", "en"),
        ("http://A.TEST/x", ts(30), b"<p>mid</p>", "mid", "en"),
        # collision group 2: warc_ts TIE — url_raw ascii order breaks it
        ("http://b.test/y?b=2&a=1", ts(10), b"<p>q1</p>", "q1", "en"),
        ("http://b.test/y?a=1&b=2", ts(10), b"<p>q0</p>", "q0", "en"),
        # unique rows pass through untouched
        ("http://c.test/z", ts(5), b"<p>u1</p>", "u1", "en"),
        ("http://d.test/w", ts(6), b"<p>u2</p>", "u2", "en"),
    ]
    if not collide:
        pages = pages[1:2] + pages[4:]
    d = tmp_path
    _write(str(d / "pages.parquet"), pages, ["url", "warc_ts", "html", "text", "lang"])
    _write(str(d / "seeds.parquet"), [("http://a.test/x", 1.0)], ["url", "priority"])
    _write(str(d / "robots.parquet"), [("a.test", "/private")], ["host", "disallow_prefix"])
    return str(d)


def _bootstrap_pages(spark, tmp_path, sub: str, collide: bool):
    d = _corpus(tmp_path, collide)
    wh = Warehouse(str(tmp_path / f"wh_{sub}"))
    crawl.bootstrap(
        spark,
        wh,
        f"{d}/pages.parquet",
        f"{d}/seeds.parquet",
        f"{d}/robots.parquet",
        CrawlConfig(num_buckets=4, rounds=1),
    )
    rows = wh.read_round(spark, "pages_canon", 0).select("url", "text").collect()
    return {r["url"]: r["text"] for r in rows}


EXPECT = {
    "http://a.test/x": "win",  # earliest warc_ts of group 1
    "http://b.test/y?a=1&b=2": "q0",  # warc_ts tie -> lowest url_raw
    "http://c.test/z": "u1",
    "http://d.test/w": "u2",
}


def test_broadcast_split_path(spark, tmp_path):
    assert _bootstrap_pages(spark, tmp_path, "bc", collide=True) == EXPECT


def test_window_fallback_path(spark, tmp_path, monkeypatch):
    """Collision set 'beyond broadcast scale' (limit forced to 0): the
    full-corpus window fallback must pick the same survivors."""
    monkeypatch.setattr(crawl, "_DUP_BROADCAST_LIMIT", 0)
    assert _bootstrap_pages(spark, tmp_path, "win", collide=True) == EXPECT


def test_clean_corpus_skips_dedup(spark, tmp_path):
    """No collisions: every canonical row survives (dedup shuffle skipped)."""
    got = _bootstrap_pages(spark, tmp_path, "clean", collide=False)
    assert got == EXPECT


@pytest.mark.parametrize("collide", [True, False])
def test_no_duplicate_canonical_urls(spark, tmp_path, collide):
    d = _corpus(tmp_path, collide)
    from twittercrawler_spark.functions.urls import canonicalize_url

    import duckdb

    raw = duckdb.sql(f"SELECT url FROM '{d}/pages.parquet'").fetchall()
    canon = [canonicalize_url(u) for (u,) in raw]
    assert (len(set(canon)) < len(canon)) == collide
