"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-§3).

Seed=42, no wall clock, no external data. Same seed ⇒ byte-identical output
across runs and parallelism levels (FIXTURES.md invariant 1). Each row's
randomness derives only from ``(seed, page index)`` so generation order (and
chunking) cannot change content.

Shape matches BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
plus engine fixtures:
    seeds(url string, priority double)  — fixed order
    robots(host string, disallow_prefix string, crawl_delay int)

Skew: host index 0 ("hot.example.com") owns ~50% of pages; the rest follow a
Zipf(1.2)-ish tail (FIXTURES.md: exercises salting). URLs are deliberately
messy — mixed-case hosts, explicit default ports, fragments, unsorted query
strings — to exercise canonicalization. The ``text`` column is ground truth:
it is computed with the SAME pure function the engine's pandas UDF applies,
and parity tests assert byte equality end-to-end through Spark.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.text import extract_text

_BASE_TS = dt.datetime(2023, 3, 1, 0, 0, 0)
_LANGS = ["tr", "en", "de"]

_WORDS = (
    "ankara izmir istanbul merkez secim sonuc haber data page crawl spark "
    "frontier queue politeness robots budget shard partition bloom filter "
    "hash link anchor body title sample text corpus document web host"
).split()


def _host_name(h: int) -> str:
    return "hot.example.com" if h == 0 else f"site{h}.example.org"


def _messy_host(h: int, rng: random.Random) -> str:
    """Raw (pre-canonicalization) spelling of the host."""
    name = _host_name(h)
    style = rng.randrange(4)
    if style == 0:
        return name.upper()
    if style == 1:
        return name.title()
    if style == 2:
        return name + (":80" if rng.random() < 0.5 else "")
    return name


def _host_assignment(n_pages: int, n_hosts: int, seed: int) -> np.ndarray:
    """Deterministic host index per page: ~50% host 0, Zipf(1.2) tail."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n_pages) < 0.5
    tail = 1.0 / np.power(np.arange(1, n_hosts), 1.2)
    tail /= tail.sum()
    idx = rng.choice(np.arange(1, n_hosts), size=n_pages, p=tail)
    return np.where(hot, 0, idx)


def _page_url_raw(h: int, i: int, rng: random.Random) -> str:
    """Messy raw URL for page i on host h."""
    host = _messy_host(h, rng)
    url = f"http://{host}/p/{i}"
    r = rng.random()
    if r < 0.25:
        url += "?b=2&a=1"
    elif r < 0.35:
        url += "?x=9"
    if rng.random() < 0.2:
        url += "#frag"
    return url


def generate_corpus(
    out_dir: str,
    n_pages: int = 2000,
    n_hosts: int = 50,
    n_seeds: int = 10,
    links_per_page: int = 4,
    seed: int = 42,
    chunk_rows: int = 50_000,
    words_per_page: int = 12,
    n_files: int = 1,
) -> dict[str, str]:
    """Write pages/seeds/robots parquet under ``out_dir``; return paths.

    ``n_files > 1`` writes the pages table as a directory of part files so
    Spark gets real input-split parallelism (one ~35 MB file has too few row
    groups to feed 32 cores). Row content depends only on (seed, page index),
    so the file layout never changes the data.
    """
    os.makedirs(out_dir, exist_ok=True)
    hosts = _host_assignment(n_pages, n_hosts, seed)

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    pages_path = os.path.join(out_dir, "pages.parquet")
    if n_files > 1:
        os.makedirs(pages_path, exist_ok=True)
        chunk_rows = max(1, -(-n_pages // n_files))
        writer = None
    else:
        writer = pq.ParquetWriter(pages_path, schema)
    for file_idx, lo in enumerate(range(0, n_pages, chunk_rows)):
        hi = min(lo + chunk_rows, n_pages)
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for i in range(lo, hi):
            h = int(hosts[i])
            rng = random.Random(f"{seed}:{i}")
            url = _page_url_raw(h, i, rng)
            # body paragraphs with \n/\r/\t/double-space runs (FIXTURES.md)
            words = rng.choices(_WORDS, k=words_per_page)
            half = words_per_page // 2
            para1 = " ".join(words[:half]) + "\nline2\ttabbed  double " + words[half]
            para2 = " ".join(words[half + 1 :]) + "\r\ncrlf &amp; amp &lt;tag&gt;"
            # deterministic out-links into the URL graph
            n_links = rng.randrange(1, links_per_page + 1)
            link_targets = [rng.randrange(n_pages) for _ in range(n_links)]
            anchors = []
            for t in link_targets:
                th = int(hosts[t])
                trng = random.Random(f"{seed}:{t}")
                turl = _page_url_raw(th, t, trng)
                if rng.random() < 0.3:
                    # relative href to exercise urljoin resolution
                    anchors.append(f'<a href="/p/{t}">rel{t}</a>')
                else:
                    anchors.append(f'<a href="{turl}">abs{t}</a>')
            html = (
                f"<html><head><title>Page {i} on {_host_name(h)}</title>"
                f"<script>var x={i};</script><style>p{{color:red}}</style></head>"
                f"<body><h1>Doc {i}</h1><p>{para1}</p><p>{para2}</p>"
                f"{''.join(anchors)}</body></html>"
            )
            urls.append(url)
            tss.append(_BASE_TS + dt.timedelta(seconds=i))
            htmls.append(html.encode("utf-8"))
            texts.append(extract_text(html))
            langs.append(_LANGS[h % 3])
        tbl = pa.table(
            {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs},
            schema=schema,
        )
        if writer is None:
            pq.write_table(tbl, os.path.join(pages_path, f"part-{file_idx:05d}.parquet"))
        else:
            writer.write_table(tbl)
    if writer is not None:
        writer.close()

    # seeds: first page of the n_seeds lowest-indexed distinct hosts, fixed
    # order, descending priority (analog of the fixed topic list order,
    # reference pages/Crawler.py:70,199-203)
    seen_hosts: dict[int, int] = {}
    for i in range(n_pages):
        h = int(hosts[i])
        if h not in seen_hosts:
            seen_hosts[h] = i
        if len(seen_hosts) >= n_seeds:
            break
    seed_urls, seed_prios = [], []
    for rank, (h, i) in enumerate(sorted(seen_hosts.items())[:n_seeds]):
        rng = random.Random(f"{seed}:{i}")
        seed_urls.append(_page_url_raw(h, i, rng))
        seed_prios.append(float(100 - rank))
    seeds_path = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(
        pa.table({"url": seed_urls, "priority": seed_prios}),
        seeds_path,
    )

    # robots: every 7th host disallows the /p/1 prefix (so /p/1, /p/1x,
    # /p/1xx... are gated — a real prefix rule, not an exact match), and
    # the hot host plus every 5th host declare a crawl-delay (the delay
    # rows carry a NULL prefix: startswith(NULL) is NULL, so they never
    # gate; the prefix rows carry a NULL delay)
    r_hosts, r_prefixes, r_delays = [], [], []
    for h in range(n_hosts):
        if h % 7 == 3:
            r_hosts.append(_host_name(h))
            r_prefixes.append("/p/1")
            r_delays.append(None)
        if h == 0 or h % 5 == 2:
            r_hosts.append(_host_name(h))
            r_prefixes.append(None)
            r_delays.append(2 + (h % 3))
    robots_path = os.path.join(out_dir, "robots.parquet")
    pq.write_table(
        pa.table({
            "host": pa.array(r_hosts, pa.string()),
            "disallow_prefix": pa.array(r_prefixes, pa.string()),
            "crawl_delay": pa.array(r_delays, pa.int32()),
        }),
        robots_path,
    )
    return {"pages": pages_path, "seeds": seeds_path, "robots": robots_path}
