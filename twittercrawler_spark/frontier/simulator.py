"""Pure-Python crawl simulator — the parity oracle (SURVEY.md §5.1).

A faithful sequential implementation of the crawl semantics, sharing the
EXACT same scalar functions (canonicalize_url, url_hash64, extract_text,
extract_links) with the Spark engine. The engine's distributed output
(fetch order, seen-set membership, extracted text bytes) must equal this
simulator's on the same seeds + budget — that is the graft analog of
reproducing the reference crawler's ordering/membership
(pages/Crawler.py:53-153) under its politeness budget.

Semantics (the single normative spec, mirrored by frontier/crawl.py):

* seeds are canonicalized; duplicate canonical seeds keep max priority;
* per round: pending frontier → robots gate (drop urls whose path starts
  with any disallow_prefix for the host; gated = permanently removed) →
  per-host top-k by (priority desc, url_hash asc, url asc) → global order
  (host asc, within-host order) with consecutive seq → fetch (lookup in the
  pages corpus by canonical url; miss = status "missing") → all ATTEMPTED
  urls enter the seen set → out-links canonicalized against the page url,
  child priority = parent priority × decay, per-url max across parents,
  dropped if in seen or already pending, else added with
  discovered_round = current round;
* stop after ``rounds`` rounds or when the frontier is empty.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.text import extract_links, extract_text
from ..functions.urls import canonicalize_url, host_of, url_hash64


@dataclass
class CrawlConfig:
    per_host_per_round: int = 2
    rounds: int = 5
    priority_decay: float = 0.8
    num_buckets: int = 32
    salt_sub_buckets: int = 8
    # > 0 enables robots crawl-delay politeness: a host with delay d may
    # fetch at most floor(round_seconds / d) urls per round (capped by
    # per_host_per_round); 0 keeps the flat per-host quota
    round_seconds: int = 0


@dataclass
class SimResult:
    fetch_log: list[dict] = field(default_factory=list)  # round, seq, url, host, status, text
    seen: set[str] = field(default_factory=set)
    pending: dict[str, tuple[float, int]] = field(default_factory=dict)  # url -> (prio, round)
    rounds_run: int = 0


def _path_of(canonical_url: str) -> str:
    # canonical urls are scheme://netloc/path[?q] — path starts at first '/'
    # after the netloc
    rest = canonical_url.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:].split("?", 1)[0] if slash >= 0 else "/"


def simulate(
    pages: dict[str, bytes],  # canonical url -> html bytes
    seeds: list[tuple[str, float]],  # raw url, priority (fixed order)
    robots: list[tuple[str, str]],  # host, disallow_prefix
    cfg: CrawlConfig,
    delays: dict[str, int] | None = None,  # host -> robots crawl-delay (s)
) -> SimResult:
    res = SimResult()
    disallow: dict[str, list[str]] = {}
    for host, prefix in robots:
        if prefix is not None:
            disallow.setdefault(host, []).append(prefix)

    def host_quota(host: str) -> int:
        if cfg.round_seconds <= 0 or not delays:
            return cfg.per_host_per_round
        d = delays.get(host, 0)
        if d is None or d <= 0:
            return cfg.per_host_per_round
        return min(cfg.per_host_per_round, cfg.round_seconds // d)

    # seed the frontier
    for raw, prio in seeds:
        cu = canonicalize_url(raw)
        if cu is None:
            continue
        if cu in res.pending:
            res.pending[cu] = (max(res.pending[cu][0], prio), 0)
        else:
            res.pending[cu] = (prio, 0)

    seq = 0
    for rnd in range(1, cfg.rounds + 1):
        if not res.pending:
            break
        res.rounds_run = rnd

        # robots gate (permanent removal)
        gated = [
            u
            for u in res.pending
            if any(_path_of(u).startswith(p) for p in disallow.get(host_of(u), []))
        ]
        for u in gated:
            del res.pending[u]

        # per-host top-k
        by_host: dict[str, list[str]] = {}
        for u in res.pending:
            by_host.setdefault(host_of(u), []).append(u)
        selected: list[tuple[str, str]] = []  # (host, url) in global order
        for host in sorted(by_host):
            urls = sorted(
                by_host[host],
                key=lambda u: (-res.pending[u][0], url_hash64(u), u),
            )
            for u in urls[: host_quota(host)]:
                selected.append((host, u))

        # fetch + extract + expand
        new_links: dict[str, float] = {}
        for host, u in selected:
            seq += 1
            prio = res.pending[u][0]
            del res.pending[u]
            res.seen.add(u)
            html = pages.get(u)
            if html is None:
                res.fetch_log.append(
                    {"round": rnd, "seq": seq, "url": u, "host": host, "status": "missing", "text": None}
                )
                continue
            text = extract_text(html)
            res.fetch_log.append(
                {"round": rnd, "seq": seq, "url": u, "host": host, "status": "ok", "text": text}
            )
            for href in extract_links(html):
                cu = canonicalize_url(href, base=u)
                if cu is None:
                    continue
                child = prio * cfg.priority_decay
                if cu in new_links:
                    new_links[cu] = max(new_links[cu], child)
                else:
                    new_links[cu] = child

        for cu, prio in new_links.items():
            if cu in res.seen or cu in res.pending:
                continue
            res.pending[cu] = (prio, rnd)

    return res
