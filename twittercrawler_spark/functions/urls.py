"""URL canonicalization, host extraction, and the 60-bit URL hash.

Canonicalization spec (fixed, documented — the engine↔simulator contract):

1. resolve relative references against the base URL (``urllib.parse.urljoin``)
2. lowercase scheme and host
3. drop default ports (``:80`` for http, ``:443`` for https)
4. drop the fragment
5. sort query parameters by (key, value), preserving duplicates; drop a
   trailing ``?`` when the query is empty
6. empty path → ``/``
7. percent-encoding is NOT normalized (out of scope, documented)

``url_hash64`` is ``int(md5(canonical_url)[:15 hex], 16)`` — a 60-bit
deterministic hash computable identically in pure Python (hashlib), in Spark
SQL (``conv(substring(md5(url), 1, 15), 16, 10)``), and in DuckDB — used for
partitioning/bucketing and ordering tie-breaks ONLY. Seen-set EXACTNESS is
always decided on the canonical URL string itself (hash collisions can never
corrupt membership; they only cost an extra tie-break on the url column).

The reference has no URL layer; this replaces its Redis/list seen-set keying
(pages/Postprocess_scripts/Cansin_Location_Detection.py:45,107-109 and
pages/Preprocess_scripts/GenerateUserUseridDict.py:53) per the north rule.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str, base: str | None = None) -> str | None:
    """Canonical form per the module spec; None for non-http(s)/unparseable."""
    try:
        if base:
            url = urljoin(base, url)
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower()
    netloc = host
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = parts.query
    if query:
        pairs = sorted(p.partition("=") for p in query.split("&"))
        query = "&".join(k + sep + v for k, sep, v in pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(canonical_url: str) -> str:
    """netloc (host[:port]) of an already-canonical URL."""
    return urlsplit(canonical_url).netloc


def url_hash64(canonical_url: str) -> int:
    """60-bit int from the first 15 hex chars of md5 — pure-Python twin."""
    return int(hashlib.md5(canonical_url.encode("utf-8")).hexdigest()[:15], 16)


# --- vectorized (pandas UDF interior) twins ----------------------------------

def pd_canonicalize(urls: pd.Series, bases: pd.Series | None = None) -> pd.Series:
    if bases is None:
        return urls.map(lambda u: canonicalize_url(u) if isinstance(u, str) else None)
    # absolute hrefs don't need the (expensive) urljoin resolve; urljoin on
    # an absolute URL returns it unchanged, so this fast path is semantics-
    # preserving (asserted in tests/test_urls.py)
    return pd.Series(
        [
            canonicalize_url(u)
            if isinstance(u, str) and (u.startswith("http://") or u.startswith("https://"))
            else (canonicalize_url(u, b) if isinstance(u, str) else None)
            for u, b in zip(urls, bases)
        ],
        index=urls.index,
        dtype=object,
    )


def pd_host(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: host_of(u) if isinstance(u, str) else None)


def pd_url_hash64(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: url_hash64(u) if isinstance(u, str) else None)


# --- JVM-side (Catalyst, codegen'd) equivalents -------------------------------

def spark_url_hash64(col: Column | str) -> Column:
    """JVM-side twin of :func:`url_hash64` — stays in whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def spark_host_bucket(
    host: Column | str,
    url_hash: Column | str,
    num_buckets: int,
    salt_sub_buckets: int,
) -> Column:
    """Salted-HOST partitioning key (SURVEY §4.3; the north rule's hot-domain
    skew control): ``pmod(hash(host) + pmod(url_hash, S), NB)``.

    One host's rows land in at most S buckets — co-located enough that
    per-host politeness windows and seen probes shuffle to a handful of
    partitions, spread enough that a 50%-hot host cannot pin a single
    bucket. S is the same knob as the scheduler's two-phase top-k salt.
    The host hash reuses the md5-derived :func:`url_hash64` so the key has
    an exact pure-Python/DuckDB twin (:func:`host_bucket_of`).
    """
    uh = F.col(url_hash) if isinstance(url_hash, str) else url_hash
    return F.pmod(
        spark_url_hash64(host) + F.pmod(uh, F.lit(salt_sub_buckets)),
        F.lit(num_buckets),
    ).cast("int")


def host_bucket_of(
    host: str, url_hash: int, num_buckets: int, salt_sub_buckets: int
) -> int:
    """Pure-Python twin of :func:`spark_host_bucket` (parity-tested)."""
    return (url_hash64(host) + url_hash % salt_sub_buckets) % num_buckets
