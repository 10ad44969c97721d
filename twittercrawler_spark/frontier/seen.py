"""URL-seen set: numpy Bloom prefilter + exact anti-join.

Replaces the reference's per-row membership probes — the O(n) Python-list
scan (pages/Preprocess_scripts/GenerateUserUseridDict.py:53) and the
one-Redis-RTT-per-row probe
(pages/Postprocess_scripts/Cansin_Location_Detection.py:107-109) — with the
north rule's design:

* EXACTNESS is always decided by a ``left_anti`` join on the canonical URL
  string against the committed seen table (hash/Bloom false positives can
  never corrupt membership);
* a Bloom filter over the 60-bit url_hash acts as a shuffle-avoiding
  prefilter: candidate links that are DEFINITE misses skip the anti-join
  entirely (at 10^10-frontier scale the overwhelming majority of new links
  are definite misses, so the expensive shuffle only sees the "maybe" set).

The Bloom bitset is built per host_bucket with vectorized numpy (no per-row
Python) and shipped to executors as a broadcast variable probed inside an
Arrow-batched pandas UDF. Double hashing h_i = h1 + i*h2 (Kirsch–Mitzenmacher,
public construction) over the already-uniform md5-derived url_hash.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class NumpyBloom:
    """Vectorized Bloom filter over int64 keys (bits stored as uint8 array)."""

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = bits if bits is not None else np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "NumpyBloom":
        n = max(n_items, 1)
        m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, min(k, 8))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = (h1 >> np.uint64(29)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys, dtype=np.int64)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def maybe_contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, m_bits: int, k: int, blob: bytes) -> "NumpyBloom":
        return cls(m_bits, k, np.frombuffer(blob, dtype=np.uint8).copy())


def build_bloom_sidecar(seen_hashes: DataFrame, fpp: float = 0.01) -> dict[int, tuple[int, int, bytes]]:
    """Per-host_bucket Bloom sidecar from the seen table.

    Returns {host_bucket: (m_bits, k, bitset_bytes)} — small (NB entries),
    suitable for a broadcast variable. Built from a per-bucket collect of
    url_hash arrays via Arrow (the sidecar is metadata-scale: even at 10^10
    URLs / 4096 buckets it is a bounded per-bucket bitset, and on a real
    cluster this builder becomes a per-bucket applyInPandas writing an
    Iceberg sidecar table — same layout, no driver collect).
    """
    pdf = seen_hashes.select("host_bucket", "url_hash").toPandas()
    out: dict[int, tuple[int, int, bytes]] = {}
    for bucket, grp in pdf.groupby("host_bucket"):
        bloom = NumpyBloom.sized_for(len(grp), fpp)
        bloom.add(grp["url_hash"].to_numpy(dtype=np.int64))
        out[int(bucket)] = (bloom.m, bloom.k, bloom.to_bytes())
    return out


def filter_unseen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom_sidecar: dict[int, tuple[int, int, bytes]] | None,
) -> DataFrame:
    """Rows of ``candidates`` whose url is NOT in ``seen`` (exact).

    candidates must carry (url, url_hash, host_bucket). With a Bloom sidecar,
    definite misses bypass the anti-join shuffle; "maybe" rows go through the
    exact ``left_anti`` join. Without one (or without seen), degenerate paths.
    """
    if seen is None:
        return candidates
    if not bloom_sidecar:
        return candidates.join(seen.select("url"), "url", "left_anti")

    bc = spark.sparkContext.broadcast(bloom_sidecar)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(bucket: pd.Series, url_hash: pd.Series) -> pd.Series:
        side = bc.value
        out = np.zeros(len(bucket), dtype=bool)
        bnp = bucket.to_numpy()
        hnp = url_hash.to_numpy(dtype=np.int64)
        for b in np.unique(bnp):
            entry = side.get(int(b))
            if entry is None:
                continue
            m, k, blob = entry
            mask = bnp == b
            out[mask] = NumpyBloom.from_bytes(m, k, blob).maybe_contains(hnp[mask])
        return pd.Series(out)

    flagged = candidates.withColumn(
        "_maybe_seen", maybe_seen(F.col("host_bucket"), F.col("url_hash"))
    )
    definite_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybes = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    verified_new = maybes.join(seen.select("url"), "url", "left_anti")
    return definite_new.unionByName(verified_new)
