"""LSH coarseness observability (VERDICT r2 item 1): for each bucketed
candidate-generation path, report the bucket-space size, the realized
candidate-pair count, and the all-pairs count it replaced — so "bucketed,
not all-pairs" is a measured fact, not a claim.

Usage:  python tools/lsh_stats.py [sf_dir]      (default /root/testdata/sf0.1)

Prints one JSON line; the numbers are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from twittercrawler_spark.analytics import dedup, similarity
    from twittercrawler_spark.analytics._util import t
    from twittercrawler_spark.session import get_spark

    spark = get_spark("lsh_stats", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    n_docs = t(spark, sf, "documents").count()
    n_vecs = t(spark, sf, "embeddings").count()
    out: dict = {"sf_dir": sf, "n_docs": n_docs, "n_vecs": n_vecs}

    def pairs_of(cand_df) -> int:
        return cand_df.count()

    # SimHash: 4 chunk positions x 2^16 chunk values; re-derive the
    # candidate stage exactly as the query builds it
    ch_keys = 4 * 65536
    d = dedup.t_split(spark, sf, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tk"))
        .filter(F.col("tk") != "")
        .distinct()
    )
    th = tok.select(
        "doc_id",
        dedup.base_hash32(F.col("tk")).alias("h_lo"),
        F.conv(F.substring(F.md5(F.col("tk")), 9, 8), 16, 10).cast("bigint").alias("h_hi"),
    )
    bit_sums = [
        F.sum(
            F.when(
                F.expr(f"(h_lo >> {j}) & 1" if j < 32 else f"(h_hi >> {j - 32}) & 1") == 1, 1
            ).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(64)
    ]

    def _half(lo: int):
        e = F.lit(0).cast("bigint")
        for j in range(lo, lo + 32):
            e = e + F.when(F.col(f"s{j}") > 0, F.lit(1 << (j - lo)).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        return e

    fp = th.groupBy("doc_id").agg(*bit_sums).select(
        "doc_id", _half(0).alias("f_lo"), _half(32).alias("f_hi")
    )
    ch = fp.selectExpr(
        "doc_id", "explode(array(0,1,2,3)) AS k", "f_lo", "f_hi"
    ).selectExpr(
        "doc_id", "k",
        "(CASE WHEN k < 2 THEN shiftright(f_lo, k * 16) "
        "ELSE shiftright(f_hi, (k - 2) * 16) END) & 65535 AS chunk",
    )
    ca = ch.select(F.col("doc_id").alias("x"), "k", "chunk")
    cb = ch.select(F.col("doc_id").alias("y"), "k", "chunk")
    simhash_cand = (
        ca.join(cb, ["k", "chunk"]).filter(F.col("x") < F.col("y")).select("x", "y").distinct()
    )
    out["simhash"] = {
        "bucket_keys": ch_keys,
        "candidate_pairs": pairs_of(simhash_cand),
        "all_pairs": n_docs * (n_docs - 1) // 2,
    }

    for label, tables in (("ann", similarity.AN_TABLES), ("embedding_nd", similarity.ND_TABLES)):
        planes = similarity.srp_planes(n_vecs)
        buckets = similarity._srp_buckets(spark, sf, tables)
        ba = buckets.select(F.col("vec_id").alias("x"), "t", "bucket")
        bb = buckets.select(F.col("vec_id").alias("y"), "t", "bucket")
        cand = (
            ba.join(bb, ["t", "bucket"]).filter(F.col("x") < F.col("y")).select("x", "y").distinct()
        )
        out[label] = {
            "tables": tables,
            "planes": planes,
            "bucket_keys": tables * (2 ** planes),
            "candidate_pairs": pairs_of(cand),
            "all_pairs": n_vecs * (n_vecs - 1) // 2,
        }

    # MinHash-LSH: band keys are (band, 4-minima signature) — the key space
    # is value-distinct signatures; report the realized candidate count
    from twittercrawler_spark.analytics.dedup import dedup_minhash_lsh  # noqa: F401

    hs = dedup._shingle_hashes(spark, sf)
    min_cols = [
        F.min(
            (F.lit(2 * i + 1) * F.col("h") + F.lit((1000003 * i) % dedup.MERSENNE_P))
            % dedup.MERSENNE_P
        ).alias(f"m{i}")
        for i in range(1, dedup.MINHASH_K + 1)
    ]
    agg = hs.groupBy("doc_id").agg(*min_cols)
    n_bands = dedup.MINHASH_K // dedup.MINHASH_BAND
    band_entries = [
        F.struct(
            F.lit(b).cast("bigint").alias("band"),
            F.concat_ws(
                "-",
                *[
                    F.col(f"m{b * dedup.MINHASH_BAND + j + 1}").cast("string")
                    for j in range(dedup.MINHASH_BAND)
                ],
            ).alias("sig"),
        )
        for b in range(n_bands)
    ]
    bands = agg.select("doc_id", F.explode(F.array(*band_entries)).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    mh_cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
    )
    out["minhash"] = {
        "bands": n_bands,
        "distinct_band_keys": bands.select("band", "sig").distinct().count(),
        "candidate_pairs": pairs_of(mh_cand),
        "all_pairs": n_docs * (n_docs - 1) // 2,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
