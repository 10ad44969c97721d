"""Experiment 2: does multi-row-group corpus layout fix the 8->32 extract step?

The scaling corpus is written as 64 part files x ONE ~130MB row group each
(pyarrow write_table default), so byte-range splitting cannot engage: the
scan runs exactly 64 non-empty tasks = 2 waves at local[32] — a layout
artifact of the synthetic corpus, not an engine property. Production
Common-Crawl-style warehouses write bounded row groups precisely so scans
can split. This rewrites the same pages table with ~8 row groups per file
and re-measures the isolated extract path at 8 and 32 cores.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rewrite_rowgroups(src: str, dst: str, rows_per_group: int) -> None:
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(src, name))
        pq.write_table(
            tbl, os.path.join(dst, name), row_group_size=rows_per_group,
            compression="zstd",
        )


def measure(pages: str, cores: int, mpb_mb: int) -> float:
    from pyspark.sql import functions as F

    from twittercrawler_spark.functions.udfs import udf_extract_text_links
    from twittercrawler_spark.session import get_spark

    conf = {
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.files.maxPartitionBytes": str(mpb_mb * 1024 * 1024),
    }
    spark = get_spark(f"rg_{cores}", cores=cores, shuffle_partitions=cores, extra_conf=conf)
    best = float("inf")
    for i in range(3):
        df = spark.read.parquet(pages)
        t0 = time.time()
        (
            df.withColumn("_ex", udf_extract_text_links("html"))
            .select((F.length("_ex.text") + i).alias("L"))
            .agg(F.sum("L"))
            .collect()
        )
        best = min(best, time.time() - t0)
    spark.stop()
    print(f"cores={cores} mpb={mpb_mb}m pages={os.path.basename(pages)} best={best:.1f}s", flush=True)
    return best


def main() -> None:
    import bench

    corpus = bench.ensure_bench_corpus(bench.SCALE_PAGES, bench.SCALE_WORDS)
    src = f"{corpus}/pages.parquet"
    dst = f"{corpus}/pages_rg.parquet"
    if not os.path.exists(os.path.join(dst, "_done")):
        t0 = time.time()
        rewrite_rowgroups(src, dst, rows_per_group=600)
        with open(os.path.join(dst, "_done"), "w") as f:
            f.write("ok")
        print(f"rewrite: {time.time() - t0:.0f}s", flush=True)

    r8 = measure(dst, 8, 8)
    r32 = measure(dst, 32, 8)
    print("rg  8:", r8, " 32:", r32, " eff:", round(r8 / r32 / 4, 3))


if __name__ == "__main__":
    main()
