"""One-off experiment: where does the isolated extract path lose at local[32]?

Hypotheses tested, same 300k-page corpus, best-of-3 fresh-plan trials each:
  (a) task granularity — 64 input files = 64 splits = exactly 2 waves at 32
      cores; finer splits (maxPartitionBytes) pack better and shrink each
      task's working set;
  (b) heap pressure — a fixed 16g heap serves 4x the allocation rate at 32
      concurrent tasks (zstd-decompressed multi-KB html columns + Arrow
      batches), so GC time scales superlinearly with cores.

Run AFTER any other Spark job finishes (owns the whole box).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(corpus: str, cores: int, conf: dict[str, str], mem: str) -> float:
    os.environ["SPARK_DRIVER_MEM"] = mem
    from pyspark.sql import functions as F

    from twittercrawler_spark.functions.udfs import udf_extract_text_links
    from twittercrawler_spark.session import get_spark

    c = {"spark.ui.showConsoleProgress": "false"}
    c.update(conf)
    spark = get_spark(f"exp_{cores}", cores=cores, shuffle_partitions=cores, extra_conf=c)
    best = float("inf")
    for i in range(3):
        pages = spark.read.parquet(f"{corpus}/pages.parquet")
        t0 = time.time()
        (
            pages.withColumn("_ex", udf_extract_text_links("html"))
            .select((F.length("_ex.text") + i).alias("L"))
            .agg(F.sum("L"))
            .collect()
        )
        best = min(best, time.time() - t0)
    n_splits = spark.read.parquet(f"{corpus}/pages.parquet").rdd.getNumPartitions()
    spark.stop()
    print(f"cores={cores} mem={mem} conf={conf} splits={n_splits} best={best:.1f}s", flush=True)
    return best


def main() -> None:
    import bench

    corpus = bench.ensure_bench_corpus(bench.SCALE_PAGES, bench.SCALE_WORDS)
    mpb16 = {"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)}
    mpb8 = {"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)}

    r = {}
    r["8_base"] = measure(corpus, 8, {}, "16g")
    r["32_base"] = measure(corpus, 32, {}, "16g")
    r["32_mpb16"] = measure(corpus, 32, mpb16, "16g")
    r["32_mem48"] = measure(corpus, 32, {}, "48g")
    r["32_both"] = measure(corpus, 32, mpb16, "48g")
    r["32_mpb8_mem48"] = measure(corpus, 32, mpb8, "48g")
    r["8_mpb16"] = measure(corpus, 8, mpb16, "16g")

    for k, v in r.items():
        print(k, f"{v:.1f}s")
    print("eff 8_base->32_base:", round(r["8_base"] / r["32_base"] / 4, 3))
    print("eff 8_base->32_best:", round(r["8_base"] / min(r[k] for k in r if k.startswith("32")) / 4, 3))
    print("eff 8_mpb16->32_both:", round(r["8_mpb16"] / r["32_both"] / 4, 3))


if __name__ == "__main__":
    main()
