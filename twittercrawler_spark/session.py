"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every setting here
is chosen to be correct at both scales:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing)
* Arrow on (all Python↔JVM crossings are vectorized pandas UDF batches)
* shuffle partitions sized to cores locally (a cluster deployment overrides
  via spark-submit conf; nothing in the engine assumes the local value)
* UTC session timezone (oracle comparisons against DuckDB are UTC-naive)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "twittercrawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # One BLAS/OpenMP thread per Python worker: N workers × M-thread pools
    # oversubscribe the box and *invert* scaling (measured 2× slowdown at
    # local[32]). Real clusters pin this via spark.executorEnv too.
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        os.environ.setdefault(var, "1")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # modest Arrow batches: crawl rows carry multi-KB html/text payloads,
        # and 10k-row batches of those thrash the heap at high parallelism
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # JVM-side twin of the Arrow cap: the vectorized parquet reader
        # reserves columnarReaderBatchSize rows CONTIGUOUSLY per task batch
        # — the 4096-row default is sized for numeric columns, but at ~28 KB
        # html/text rows it is ~115 MB per in-flight task, which at 32
        # concurrent tasks OOMs any per-executor heap that 8 tasks survive
        # (measured: the local[32] scan died in GC while local[8] passed,
        # inverting the 8->32 scaling step). 512 rows ≈ 14 MB per task on
        # page-sized rows, linear head-room in the core count.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # writer-side twin of the same bound: a ParquetWriter buffers up to
        # parquet.block.size of UNCOMPRESSED column data per task before
        # flushing a row group — the 128 MB default × 32 concurrent write
        # tasks is > 4 GB of heap churn on page-sized rows (the fetch_log/
        # frontier writes showed the same degrade-at-32 signature as the
        # reader). 16 MB bounds the writer the same way, and the resulting
        # multi-row-group files let later scans split BELOW file granularity
        # (byte-range splits bind to row groups), so warehouse tables stay
        # scan-parallel even when a stage coalesced them to few files.
        .config("spark.hadoop.parquet.block.size", str(16 * 1024 * 1024))
        # zstd: ~35% smaller files than snappy on text-heavy tables; the
        # extra (parallel) CPU trades against the one resource that does
        # NOT scale with executors — storage bandwidth
        .config("spark.sql.parquet.compression.codec", "zstd")
        # task-side parallel file commit: the warehouse's own manifest commit
        # (sources/tables.py) provides atomic visibility, so the slow
        # driver-serial v1 rename pass buys nothing here — and at 100 TB the
        # v1 single-threaded rename of thousands of files IS the job tail
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
