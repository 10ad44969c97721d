"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every setting here
is chosen to be correct at both scales:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing)
* Arrow on (all Python↔JVM crossings are vectorized pandas UDF batches)
* shuffle partitions sized to cores locally (a cluster deployment overrides
  via spark-submit conf; nothing in the engine assumes the local value)
* UTC session timezone (oracle comparisons against DuckDB are UTC-naive)

BEFORE COMMITTING ANY CHANGE TO THIS FILE run `python tools/bench_smoke.py`
(headline-shape envelope at sf0.01) — a global default that is right for one
row shape can be a scale-killer for another, and round 3 shipped a 3x bench
regression exactly this way.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import SparkSession

# writer row-group bound for page-sized rows (~28 KB html/text): bounds both
# the writer's per-task buffer AND — because a vectorized parquet reader batch
# never spans a row group — every later scan's per-task batch, regardless of
# the 4096-row session default. Used by the crawl warehouse for its wide
# tables only (pages_canon, fetch_log); analytics tables keep the 128 MB
# default for compression/scan locality at 100 TB.
PAGE_ROW_GROUP_BYTES = 16 * 1024 * 1024

# log4j2 config = Spark defaults + a DENY filter for exactly the benign
# "Failed to update accumulator N (Unknown class) for task M" GC race (a
# late 1-task completion event processed after its finished execution's
# weakly-referenced SQL-metric accumulators were collected — internal to
# Spark, result-neutral, not reachable from user code). Real accumulator
# failures log the accumulator's class name and pass through. Applied via
# driver extraJavaOptions so it lands at JVM launch; a getOrCreate that
# joins an already-running JVM keeps that JVM's logging config.
_LOG4J_CONF = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "resources",
    "log4j2-engine.properties",
)


@contextlib.contextmanager
def page_row_scan(spark: SparkSession, batch_rows: int = 512):
    """Scope a small vectorized-reader batch around actions that scan
    page-sized rows from parquet WE DID NOT WRITE (no 16 MB row-group bound
    to lean on): 4096-row batches of ~28 KB rows are ~115 MB per in-flight
    task, which at 32 concurrent tasks inverts the 8->32 scaling step under
    GC (measured, BENCH/STAGES.md); 512 rows ≈ 14 MB per task. The conf is
    captured at physical-planning (action) time, so the toggle-restore
    pattern scopes it to exactly the actions run inside the block."""
    key = "spark.sql.parquet.columnarReaderBatchSize"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(batch_rows))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


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
        # Parquet batch/row-group sizing stays at the Spark defaults (4096-row
        # vectorized reader batches, 128 MB writer row groups): those are the
        # right numbers for numeric/analytics tables, and round 3 measured an
        # 11x scan regression (pricing_summary 0.61s -> 6.8s at sf0.1) when a
        # page-row bound (512/16m) was applied HERE as a session default.
        # Page-sized rows (~28 KB html/text) do need bounding — 4096 rows of
        # those is ~115 MB per in-flight task batch, which inverts the 8->32
        # scaling step under GC — but the bound is scoped to where such rows
        # live: the crawl warehouse writes its wide tables (pages_canon,
        # fetch_log) with 16 MB row groups (sources/tables.py row_group_bytes),
        # and since a vectorized reader batch never spans a row group, every
        # later scan of those tables self-bounds to ~16 MB per task batch with
        # no session knob. The one scan of page rows NOT written by us (the
        # raw corpus in frontier.crawl.bootstrap) runs under the scoped
        # page_row_scan() conf below.
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
        # Unix-domain sockets for the Python<->JVM side channels. The default
        # TCP accumulator server is single-threaded and its handler dies
        # PERMANENTLY on one failed auth handshake (pyspark/accumulators.py
        # UpdateRequestHandler) — observed as an "EOF reached before Python
        # server acknowledged" followed by endless per-task "Broken pipe"
        # DAGScheduler errors in long crawl benches. UDS skips the auth
        # handshake entirely and is the Spark 4 local-channel fast path;
        # driver and executor are host-local here and on any sane cluster
        # layout (the conf only governs same-host sockets).
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    merged = dict(extra_conf or {})
    merged["spark.driver.extraJavaOptions"] = (
        f"-Dlog4j.configurationFile=file:{_LOG4J_CONF} "
        + merged.get("spark.driver.extraJavaOptions", "")
    ).strip()
    for k, v in merged.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark: SparkSession, n: int | None = None) -> None:
    """Fork and import-warm the session's Python worker pool.

    The first pandas-UDF job after a session starts pays a worker spawn
    storm: the pyspark daemon forks one worker per task slot and each fork
    imports pandas+pyarrow (measured ~37 s for the first ``mapInPandas``
    action at local[32] vs ~1 s steady-state on the same input). One tiny
    map-only job with a task per slot moves that cost out of any measured
    or latency-sensitive section — the same role container/executor
    pre-warming plays on a real cluster, where the pool outlives any one
    job. With ``spark.python.worker.reuse`` (default on) every later
    pandas-UDF task lands on a warm worker.
    """
    if n is None:
        n = spark.sparkContext.defaultParallelism

    def _touch(batches):
        yield from batches

    (
        spark.range(n, numPartitions=n)
        .mapInPandas(_touch, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
