"""Politeness scheduler: salted per-host top-k + deterministic global order.

Maps the reference's rate budget — fixed topic order, ``max_count`` results
per topic per round, sleep-to-budget pacing (pages/Crawler.py:70,80,148-153)
— onto a distributed frontier:

* per-host quota ``k`` per round = the politeness budget;
* selection order INSIDE a host: priority desc, then url_hash asc, then url
  asc — a computed total order, never task order (SURVEY.md §7.4);
* global fetch order ACROSS hosts: host asc, then the per-host selection
  order — the analog of the reference's fixed topic-list round-robin;
* hot-host skew (one host owning ~50% of the frontier) is defused by a
  TWO-PHASE top-k: phase 1 takes top-k within (host, salt_sub_bucket) —
  bounded per-task work even for the hottest host — phase 2 takes the final
  top-k from the ≤ k·S per-host survivors. The global per-host quota stays
  exact (SURVEY.md §7.4 "Hot-host skew").

The global sequence number is assigned WITHOUT a single-partition window:
range-repartition on the order columns, sort within partitions, then add
per-partition offsets (computed from a tiny collected count-per-partition
map) inside an Arrow-batched iterator — the standard scalable zip-with-index.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def order_cols() -> list[Column]:
    """The within-host selection total order (parity-critical)."""
    return [F.col("priority").desc(), F.col("url_hash").asc(), F.col("url").asc()]


def select_per_host_topk(candidates: DataFrame, k: int, salt_sub_buckets: int = 8) -> DataFrame:
    """Per-host top-k under the politeness budget; exact, skew-resistant."""
    sub = F.pmod(F.col("url_hash"), F.lit(salt_sub_buckets))
    w1 = Window.partitionBy("host", sub).orderBy(*order_cols())
    phase1 = (
        candidates.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1")
    )
    w2 = Window.partitionBy("host").orderBy(*order_cols())
    return (
        phase1.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= k)
    )


def with_global_sequence(
    selected: DataFrame, start_at: int, num_partitions: int | None = None
) -> DataFrame:
    """Add ``seq`` = start_at + rank in (host asc, host_rank asc) order.

    Scales: no global single-partition window. Range partition on the order
    key, sort within partitions, offset by broadcast per-partition counts.
    """
    cols = ["host", "host_rank"]
    np_ = num_partitions or selected.sparkSession.sparkContext.defaultParallelism
    arranged = selected.repartitionByRange(np_, *cols).sortWithinPartitions(*cols)
    arranged = arranged.withColumn("_pid", F.spark_partition_id())
    # pin the range-partitioner's sampled boundaries: the count job and the
    # final mapInPandas job must see IDENTICAL partitioning
    arranged = arranged.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["cnt"]
        for r in arranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start_at
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    schema = T.StructType(list(arranged.schema.fields) + [T.StructField("seq", T.LongType())])

    def add_seq(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in it:
            if len(pdf) == 0:
                yield pdf.assign(seq=pd.Series(dtype="int64"))
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.assign(seq=range(base + local + 1, base + local + 1 + len(pdf)))
            local += len(pdf)
            yield pdf

    return arranged.mapInPandas(add_seq, schema).drop("_pid")
