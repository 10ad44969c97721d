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

The global sequence number is assigned WITHOUT a row-level global sort:
the (host asc, host_rank asc) total order decomposes into per-host base
offsets — a running sum over the host-level count table (metadata scale) —
broadcast back onto the rows. Fully JVM-side, shuffle-light, deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def order_cols() -> list[Column]:
    """The within-host selection total order (parity-critical)."""
    return [F.col("priority").desc(), F.col("url_hash").asc(), F.col("url").asc()]


def select_per_host_topk(
    candidates: DataFrame,
    k: int,
    salt_sub_buckets: int = 8,
    quotas: DataFrame | None = None,
) -> DataFrame:
    """Per-host top-k under the politeness budget; exact, skew-resistant.

    ``quotas`` (host, _quota) — dimension-sized, broadcast — tightens the
    budget per host below ``k`` (robots crawl-delay: quota = floor(round
    seconds / delay)). Hosts absent from it keep ``k``; phase 1 prunes with
    ``k`` (the maximum any host may take), so the variable budget changes
    WHICH ranks survive, never the two-phase shape. A quota above ``k`` is
    clamped to ``k`` (quotas only ever TIGHTEN — enforced here so the
    phase-1 prune stays valid for any input). A 0 quota starves the host
    for the round — its urls stay pending, exactly the reference's
    sleep-to-budget semantics when the budget is smaller than one fetch.
    """
    sub = F.pmod(F.col("url_hash"), F.lit(salt_sub_buckets))
    w1 = Window.partitionBy("host", sub).orderBy(*order_cols())
    phase1 = (
        candidates.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1")
    )
    w2 = Window.partitionBy("host").orderBy(*order_cols())
    ranked = phase1.withColumn("host_rank", F.row_number().over(w2))
    if quotas is None:
        return ranked.filter(F.col("host_rank") <= k)
    return (
        ranked.join(F.broadcast(quotas), "host", "left")
        .filter(
            F.col("host_rank")
            <= F.least(F.coalesce(F.col("_quota"), F.lit(k)), F.lit(k))
        )
        .drop("_quota")
    )


def selected_counts(
    gated: DataFrame, k: int, quotas: DataFrame | None = None
) -> DataFrame:
    """Per-host SELECTED row counts derived from the candidate set — one
    hash aggregation, no window shuffles.

    Exactness: :func:`select_per_host_topk` keeps ``host_rank <= q`` rows
    per host, where host_rank runs over the phase-1 survivors and
    ``q = min(quota, k)`` (the scheduler clamps — quotas only tighten).
    Per host with n candidates: if n < q every sub-bucket holds < q <= k
    rows so phase 1 keeps all n; if n >= q the survivors number
    >= min(k, n) >= q. Either way the kept count is exactly ``min(q, n)``
    — so the count table never needs the ranked rows. Used
    by callers that pass it to :func:`with_global_sequence`, replacing the
    offsets broadcast-build's re-run of BOTH top-k window shuffles with
    one count over the (checkpointed) candidates (a parity test pins the
    resulting fetch order against the sequential simulator).
    """
    counts = gated.groupBy("host").agg(F.count("*").alias("_cnt"))
    if quotas is None:
        return counts.withColumn("_cnt", F.least(F.col("_cnt"), F.lit(k).cast("long")))
    return (
        counts.join(F.broadcast(quotas), "host", "left")
        .select(
            "host",
            F.least(
                F.col("_cnt"),
                F.least(F.coalesce(F.col("_quota"), F.lit(k)), F.lit(k)).cast(
                    "long"
                ),
            ).alias("_cnt"),
        )
    )


def with_global_sequence(
    selected: DataFrame, start_at: int, counts: DataFrame | None = None
) -> DataFrame:
    """Add ``seq`` = start_at + rank in (host asc, host_rank asc) order.

    Fully JVM-side and shuffle-light: the global order decomposes into
    per-host base offsets (a running sum over the HOST-LEVEL count table,
    which is quota-bounded rows-per-host and #hosts rows total — metadata
    scale) broadcast-joined back, plus the already-computed ``host_rank``.
    No row-level global sort, no Python crossing, no single-partition pass
    at all. The offsets prefix-sum itself is TWO-LEVEL (intra-prefix
    running sum + per-prefix-group bases via a broadcast theta-join), so
    neither the host-count table nor the prefix-group totals funnel
    through one task; the totals table is capped by the 2-char prefix
    alphabet.

    ``counts`` (host, _cnt): optional precomputed per-host selected counts
    (see :func:`selected_counts`). Without it the count table derives from
    ``selected`` itself — correct everywhere, but as the offsets
    broadcast-build subtree it re-executes the two top-k window shuffles.
    """
    if counts is None:
        counts = selected.groupBy("host").agg(F.count("*").alias("_cnt"))
    # TWO-LEVEL running sum (the documented treatment, now implemented):
    # hosts group by their 2-char prefix — prefix groups are CONTIGUOUS in
    # host-asc order, so the global prefix-sum decomposes exactly into
    # (intra-group running sum, partitioned ≤ ~40² ways) + (group base, an
    # exclusive prefix sum over the one-row-per-group totals table via a
    # broadcast theta-join — see below). Nothing crosses a single
    # partition; the group table's size is hard-capped by the prefix
    # alphabet, never by how many hosts a round schedules. Prefix skew
    # (many hosts sharing a prefix) only costs balance within level 1,
    # never exactness.
    counts = counts.withColumn("_g", F.substring("host", 1, 2))
    wi = (
        Window.partitionBy("_g")
        .orderBy("host")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = counts.withColumn("_ibase", F.coalesce(F.sum("_cnt").over(wi), F.lit(0)))
    # group bases: exclusive prefix sum over the one-row-per-prefix totals
    # table, computed as a broadcast theta-join (sum of strictly-smaller
    # groups) instead of an unpartitioned window. The table is hard-capped
    # by the 2-char prefix alphabet (~1.6k rows → ≤2.6M broadcast-nested-
    # loop comparisons, metadata scale), and unlike a constant-key window
    # this stays spread across tasks and emits no single-partition warning
    # — Catalyst constant-folds any foldable partition key back to empty.
    totals = counts.groupBy("_g").agg(F.sum("_cnt").alias("_gcnt"))
    prior = totals.select(
        F.col("_g").alias("_g2"), F.col("_gcnt").alias("_gcnt2")
    )
    gbase = (
        totals.join(F.broadcast(prior), F.col("_g2") < F.col("_g"), "left")
        .groupBy("_g")
        .agg(F.coalesce(F.sum("_gcnt2"), F.lit(0)).alias("_gbase"))
    )
    offsets = (
        intra.join(F.broadcast(gbase), "_g")
        .withColumn("_base", F.col("_gbase") + F.col("_ibase"))
        .select("host", "_base")
    )
    return (
        selected.join(F.broadcast(offsets), "host")
        .withColumn(
            "seq",
            (F.lit(start_at).cast("long") + F.col("_base") + F.col("host_rank")).cast(
                "long"
            ),
        )
        .drop("_base")
    )
