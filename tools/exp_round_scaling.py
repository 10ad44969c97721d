"""Focused 8-vs-32 full-round measurement (after the reader/writer batch
bounds in session.py). Bootstraps once at local[8], then alternates full
rounds at the two levels from copied warehouses, 2 cycles, and prints the
per-level times plus the same-run host mp ceiling for context."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import (  # noqa: E402
    _session,
    capture_stage_timings,
    measure_host_ceiling,
)


def main() -> None:
    import bench
    from twittercrawler_spark.frontier.crawl import bootstrap, run_round
    from twittercrawler_spark.frontier.simulator import CrawlConfig
    from twittercrawler_spark.sources.tables import Warehouse

    corpus = bench.ensure_bench_corpus(bench.SCALE_PAGES, bench.SCALE_WORDS)
    cfg = CrawlConfig(per_host_per_round=bench.CRAWL_QUOTA, rounds=1, num_buckets=64)

    wh_base = tempfile.mkdtemp(prefix="rexp_wh_base_")
    spark = _session(8)
    t0 = time.time()
    bootstrap(
        spark,
        Warehouse(wh_base),
        f"{corpus}/pages.parquet",
        f"{corpus}/seeds_all.parquet",
        f"{corpus}/robots.parquet",
        cfg,
    )
    print(f"bootstrap@8: {time.time() - t0:.1f}s", flush=True)
    spark.stop()

    times: dict[int, list[float]] = {8: [], 32: []}
    for _cycle in range(2):
        for cores in (8, 32):
            spark = _session(cores)
            trial = tempfile.mkdtemp(prefix=f"rexp_wh_{cores}_")
            shutil.rmtree(trial)
            shutil.copytree(wh_base, trial)
            wh = Warehouse(trial)
            t0 = time.time()
            run_round(spark, wh, cfg, 1)
            dt = time.time() - t0
            times[cores].append(dt)
            print(f"round@{cores}: {dt:.1f}s", flush=True)
            shutil.rmtree(trial, ignore_errors=True)
            spark.stop()

    stages_8 = capture_stage_timings(8, wh_base, cfg)
    stages_32 = capture_stage_timings(32, wh_base, cfg)
    shutil.rmtree(wh_base, ignore_errors=True)
    host_8 = measure_host_ceiling(8)
    host_32 = measure_host_ceiling(32)

    b8, b32 = min(times[8]), min(times[32])
    print("stages@8:", {k: round(v, 2) for k, v in stages_8.items()}, flush=True)
    print("stages@32:", {k: round(v, 2) for k, v in stages_32.items()}, flush=True)
    print(f"best round 8: {b8:.1f}s  32: {b32:.1f}s  eff: {b8 / b32 / 4:.3f}")
    print(f"host ceiling 8->32: {(host_32 / host_8) / 4:.3f}")


if __name__ == "__main__":
    main()
