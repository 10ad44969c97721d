"""Process-isolated executor emulation for the 8→32 scaling question.

BENCH/STAGES.md shows the single-JVM `local[8]`→`local[32]` step losing
most of its efficiency while the host's own multiprocessing ceiling
(measured in the same run) stays near 1.0 — i.e. the loss is in-process
(one JVM's scan/Arrow/GC threads + 32 Python UDF workers on shared SMT
vCPUs), not host capacity. The deployment the north rule describes —
4 × 8-core EXECUTORS — has no such sharing: each executor is its own
process with its own Python worker pool.

This tool measures that topology directly: the same strong-scaling step
(one input, 4× the workers) with the 32 cores split across FOUR
process-isolated `local[8]` Spark sessions, each owning a disjoint quarter
of the input files — exactly how a 4-executor cluster partitions a scan.

    N  = 1 × local[8] over all files            (wall time T_N)
    4N = 4 × local[8], one quarter each, started simultaneously
         (wall time T_4N = max over workers)

    strong-scaling efficiency = T_N / (4 · T_4N)

The metered work is the round's compute path in isolation (scan → fused
extract-text+links Arrow UDF → aggregate — measure_extract_stage's
pipeline), because STAGES.md already isolates that path inside one JVM
(0.473 at 8→32); if the SAME work scales across process-isolated workers,
the single-JVM loss is demonstrated to be the artifact, not the engine.

A barrier file aligns the 4 workers' timed regions: each builds its
session, warms the scan, signals ready, and none starts the clock until
the orchestrator has seen all four.

Usage:  python tools/bench_multiproc.py            # orchestrate + report
        (worker mode is internal, via --worker)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = 8
N_WORKERS = 4


def _worker(files: list[str], out: str, ready: str, go: str) -> None:
    import bench
    from pyspark.sql import functions as F

    from twittercrawler_spark.functions.udfs import udf_extract_text_links
    from twittercrawler_spark.session import get_spark

    conf = dict(bench.BENCH_CONF)
    conf["spark.ui.showConsoleProgress"] = "false"
    spark = get_spark(f"mp_{os.getpid()}", cores=CORES, shuffle_partitions=CORES,
                      extra_conf=conf)

    def metered(tag: int):
        pages = spark.read.parquet(*files)
        return (
            pages.withColumn("_ex", udf_extract_text_links("html"))
            .select((F.length("_ex.text") + tag).alias("L"))
            .agg(F.sum("L"))
            .collect()
        )

    # REAL warm-up: the full metered pipeline once, unmeasured — this
    # starts the Python UDF workers and pulls the html column through the
    # page cache. A count(*)-style warm would prune to footers only and
    # leave both cold, so the first (barrier-aligned) timed run would pay
    # startup costs and the reported number would not be steady-state.
    metered(1)
    with open(ready, "w") as f:
        f.write("ok")
    while not os.path.exists(go):
        time.sleep(0.05)
    # ONE timed trial, and it is the barrier-aligned one: all workers start
    # together, so the max-over-workers wall time reflects real 4-way
    # steady-state contention (an un-aligned best-of-N would let fast
    # workers finish first and hand the straggler an idle box).
    t0 = time.time()
    metered(0)
    sec = time.time() - t0
    with open(out, "w") as f:
        json.dump({"sec": sec, "n_files": len(files)}, f)
    spark.stop()


def _spawn(files: list[str], out: str, ready: str, go: str,
           errlog: str) -> subprocess.Popen:
    env = dict(os.environ, SPARK_DRIVER_MEM="8g")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--files", ",".join(files), "--out", out, "--ready", ready, "--go", go],
        env=env, stdout=subprocess.DEVNULL, stderr=open(errlog, "w"),
    )


def _run_level(shards: list[list[str]], tag: str, workdir: str) -> float:
    """Run len(shards) simultaneous workers; return max timed seconds."""
    outs, readies, errlogs = [], [], []
    go = os.path.join(workdir, f"go_{tag}")
    procs = []
    for i, files in enumerate(shards):
        out = os.path.join(workdir, f"out_{tag}_{i}.json")
        ready = os.path.join(workdir, f"ready_{tag}_{i}")
        errlog = os.path.join(workdir, f"err_{tag}_{i}.log")
        outs.append(out)
        readies.append(ready)
        errlogs.append(errlog)
        procs.append(_spawn(files, out, ready, go, errlog))
    deadline = time.time() + 600
    while not all(os.path.exists(r) for r in readies):
        for i, p in enumerate(procs):
            if p.poll() is not None and not os.path.exists(readies[i]):
                with open(errlogs[i]) as f:
                    tail = f.read()[-2000:]
                raise RuntimeError(
                    f"worker {i} ({tag}) died rc={p.returncode} before ready:\n{tail}"
                )
        if time.time() > deadline:
            raise TimeoutError(f"workers never became ready ({tag})")
        time.sleep(0.1)
    with open(go, "w") as f:
        f.write("go")
    for p in procs:
        p.wait(timeout=600)
    times = []
    for out in outs:
        with open(out) as f:
            times.append(json.load(f)["sec"])
    return max(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--files", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--ready", default="")
    ap.add_argument("--go", default="")
    args = ap.parse_args()
    if args.worker:
        _worker(args.files.split(","), args.out, args.ready, args.go)
        return

    import glob

    import bench

    corpus = bench.ensure_bench_corpus(bench.SCALE_PAGES, bench.SCALE_WORDS)
    files = sorted(glob.glob(os.path.join(corpus, "pages.parquet", "*.parquet")))
    assert len(files) % N_WORKERS == 0, len(files)
    per = len(files) // N_WORKERS
    shards = [files[i * per:(i + 1) * per] for i in range(N_WORKERS)]

    # same-run host ceiling: what the box itself gives pure multiprocessing
    # for 8 -> 32 workers, measured minutes from the Spark numbers so the
    # comparison isn't against a stale capacity reading
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_scaling

    host_8 = bench_scaling.measure_host_ceiling(8)
    host_32 = bench_scaling.measure_host_ceiling(32)
    host_eff = (host_32 / host_8) / 4

    workdir = tempfile.mkdtemp(prefix="bench_mp_")
    t_n = _run_level([files], "n", workdir)           # 1 × local[8], all files
    t_4n = _run_level(shards, "4n", workdir)          # 4 × local[8], quarters
    eff = t_n / (N_WORKERS * t_4n)
    print(json.dumps({
        "metric": "extract_path_process_isolated_scaling",
        "t_1x8_all_files_sec": round(t_n, 2),
        "t_4x8_max_quarter_sec": round(t_4n, 2),
        "strong_scaling_efficiency_8_to_4x8": round(eff, 3),
        "host_mp_ceiling_8_to_32": round(host_eff, 3),
        "engine_vs_host_ceiling": round(eff / host_eff, 3) if host_eff else None,
        "n_files": len(files),
        "workers": N_WORKERS,
        "cores_per_worker": CORES,
    }))


if __name__ == "__main__":
    main()
