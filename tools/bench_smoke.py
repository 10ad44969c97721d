"""Pre-commit bench smoke for session-config changes.

Round 3 shipped a 3x headline regression because a session.py change landed
on the strength of one scaling measurement without re-running the headline
shapes. This gate times a handful of headline queries (min of 3 fresh-plan
trials, absorbing host jitter on the shared VM) at sf0.01 and fails if any
exceeds a generous envelope — 2x the pinned calm-host time. Run it before
committing ANYTHING that touches twittercrawler_spark/session.py:

    python tools/bench_smoke.py            # uses /root/testdata/sf0.01
    python tools/bench_smoke.py <sf_dir>

The envelope numbers are calm-host min-of-3 at local[32]/sf0.01 (re-pin with
--pin when the query set or testdata changes). A FAIL on a quiet host means
a real regression; on a noisy host (the tool prints steal%/sys%), re-run.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# calm-host min-of-3 seconds at local[32], sf0.01 (pinned round 4)
ENVELOPE = {
    "pricing_summary": 0.85,
    "token_stats": 0.40,
    "doc_fingerprint": 0.85,
    "dedup_simhash": 2.60,
}
SLACK = 2.0  # fail at > SLACK x pin


def _cpu():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    pin_mode = "--pin" in sys.argv

    from bench import BENCH_CONF, _force
    from twittercrawler_spark.analytics import ALL_QUERIES
    from twittercrawler_spark.session import get_spark

    spark = get_spark("bench_smoke", cores=32, extra_conf=BENCH_CONF)
    c0 = _cpu()
    results: dict[str, float] = {}
    for name in ENVELOPE:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _force(ALL_QUERIES[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        results[name] = round(best, 3)
    c1 = _cpu()
    spark.stop()
    d = [b - a for a, b in zip(c0, c1)]
    tot = max(sum(d), 1)
    print(f"host during run: steal={100*d[7]/tot:.1f}% sys={100*d[2]/tot:.1f}%")

    if pin_mode:
        print("pin these as ENVELOPE:", results)
        return 0

    failed = []
    for name, best in results.items():
        pin = ENVELOPE[name]
        verdict = "ok" if best <= SLACK * pin else "FAIL"
        print(f"{verdict:4s} {name}: {best:.3f}s (pin {pin:.2f}s, limit {SLACK * pin:.2f}s)")
        if verdict == "FAIL":
            failed.append(name)
    if failed:
        print(f"REGRESSION: {', '.join(failed)} — do not commit session.py changes")
        return 1
    print("smoke ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
