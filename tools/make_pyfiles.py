#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files``.

Writes ``dist/twittercrawler_spark.zip`` containing the package's .py files
(no tests, no caches) so executors can import it without a repo checkout:

    python tools/make_pyfiles.py
    spark-submit --py-files dist/twittercrawler_spark.zip tools/submit_crawl.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "twittercrawler_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "twittercrawler_spark")
    # deterministic archive: sorted walk, fixed timestamp
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                arc = os.path.relpath(full, REPO)
                info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as f:
                    zf.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
