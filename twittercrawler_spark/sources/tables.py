"""Committed parquet warehouse — Iceberg-style snapshots without Iceberg jars.

The north rule asks for per-round Iceberg commits with exact resume. The
sandbox image has no Iceberg runtime jar, so this layer provides the same
transactional contract on plain parquet:

* each table is a directory of ``round=<r>`` partitions;
* a round is VISIBLE only once it appears in the warehouse-level manifest
  ``_commits.json``, which is replaced atomically (tmp file + ``os.replace``)
  AFTER all of the round's tables are fully written;
* resume = max committed round; a crash mid-round leaves orphan ``round=``
  dirs that are invisible (and are overwritten when the round re-runs).

This replaces the reference's ``saving_period`` gzip flush
(pages/Crawler.py:51-52,127-146) and per-iteration JSON checkpoints
(pages/Postprocess_scripts/Stance_Detection.py:318-323) with stronger,
exactly-resumable semantics. On a real cluster the same API maps 1:1 onto an
Iceberg catalog (append/overwrite snapshots + snapshot-id manifest); only
this file would change.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest -------------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_commits.json")

    def _load_manifest(self) -> dict[str, Any]:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"rounds": [], "meta": {}}

    def committed_rounds(self) -> list[int]:
        return sorted(r["round"] for r in self._load_manifest()["rounds"])

    def last_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def round_info(self, rnd: int) -> dict[str, Any] | None:
        for r in self._load_manifest()["rounds"]:
            if r["round"] == rnd:
                return r
        return None

    def commit(self, rnd: int, metrics: dict[str, Any] | None = None) -> None:
        """Atomically publish round ``rnd`` (idempotent on re-commit)."""
        m = self._load_manifest()
        m["rounds"] = [r for r in m["rounds"] if r["round"] != rnd]
        m["rounds"].append({"round": rnd, "metrics": metrics or {}})
        m["rounds"].sort(key=lambda r: r["round"])
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)

    # -- data -----------------------------------------------------------------
    def _round_dir(self, name: str, rnd: int) -> str:
        return os.path.join(self.root, name, f"round={rnd}")

    def write(self, name: str, df: DataFrame, rnd: int) -> str:
        """Write one table's data for round ``rnd`` (invisible until commit).

        ``mode=overwrite`` makes re-running an uncommitted/crashed round safe.
        """
        path = self._round_dir(name, rnd)
        df.write.mode("overwrite").parquet(path)
        return path

    def read(
        self, spark: SparkSession, name: str, upto: int | None = None
    ) -> DataFrame | None:
        """Union of all committed rounds of an append-style table."""
        rounds = [r for r in self.committed_rounds() if upto is None or r <= upto]
        paths = [self._round_dir(name, r) for r in rounds]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return None
        return (
            spark.read.option("basePath", os.path.join(self.root, name)).parquet(*paths)
        )

    def read_uncommitted(
        self, spark: SparkSession, name: str, rnd: int, schema=None
    ) -> DataFrame:
        """Read a round's data BEFORE its commit — for in-round dataflow that
        uses the just-written durable table as its materialization point
        (cheaper and GC-safer than caching wide rows on-heap).

        The in-round caller just WROTE the table and still holds its
        DataFrame, so it passes that ``schema`` — skipping the driver-side
        footer-read schema inference on the shared disk (part of the fixed
        per-round floor the scaling evidence tracks)."""
        reader = spark.read.option("basePath", os.path.join(self.root, name))
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self._round_dir(name, rnd))

    def read_round(self, spark: SparkSession, name: str, rnd: int) -> DataFrame | None:
        """One committed round of a snapshot-style table."""
        if rnd not in self.committed_rounds():
            return None
        path = self._round_dir(name, rnd)
        if not os.path.isdir(path):
            return None
        return spark.read.option(
            "basePath", os.path.join(self.root, name)
        ).parquet(path)
