"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline; ``queries``/``oracle_sql`` expose the
full operator inventory (SURVEY.md §2 + dedup/similarity/text-analysis/
multimodal suites + crawl-engine outputs) for the driver's DuckDB
correctness comparison at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twittercrawler_spark.analytics import ALL_ORACLES, ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the distributed crawl's parity-critical fetch order.

    Runs the full frontier pipeline (bootstrap → politeness-scheduled
    rounds → seen-set dedup → extraction) on the deterministic synthetic
    corpus and returns the committed global fetch sequence.
    """
    return ALL_QUERIES["crawl_fetch_order"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; crawl/* and multimodal_decode are deliberately absent
    (iterative/stateful or pandas-UDF ops → driver rows-only check; their
    strong gate is tests/test_crawl_parity.py)."""
    return dict(ALL_ORACLES)
