"""Analytics query registry: every operator from SURVEY.md §2 plus the
training-data-pipeline suites (dedup, similarity, text stats, multimodal)
and the crawl-engine outputs, each as (Spark program, DuckDB oracle SQL).
"""

from __future__ import annotations

from . import (
    classify,
    crawl_queries,
    curation,
    dedup,
    graph,
    multimodal,
    similarity,
    search,
    star,
    temporal,
    textstats,
)

_MODULES = [star, graph, dedup, similarity, textstats, multimodal, classify, curation, crawl_queries, temporal, search]

ALL_QUERIES: dict = {}
ALL_ORACLES: dict = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        assert _k not in ALL_QUERIES, f"duplicate query name {_k}"
        ALL_QUERIES[_k] = _v
    ALL_ORACLES.update(_m.ORACLES)
