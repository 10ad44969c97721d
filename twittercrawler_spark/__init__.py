"""twittercrawler_spark — a PySpark-native crawl frontier + analytics engine.

A from-scratch, idiomatic-Spark re-expression of the capabilities of the
reference repo alperbahcekapili/TwitterCrawler (see SURVEY.md): a distributed
URL frontier + politeness-budgeted fetch scheduler over Common-Crawl-style
page tables, plus the reference's full analytics operator inventory as
DataFrame/SQL queries.

Layout:
    functions/  pure-Python parity functions + their vectorized pandas-UDF twins
    sources/    synthetic deterministic corpus generator; parquet table layer
                with atomic commit manifests (Iceberg-style, parquet fallback)
    frontier/   seen-set (Bloom prefilter + exact anti-join), politeness
                scheduler (salted host buckets, two-phase top-k), round loop
                with checkpoint/resume, pure-Python reference simulator
    operators/  SURVEY.md §2 analytics operators as (spark, sf_dir) queries
    streaming/  Structured Streaming equivalents (windowed counts)
"""

__version__ = "0.1.0"
