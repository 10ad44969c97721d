"""Source/sink format coverage (SURVEY.md §2.1 S2-S7).

The reference moves data through gzip NDJSON dumps, partitioned CSV trees,
and recursive directory listings; these tests pin the Spark equivalents:
transparent .gz JSON read, PERMISSIVE malformed-line handling, Hive-style
partitioned CSV write/read, and recursive multi-file reads.
"""

import gzip
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_gzip_ndjson_roundtrip(spark, tmp_path):
    """S2/S3: gz NDJSON sink + transparent decompressing scan."""
    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 3).alias("topic"),
    )
    out = str(tmp_path / "dump")
    df.write.option("compression", "gzip").partitionBy("topic").json(out)
    # partition dirs + gz part files, like the reference's per-topic dumps
    topics = [d for d in os.listdir(out) if d.startswith("topic=")]
    assert sorted(topics) == ["topic=0", "topic=1", "topic=2"]
    back = spark.read.json(out)
    assert back.count() == 100
    assert {r["id"] for r in back.collect()} == set(range(100))


def test_permissive_malformed_json_skip(spark, tmp_path):
    """S4/P7: malformed lines survive the read and are filterable, matching
    the reference's try/except-continue (PreprocessDump.py:202-224)."""
    p = tmp_path / "lines.json.gz"
    with gzip.open(p, "wt") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "text": f"t{i}"}) + "\n")
        f.write("{not json at all\n")
        f.write(json.dumps({"id": 10, "text": "t10"}) + "\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(str(p)).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 11
    assert bad.count() == 1
    df.unpersist()


def test_partitioned_csv_roundtrip(spark, tmp_path):
    """S5/S6/D4: Hive-style (topic, lang) partitioned CSV, the reference's
    tweets_dump_csv/<topic>/<lang>/ tree (PreprocessDump.py:107-134)."""
    rows = [(i, f"txt{i}", f"t{i % 2}", ["tr", "en"][i % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string, topic string, lang string")
    out = str(tmp_path / "csv_lake")
    df.write.option("header", True).partitionBy("topic", "lang").csv(out)
    assert os.path.isdir(os.path.join(out, "topic=t0", "lang=tr"))
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 40
    assert set(back.columns) == {"id", "text", "topic", "lang"}


def test_recursive_file_lookup(spark, tmp_path):
    """S7: nested directory tree → one logical dataset (os.walk analog)."""
    for sub in ["a/x", "a/y", "b"]:
        d = tmp_path / sub
        d.mkdir(parents=True)
        with open(d / "part.json", "w") as f:
            f.write(json.dumps({"v": sub}) + "\n")
    df = (
        spark.read.option("recursiveFileLookup", "true").json(str(tmp_path))
    )
    assert df.count() == 3
    assert {r["v"] for r in df.collect()} == {"a/x", "a/y", "b"}


def test_pylit_lines_source(spark, tmp_path):
    """S4 variant: Python-dict-literal dump lines (ast.literal_eval path,
    ref User Based Dashboard.py:94-108) with malformed-skip semantics."""
    from twittercrawler_spark.sources.lines import read_pylit_lines

    p = tmp_path / "dump.txt"
    lines = [
        "{'id': 1, 'text': 'hello', 'ok': True}",
        "{'id': 2, 'text': None, 'extra': [1, 2]}",
        "{'id': 3, 'text': 'quoted \\'x\\''}",
        "not a literal at all",
        "{'id': 4, 'text': 'trailing",  # syntax error
        "[1, 2, 3]",  # literal but not a dict
        "{'text': 'no id'}",
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_pylit_lines(spark, str(p), "id long, text string")
    rows = {r["id"]: r["text"] for r in df.collect()}
    assert rows == {1: "hello", 2: None, 3: "quoted 'x'", None: "no id"}


def test_zip_lines_source(spark, tmp_path):
    """S3 zip variant (ref Functions.py:20-33 zip_open): archives → lines."""
    import zipfile

    from twittercrawler_spark.sources.lines import read_zip_lines

    for i in range(2):
        with zipfile.ZipFile(tmp_path / f"dump{i}.zip", "w") as zf:
            zf.writestr(f"part{i}/a.txt", "l1\nl2\n")
            zf.writestr(f"part{i}/b.txt", "only\n")
    (tmp_path / "ignore.txt").write_text("not a zip")
    df = read_zip_lines(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    got = {(r["member"], r["line_no"], r["line"]) for r in rows}
    assert ("part0/a.txt", 2, "l2") in got and ("part1/b.txt", 1, "only") in got


def test_pylit_lines_skips_type_mismatch(spark, tmp_path):
    """A well-formed dict whose value type contradicts the schema is SKIPPED
    (the PERMISSIVE contract), never an Arrow-cast crash."""
    from twittercrawler_spark.sources.lines import read_pylit_lines

    p = tmp_path / "dump2.txt"
    p.write_text(
        "\n".join(
            [
                "{'id': 1, 'text': 'good'}",
                "{'id': 'abc', 'text': 'bad id type'}",
                "{'id': True, 'text': 'bool is not long'}",
                "{'id': 2, 'text': 3.5}",
                "{'id': 3}",
            ]
        )
        + "\n"
    )
    df = read_pylit_lines(spark, str(p), "id long, text string")
    rows = {r["id"]: r["text"] for r in df.collect()}
    assert rows == {1: "good", 3: None}


def test_zip_lines_skips_binary_members(spark, tmp_path):
    """Non-UTF-8 / binary members are skipped, not fatal."""
    import zipfile

    from twittercrawler_spark.sources.lines import read_zip_lines

    with zipfile.ZipFile(tmp_path / "mixed.zip", "w") as zf:
        zf.writestr("good.txt", "a\nb\n")
        zf.writestr("img.bin", bytes([0xFF, 0xFE, 0x00, 0x9C] * 8))
    rows = read_zip_lines(spark, str(tmp_path)).collect()
    assert {(r["member"], r["line"]) for r in rows} == {("good.txt", "a"), ("good.txt", "b")}


def test_parquet_bounds_scoped_not_global(spark, tmp_path):
    """Round-3 regression guard: the page-row parquet bounds must NOT be
    session defaults (they cost numeric scans 11x, VERDICT r3); the writer
    bound is applied per-write for wide tables and bounds later scans via
    row-group granularity (a vectorized reader batch never spans one)."""
    from twittercrawler_spark.session import PAGE_ROW_GROUP_BYTES, page_row_scan
    from twittercrawler_spark.sources.tables import Warehouse

    key = "spark.sql.parquet.columnarReaderBatchSize"
    # session default restored (Spark default 4096; anything >= 2048 is sane)
    assert int(spark.conf.get(key, "4096")) >= 2048
    with page_row_scan(spark, batch_rows=512):
        assert spark.conf.get(key) == "512"
    assert int(spark.conf.get(key, "4096")) >= 2048

    # writer bound: ~12 MB of incompressible rows with a 1 MB row-group bound
    # must split into many row groups (parquet-mr checks size every ~100 rows)
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    df = spark.range(12000)
    cols = [
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(i))), 256)
        for i in range(16)
    ]
    df = df.withColumn("payload", F.concat(*cols)).coalesce(1)
    wh = Warehouse(str(tmp_path / "wh"))
    path = wh.write("pages_canon", df, 0, row_group_bytes=1024 * 1024)
    f = glob.glob(path + "/*.parquet")[0]
    assert pq.ParquetFile(f).metadata.num_row_groups >= 5
    assert PAGE_ROW_GROUP_BYTES == 16 * 1024 * 1024
