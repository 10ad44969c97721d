"""Line-oriented sources the reference reads that plain ``spark.read`` can't.

* :func:`read_pylit_lines` — dump lines written as PYTHON dict literals
  (single quotes, ``True``/``None``), which ``from_json`` rejects. The
  reference parses them row-at-a-time with ``ast.literal_eval``
  (`/root/reference/pages/User Based Dashboard.py:94-108`,
  `pages/Preprocess_scripts/PreprocessDump.py:202-211` fallback path); here
  the same parse runs as an Arrow-batched ``mapInPandas`` stage with
  malformed-line skip semantics (SURVEY.md §2 S4/P7).
* :func:`read_zip_lines` — text lines out of zip archives
  (`/root/reference/pages/Preprocess_scripts/Functions.py:20-33``zip_open``).
  Spark has no zip codec, so archives load as ``binaryFile`` rows and a
  ``mapInPandas`` stage fans each archive out to (archive, member, line_no,
  line) rows. Scale note: parallelism is per-ARCHIVE (a zip is not
  splittable — same at 100 TB, which is why the crawl warehouse itself
  stores parquet; this source exists for ingesting legacy dumps).
"""

from __future__ import annotations

import ast
import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_pylit_lines(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Parse Python-dict-literal lines into ``schema`` columns.

    Lines that fail ``ast.literal_eval`` (or don't evaluate to a dict) are
    SKIPPED — the PERMISSIVE-mode analog for a format json parsers reject.
    Missing keys yield nulls; extra keys are ignored.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    names = [f.name for f in schema.fields]
    # python-type gate per declared field: a parsed dict whose value has the
    # wrong type must be SKIPPED like any other malformed line, not crash
    # the Arrow conversion (bool is excluded from the int family on purpose)
    _OK: dict[type, tuple[type, ...]] = {
        T.LongType: (int,),
        T.IntegerType: (int,),
        T.DoubleType: (int, float),
        T.FloatType: (int, float),
        T.BooleanType: (bool,),
        T.StringType: (str,),
    }
    checks = [(f.name, _OK.get(type(f.dataType))) for f in schema.fields]

    def _row_ok(obj: dict) -> bool:
        for name, ok_types in checks:
            v = obj.get(name)
            if v is None or ok_types is None:
                continue
            if not isinstance(v, ok_types) or (
                isinstance(v, bool) and bool not in ok_types
            ):
                return False
        return True

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                try:
                    obj = ast.literal_eval(line)
                except (ValueError, SyntaxError):
                    continue
                if not isinstance(obj, dict) or not _row_ok(obj):
                    continue
                rows.append(tuple(obj.get(n) for n in names))
            yield pd.DataFrame(rows, columns=names)

    return spark.read.text(path).mapInPandas(parse, schema)


ZIP_LINES_SCHEMA = T.StructType(
    [
        T.StructField("archive", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("line_no", T.LongType()),
        T.StructField("line", T.StringType()),
    ]
)


def read_zip_lines(spark: SparkSession, path: str) -> DataFrame:
    """Every text line of every member of every zip archive under ``path``."""

    def unzip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for archive, blob in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                    for member in zf.namelist():
                        if member.endswith("/"):
                            continue
                        try:  # binary / non-UTF-8 members are SKIPPED, not fatal
                            text = zf.read(member).decode("utf-8")
                        except UnicodeDecodeError:
                            continue
                        lines = text.splitlines()
                        yield pd.DataFrame(
                            {
                                "archive": [archive] * len(lines),
                                "member": [member] * len(lines),
                                "line_no": range(1, len(lines) + 1),
                                "line": lines,
                            }
                        )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path)
        .select("path", "content")
        .mapInPandas(unzip, ZIP_LINES_SCHEMA)
    )
