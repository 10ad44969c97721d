"""Batched model scoring over the documents table (SURVEY.md §2 F12/U3).

Re-creates the reference's classifier pipeline shape — clean text →
featurize → score a pickled model in fixed-size batches through a worker
(`/root/reference/pages/Postprocess_scripts/Random_Forest_Classifier.py:14-75`,
consumed in 100-row queue batches at
`/root/reference/pages/User Based Dashboard.py:257-275`) — as a Spark
``mapInPandas`` stage: Arrow-batched pandas frames stream through a Python
scorer, exactly the structure a real TF-IDF + RandomForest (or any sklearn /
torch model) plugs into.

The sandbox has no model artifact, so the "model" is a DETERMINISTIC
hashing-TF + fixed-weight linear scorer, chosen so the whole computation is
integer arithmetic and therefore bit-identical in the DuckDB oracle:

* token → feature bucket: shared 32-bit md5 base hash mod ``D``;
* bucket weight: ``(md5("w:" + bucket) % 2001) - 1000`` ∈ [-1000, 1000];
* score_int = Σ_token-occurrences weight[bucket]  (integer, order-free);
* score = score_int / (n_tokens · 1000), label = sign.

Scale notes: the scorer is a pure map stage — no shuffle, no driver round
trip; weights (D integers) live in the closure exactly like a broadcast
model artifact; Arrow batch size is bounded by the session's
``maxRecordsPerBatch`` (the analog of the reference's 100-row queue batch).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ._util import py_base_hash32, t, t_split

QUERIES: dict = {}
ORACLES: dict = {}

D = 256  # hashing-TF feature dimension

#: fixed "model": one signed integer weight per feature bucket
WEIGHTS = [(py_base_hash32(f"w:{b}") % 2001) - 1000 for b in range(D)]

_WS = re.compile(r"\s+")

_SCHEMA = "doc_id bigint, n_tokens bigint, score_int bigint"


def _score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The model-scoring worker: one pandas frame in, one scored frame out.

    A real deployment swaps the body for ``model.predict(featurize(batch))``;
    the bucket-hash cache plays the role of the fitted vectorizer vocabulary.
    Only INTEGER accumulators leave the worker — the final float (and its
    rounding mode) is a JVM expression, so the oracle comparison is exact.
    """
    bucket_cache: dict[str, int] = {}
    for pdf in batches:
        out = {"doc_id": [], "n_tokens": [], "score_int": []}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if not isinstance(text, str):
                continue  # NULL text: the oracle emits no row — so must we
            toks = [w for w in _WS.split(text.lower()) if w]
            if not toks:
                continue  # featurizer contract: empty docs produce no row
            s = 0
            for tk in toks:
                b = bucket_cache.get(tk)
                if b is None:
                    b = bucket_cache[tk] = py_base_hash32(tk) % D
                s += WEIGHTS[b]
            out["doc_id"].append(int(doc_id))
            out["n_tokens"].append(len(toks))
            out["score_int"].append(s)
        yield pd.DataFrame(out)


def q(name: str, sql: str | None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


@q(
    "text_classify_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tk
      FROM documents),
    tk2 AS (SELECT doc_id, tk FROM tok WHERE tk <> ''),
    w AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5('w:' || CAST(
                  CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) % {D}
              AS VARCHAR)), 1, 8) AS BIGINT) % 2001) - 1000 AS wt
      FROM tk2)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(wt) AS BIGINT) AS score_int,
           round(sum(wt) / (count(*) * 1000.0), 6) AS score,
           CASE WHEN sum(wt) > 0 THEN 'pos' ELSE 'neg' END AS label
    FROM w GROUP BY doc_id
    """,
)
def text_classify_scores(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = t_split(spark, sf, "documents").select("doc_id", "text")
    scored = d.mapInPandas(_score_batches, _SCHEMA)
    return scored.select(
        "doc_id",
        "n_tokens",
        "score_int",
        F.round(F.col("score_int") / (F.col("n_tokens") * 1000.0), 6).alias("score"),
        F.when(F.col("score_int") > 0, "pos").otherwise("neg").alias("label"),
    )


def classify_with_model(df: DataFrame, predict) -> DataFrame:
    """Generic hook: score ``df`` (doc_id, text) with a caller-supplied
    ``predict(list[str]) -> list[float]`` in Arrow batches — the seam where
    a real pickled model (the reference's RandomForest) would be injected.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = predict(list(pdf["text"].astype(str)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "score": scores})

    return df.mapInPandas(run, "doc_id bigint, score double")


class HashingLinearModel:
    """A minimal REAL model artifact for the :func:`classify_with_model`
    seam: pickle-able state (feature dim + weight vector), a
    ``predict(list[str]) -> list[float]`` method — the same load-once →
    ship-to-workers → batch-predict lifecycle as the reference's pickled
    RandomForest (`/root/reference/pages/Postprocess_scripts/
    Random_Forest_Classifier.py:53-75`). The driver unpickles it once and
    the bound ``predict`` travels to executors inside the serialized
    ``mapInPandas`` closure — the broadcast-model pattern (weights cross
    the wire once per task, never per row). Deterministic arithmetic, so a
    distributed run is bit-identical to a local ``predict`` call.
    """

    def __init__(self, dim: int = D, weights: list[int] | None = None):
        self.dim = int(dim)
        self.weights = list(weights) if weights is not None else list(WEIGHTS)

    def predict(self, texts: list[str]) -> list[float]:
        out: list[float] = []
        for text in texts:
            toks = [w for w in _WS.split(str(text).lower()) if w]
            if not toks:
                out.append(0.0)
                continue
            s = sum(self.weights[py_base_hash32(tk) % self.dim] for tk in toks)
            out.append(s / (len(toks) * 1000.0))
        return out
