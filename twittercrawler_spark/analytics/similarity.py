"""Similarity search over the embeddings table (array<float> column).

Two paths, per the scale doctrine:
* ``knn_bruteforce`` — exact cosine top-k per query vector. The baseline:
  a broadcast of the (small) query set against the full corpus, window
  top-k. At 100 TB this is the per-batch scoring pattern (queries always
  broadcast; corpus never shuffles).
* ``ann_lsh_bucketed`` — sign-random-projection LSH: 8 deterministic ±1
  hyperplanes bucket every vector into one of 256 cells; candidate pairs
  come from an equi-join on the bucket id, then exact cosine verifies. The
  pair space is per-bucket, never n². Hyperplane components derive from the
  shared md5 base hash; the projection is computed on integer-quantized
  embeddings so the bucket id is exact-integer — bit-identical across
  engines and partitionings.

Cosine is the same sequential fold in Spark (``F.aggregate``) and DuckDB
(``list_reduce``) → identical IEEE doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import py_base_hash32, t
from .dedup import _COS_SQL, _cos_cols, _emb


def _sign_of(salt: str) -> int:
    """±1 from the shared 32-bit md5 base hash — the Python twin of the
    oracle's CASE WHEN CAST('0x'||substr(md5(salt),1,8) AS BIGINT)%2."""
    return 1 if py_base_hash32(salt) % 2 == 1 else -1

QUERIES: dict = {}
ORACLES: dict = {}

KNN_QUERIES = 5  # vec_id < 5 are the query vectors
KNN_K = 10
N_PLANES = 8
ANN_COSINE_T = 0.3
# near-dup LSH: 2 independent hash tables of 6 planes each (OR-amplified:
# a pair is a candidate if it collides in ANY table — recall amplification
# for the high-similarity band near-dup detection cares about)
ND_TABLES = 2
ND_PLANES = 6
ND_COSINE_T = 0.4


def q(name: str, sql: str | None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


@q(
    "knn_bruteforce",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    p AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COS_SQL} AS cos
      FROM e a JOIN e b ON a.vec_id < {KNN_QUERIES} AND a.vec_id <> b.vec_id),
    r AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM p)
    SELECT query_id, neighbor_id, rank, round(cos, 6) AS sim
    FROM r WHERE rank <= {KNN_K}
    """,
)
def knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    queries = F.broadcast(
        e.filter(F.col("vec_id") < KNN_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("vq")
        )
    )
    corpus = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vc"))
    cos = _cos_cols(F.col("vq"), F.col("vc"))
    scored = (
        queries.join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("sim"))
    )


# Deterministic ±1 hyperplane component for (plane j, dim d): parity of the
# shared base hash of "j:d". Quantized projection keeps bucketing integer.
_BUCKET_SQL = f"""
    planes AS (
      SELECT j, d,
             CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                  CAST(d AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END AS r
      FROM unnest(generate_series(0, {N_PLANES - 1})) AS gj(j)
      CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    vq AS (
      SELECT vec_id, d, CAST(round(embedding[d]::DOUBLE * 1000, 0) AS BIGINT) AS q
      FROM embeddings CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    proj AS (
      SELECT vq.vec_id, p.j, sum(vq.q * p.r) AS dot
      FROM vq JOIN planes p ON vq.d = p.d
      GROUP BY 1, 2),
    buckets AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j)
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM proj GROUP BY 1)
"""


@q(
    "ann_lsh_bucketed",
    f"""
    WITH {_BUCKET_SQL},
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
    cand AS (
      SELECT ba.vec_id AS x, bb.vec_id AS y
      FROM buckets ba JOIN buckets bb
        ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id)
    SELECT c.x, c.y, round({_COS_SQL}, 6) AS sim
    FROM cand c JOIN e a ON a.vec_id = c.x JOIN e b ON b.vec_id = c.y
    WHERE {_COS_SQL} >= {ANN_COSINE_T}
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    # constant hyperplane dim (8×64 rows) built driver-side with the same
    # md5 parity as the oracle SQL — a literal dimension table, no join
    # chain of ranges in the plan
    planes = F.broadcast(
        spark.createDataFrame(
            [
                (j, d, _sign_of(f"{j}:{d}"))
                for j in range(N_PLANES)
                for d in range(1, 65)
            ],
            "j int, d int, r int",
        )
    )
    vq = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("d0", "val"),
    ).select(
        "vec_id",
        (F.col("d0") + 1).alias("d"),
        F.round(F.col("val").cast("double") * 1000, 0).cast("bigint").alias("q"),
    )
    proj = (
        vq.join(planes, "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("q") * F.col("r")).alias("dot"))
    )
    buckets = proj.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("bucket")
    )
    ba = buckets.select(F.col("vec_id").alias("x"), "bucket")
    bb = buckets.select(F.col("vec_id").alias("y"), "bucket")
    cand = ba.join(bb, "bucket").filter(F.col("x") < F.col("y")).select("x", "y")
    e = _emb(spark, sf)
    cos = _cos_cols(F.col("va"), F.col("vb"))
    return (
        cand.join(e.select(F.col("vec_id").alias("x"), F.col("v").alias("va")), "x")
        .join(e.select(F.col("vec_id").alias("y"), F.col("v").alias("vb")), "y")
        .filter(cos >= ANN_COSINE_T)
        .select("x", "y", F.round(cos, 6).alias("sim"))
    )


# ---------------------------------------------------------------------------
# Embedding near-dup, the SCALE path (the all-pairs dedup_embedding_cosine in
# dedup.py is the small-scale oracle shape): candidates come from equi-joins
# on (table, bucket) over ND_TABLES independent sign-random-projection hash
# tables — OR-amplification raises recall in the high-similarity band while
# the pair space stays per-bucket, never n². Exact cosine verifies, so every
# emitted pair is a true >= ND_COSINE_T near-dup. Deterministic integer
# projection (same scheme as ann_lsh_bucketed) keeps buckets bit-identical
# across engines and partitionings.
_ND_BUCKET_SQL = f"""
    nd_planes AS (
      SELECT t, j, d,
             CASE WHEN CAST('0x' || substr(md5(CAST(t AS VARCHAR) || ':' ||
                  CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT)
                  % 2 = 1 THEN 1 ELSE -1 END AS r
      FROM unnest(generate_series(0, {ND_TABLES - 1})) AS gt(t)
      CROSS JOIN unnest(generate_series(0, {ND_PLANES - 1})) AS gj(j)
      CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    nd_vq AS (
      SELECT vec_id, d, CAST(round(embedding[d]::DOUBLE * 1000, 0) AS BIGINT) AS q
      FROM embeddings CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    nd_proj AS (
      SELECT nd_vq.vec_id, p.t, p.j, sum(nd_vq.q * p.r) AS dot
      FROM nd_vq JOIN nd_planes p ON nd_vq.d = p.d
      GROUP BY 1, 2, 3),
    nd_buckets AS (
      SELECT vec_id, t,
             CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j)
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM nd_proj GROUP BY 1, 2)
"""


@q(
    "dedup_embedding_lsh",
    f"""
    WITH {_ND_BUCKET_SQL},
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
    cand AS (
      SELECT DISTINCT ba.vec_id AS x, bb.vec_id AS y
      FROM nd_buckets ba JOIN nd_buckets bb
        ON ba.t = bb.t AND ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id)
    SELECT c.x, c.y, round({_COS_SQL}, 6) AS sim
    FROM cand c JOIN e a ON a.vec_id = c.x JOIN e b ON b.vec_id = c.y
    WHERE {_COS_SQL} >= {ND_COSINE_T}
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    planes = F.broadcast(
        spark.createDataFrame(
            [
                (tb, j, d, _sign_of(f"{tb}:{j}:{d}"))
                for tb in range(ND_TABLES)
                for j in range(ND_PLANES)
                for d in range(1, 65)
            ],
            "t int, j int, d int, r int",
        )
    )
    vq = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("d0", "val")
    ).select(
        "vec_id",
        (F.col("d0") + 1).alias("d"),
        F.round(F.col("val").cast("double") * 1000, 0).cast("bigint").alias("q"),
    )
    proj = (
        vq.join(planes, "d")
        .groupBy("vec_id", "t", "j")
        .agg(F.sum(F.col("q") * F.col("r")).alias("dot"))
    )
    buckets = proj.groupBy("vec_id", "t").agg(
        F.sum(
            F.when(F.col("dot") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("bucket")
    )
    ba = buckets.select(F.col("vec_id").alias("x"), "t", "bucket")
    bb = buckets.select(F.col("vec_id").alias("y"), "t", "bucket")
    cand = (
        ba.join(bb, ["t", "bucket"])
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
        .distinct()
    )
    e = _emb(spark, sf)
    cos = _cos_cols(F.col("va"), F.col("vb"))
    return (
        cand.join(e.select(F.col("vec_id").alias("x"), F.col("v").alias("va")), "x")
        .join(e.select(F.col("vec_id").alias("y"), F.col("v").alias("vb")), "y")
        .filter(cos >= ND_COSINE_T)
        .select("x", "y", F.round(cos, 6).alias("sim"))
    )
