"""Similarity search over the embeddings table (array<float> column).

Two paths, per the scale doctrine:
* ``knn_bruteforce`` — exact cosine top-k per query vector. The baseline:
  a broadcast of the (small) query set against the full corpus, window
  top-k. At 100 TB this is the per-batch scoring pattern (queries always
  broadcast; corpus never shuffles).
* ``ann_lsh_bucketed`` / ``dedup_embedding_lsh`` — multi-table
  sign-random-projection LSH: T independent hash tables of P deterministic
  ±1 hyperplanes each bucket every vector into one of T·2^P cells;
  candidate pairs come from an equi-join on (table, bucket), then exact
  cosine verifies. The pair space is per-bucket, never n².

Bucket-space sizing (the 100 TB contract): P is NOT a fixed constant — it
is computed from the corpus count as P = max(floor, ceil(log2(n / B)))
(:func:`srp_planes`) for a constant target bucket occupancy B. The cell
count 2^P then grows LINEARLY with n, so the expected candidate-pair count
is ~n·B·T/2 — linear in corpus size — and the equi-join key space (the
shuffle parallelism bound) grows with the corpus instead of capping it:
n=500 → P=6 (64 cells/table), n=2000 → P=8, n=10^9 at B=8 → P=27 (~10^8
cells/table). BOTH engines derive P from the same count (the oracle SQL
computes it in a CTE; the Spark program counts the scan), so the buckets
stay bit-identical. Recall for the high-similarity band is controlled
independently by the OR-table count T: collision probability per table for
angle θ is (1 − θ/π)^P, overall 1 − (1 − p)^T — raise T to buy recall,
never by shrinking the bucket space.

Hyperplane components derive from the shared md5 base hash; the projection
is computed on integer-quantized embeddings so the bucket id is
exact-integer. Cosine is the same sequential fold in Spark
(``F.aggregate``) and DuckDB (``list_reduce``) → identical IEEE doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import py_base_hash32, t
from .dedup import _COS_SQL, _cos_cols, _emb

#: target expected vectors per LSH cell (B in the sizing rule)
SRP_TARGET_BUCKET = 8
#: minimum planes per table (guards degenerate tiny corpora)
SRP_FLOOR = 4


def srp_planes(n_vectors: int, target_bucket: int = SRP_TARGET_BUCKET,
               floor: int = SRP_FLOOR) -> int:
    """Planes per hash table for an expected ``target_bucket`` vectors per
    cell: P = max(floor, ceil(log2(n / target_bucket))). Keeps the per-cell
    pair space ~B²/2 regardless of corpus size — the property that makes
    the candidate join linear in n instead of n²/cells."""
    return max(floor, math.ceil(math.log2(max(2.0, n_vectors / target_bucket))))


#: SQL twin of srp_planes (a CTE producing one row (p)); MUST stay the same
#: formula — both engines derive the plane count from the same corpus count.
_SRP_PLANES_SQL = (
    f"SELECT greatest({SRP_FLOOR}, CAST(ceil(log2(greatest(2.0, "
    f"count(*) / {SRP_TARGET_BUCKET}.0))) AS INT)) AS p FROM embeddings"
)


#: one corpus-count job per sf_dir per process — srp/ivf sizing needs only
#: this scalar, and constructing several sized queries (or plan-only tests)
#: should not re-count the same static table
_N_VECTORS: dict[str, int] = {}


def _n_vectors(spark: SparkSession, sf: str) -> int:
    if sf not in _N_VECTORS:
        _N_VECTORS[sf] = t(spark, sf, "embeddings").count()
    return _N_VECTORS[sf]


def _sign_of(salt: str) -> int:
    """±1 from the shared 32-bit md5 base hash — the Python twin of the
    oracle's CASE WHEN CAST('0x'||substr(md5(salt),1,8) AS BIGINT)%2."""
    return 1 if py_base_hash32(salt) % 2 == 1 else -1

QUERIES: dict = {}
ORACLES: dict = {}

KNN_QUERIES = 5  # vec_id < 5 are the query vectors
KNN_K = 10
# OR-table counts (the recall knob; the bucket space is srp_planes-sized)
AN_TABLES = 4
ANN_COSINE_T = 0.3
ND_TABLES = 4
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


# Deterministic ±1 hyperplane component for (table t, plane j, dim d):
# parity of the shared base hash of "t:j:d". Quantized projection keeps
# bucketing integer. One SQL template serves both LSH families (they differ
# only in the table count and CTE prefix); the plane count comes from the
# nv CTE — computed from the corpus count, never a constant.
def _srp_bucket_sql(prefix: str, n_tables: int) -> str:
    return f"""
    {prefix}nv AS ({_SRP_PLANES_SQL}),
    {prefix}planes AS (
      SELECT t, j, d,
             CASE WHEN CAST('0x' || substr(md5(CAST(t AS VARCHAR) || ':' ||
                  CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT)
                  % 2 = 1 THEN 1 ELSE -1 END AS r
      FROM {prefix}nv
      CROSS JOIN unnest(generate_series(0, {n_tables - 1})) AS gt(t)
      CROSS JOIN unnest(generate_series(0, {prefix}nv.p - 1)) AS gj(j)
      CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    {prefix}vq AS (
      SELECT vec_id, d, CAST(round(embedding[d]::DOUBLE * 1000, 0) AS BIGINT) AS q
      FROM embeddings CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    {prefix}proj AS (
      SELECT {prefix}vq.vec_id, p.t, p.j, sum({prefix}vq.q * p.r) AS dot
      FROM {prefix}vq JOIN {prefix}planes p ON {prefix}vq.d = p.d
      GROUP BY 1, 2, 3),
    {prefix}buckets AS (
      SELECT vec_id, t,
             CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j)
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM {prefix}proj GROUP BY 1, 2)
"""


def _srp_buckets(spark: SparkSession, sf: str, n_tables: int) -> DataFrame:
    """(vec_id, t, bucket): the Spark twin of :func:`_srp_bucket_sql`.

    The plane count is srp_planes(corpus count) — a metadata-cheap count()
    over the parquet scan, the same number the oracle's nv CTE computes.
    The plane-sign matrix is MODEL STATE, exactly like the IVF quantizer: a
    64×(T·P) ±1 matrix (≤ a few KB) built driver-side from the shared md5
    base hash and closed over one Arrow-batched matmul pass — MAP-ONLY, no
    shuffle: every vector's T·P quantized projections come from one int64
    ``Q @ S`` per batch, so the bucketing stage shuffles nothing at any
    corpus size. (The previous form posexploded to n·64 rows, broadcast-
    joined a (t,j,d) dim, and ran two n·T·P-row aggregations — the same
    integer dots at ~100× the per-element cost plus a vec_id-keyed shuffle.)
    Quantization (round(x·1000) HALF-UP, matching both engines' round())
    keeps the dots exact-integer, so buckets stay bit-identical to the
    oracle's."""
    import numpy as np
    import pandas as pd

    n_planes = srp_planes(_n_vectors(spark, sf))
    # S[d-1, t*P + j] = ±1 for plane (t, j), dim d — the md5-derived model
    signs = np.array(
        [
            [_sign_of(f"{tb}:{j}:{d}") for tb in range(n_tables) for j in range(n_planes)]
            for d in range(1, 65)
        ],
        dtype=np.int64,
    )
    bit_w = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    t_ids = np.arange(n_tables, dtype=np.int32)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1000.0
            # round-half-away-from-zero: the engines' round(x, 0) contract
            q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
            dots = q @ signs  # (batch, T·P) exact int64
            bits = (dots >= 0).reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * bit_w).sum(axis=2, dtype=np.int64)  # (batch, T)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                    "t": np.tile(t_ids, len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return (
        t(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(assign, "vec_id bigint, t int, bucket bigint")
    )


def _srp_verified_pairs(
    spark: SparkSession, sf: str, buckets: DataFrame, cosine_t: float
) -> DataFrame:
    """Candidate pairs from the (t, bucket) equi-join, exact-cosine verified.

    Both sides of the candidate self-join consume ``buckets``; a lazy
    checkpoint runs the Arrow-batched SRP matmul once instead of once per
    side (A/B at sf0.1: 0.93 s vs 1.05 s min-of-4). The stored frame is
    n_tables rows of 3 ints per vector — metadata scale."""
    buckets = buckets.localCheckpoint(eager=False)
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
        .filter(cos >= cosine_t)
        .select("x", "y", F.round(cos, 6).alias("sim"))
    )


@q(
    "ann_lsh_bucketed",
    f"""
    WITH {_srp_bucket_sql("", AN_TABLES)},
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
    cand AS (
      SELECT DISTINCT ba.vec_id AS x, bb.vec_id AS y
      FROM buckets ba JOIN buckets bb
        ON ba.t = bb.t AND ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id)
    SELECT c.x, c.y, round({_COS_SQL}, 6) AS sim
    FROM cand c JOIN e a ON a.vec_id = c.x JOIN e b ON b.vec_id = c.y
    WHERE {_COS_SQL} >= {ANN_COSINE_T}
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    buckets = _srp_buckets(spark, sf, AN_TABLES)
    return _srp_verified_pairs(spark, sf, buckets, ANN_COSINE_T)


# ---------------------------------------------------------------------------
# Embedding near-dup, the SCALE path (the all-pairs dedup_embedding_cosine in
# dedup.py is the small-scale oracle shape): candidates come from equi-joins
# on (table, bucket) over ND_TABLES independent sign-random-projection hash
# tables — OR-amplification raises recall in the high-similarity band while
# the pair space stays per-bucket, never n². Exact cosine verifies, so every
# emitted pair is a true >= ND_COSINE_T near-dup. Plane count per table is
# srp_planes(corpus count) — see the module docstring's sizing rule.
@q(
    "dedup_embedding_lsh",
    f"""
    WITH {_srp_bucket_sql("nd_", ND_TABLES)},
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
    buckets = _srp_buckets(spark, sf, ND_TABLES)
    return _srp_verified_pairs(spark, sf, buckets, ND_COSINE_T)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cell-probing alternative to sign-LSH. A
# coarse quantizer of C = ceil(sqrt(n)) centroids partitions the corpus into
# cells; a query scores only the vectors in its NPROBE nearest cells. The
# 100 TB shape: the quantizer is MODEL STATE (C·64 ints, ~16 MB at n=10^9)
# — deterministically hash-sampled here, exactly where a k-means|| trainer
# would plug in without changing any dataflow — broadcast into ONE
# Arrow-batched numpy pass that assigns every vector (no shuffle, linear);
# the search is a broadcast equi-join of the tiny query-probe table against
# cell-keyed assignments, so the scored pair space is nprobe·cell-size per
# query, never n·q. Assignment arithmetic runs on the SAME JVM-quantized
# integer vectors in both engines (int64 dots are exact; the one division
# per score is the same IEEE op), so Spark and the DuckDB oracle pick
# bit-identical cells; tie-breaks are (cos DESC, cid ASC) everywhere.
IVF_NPROBE = 4
IVF_MIN_CENTROIDS = 4

#: JVM-side integer quantization — the same rounding the SRP path uses (and
#: NOT numpy round, which is banker's): one shared source of exact ints.
_QV_EXPR = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"


def ivf_centroids(n_vectors: int) -> int:
    """C = max(4, ceil(sqrt(n))) — cells scale with the corpus so expected
    cell size is ~sqrt(n) and probe cost per query is ~NPROBE·sqrt(n)."""
    return max(IVF_MIN_CENTROIDS, math.ceil(math.sqrt(max(1, n_vectors))))


_IVF_SQL = f"""
    WITH q AS (
      SELECT vec_id, d, CAST(round(embedding[d]::DOUBLE * 1000, 0) AS BIGINT) AS qv
      FROM embeddings CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    nn AS (SELECT count(*) AS n FROM embeddings),
    cent AS (
      SELECT vec_id AS cid FROM (
        SELECT vec_id, row_number() OVER (
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings) s JOIN nn
      ON s.rn <= greatest({IVF_MIN_CENTROIDS}, CAST(ceil(sqrt(nn.n)) AS INT))),
    cq AS (SELECT cent.cid, q.d, q.qv AS cqv FROM q JOIN cent ON q.vec_id = cent.cid),
    norms AS (SELECT vec_id, sum(qv * qv) AS nsq FROM q GROUP BY 1),
    score AS (
      SELECT dt.vec_id, dt.cid,
             dt.dot / (sqrt(nv.nsq) * sqrt(nc.nsq)) AS cos
      FROM (SELECT q.vec_id, cq.cid, sum(q.qv * cq.cqv) AS dot
            FROM q JOIN cq ON q.d = cq.d GROUP BY 1, 2) dt
      JOIN norms nv ON dt.vec_id = nv.vec_id
      JOIN norms nc ON dt.cid = nc.vec_id),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM score) s
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        FROM score WHERE vec_id < {KNN_QUERIES}) s
      WHERE rn <= {IVF_NPROBE}),
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
    cand AS (
      SELECT p.query_id, asn.vec_id AS neighbor_id
      FROM probes p JOIN assign asn ON p.cid = asn.cid
      WHERE asn.vec_id <> p.query_id),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {_COS_SQL} AS cos
      FROM cand c JOIN e a ON a.vec_id = c.query_id
                  JOIN e b ON b.vec_id = c.neighbor_id),
    r AS (
      SELECT query_id, neighbor_id, cos, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank, round(cos, 6) AS sim
    FROM r WHERE rank <= {KNN_K}
"""


_IVF_OUT_SCHEMA = "vec_id long, cid long"


def _ivf_quant(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "embeddings").selectExpr("vec_id", f"{_QV_EXPR} AS qv")


def _ivf_seed_centroids(quant: DataFrame, n_cent: int) -> list:
    """The coarse quantizer: C hash-sampled quantized vectors as
    (cid, qv) tuples ordered by cid asc — so numpy's first-max argmax
    matches the SQL (cos DESC, cid ASC) tie-break. This collect IS the
    design (quantizer = broadcast model state, like classifier weights) —
    C·64 ints, never corpus-sized."""
    rows = (
        quant.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(n_cent)
        .select("vec_id", "qv")
        .collect()
    )
    return sorted([(r["vec_id"], list(r["qv"])) for r in rows])


def _ivf_assigner(cent_rows: list, top_r: int):
    """Arrow-batched integer-exact assignment against the (cid, qv)
    quantizer: int64 matmul for dots (exact), one IEEE division per score —
    bit-identical to the oracle's per-(vec, cid) SQL scoring."""
    import numpy as np
    import pandas as pd

    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    cmat = np.array([qv for _, qv in cent_rows], dtype=np.int64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qm = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            dots = qm @ cmat.T  # exact int64 matmul
            vnorm = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
            cos = dots.astype(np.float64) / (vnorm[:, None] * cnorm[None, :])
            if top_r == 1:
                pick = np.argmax(cos, axis=1)[:, None]  # first max = cid asc
            else:
                # stable sort on -cos keeps cid-asc order for exact ties
                pick = np.argsort(-cos, axis=1, kind="stable")[:, :top_r]
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vec_ids, pick.shape[1]),
                    "cid": cids[pick].ravel(),
                }
            )

    return assign


def _ivf_search(
    spark: SparkSession,
    sf: str,
    quant: DataFrame,
    cent_rows: list,
    assign_a: int = 1,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Assignment + nprobe cell-probing top-k against a given quantizer.

    ``assign_a`` is the multi-assignment factor: each corpus vector is
    indexed into its top-A cells (A > 1 trades A× index size for recall —
    the standard IVF multiple-assignment knob; probe cost per query stays
    ~nprobe·cell-size, and duplicated (query, neighbor) candidates are
    de-duplicated BEFORE the exact-cosine rescoring join)."""
    assign_df = quant.mapInPandas(
        _ivf_assigner(cent_rows, min(assign_a, len(cent_rows))), _IVF_OUT_SCHEMA
    )
    probes = (
        quant.filter(F.col("vec_id") < KNN_QUERIES)
        .mapInPandas(
            _ivf_assigner(cent_rows, min(nprobe, len(cent_rows))),
            _IVF_OUT_SCHEMA,
        )
        .withColumnRenamed("vec_id", "query_id")
    )
    # tiny probe table broadcasts; the corpus-side assignments never shuffle
    cand = (
        assign_df.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    if assign_a > 1:
        # a neighbor sharing >1 probed cell with the query would be scored
        # twice (and double-counted by the rank window) without this
        cand = cand.distinct()
    e = _emb(spark, sf)
    cos = _cos_cols(F.col("vq_"), F.col("vc_"))
    scored = (
        cand.join(e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("vq_")),
                  "query_id")
        .join(e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vc_")),
              "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("sim"))
    )


@q("ann_ivf", _IVF_SQL)
def ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    quant = _ivf_quant(spark, sf)
    n_cent = ivf_centroids(_n_vectors(spark, sf))
    return _ivf_search(spark, sf, quant, _ivf_seed_centroids(quant, n_cent))


# Lloyd refinement on top of the hash-sampled seed quantizer: each round's
# new centroid = per-dimension integer mean (floor(sum/count + 0.5)) of the
# vectors assigned to the cell — the k-means train step, expressed as ONE
# cid-keyed aggregation per round (linear, map-side combinable) with the
# refined quantizer collected back as model state. All arithmetic stays
# engine-identical: int64 sums, one double division, one floor. Cells that
# attract no vectors drop out (standard Lloyd behavior).
#
# The refined index buys recall with two FIXED-absolute knobs (measured at
# sf0.001 vs knn_bruteforce: seed/nprobe=4 0.34 → 0.80 with rounds=2,
# multi-assign A=2, nprobe=6): because the cell count C = ceil(sqrt(n))
# grows with the corpus, the probed candidate fraction ~A·nprobe/C SHRINKS
# with scale — at n=10^6 it is ~1.2% of the corpus, at the sf0.001 test
# corpus it is deliberately generous.
_IVF_REFINE_ROUNDS = 2
_IVF_ASSIGN = 2
_IVF_REFINED_NPROBE = 6


def _ivf_refined_sql(rounds: int, assign_a: int, nprobe: int) -> str:
    """DuckDB twin of the refined IVF path, generated for any round count:
    the same quantization/seed CTEs as _IVF_SQL, then per round a
    (score → argmax-assign → integer-mean) block, then multi-assign /
    probe / DISTINCT-candidate / exact-rescore epilogue."""
    head = f"""
    WITH q AS (
      SELECT vec_id, d, CAST(round(embedding[d]::DOUBLE * 1000, 0) AS BIGINT) AS qv
      FROM embeddings CROSS JOIN unnest(generate_series(1, 64)) AS gd(d)),
    nn AS (SELECT count(*) AS n FROM embeddings),
    cent AS (
      SELECT vec_id AS cid FROM (
        SELECT vec_id, row_number() OVER (
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings) s JOIN nn
      ON s.rn <= greatest({IVF_MIN_CENTROIDS}, CAST(ceil(sqrt(nn.n)) AS INT))),
    cq0 AS (SELECT cent.cid, q.d, q.qv AS cqv FROM q JOIN cent ON q.vec_id = cent.cid),
    norms AS (SELECT vec_id, sum(qv * qv) AS nsq FROM q GROUP BY 1),
    cnorm0 AS (SELECT cid, sum(cqv * cqv) AS nsq FROM cq0 GROUP BY 1)"""
    rounds_sql = []
    for r in range(rounds):
        rounds_sql.append(f""",
    score{r} AS (
      SELECT dt.vec_id, dt.cid,
             dt.dot / (sqrt(nv.nsq) * sqrt(nc.nsq)) AS cos
      FROM (SELECT q.vec_id, cq{r}.cid, sum(q.qv * cq{r}.cqv) AS dot
            FROM q JOIN cq{r} ON q.d = cq{r}.d GROUP BY 1, 2) dt
      JOIN norms nv ON dt.vec_id = nv.vec_id
      JOIN cnorm{r} nc ON dt.cid = nc.cid),
    assign{r} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM score{r}) s
      WHERE rn = 1),
    cq{r + 1} AS (
      SELECT a.cid, q.d,
             CAST(floor(CAST(sum(q.qv) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                        + 0.5) AS BIGINT) AS cqv
      FROM assign{r} a JOIN q ON q.vec_id = a.vec_id
      GROUP BY 1, 2),
    cnorm{r + 1} AS (SELECT cid, sum(cqv * cqv) AS nsq FROM cq{r + 1} GROUP BY 1)""")
    fin = rounds
    tail = f""",
    scoreF AS (
      SELECT dt.vec_id, dt.cid,
             dt.dot / (sqrt(nv.nsq) * sqrt(nc.nsq)) AS cos
      FROM (SELECT q.vec_id, cq{fin}.cid, sum(q.qv * cq{fin}.cqv) AS dot
            FROM q JOIN cq{fin} ON q.d = cq{fin}.d GROUP BY 1, 2) dt
      JOIN norms nv ON dt.vec_id = nv.vec_id
      JOIN cnorm{fin} nc ON dt.cid = nc.cid),
    assignF AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM scoreF) s
      WHERE rn <= {assign_a}),
    probesF AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        FROM scoreF WHERE vec_id < {KNN_QUERIES}) s
      WHERE rn <= {nprobe}),
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
    cand AS (
      SELECT DISTINCT p.query_id, asn.vec_id AS neighbor_id
      FROM probesF p JOIN assignF asn ON p.cid = asn.cid
      WHERE asn.vec_id <> p.query_id),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {_COS_SQL} AS cos
      FROM cand c JOIN e a ON a.vec_id = c.query_id
                  JOIN e b ON b.vec_id = c.neighbor_id),
    r AS (
      SELECT query_id, neighbor_id, cos, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank, round(cos, 6) AS sim
    FROM r WHERE rank <= {KNN_K}
"""
    return head + "".join(rounds_sql) + tail


def _ivf_lloyd_round(quant: DataFrame, cent_rows: list) -> list:
    """One k-means train step: argmax-assign the corpus against the given
    quantizer (Arrow-batched, integer-exact), then per-cell integer means
    as 64 aggregate COLUMNS in one cid-keyed groupBy (map-side partial
    sums), floored JVM-side with the exact arithmetic the oracle uses. The
    collect is the sanctioned C·64-int quantizer model state."""
    assign_df = quant.mapInPandas(_ivf_assigner(cent_rows, 1), _IVF_OUT_SCHEMA)
    sums = assign_df.join(quant, "vec_id").groupBy("cid").agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(F.element_at("qv", d + 1)).alias(f"s{d}")
            for d in range(64)
        ],
    )
    refined_rows = sums.select(
        "cid",
        F.array(
            *[
                F.floor(
                    F.col(f"s{d}").cast("double") / F.col("cnt").cast("double")
                    + F.lit(0.5)
                ).cast("bigint")
                for d in range(64)
            ]
        ).alias("qv"),
    ).collect()
    return sorted((int(r["cid"]), list(r["qv"])) for r in refined_rows)


@q(
    "ann_ivf_refined",
    _ivf_refined_sql(_IVF_REFINE_ROUNDS, _IVF_ASSIGN, _IVF_REFINED_NPROBE),
)
def ann_ivf_refined(spark: SparkSession, sf: str) -> DataFrame:
    quant = _ivf_quant(spark, sf)
    n_cent = ivf_centroids(_n_vectors(spark, sf))
    cent = _ivf_seed_centroids(quant, n_cent)
    for _ in range(_IVF_REFINE_ROUNDS):
        cent = _ivf_lloyd_round(quant, cent)
    return _ivf_search(
        spark, sf, quant, cent,
        assign_a=_IVF_ASSIGN, nprobe=_IVF_REFINED_NPROBE,
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroids — the class-prototype computation (cluster
# summaries, nearest-class-mean classification, drift monitoring). Same
# integer-exact arithmetic as the IVF quantizer: the shared ×1000
# quantization, int64 per-(label, dim) sums planned as partial+final hash
# aggregation (map-side combine eats the posexplode fan-out before the one
# shuffle on the labels×dims key space), one double division at the end,
# rounded to 6.
@q(
    "embedding_centroid_per_label",
    """
    WITH q AS (
      SELECT label, d, CAST(round(embedding[d]::DOUBLE * 1000, 0) AS BIGINT) AS qv
      FROM embeddings CROSS JOIN unnest(generate_series(1, 64)) AS gd(d))
    SELECT label, CAST(d AS INT) AS d, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(qv) AS DOUBLE) / count(*) / 1000.0, 6) AS centroid
    FROM q GROUP BY 1, 2
    """,
)
def embedding_centroid_per_label(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings").select(
        "label", F.posexplode(F.col("embedding")).alias("d0", "val")
    )
    return (
        e.select(
            "label",
            (F.col("d0") + 1).cast("int").alias("d"),
            F.round(F.col("val").cast("double") * 1000, 0).cast("bigint").alias("qv"),
        )
        .groupBy("label", "d")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum("qv").cast("double") / F.count("*") / F.lit(1000.0), 6
            ).alias("centroid"),
        )
    )
