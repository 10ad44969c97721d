"""Iterative label propagation (SURVEY.md §2 J5+A7+A8+A15, §3.3).

Re-creates the reference's stance-propagation loop
(`/root/reference/pages/Postprocess_scripts/Stance_Detection.py:119-233`):
seeded labels propagate over an edge list; each round a node adopts the
majority label among its labeled neighbors iff the top count beats the
runner-up by a margin (getStance, Stance_Detection.py:164-202), and seed
("master") nodes are pinned (Stance_Detection.py:57-61,92-93).

Graph here: suppliers are nodes; an edge connects suppliers that co-occur in
an order (derived deterministically from lineitem). The driver loop + the
join→groupBy→top-2-window→update round is EXACTLY the frontier-expansion
shape (SURVEY.md §3.3); state lives in a checkpointed DataFrame per round,
never in growing lineage.

The oracle is the same fixpoint UNROLLED as nested SQL CTEs — one block per
round — so DuckDB verifies every intermediate rule exactly.

Scale: edges shuffle once per round on dst (hash join with the label table,
which is node-sized); label state is node-sized. At 10^10 edges the same
plan holds with the label table bucketed on node — noted in BENCH notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ROUNDS = 3
MARGIN = 1

_BASE_SQL = """
edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
nodes AS (SELECT DISTINCT s_suppkey AS node FROM supplier),
r0 AS (
  SELECT node,
         CASE WHEN node % 10 = 0 THEN 'L' || CAST(node % 3 AS VARCHAR)
              ELSE 'Unknown' END AS label,
         node % 10 = 0 AS is_seed
  FROM nodes)
"""

_ROUND_SQL = """
v{r} AS (
  SELECT e.src AS node, l.label, CAST(count(*) AS BIGINT) AS n
  FROM edges e JOIN r{p} l ON e.dst = l.node
  WHERE l.label <> 'Unknown'
  GROUP BY 1, 2),
t{r} AS (
  SELECT node, label, n,
         row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk
  FROM v{r}),
r{r} AS (
  SELECT p.node,
         CASE WHEN p.is_seed THEN p.label
              WHEN a.n - coalesce(b.n, 0) >= {margin} THEN a.label
              ELSE 'Unknown' END AS label,
         p.is_seed
  FROM r{p} p
  LEFT JOIN t{r} a ON p.node = a.node AND a.rk = 1
  LEFT JOIN t{r} b ON p.node = b.node AND b.rk = 2)
"""


def label_propagation_oracle_sql(rounds: int = N_ROUNDS, margin: int = MARGIN) -> str:
    parts = [_BASE_SQL]
    for r in range(1, rounds + 1):
        parts.append(_ROUND_SQL.format(r=r, p=r - 1, margin=margin))
    return "WITH " + ",".join(parts) + f"\nSELECT node, label FROM r{rounds}"


def _edges(spark: SparkSession, sf: str, part_key: str | None = None) -> DataFrame:
    """Distinct co-occurrence edge list; ``part_key`` ("src"/"dst") hash-
    partitions the result for the caller's per-round joins/aggs. The dedupe
    is expressed as dropDuplicates AFTER the repartition so it reuses that
    exchange — hash-partitioning on one edge endpoint co-locates equal
    (src, dst) pairs, so Catalyst plans ONE shuffle for partition+dedupe
    instead of distinct's own (src, dst) shuffle plus a second repartition
    (measured 3 → 2 exchanges and ~25% faster at sf0.1).

    Pair generation is collect_set-per-order + a double explode, not a
    lineitem self-join: one scan and one (partially-aggregated) shuffle of
    the two join columns instead of two scans and two shuffle sides, and the
    s² pair blowup happens map-side AFTER the per-order dedup. Orders have
    bounded supplier counts (TPC-H ~7 lines/order), so the per-group set is
    O(1) — the groupBy cannot skew. Same distinct edge set as the oracle's
    self-join by construction.

    Parallelism guard: collect_set's heavy half is the PARTIAL aggregation,
    which runs at scan parallelism — and a column-pruned scan of a small-SF
    table splits into fewer file partitions than cores (3 tasks on 32 slots
    measured 4.0 s vs 1.3 s end-to-end). When the scan is narrower than the
    cluster, repartition on the grouping key first: the groupBy reuses that
    exchange (still 2 exchanges total) and the set-building runs at full
    width. At production scan widths (≥ slots) the branch is a no-op and
    map-side partial aggregation keeps the shuffle at set-count rows."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    if li.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        li = li.repartition("l_orderkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("_ss")
    )
    pairs = (
        per_order.select(F.explode("_ss").alias("src"), "_ss")
        .select("src", F.explode("_ss").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    if part_key is not None:
        pairs = pairs.repartition(part_key)
    return pairs.dropDuplicates(["src", "dst"])


def label_propagation(
    spark: SparkSession, sf: str, rounds: int = N_ROUNDS, margin: int = MARGIN
) -> DataFrame:
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    labels = sup.select(
        F.col("s_suppkey").alias("node"),
        F.when(
            F.col("s_suppkey") % 10 == 0,
            F.concat(F.lit("L"), (F.col("s_suppkey") % 3).cast("string")),
        )
        .otherwise("Unknown")
        .alias("label"),
        (F.col("s_suppkey") % 10 == 0).alias("is_seed"),
    )
    # edges are reused every round: cache once, shuffle-partitioned on dst
    edges = _edges(spark, sf, "dst").cache()
    # The label domain is CLOSED by construction (seeds are 'L' || node % 3,
    # non-seeds only ever adopt a seed-descended label), so per-node vote
    # counting pivots into |domain| conditional counts in ONE codegen'd hash
    # aggregation — no (src, label) pre-aggregation shuffle and no
    # collect_list/sort_array ObjectHashAggregate. Top-1 / runner-up / the
    # oracle's (n DESC, label ASC) tie-break all become column expressions
    # over the three counts (second-largest-with-zeros == the oracle's
    # coalesce(rk2.n, 0), since absent vote rows are exactly the zero counts).
    domain = [f"L{i}" for i in range(3)]
    cs = [F.col(f"c{i}") for i in range(len(domain))]
    for _ in range(rounds):
        # labels are node-sized (edge-count / avg-degree): broadcast into the
        # cached edge scan so edges never shuffle. Past broadcast scale
        # (~10^8+ nodes) drop the hint — edges are already hash-partitioned
        # on dst, giving a co-located shuffle join with the same agg shape.
        counts = (
            edges.join(
                F.broadcast(
                    labels.filter(F.col("label") != "Unknown").select(
                        F.col("node").alias("dst"), F.col("label")
                    )
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                *[
                    F.count(F.when(F.col("label") == lab, True)).alias(f"c{i}")
                    for i, lab in enumerate(domain)
                ]
            )
        )
        n1 = F.greatest(*cs)
        n2 = sum(cs, F.lit(0)) - n1 - F.least(*cs)
        l1 = (
            F.when((cs[0] >= cs[1]) & (cs[0] >= cs[2]), domain[0])
            .when(cs[1] >= cs[2], domain[1])
            .otherwise(domain[2])
        )
        labels = (
            labels.join(counts, "node", "left")
            .select(
                "node",
                F.when(F.col("is_seed"), F.col("label"))
                .when((n1 >= 1) & (n1 - n2 >= margin), l1)
                .otherwise("Unknown")
                .alias("label"),
                "is_seed",
            )
        )
        # state table per round, lineage truncated (the reference's
        # iterations/it{N}-*.json checkpoint, Stance_Detection.py:318-323)
        labels = labels.localCheckpoint(eager=True)
    edges.unpersist()
    return labels.select("node", "label")


# ---------------------------------------------------------------------------
# Connected components (min-label propagation): each round every node adopts
# the minimum component id among itself and its neighbours; after R rounds a
# node's id is the minimum node id within R hops — both engines run EXACTLY
# R rounds, so parity holds even before full convergence. The same iterative
# DataFrame shape as label_propagation (SURVEY §2 A15), a second graph
# primitive a training-data pipeline needs (near-dup clusters → canonical
# representative per cluster).

CC_ROUNDS = 5

_CC_ROUND_SQL = """
v{r} AS (
  SELECT e.src AS node, min(l.comp) AS nc
  FROM edges e JOIN c{p} l ON e.dst = l.node
  GROUP BY 1),
c{r} AS (
  SELECT p.node,
         CASE WHEN v.nc IS NOT NULL AND v.nc < p.comp THEN v.nc
              ELSE p.comp END AS comp
  FROM c{p} p LEFT JOIN v{r} v ON p.node = v.node)
"""


def min_label_rounds_sql(rounds: int) -> str:
    """The unrolled min-label CTE chain v1/c1 … v{rounds}/c{rounds}; expects
    ``edges(src, dst)`` and ``c0(node, comp)`` CTEs to exist. THE single
    source of the oracle-side propagation rule (connected_components here,
    dedup_near_canonical in dedup.py)."""
    return ",".join(_CC_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, rounds + 1))


def min_label_rounds(comp: DataFrame, edges: DataFrame, rounds: int) -> DataFrame:
    """``rounds`` iterations of min-label propagation: each round every node
    adopts min(own comp, neighbours' comp). Per-round localCheckpoint keeps
    the state table node-sized with no lineage growth. THE single source of
    the Spark-side rule (twin of :func:`min_label_rounds_sql`).

    The state table is node-sized (edge-count / avg-degree): broadcast it
    into the edge join so the (cached, partitioned) edges never re-shuffle
    per round; past broadcast scale (~10^8+ nodes) drop the hint for a
    co-located shuffle join on the edges' dst partitioning — same agg shape."""
    for _ in range(rounds):
        neigh = (
            edges.join(
                F.broadcast(comp.select(F.col("node").alias("dst"), "comp")), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("comp").alias("nc"))
        )
        comp = (
            comp.join(neigh, "node", "left")
            .select(
                "node",
                F.when(
                    F.col("nc").isNotNull() & (F.col("nc") < F.col("comp")), F.col("nc")
                )
                .otherwise(F.col("comp"))
                .alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
    return comp


def connected_components_oracle_sql(rounds: int = CC_ROUNDS) -> str:
    base = """
edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
nodes AS (SELECT DISTINCT s_suppkey AS node FROM supplier),
c0 AS (SELECT node, node AS comp FROM nodes)
"""
    return (
        "WITH " + base + "," + min_label_rounds_sql(rounds)
        + f"\nSELECT node, CAST(comp AS BIGINT) AS comp FROM c{rounds}"
    )


def connected_components(
    spark: SparkSession, sf: str, rounds: int = CC_ROUNDS
) -> DataFrame:
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    comp = sup.select(
        F.col("s_suppkey").alias("node"), F.col("s_suppkey").cast("bigint").alias("comp")
    )
    edges = _edges(spark, sf, "dst").cache()
    comp = min_label_rounds(comp, edges, rounds)
    edges.unpersist()
    return comp.select("node", "comp")


# ---------------------------------------------------------------------------
# Fixed-point PageRank: the third iterative-graph primitive, in INTEGER
# arithmetic so both engines are bit-exact (the ann_ivf trick applied to
# ranks). Ranks are scaled by 10^6; per-round contribution is r // outdeg
# (integer floor division — deterministic, no float summation-order drift),
# damping 0.85 applied as (85 * m) // 100. Isolated nodes keep the base
# (1-d) mass; both engines run EXACTLY the same rounds of the same integer
# recurrence, so equality is exact, not approximate.

PR_ROUNDS = 3
PR_SCALE = 1_000_000

_PR_ROUND_SQL = """
s{r} AS (
  SELECT e.dst AS node, sum(p.r // d.outdeg) AS m
  FROM edges e
  JOIN p{p} p ON e.src = p.node
  JOIN deg d ON e.src = d.node
  GROUP BY 1),
p{r} AS (
  SELECT n.node,
         CAST(150000 + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS r
  FROM p{p} n LEFT JOIN s{r} s ON n.node = s.node)
"""


def pagerank_oracle_sql(rounds: int = PR_ROUNDS) -> str:
    base = f"""
edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
nodes AS (SELECT DISTINCT s_suppkey AS node FROM supplier),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
        FROM edges GROUP BY 1),
p0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)
"""
    rounds_sql = ",".join(_PR_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, rounds + 1))
    return (
        "WITH " + base + "," + rounds_sql
        + f"\nSELECT node, r AS rank_fp FROM p{rounds}"
    )


def pagerank_fixedpoint(
    spark: SparkSession, sf: str, rounds: int = PR_ROUNDS
) -> DataFrame:
    """Integer-exact PageRank over the supplier co-occurrence graph.

    Scale shape: edges cached once, pre-partitioned on src (the per-round
    join key); the rank state and degree table are node-sized; each round is
    join → dst-keyed sum → node-sized update, localCheckpoint'd so lineage
    stays flat — identical round shape to label_propagation/components.
    """
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    ranks = sup.select(
        F.col("s_suppkey").alias("node"),
        F.lit(PR_SCALE).cast("bigint").alias("r"),
    )
    edges = _edges(spark, sf, "src").cache()
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("bigint").alias("outdeg"))
    )
    for _ in range(rounds):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            ranks.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(150000).cast("bigint")
                    + F.expr("(85 * coalesce(m, 0L)) div 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return ranks.select("node", F.col("r").alias("rank_fp"))


TRIANGLE_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_suppkey AS s, b.l_suppkey AS t
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.s = e1.t
JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t
"""


def triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Global triangle count over the supplier co-occurrence graph — the
    classic compact-forward algorithm as two equi-joins: orient every edge
    low→high (each triangle counted exactly once), build wedges by joining
    edge endpoints, then close each wedge against the oriented edge set.

    Scale shape: both joins are hash equi-joins on a single node key —
    shuffle-partitioned, no cartesian, no adjacency list ever collected.
    The orientation is the standard skew bound: a hub of degree d
    contributes only its higher-numbered neighbors to wedge fan-out
    (worst case d²/4 instead of d²; at web scale the further refinement is
    degree-ordering instead of id-ordering, which caps fan-out at
    O(m^1.5) total — id-ordering keeps the oracle trivially identical).
    Graft provenance: the reference builds a mention graph and counts
    mutual-follow structures row-at-a-time
    (`/root/reference/pages/Postprocess_scripts/Stance_Detection.py:119-160`);
    this is the set-at-a-time form of the same closure counting.
    """
    e = (
        _edges(spark, sf)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("s"), F.col("dst").alias("t"))
    )
    wedge = e.alias("e1").join(
        e.alias("e2"), F.col("e1.t") == F.col("e2.s")
    ).select(
        F.col("e1.s").alias("a"), F.col("e1.t").alias("b"), F.col("e2.t").alias("c")
    )
    closed = wedge.join(
        e.alias("e3"),
        (F.col("a") == F.col("e3.s")) & (F.col("c") == F.col("e3.t")),
    )
    return closed.agg(F.count("*").cast("bigint").alias("n_triangles"))


QUERIES = {
    "label_propagation": label_propagation,
    "connected_components": connected_components,
    "pagerank_fixedpoint": pagerank_fixedpoint,
    "triangle_count": triangle_count,
}
ORACLES = {
    "label_propagation": label_propagation_oracle_sql(),
    "connected_components": connected_components_oracle_sql(),
    "pagerank_fixedpoint": pagerank_oracle_sql(),
    "triangle_count": TRIANGLE_SQL,
}


DEGREE_DIST_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM e GROUP BY 1)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1
"""


def degree_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Degree histogram of the co-occurrence graph — the first sanity
    report any graph pipeline emits (skew detection: a power-law tail here
    is what motivates the salted/two-phase treatments everywhere else).

    Scale shape: two partial+final aggregations (per-node degree on the
    node key, then count-of-counts on the degree key) — the same
    count-distribution shape as customer_order_distribution (Q13)."""
    deg = (
        _edges(spark, sf, "src")  # src-partitioned dedupe: the degree
        # groupBy reuses the same exchange — one shuffle end-to-end
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_nodes"))


QUERIES["degree_distribution"] = degree_distribution
ORACLES["degree_distribution"] = DEGREE_DIST_SQL
