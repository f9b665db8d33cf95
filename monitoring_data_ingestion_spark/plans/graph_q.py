"""Graph analytics over relational data: the co-purchase graph family.

Large catalogs mine the "parts bought together" graph for substitution,
recommendation, and anomaly work. The family here builds one shared graph —
nodes = parts, an undirected edge whenever two parts appear in the same
order — and runs the three canonical whole-graph computations over it:

* ``graph_copurchase_pagerank`` — 5 damped PageRank iterations in EXACT
  integer arithmetic (ranks held as bigint micro-units, integer floor
  division everywhere), so Spark and the DuckDB oracle agree bit-for-bit
  with zero float-accumulation-order sensitivity.
* ``graph_triangle_census`` — per-node triangle counts + local clustering
  coefficients via the degree-ordered orientation (each triangle counted
  once from its lowest-degree vertex).
* ``graph_degree_distribution`` — log2-bucketed degree histogram, the
  standard first look at any graph's shape.

Scale stance (100 TB): the edge list is built by a SELF-JOIN ON THE ORDER
KEY — per-key fan-out is bounded by lines-per-order (≤7 in TPC-H-shaped
data), so edge generation is linear in the fact table and never all-pairs.
PageRank is one shuffle per iteration keyed on the destination node
(lineage truncated per round with ``localCheckpoint`` so iteration N costs
the same as iteration 1). Triangle counting uses the classic
degree-orientation bound: directing every edge from its
(degree, id)-smaller endpoint caps out-degree at O(sqrt(m)), so the wedge
join generates O(m^{3/2}) candidates worst-case instead of sum(deg^2) —
the difference between feasible and not on power-law graphs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import table
from .catalog import query

# PageRank ranks are bigint multiples of 1/RANK_SCALE. 85*RANK_SCALE
# = 8.5e13 < 2^53, so every intermediate fits a double EXACTLY and the
# `_idiv` double-division trick below is lossless.
RANK_SCALE = 10**12
PR_ITERS = 5


def _idiv(a: Column, b: Column | int) -> Column:
    """Exact integer floor division on nonnegative bigints.

    ``a - a % b`` is exactly divisible by ``b``; both operands and the
    integer quotient stay below 2^53, so the IEEE double division returns
    the exact integer. Mirrors DuckDB's ``//`` on BIGINT operands.
    """
    b = F.lit(b) if isinstance(b, int) else b
    return ((a - a % b) / b).cast("long")


def _edges_from_lineitem(li: DataFrame) -> DataFrame:
    """Distinct (u < v) co-purchase pairs from a (l_orderkey, l_partkey)
    relation — the intra-order pair join shared by the full build and
    the incremental delta path."""
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges as (u < v) part-key pairs.

    Equi-join on l_orderkey (bounded per-key fan-out), never a cross
    join: the pair generation cost is sum over orders of C(lines, 2).
    """
    return _edges_from_lineitem(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )


# MATERIALIZED: these CTEs are referenced once per unrolled iteration /
# triangle stage; DuckDB inlines plain CTEs, which would recompute the
# lineitem self-join at every reference (the PCA-oracle 2^K lesson).
_EDGES_SQL = """
edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
),
deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src)
"""


def _und(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    rev = edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    return fwd.unionByName(rev)


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        _und(edges)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
    )


def _orient(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Direct every edge from its (degree, id)-smaller endpoint.

    Out-degree under this orientation is O(sqrt(m)) — the bound the
    wedge join below depends on.
    """
    dedge = (
        edges.join(
            F.broadcast(deg).withColumnRenamed("node", "u").withColumnRenamed("deg", "deg_u"),
            "u",
        )
        .join(
            F.broadcast(deg).withColumnRenamed("node", "v").withColumnRenamed("deg", "deg_v"),
            "v",
        )
    )
    lower = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    return dedge.select(
        F.when(lower, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_dst"),
    )


def _wedge_close(oriented: DataFrame) -> DataFrame:
    """Wedge-generate + close over an oriented edge set → triangles."""
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedge_order = (F.col("o1.deg_dst") < F.col("o2.deg_dst")) | (
        (F.col("o1.deg_dst") == F.col("o2.deg_dst"))
        & (F.col("o1.dst") < F.col("o2.dst"))
    )
    wedges = (
        o1.join(o2, F.col("o1.src") == F.col("o2.src"))
        .filter(wedge_order)
        .select(
            F.col("o1.src").alias("a"),
            F.col("o1.dst").alias("b"),
            F.col("o2.dst").alias("c"),
        )
    )
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return wedges.join(closing, ["b", "c"])


def _oriented_triangles(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Triangle list (a, b, c) via the degree-ordered orientation.

    Every edge is directed from its (degree, id)-smaller endpoint, wedges
    are generated only between a node's out-neighbors in (degree, id)
    order, and a wedge closes iff the oriented (b, c) edge exists — each
    triangle emitted exactly once. Out-degree under this orientation is
    O(sqrt(m)), so the wedge join generates O(m^{3/2}) candidates
    worst-case instead of sum(deg^2).
    """
    return _wedge_close(_orient(edges, deg).localCheckpoint())


_TRI_SQL = """
dedge AS (
  SELECT e.u, e.v, du.deg AS deg_u, dv.deg AS deg_v
  FROM edges e
  JOIN deg du ON e.u = du.node
  JOIN deg dv ON e.v = dv.node
),
oriented AS (
  SELECT CASE WHEN (deg_u, u) < (deg_v, v) THEN u ELSE v END AS src,
         CASE WHEN (deg_u, u) < (deg_v, v) THEN v ELSE u END AS dst,
         CASE WHEN (deg_u, u) < (deg_v, v) THEN deg_v ELSE deg_u END AS deg_dst
  FROM dedge
),
tri AS MATERIALIZED (
  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
  FROM oriented o1
  JOIN oriented o2
    ON o1.src = o2.src AND (o1.deg_dst, o1.dst) < (o2.deg_dst, o2.dst)
  JOIN oriented o3 ON o3.src = o1.dst AND o3.dst = o2.dst
)
"""


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration integer PageRank as one DuckDB CTE chain."""
    s = RANK_SCALE
    parts = [
        "WITH " + _EDGES_SQL.strip() + ",",
        "nn AS (SELECT COUNT(*) AS n FROM deg),",
        f"r0 AS (SELECT node, {s} // nn.n AS r FROM deg CROSS JOIN nn)",
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT d.node,
         (15 * ({s} // nn.n)) // 100
           + (85 * COALESCE(inf.inflow, 0)) // 100 AS r
  FROM deg d CROSS JOIN nn
  LEFT JOIN (
    SELECT und.dst AS node, SUM(p.r // dg.deg) AS inflow
    FROM und
    JOIN r{i - 1} p ON und.src = p.node
    JOIN deg dg ON und.src = dg.node
    GROUP BY und.dst
  ) inf ON d.node = inf.node
)"""
        )
    parts.append(
        f"""
SELECT d.node AS part, d.deg AS degree, CAST(f.r AS BIGINT) AS rank_scaled,
       CAST(f.r AS DOUBLE) / {s} AS rank
FROM r{PR_ITERS} f JOIN deg d ON f.node = d.node
ORDER BY rank_scaled DESC, part LIMIT 20"""
    )
    return "\n".join(parts)


def _pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by exact-integer PageRank (the pagerank query's
    result relation — also the hub source for graph_substitution_recs)."""
    edges = _copurchase_edges(spark, sf_dir)
    und = _und(edges).localCheckpoint()
    deg = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint()
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    base = _idiv(F.lit(RANK_SCALE), F.col("n"))
    teleport = _idiv(15 * base, 100)
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        "node", base.alias("r")
    ).localCheckpoint()
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(deg, "node")
            .select(F.col("node").alias("src"), _idiv(F.col("r"), F.col("deg")).alias("c"))
        )
        inflow = (
            und.join(contrib, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            deg.crossJoin(F.broadcast(nn))
            .join(inflow, "node", "left")
            .select(
                "node",
                (teleport + _idiv(85 * F.coalesce(F.col("inflow"), F.lit(0)), 100)).alias("r"),
            )
            .localCheckpoint()
        )
    return (
        ranks.join(deg, "node")
        .select(
            F.col("node").alias("part"),
            F.col("deg").alias("degree"),
            F.col("r").alias("rank_scaled"),
            (F.col("r").cast("double") / RANK_SCALE).alias("rank"),
        )
        .orderBy(F.desc("rank_scaled"), "part")
        .limit(20)
    )


@query(
    "graph_copurchase_pagerank",
    tags=("graph", "join", "agg", "iterative"),
    oracle=_pagerank_oracle(),
)
def graph_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 5 iterations) over the part co-purchase
    graph — "which parts sit at the center of the basket network".

    Spark-first iterative dataflow: edges and degrees are computed once
    and ``localCheckpoint``-ed; each iteration is ONE shuffle (inflow
    grouped by destination) plus a broadcast of the 1-row node count.
    Rank state is bigint micro-units (multiples of 1e-12) with integer
    floor division at every step, so the fixpoint is bit-exact across
    engines and partitionings — no float accumulation order anywhere.
    The oracle unrolls the same five iterations as a DuckDB CTE chain.
    """
    return _pagerank_top20(spark, sf_dir)


_CENSUS_ORACLE = (
    "WITH "
    + _EDGES_SQL.strip()
    + ","
    + _TRI_SQL.strip()
    + """,
pernode AS (
  SELECT node, COUNT(*) AS triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT p.node AS part, d.deg AS degree, p.triangles,
       ROUND(2.0 * p.triangles / (d.deg * (d.deg - 1)), 6) AS clustering
FROM pernode p JOIN deg d ON p.node = d.node
ORDER BY p.triangles DESC, part LIMIT 20"""
)


def _census_from_tri(tri: DataFrame, deg: DataFrame) -> DataFrame:
    pernode = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        pernode.join(deg, "node")
        .select(
            F.col("node").alias("part"),
            F.col("deg").alias("degree"),
            "triangles",
            F.round(
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)), 6
            ).alias("clustering"),
        )
        .orderBy(F.desc("triangles"), "part")
        .limit(20)
    )


@query(
    "graph_triangle_census",
    tags=("graph", "join", "agg"),
    oracle=_CENSUS_ORACLE,
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    co-purchase graph, via the degree-ordered orientation: every edge is
    directed from its (degree, id)-smaller endpoint, wedges are generated
    only between a node's out-neighbors in (degree, id) order, and a
    wedge closes iff the oriented (b, c) edge exists — each triangle
    found exactly once, from its smallest vertex.

    Scale: orientation caps out-degree at O(sqrt(m)), so the wedge join
    emits O(m^{3/2}) rows worst-case instead of sum(deg^2) — the bound
    that keeps triangle counting feasible on power-law graphs. Both
    joins are equi-joins (on the wedge apex, then on the closing edge
    pair); the 2-column degree table broadcasts.

    The distinct edge list is materialized ONCE (``localCheckpoint``) —
    it feeds both the degree aggregate and the orientation join, and
    without truncation the lineitem self-join + distinct would execute
    twice.
    """
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    deg = _degrees(edges)
    tri = _oriented_triangles(edges, deg)
    return _census_from_tri(tri, deg)


@query(
    "graph_degree_distribution",
    tags=("graph", "agg"),
    oracle="WITH "
    + _EDGES_SQL.strip()
    + """
SELECT CAST(FLOOR(LOG2(deg)) AS INTEGER) AS degree_log2_bucket,
       COUNT(*) AS n_nodes,
       MIN(deg) AS min_degree, MAX(deg) AS max_degree,
       CAST(SUM(deg) AS BIGINT) AS total_degree
FROM deg
GROUP BY 1 ORDER BY 1""",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree histogram of the co-purchase graph — the
    first diagnostic of any graph workload (power-law tail = skew risk
    for the downstream joins; the bucket census is what decides whether
    the triangle orientation / salting paths are needed).

    One aggregation over the degree table; integer-exact. log2 of an
    exact power-of-two-free integer is boundary-safe here because buckets
    split at exact powers of two and ``deg`` is an integer: floor(log2)
    can only waver when deg IS a power of two, where both engines compute
    log2 exactly (it is representable), so the floor is stable.
    """
    edges = _copurchase_edges(spark, sf_dir)
    deg = _und(edges).groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.groupBy(
            F.floor(F.log2("deg")).cast("int").alias("degree_log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").alias("min_degree"),
            F.max("deg").alias("max_degree"),
            F.sum("deg").alias("total_degree"),
        )
        .orderBy("degree_log2_bucket")
    )


# Full per-edge Jaccard score relation (no order/limit) — the query below
# adds the top-20 tail; graph_substitution_recs nests this whole SELECT.
_JACCARD_SCORES_SQL = (
    "WITH "
    + _EDGES_SQL.strip()
    + ","
    + _TRI_SQL.strip()
    + """,
sup AS (
  SELECT u, v, COUNT(*) AS support FROM (
    SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM tri
    UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM tri
    UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM tri
  ) GROUP BY u, v
)
SELECT e.u AS part_a, e.v AS part_b,
       CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
       du.deg AS deg_a, dv.deg AS deg_b,
       ROUND(CAST(COALESCE(s.support, 0) AS DOUBLE)
             / (du.deg + dv.deg - COALESCE(s.support, 0)), 6) AS jaccard
FROM edges e
LEFT JOIN sup s ON e.u = s.u AND e.v = s.v
JOIN deg du ON e.u = du.node
JOIN deg dv ON e.v = dv.node"""
)


def _edge_jaccard_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every co-purchase edge scored: (part_a, part_b, support, deg_a,
    deg_b, jaccard) — support read off the oriented triangle list."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    deg = _degrees(edges)
    tri = _oriented_triangles(edges, deg)
    pair = lambda x, y: [F.least(F.col(x), F.col(y)).alias("u"), F.greatest(F.col(x), F.col(y)).alias("v")]  # noqa: E731
    sup = (
        tri.select(*pair("a", "b"))
        .unionAll(tri.select(*pair("a", "c")))
        .unionAll(tri.select(*pair("b", "c")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    support = F.coalesce(F.col("support"), F.lit(0))
    return (
        edges.join(sup, ["u", "v"], "left")
        .join(
            F.broadcast(deg).withColumnRenamed("node", "u").withColumnRenamed("deg", "deg_a"),
            "u",
        )
        .join(
            F.broadcast(deg).withColumnRenamed("node", "v").withColumnRenamed("deg", "deg_b"),
            "v",
        )
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            support.alias("support"),
            "deg_a",
            "deg_b",
            F.round(
                support.cast("double")
                / (F.col("deg_a") + F.col("deg_b") - support),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "graph_edge_jaccard",
    tags=("graph", "join", "agg", "similarity"),
    oracle=_JACCARD_SCORES_SQL
    + "\nORDER BY jaccard DESC, part_a, part_b LIMIT 20",
)
def graph_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural (SCAN) similarity per co-purchase edge: for every edge
    (u, v), Jaccard overlap of the two open neighborhoods —
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the item-item substitution score
    collaborative filters rank against (two parts whose baskets overlap
    heavily are interchangeable).

    The common-neighbor count per edge is exactly the edge's triangle
    support, so it is read off the oriented triangle list (each triangle
    credits its three canonical edges) — total work stays O(m^{3/2})
    with NO per-apex quadratic pair generation and no hub caps: an apex
    of degree d contributes wedges only through its O(sqrt(m))-bounded
    out-neighborhood, never C(d, 2) pairs. Denominators are full
    degrees broadcast onto the edge list; edges in no triangle keep
    support 0 via the left join.
    """
    return (
        _edge_jaccard_scores(spark, sf_dir)
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(20)
    )


KCORE_K = 80
KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    parts = [
        "WITH " + _EDGES_SQL.strip() + ",",
        "a0 AS (SELECT node, deg FROM deg)",
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f""",
e{r} AS MATERIALIZED (
  SELECT src, dst FROM und
  WHERE src IN (SELECT node FROM a{r - 1} WHERE deg >= {KCORE_K})
    AND dst IN (SELECT node FROM a{r - 1} WHERE deg >= {KCORE_K})
),
a{r} AS MATERIALIZED (
  SELECT src AS node, COUNT(*) AS deg FROM e{r} GROUP BY src
)"""
        )
    parts.append(
        f"""
SELECT node AS part, CAST(deg AS BIGINT) AS core_degree
FROM a{KCORE_ROUNDS} WHERE deg >= {KCORE_K}
ORDER BY core_degree DESC, part LIMIT 20"""
    )
    return "\n".join(parts)


@query(
    "graph_kcore",
    tags=("graph", "join", "agg", "iterative"),
    oracle=_kcore_oracle(),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition of the co-purchase graph by parallel peeling:
    each round drops every node whose degree WITHIN the surviving
    subgraph is < k, until the k-core (k = KCORE_K = 80) remains — the standard dense-
    nucleus extractor (fraud rings, always-bundled assortments, community
    seeds). Output is the top-20 core members by within-core degree
    after a fixed round budget, which makes the result bit-deterministic
    on both engines even on graphs where peeling hasn't fully converged.

    Scale: each round is one broadcastable semi-join of the (shrinking)
    survivor set against the edge list plus one hash aggregate — rounds
    are fixed (6), the survivor set only shrinks, and lineage is
    truncated per round with ``localCheckpoint`` so round N costs round
    1's plan, not N compounded re-plays. The DuckDB oracle unrolls the
    same six peels with MATERIALIZED survivor CTEs (each is referenced
    twice — once per edge endpoint — so inlining would double the
    recomputed subtree per level).
    """
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    und = _und(edges).localCheckpoint()
    alive = _degrees(edges)
    for _ in range(KCORE_ROUNDS):
        keep = alive.filter(F.col("deg") >= KCORE_K).select("node")
        sub = und.join(
            keep.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        alive = (
            sub.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .withColumnRenamed("src", "node")
            .localCheckpoint()
        )
    return (
        alive.filter(F.col("deg") >= KCORE_K)
        .select(F.col("node").alias("part"), F.col("deg").alias("core_degree"))
        .orderBy(F.desc("core_degree"), "part")
        .limit(20)
    )


MIN_PAIR_SUPPORT = 3


@query(
    "graph_copurchase_lift",
    tags=("graph", "agg", "join", "basket"),
    oracle=f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
supp AS MATERIALIZED (
  SELECT l_partkey AS part, COUNT(*) AS supp FROM li GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS pair_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
)
SELECT p.u AS part_a, p.v AS part_b,
       CAST(p.pair_orders AS BIGINT) AS pair_orders,
       CAST(su.supp AS BIGINT) AS supp_a,
       CAST(sv.supp AS BIGINT) AS supp_b,
       ROUND(CAST(p.pair_orders AS DOUBLE) / su.supp, 6) AS confidence_ab,
       ROUND(CAST(p.pair_orders * n.n_orders AS DOUBLE)
             / (su.supp * sv.supp), 6) AS lift
FROM pairs p
JOIN supp su ON p.u = su.part
JOIN supp sv ON p.v = sv.part
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b LIMIT 20""",
)
def graph_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule scoring over co-purchased part pairs — the
    market-basket (Apriori) metrics: support, confidence(a→b), and lift
    = P(a,b) / (P(a)·P(b)). Lift > 1 marks genuinely associated pairs,
    the signal behind "frequently bought together"; a frequency-based
    complement to the neighborhood-based ``graph_edge_jaccard``.

    Scale: pair generation is the bounded order-key self-join (per-key
    fan-out ≤ lines-per-order), pair counts are one hash aggregate with
    a min-support HAVING that prunes the long tail before the support
    joins, and the per-item support table is small enough to broadcast.
    Ratios are computed from exact bigint counts (< 2^53, lossless as
    doubles) and rounded to 6 dp, so ranking is engine-stable.
    """
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint()
    )
    n = li.select(F.count_distinct("l_orderkey").alias("n_orders"))
    supp = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("supp")
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= MIN_PAIR_SUPPORT)
    )
    return (
        pairs.join(
            F.broadcast(supp).withColumnRenamed("part", "u").withColumnRenamed("supp", "supp_a"),
            "u",
        )
        .join(
            F.broadcast(supp).withColumnRenamed("part", "v").withColumnRenamed("supp", "supp_b"),
            "v",
        )
        .crossJoin(F.broadcast(n))
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("pair_orders").cast("bigint").alias("pair_orders"),
            F.col("supp_a").cast("bigint").alias("supp_a"),
            F.col("supp_b").cast("bigint").alias("supp_b"),
            F.round(
                F.col("pair_orders").cast("double") / F.col("supp_a"), 6
            ).alias("confidence_ab"),
            F.round(
                (F.col("pair_orders") * F.col("n_orders")).cast("double")
                / (F.col("supp_a") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


GRAPH_INDEX_BUCKETS = 32


@query(
    "graph_triangle_census_indexed",
    tags=("graph", "join", "agg", "index"),
    oracle=_CENSUS_ORACLE,
)
def graph_triangle_census_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The triangle census served from a PERSISTED graph index: the
    oriented edge list is written ONCE as a bucketed table hash-clustered
    on the wedge apex (``src``, operators/bucketing.py), so the wedge
    self-join — the O(m^{3/2}) heart of the computation — runs with ZERO
    exchanges on either side: both scans of the same bucketed table are
    already co-located on the join key. Only the closing join (a
    different key pair) still shuffles. Value-identical to the in-plan
    ``graph_triangle_census`` under the same oracle — the index changes
    WHAT MOVES, never the answer — mirroring the build/serve split of
    the persisted IVF index (``knn_ivf_partitioned``).

    100 TB posture: edge orientation is paid once per graph version; the
    bucketed layout then amortizes across every triangle/wedge-shaped
    query (census, edge support, clustering coefficients). Build
    discipline mirrors ``knn_ivf_partitioned``: one index per Spark
    session and fixture (keyed by applicationId + full-path/mtime
    fingerprint, ``catalog.session_cache_suffix``), external path under
    tmp with atexit cleanup, so repeated runs serve from the built index.
    """
    import atexit
    import os
    import shutil
    import tempfile

    from ..operators.bucketing import write_bucketed
    from .catalog import session_cache_suffix

    suffix = session_cache_suffix(spark, sf_dir)
    tbl = f"mdi_graph_oriented_{suffix}"
    deg_tbl = f"mdi_graph_deg_{suffix}"
    if not spark.catalog.tableExists(tbl):
        base = os.path.join(tempfile.gettempdir(), tbl)
        shutil.rmtree(base, ignore_errors=True)
        edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
        deg = _degrees(edges)
        oriented = _orient(edges, deg)
        write_bucketed(
            oriented,
            tbl,
            ["src"],
            GRAPH_INDEX_BUCKETS,
            sort_cols=["src"],
            path=os.path.join(base, "oriented"),
        )
        deg.write.format("parquet").mode("overwrite").option(
            "path", os.path.join(base, "deg")
        ).saveAsTable(deg_tbl)

        def _cleanup() -> None:
            shutil.rmtree(base, ignore_errors=True)

        atexit.register(_cleanup)
    oriented = spark.table(tbl)
    deg = spark.table(deg_tbl)
    tri = _wedge_close(oriented)
    return _census_from_tri(tri, deg)


N_HUBS = 5
RECS_PER_HUB = 3


def _substitution_oracle() -> str:
    """Compose the hub (PageRank) and score (edge-Jaccard) oracles as
    nested CTEs — one definition of each semantics, reused verbatim
    (the knn_recall_eval / dedup_lsh_recall_eval nesting pattern)."""
    return f"""
WITH pr AS MATERIALIZED ({_pagerank_oracle()}),
hubs AS (SELECT part AS hub, rank_scaled FROM pr
         ORDER BY rank_scaled DESC, part LIMIT {N_HUBS}),
js AS MATERIALIZED ({_JACCARD_SCORES_SQL}),
cand AS (
  SELECT part_a AS hub, part_b AS candidate, support, jaccard FROM js
  UNION ALL
  SELECT part_b, part_a, support, jaccard FROM js
),
ranked AS (
  SELECT h.hub, h.rank_scaled, c.candidate, c.support, c.jaccard,
         ROW_NUMBER() OVER (PARTITION BY h.hub
                            ORDER BY c.jaccard DESC, c.candidate) AS rec_rank
  FROM hubs h JOIN cand c ON h.hub = c.hub
)
SELECT hub, rank_scaled, candidate, support, jaccard,
       CAST(rec_rank AS INTEGER) AS rec_rank
FROM ranked WHERE rec_rank <= {RECS_PER_HUB}
ORDER BY hub, rec_rank"""


@query(
    "graph_substitution_recs",
    tags=("graph", "composition", "similarity"),
    oracle=_substitution_oracle(),
)
def graph_substitution_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommendation capstone, composed end-to-end as ONE lazy
    plan: find the graph's most central parts (exact-integer PageRank,
    top 5) and rank each hub's best substitution candidates (per-edge
    structural Jaccard, top 3 per hub) — "for the products everything
    else is bought with, what can stand in for them". The composition
    pattern of ``llm_corpus_prep``/``knn_recall_eval``: both stages are
    the catalog's own relations, reused verbatim, and the oracle nests
    both stages' oracles as MATERIALIZED CTEs.

    Scale: the hub set is 5 rows and broadcasts onto the scored edge
    list; candidate ranking is a per-hub window over only the hubs'
    incident edges. Nothing beyond the two component computations moves.
    """
    hubs = (
        _pagerank_top20(spark, sf_dir)
        .limit(N_HUBS)
        .select(F.col("part").alias("hub"), "rank_scaled")
    )
    scores = _edge_jaccard_scores(spark, sf_dir)
    cand = scores.select(
        F.col("part_a").alias("hub"),
        F.col("part_b").alias("candidate"),
        "support",
        "jaccard",
    ).unionByName(
        scores.select(
            F.col("part_b").alias("hub"),
            F.col("part_a").alias("candidate"),
            "support",
            "jaccard",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("hub").orderBy(F.desc("jaccard"), "candidate")
    return (
        cand.join(F.broadcast(hubs), "hub")
        .withColumn("rec_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rec_rank") <= RECS_PER_HUB)
        .select("hub", "rank_scaled", "candidate", "support", "jaccard", "rec_rank")
        .orderBy("hub", "rec_rank")
    )


@query(
    "graph_incremental_edges",
    tags=("graph", "maintenance", "agg"),
    oracle="WITH "
    + _EDGES_SQL.strip()
    + """
SELECT CAST(FLOOR(LOG2(deg)) AS INTEGER) AS degree_log2_bucket,
       COUNT(*) AS n_nodes,
       MIN(deg) AS min_degree, MAX(deg) AS max_degree,
       CAST(SUM(deg) AS BIGINT) AS total_degree
FROM deg
GROUP BY 1 ORDER BY 1""",
)
def graph_incremental_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the co-purchase edge list — the delta
    path a PERSISTED graph index (graph_triangle_census_indexed) needs
    to stay current without rebuilds. The maintenance theorem: edges are
    INTRA-order, so a delta of whole new orders contributes exactly its
    own pair join — union-dedup against the stored edge set, and the
    maintained graph equals the full rebuild. This query RUNS the
    incremental path (orders split into a 90% base batch and a 10%
    delta batch on the order key, each pair-joined separately, then
    union + dedup) while the ORACLE is the full recompute's degree
    census — the same proven-equal framing as
    ``agg_incremental_maintenance``.

    100 TB posture: the delta pair join touches only new orders; folding
    into the persisted bucketed edge table is an anti-join insert on the
    bucket key (no rebuild, no full-graph shuffle). The equality checked
    here is what licenses that maintenance schedule.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    base = _edges_from_lineitem(li.filter(F.col("l_orderkey") % 10 != 0))
    delta = _edges_from_lineitem(li.filter(F.col("l_orderkey") % 10 == 0))
    edges = base.unionByName(delta).distinct()
    deg = _und(edges).groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.groupBy(
            F.floor(F.log2("deg")).cast("int").alias("degree_log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").alias("min_degree"),
            F.max("deg").alias("max_degree"),
            F.sum("deg").alias("total_degree"),
        )
        .orderBy("degree_log2_bucket")
    )


CF_PAIR_BUDGET = 5_000_000  # max candidate pairs the part join may emit
CF_MIN_SHARED = 2
CF_TOPK = 20


@query(
    "graph_customer_similarity",
    tags=("graph", "similarity", "join", "recsys"),
    oracle=f"""
WITH cp AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
pop AS (SELECT p, COUNT(*) AS n_buyers FROM cp GROUP BY p),
budgeted AS (
  SELECT p FROM (
    SELECT p,
           SUM(n_buyers * n_buyers) OVER (ORDER BY n_buyers, p) AS cum,
           ROW_NUMBER() OVER (ORDER BY n_buyers, p) AS rk
    FROM pop
  ) WHERE cum <= {CF_PAIR_BUDGET} OR rk = 1
),
capped AS MATERIALIZED (
  SELECT cp.c, cp.p FROM cp JOIN budgeted ON cp.p = budgeted.p
),
basket AS (SELECT c, COUNT(*) AS n_parts FROM cp GROUP BY c),
pairs AS (
  SELECT a.c AS cust_a, b.c AS cust_b, COUNT(*) AS shared
  FROM capped a JOIN capped b ON a.p = b.p AND a.c < b.c
  GROUP BY a.c, b.c
  HAVING COUNT(*) >= {CF_MIN_SHARED}
)
SELECT p.cust_a, p.cust_b,
       CAST(p.shared AS BIGINT) AS shared_parts,
       ba.n_parts AS n_parts_a, bb.n_parts AS n_parts_b,
       ROUND(CAST(p.shared AS DOUBLE)
             / (ba.n_parts + bb.n_parts - p.shared), 6) AS jaccard_lb
FROM pairs p
JOIN basket ba ON p.cust_a = ba.c
JOIN basket bb ON p.cust_b = bb.c
ORDER BY jaccard_lb DESC, cust_a, cust_b LIMIT {CF_TOPK}""",
)
def graph_customer_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-user collaborative filtering over the customer-part bipartite
    graph: customers are similar when their baskets share DISCRIMINATIVE
    parts. Candidate pairs are generated only through the RAREST parts
    that fit a fixed pair budget — parts ranked by popularity, kept
    while the running sum of popularity² stays under CF_PAIR_BUDGET
    (5M) — so the part equi-join emits a bounded candidate count AT ANY
    CORPUS SCALE, the property an absolute popularity cap lacks (at 10×
    data every part outgrows a fixed cap and the candidate set silently
    empties; measured before this design was chosen). A part bought by
    everyone is the 'the' of market baskets — quadratic pairs, zero
    signal — and falls outside the budget first. The reported score is
    therefore an explicit Jaccard LOWER BOUND (shared counts only
    budgeted parts; denominators are full basket sizes) — the same
    documented-cap contract as the stop-shingle dedup family. The
    rarest part is ALWAYS kept (``cum <= budget OR rank = 1``) so a
    budget smaller than every part's pair count degrades to best-effort
    instead of silently emptying the candidate stage.

    Scale: the bipartite incidence is one distinct projection of
    orders⋈lineitem; the budget window runs over the part-popularity
    table (catalog-sized, tiny); pair generation is an equi-join on the
    part key with total fan-out ≤ the budget by construction; basket
    sizes ride broadcasts.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    pop = cp.groupBy("p").agg(F.count(F.lit(1)).alias("n_buyers"))
    from pyspark.sql import Window

    w = Window.orderBy("n_buyers", "p")
    cum = F.sum(F.col("n_buyers") * F.col("n_buyers")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    # Degenerate-budget guard: if even the RAREST part's pair count
    # exceeds the budget, keep that one part rather than silently
    # returning zero rows with no signal the candidate stage collapsed.
    budgeted = (
        pop.select("p", cum.alias("cum"), F.row_number().over(w).alias("rk"))
        .filter((F.col("cum") <= CF_PAIR_BUDGET) | (F.col("rk") == 1))
        .select("p")
    )
    capped = cp.join(F.broadcast(budgeted), "p")
    basket = cp.groupBy("c").agg(F.count(F.lit(1)).alias("n_parts"))
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, "p")
        .filter(F.col("a.c") < F.col("b.c"))
        .groupBy(F.col("a.c").alias("cust_a"), F.col("b.c").alias("cust_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= CF_MIN_SHARED)
    )
    return (
        pairs.join(
            F.broadcast(basket).withColumnRenamed("c", "cust_a").withColumnRenamed("n_parts", "n_parts_a"),
            "cust_a",
        )
        .join(
            F.broadcast(basket).withColumnRenamed("c", "cust_b").withColumnRenamed("n_parts", "n_parts_b"),
            "cust_b",
        )
        .select(
            "cust_a",
            "cust_b",
            F.col("shared").cast("bigint").alias("shared_parts"),
            "n_parts_a",
            "n_parts_b",
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_parts_a") + F.col("n_parts_b") - F.col("shared")),
                6,
            ).alias("jaccard_lb"),
        )
        .orderBy(F.desc("jaccard_lb"), "cust_a", "cust_b")
        .limit(CF_TOPK)
    )


def _imuldiv(a: Column, mult: int, den: Column) -> Column:
    """Exact floor((a * mult) / den) for products beyond _idiv's 2^53
    double envelope: the product is formed as decimal(31,0) (exact up to
    10^31), the remainder subtracted, and the exactly-divisible decimal
    division yields the integer quotient losslessly. Mirrors DuckDB's
    bigint ``//`` (which computes in int128).

    Width budget: ``a`` and ``den`` are bigint-valued (< 2^63 < 10^19),
    so decimal(19,0) holds them exactly; with ``mult`` <= 10^11 the
    product fits decimal(31,0) = 19+11+1 digits.  The earlier
    decimal(12,0) casts silently overflowed to NULL (non-ANSI) once the
    half-step total t = HITS_SCALE * avg_degree passed 10^12 — this
    version is exact for any bigint input."""
    prod = a.cast("decimal(19,0)") * F.lit(mult).cast("decimal(11,0)")
    d = den.cast("decimal(19,0)")
    return ((prod - prod % d) / d).cast("long")


HITS_ITERS = 4
# HITS state scale: after the normalized init (h0 = SCALE // n_custs, so
# sum(h0) <= SCALE) every half-step aggregate is <= SCALE and the rescale
# product a * SCALE <= SCALE^2 = 1e18 < 2^63 - bigint-safe at ANY corpus
# size, which is why HITS does not reuse the 1e12 PageRank scale.
HITS_SCALE = 10**9


def _hits_oracle() -> str:
    """Unrolled integer-exact HITS on the customer->part bipartite graph.

    Normalization per half-step rescales scores to sum to HITS_SCALE via
    integer floor division - every quantity stays an exact bigint, so the
    fixpoint is bit-identical across engines. MATERIALIZED per level
    (each raw score table is referenced twice: by its rescale and by its
    total).
    """
    s = HITS_SCALE
    parts = [
        """WITH cp AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
custs AS (SELECT c FROM cp GROUP BY c),
parts_t AS (SELECT p, COUNT(*) AS n_buyers FROM cp GROUP BY p),""",
        f"h0 AS (SELECT c, {s} // (SELECT COUNT(*) FROM custs) AS h FROM custs)",
    ]
    for i in range(1, HITS_ITERS + 1):
        parts.append(
            f""",
araw{i} AS MATERIALIZED (
  SELECT cp.p, SUM(h.h) AS a FROM cp JOIN h{i - 1} h ON cp.c = h.c GROUP BY cp.p
),
a{i} AS MATERIALIZED (
  SELECT p, (a * {s}) // (SELECT SUM(a) FROM araw{i}) AS a FROM araw{i}
),
hraw{i} AS MATERIALIZED (
  SELECT cp.c, SUM(a.a) AS h FROM cp JOIN a{i} a ON cp.p = a.p GROUP BY cp.c
),
h{i} AS MATERIALIZED (
  SELECT c, (h * {s}) // (SELECT SUM(h) FROM hraw{i}) AS h FROM hraw{i}
)"""
        )
    parts.append(
        f"""
SELECT a.p AS part, pt.n_buyers,
       CAST(a.a AS BIGINT) AS authority_scaled,
       CAST(a.a AS DOUBLE) / {s} AS authority
FROM a{HITS_ITERS} a JOIN parts_t pt ON a.p = pt.p
ORDER BY authority_scaled DESC, part LIMIT 20"""
    )
    return "\n".join(parts)


@query(
    "graph_hits_authorities",
    tags=("graph", "iterative", "agg"),
    oracle=_hits_oracle(),
)
def graph_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs-and-authorities, 4 iterations) on the
    customer->part bipartite graph: a part's authority is the summed hub
    score of its buyers, a customer's hub score the summed authority of
    their basket - the mutually-reinforcing centrality that separates
    'bought by important buyers' from raw popularity (PageRank ranks the
    co-purchase projection; HITS ranks the bipartite structure itself).
    Emits the top-20 authority parts.

    Exactness: scores start at HITS_SCALE // n_customers and every
    half-step renormalizes to sum to HITS_SCALE by exact integer floor
    division — the rescale product (bounded by HITS_SCALE² = 10^18 at
    any corpus size) exceeds ``_idiv``'s 2^53 double envelope, so it
    runs through ``_imuldiv``'s decimal path instead — and both
    engines reach the identical fixpoint - no float
    accumulation anywhere. Each half-step is one equi-join of the
    incidence list against the current score vector plus one hash
    aggregate and a 1-row broadcast total; lineage is truncated per
    round with ``localCheckpoint``.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    n_buyers = cp.groupBy("p").agg(F.count(F.lit(1)).alias("n_buyers"))
    custs = cp.select("c").distinct()
    nc = custs.agg(F.count(F.lit(1)).alias("n"))
    h = (
        custs.crossJoin(F.broadcast(nc))
        .select("c", _idiv(F.lit(HITS_SCALE), F.col("n")).alias("h"))
        .localCheckpoint()
    )
    a = None
    for _ in range(HITS_ITERS):
        araw = cp.join(h, "c").groupBy("p").agg(F.sum("h").alias("a"))
        atot = araw.agg(F.sum("a").alias("t"))
        a = (
            araw.crossJoin(F.broadcast(atot))
            .select("p", _imuldiv(F.col("a"), HITS_SCALE, F.col("t")).alias("a"))
            .localCheckpoint()
        )
        hraw = cp.join(a, "p").groupBy("c").agg(F.sum("a").alias("h"))
        htot = hraw.agg(F.sum("h").alias("t"))
        h = (
            hraw.crossJoin(F.broadcast(htot))
            .select("c", _imuldiv(F.col("h"), HITS_SCALE, F.col("t")).alias("h"))
            .localCheckpoint()
        )
    return (
        a.join(n_buyers, "p")
        .select(
            F.col("p").alias("part"),
            "n_buyers",
            F.col("a").cast("bigint").alias("authority_scaled"),
            (F.col("a").cast("double") / HITS_SCALE).alias("authority"),
        )
        .orderBy(F.desc("authority_scaled"), "part")
        .limit(20)
    )


@query(
    "graph_assortativity",
    tags=("graph", "agg", "stats"),
    oracle="WITH "
    + _EDGES_SQL.strip()
    + """,
endp AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM und
  JOIN deg du ON und.src = du.node
  JOIN deg dv ON und.dst = dv.node
),
moments AS (
  SELECT COUNT(*) AS m,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM endp
)
SELECT CAST(m AS BIGINT) AS n_directed_edges,
       ROUND(CAST(sx AS DOUBLE) / m, 6) AS mean_endpoint_degree,
       ROUND((CAST(sxy AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m) * (CAST(sx AS DOUBLE) / m))
             / (CAST(sxx AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m) * (CAST(sx AS DOUBLE) / m)),
             6) AS assortativity
FROM moments""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over every directed edge — one number summarizing
    whether hubs attach to hubs (r > 0, social-network mixing) or to
    leaves (r < 0, technological/hub-and-spoke mixing). The sign decides
    real engineering: disassortative graphs concentrate triangle and
    join work on hub-leaf pairs, which is where the orientation and
    salting defenses earn their keep.

    By the symmetry of the directed edge list, Σx = Σy and Σx² = Σy², so
    one x-moment set suffices. All moments are exact integer sums
    (bounded far below 2^53 by deg ≤ n), divided once into doubles and
    rounded — engine- and partitioning-identical. One equi-join of the
    edge list against the broadcast degree table, one aggregate.
    """
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    deg = _degrees(edges)
    und = _und(edges)
    endp = und.join(
        F.broadcast(deg).withColumnRenamed("node", "src").withColumnRenamed("deg", "x"),
        "src",
    ).join(
        F.broadcast(deg).withColumnRenamed("node", "dst").withColumnRenamed("deg", "y"),
        "dst",
    )
    m = F.count(F.lit(1))
    sx = F.sum("x").cast("bigint")
    sxx = F.sum(F.col("x") * F.col("x")).cast("bigint")
    sxy = F.sum(F.col("x") * F.col("y")).cast("bigint")
    moments = endp.agg(
        m.alias("m"), sx.alias("sx"), sxx.alias("sxx"), sxy.alias("sxy")
    )
    mean = F.col("sx").cast("double") / F.col("m")
    return moments.select(
        F.col("m").cast("bigint").alias("n_directed_edges"),
        F.round(mean, 6).alias("mean_endpoint_degree"),
        F.round(
            (F.col("sxy").cast("double") / F.col("m") - mean * mean)
            / (F.col("sxx").cast("double") / F.col("m") - mean * mean),
            6,
        ).alias("assortativity"),
    )
