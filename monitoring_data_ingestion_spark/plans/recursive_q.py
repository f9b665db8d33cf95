"""Recursive-CTE queries: hierarchy walks (Spark 4 ``WITH RECURSIVE``).

Spark 4 added recursive common table expressions (SPARK-24497) — the
engine exercises them on the canonical workload: walking a parent-child
hierarchy (org chart, BOM, account tree) to roll subtrees up to their
roots and to materialize ancestor paths.

The fixture hierarchy is synthesized from the customer table the same way
the PII/URL fixtures synthesize their inputs: ``parent(c) = c DIV 10``
(NULL below 10), which makes a forest rooted at the single-digit keys.
Both engines build the identical forest, so the oracle checks the
recursion semantics themselves, not fixture plumbing.

CORRECTNESS UNDER ``UNION ALL``: Spark's recursive CTEs support only
``UNION ALL`` (no dedup between iterations), which is exact precisely
when the recursion is PATH-UNIQUE — every row is derivable in exactly
one way. A parent-child walk qualifies (each node has one parent); a
general-graph BFS does not (it would enumerate paths). That boundary is
why the co-purchase graph family (plans/graph_q.py) uses bounded
iterative dataflow with explicit dedup instead of recursion.

Scale stance: each recursion level is ONE equi-join of the current
frontier against the (pruned) node table plus a union — depth is
O(log n) for this forest, and the frontier only shrinks. At 100 TB the
same shape holds: the hierarchy dimension is small next to facts, and
Spark materializes each level once rather than re-deriving the chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import query

# Shared recursion body; {cust} is the engine-specific customer relation
# and the integer-division operator differs (Spark DIV / DuckDB //).
_WALK_SQL = """
WITH RECURSIVE
nodes AS (
  SELECT c_custkey AS node,
         CASE WHEN c_custkey >= 10 THEN c_custkey {div} 10 ELSE NULL END AS parent,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM {cust}
),
walk (node, root, depth, bal) AS (
  SELECT node, node, 0, bal FROM nodes WHERE parent IS NULL
  UNION ALL
  SELECT c.node, w.root, w.depth + 1, c.bal
  FROM nodes c JOIN walk w ON c.parent = w.node
)
"""

_ROLLUP_TAIL = """
SELECT root,
       COUNT(*) AS subtree_nodes,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(SUM(bal) AS DOUBLE) AS subtree_balance
FROM walk GROUP BY root ORDER BY root
"""


@query(
    "hierarchy_recursive_rollup",
    tags=("recursive", "hierarchy", "agg"),
    oracle=_WALK_SQL.format(div="//", cust="customer") + _ROLLUP_TAIL,
)
def hierarchy_recursive_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over a parent-child forest via ``WITH RECURSIVE``:
    every node is walked down from its root carrying (root, depth), then
    one aggregate yields per-root subtree size, height, and the exact
    decimal balance rollup — the org-chart / chart-of-accounts primitive.

    The recursion is path-unique (one parent per node), so Spark's
    UNION ALL recursion produces each node exactly once; balances stay
    decimal until the final cast so the rollup is partitioning-proof.
    """
    return spark.sql(
        _WALK_SQL.format(div="DIV", cust=f"parquet.`{sf_dir}/customer.parquet`")
        + _ROLLUP_TAIL
    )


_PATHS_TAIL = """
SELECT node, root, CAST(depth AS BIGINT) AS depth, path
FROM pwalk
ORDER BY depth DESC, node
LIMIT 20
"""

_PWALK_SQL = """
WITH RECURSIVE
nodes AS (
  SELECT c_custkey AS node,
         CASE WHEN c_custkey >= 10 THEN c_custkey {div} 10 ELSE NULL END AS parent
  FROM {cust}
),
pwalk (node, root, depth, path) AS (
  SELECT node, node, 0, CAST(node AS {strty}) FROM nodes WHERE parent IS NULL
  UNION ALL
  SELECT c.node, w.root, w.depth + 1, w.path || '/' || CAST(c.node AS {strty})
  FROM nodes c JOIN pwalk w ON c.parent = w.node
)
"""


@query(
    "hierarchy_recursive_paths",
    tags=("recursive", "hierarchy"),
    oracle=_PWALK_SQL.format(div="//", cust="customer", strty="VARCHAR")
    + _PATHS_TAIL,
)
def hierarchy_recursive_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized ancestor paths (``root/…/node``) built during the
    recursive walk — the lineage-string form consumed by breadcrumb UIs
    and path-prefix filters (``path LIKE 'r/x/%'`` finds a subtree
    without re-walking). Emits the 20 deepest nodes deterministically.

    Path strings accrete during recursion (one concat per level), so
    the cost is O(nodes × depth) characters — bounded by the forest's
    logarithmic height, never re-joined after the walk.
    """
    return spark.sql(
        _PWALK_SQL.format(
            div="DIV", cust=f"parquet.`{sf_dir}/customer.parquet`", strty="STRING"
        )
        + _PATHS_TAIL
    )
