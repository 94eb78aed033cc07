"""Hierarchy traversal: the recursive-CTE surface Spark lacks, built as
an iterative pointer-doubling (binary lifting) DataFrame loop and
oracle-checked against DuckDB's ``WITH RECURSIVE`` — the one §2 family
where the engine's iterative plan is verified against genuine SQL
recursion rather than a rows-only check.

Scale posture (100 TB): pointer doubling reaches every node's root in
O(log depth) self-joins on the node key (a depth-10⁶ chain needs ~20
rounds), versus O(depth) rounds for naive per-level BFS. Each round is
one hash equi-join of the full node set with itself — shuffle-partitioned
on the node key, no broadcast of anything data-sized, no driver-side
frontier. ``localCheckpoint`` per round truncates the lineage exactly as
in ``llm.clustering.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def hierarchy_depth(nodes: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Depth (distance to root) for every node of a parent-pointer forest.

    ``nodes``: columns ``k`` (node id) and ``parent``; roots point at
    themselves.  Returns ``(k, depth)``. Raises RuntimeError if the
    pointer chase does not converge within ``max_rounds`` doublings
    (2^40 depth — structurally a cycle, not a tree).
    """
    roots = nodes.filter(F.col("parent") == F.col("k")).select(
        F.col("k").alias("root_k")
    )
    state = nodes.select(
        "k",
        F.col("parent").alias("anc"),
        F.when(F.col("parent") == F.col("k"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("depth"),
    ).localCheckpoint()
    for _ in range(max_rounds):
        pending = (
            state.join(
                # root count scales with the forest — no forced
                # broadcast; AQE broadcasts when genuinely small
                roots,
                F.col("anc") == F.col("root_k"),
                "left_anti",
            )
            .limit(1)
            .count()
        )
        if pending == 0:
            return state.select("k", "depth")
        hop = state.select(
            F.col("k").alias("a_k"),
            F.col("anc").alias("a_anc"),
            F.col("depth").alias("a_depth"),
        ).alias("h")
        state = (
            state.alias("s")
            .join(hop, F.col("s.anc") == F.col("h.a_k"))
            .select(
                F.col("s.k").alias("k"),
                F.col("h.a_anc").alias("anc"),
                (F.col("s.depth") + F.col("h.a_depth")).alias("depth"),
            )
            .localCheckpoint()
        )
    raise RuntimeError(
        f"hierarchy_depth: no convergence in {max_rounds} doubling rounds "
        "(cycle in the parent pointers?)"
    )


@register(
    "iter_hierarchy_levels",
    oracle="""
WITH RECURSIVE r AS (
  SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth
  UNION ALL
  SELECT p.p_partkey, r.depth + 1
  FROM part p JOIN r ON (p.p_partkey - 1) // 2 = r.k
  WHERE p.p_partkey > 0
)
SELECT depth, COUNT(*) AS n_nodes, MIN(k) AS min_key, MAX(k) AS max_key
FROM r GROUP BY depth ORDER BY depth
""",
)
def iter_hierarchy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-level rollup of a parts hierarchy (binary-heap parent edge
    ``parent(k) = (k-1) div 2``, root 0 — a deterministic BOM-style tree
    derived from the part table). The Spark side chases pointers with
    O(log depth) doubling joins; the oracle walks the same tree with a
    genuine recursive CTE, so iterative-vs-recursive equivalence is
    hash-checked, not assumed."""
    nodes = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.expr(
            "CAST(CASE WHEN p_partkey = 0 THEN 0"
            " ELSE (p_partkey - 1) DIV 2 END AS BIGINT)"
        ).alias("parent"),
    )
    depths = hierarchy_depth(nodes)
    return (
        depths.groupBy("depth")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("depth")
    )
