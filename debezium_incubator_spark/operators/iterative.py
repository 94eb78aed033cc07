"""Iterative graph analytics with EXACT differential oracles: PageRank
over the nation-level trade graph, run to a fixed iteration count in
all-integer fixed-point arithmetic so the Spark loop and the unrolled
SQL oracle are bit-identical (no float summation-order drift — every
operation is BIGINT multiply / truncating divide / exact integer sum).

Scale posture (100 TB): the edge list is built by the same broadcast
star join as q5/q7 and collapses to |nations|² rows before any
iteration; each PageRank step is one equi-join of the rank vector with
the edge list + one hash aggregate on dst — rank vectors partition by
node key, nothing is collected to the driver, and the iteration count
is fixed (the convergence-driven variant would add the same
converged-flag loop as ``hierarchy_depth``). For billion-node graphs
the identical plan runs with the rank vector hash-partitioned; the
small-side broadcast here is an AQE decision, not a structural one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

FP = 1_000_000_000_000  # 1e12 fixed-point scale for ranks
ITERS = 5
_EDGES_CTE = """
WITH edges AS (
  SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY 1, 2
), outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src
), nodes AS (
  SELECT n_name AS k FROM nation
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT k, CAST({fp} // (SELECT n FROM nn) AS BIGINT) AS rf FROM nodes
)"""


def _pagerank_oracle(iters: int = ITERS) -> str:
    """Unroll the fixed-point PageRank recurrence into chained CTEs —
    the SQL twin of the Spark loop (standard SQL forbids aggregation in
    a recursive CTE term, so the fixed iteration count is unrolled)."""
    sql = _EDGES_CTE.format(fp=FP)
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS (
  SELECT n.k,
         CAST({FP * 15 // 100} // (SELECT n FROM nn) AS BIGINT)
         + CAST(COALESCE(SUM((p.rf * e.w) // ow.ow), 0) * 85 // 100 AS BIGINT) AS rf
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.k
  LEFT JOIN r{i - 1} p ON p.k = e.src
  LEFT JOIN outw ow ON ow.src = e.src
  GROUP BY n.k
)"""
        prev = f"r{i}"
    sql += f"""
SELECT k AS nation, rf AS rank_fp,
       CAST(rf AS DOUBLE) / {FP} AS rank
FROM {prev} ORDER BY rf DESC, nation
"""
    return sql


@register("iter_pagerank", oracle=_pagerank_oracle())
def iter_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five fixed-point PageRank iterations (damping 0.85) over the
    customer-nation → supplier-nation trade graph. All arithmetic is
    BIGINT (ranks scaled by 1e12, truncating division) so the DataFrame
    loop is hash-identical to the oracle's unrolled CTE chain — the
    iterative-operator family gets exact differential coverage, not a
    rows-only check. Dangling nodes receive the teleport base via the
    left join + COALESCE."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.c_nk)
        .join(F.broadcast(sn), s.s_nationkey == sn.s_nk)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    nodes = n.select(F.col("n_name").alias("k"))
    n_nodes = nodes.count()  # control-plane scalar: node-set cardinality
    base = FP * 15 // 100 // n_nodes
    ranks = nodes.select("k", F.lit(FP // n_nodes).cast("bigint").alias("rf"))
    # round-14 (guide §4.4): every iteration's eager checkpoint below
    # re-executed ``ew``'s FULL five-table star join + two aggregates —
    # five star joins for one 625-row-max edge table.  One bounded
    # lineage cut here runs the join once; values are unchanged
    # (checkpointing is plan-only), which the unrolled-CTE oracle pins.
    ew = edges.join(outw, "src").select(
        "src", "dst", "w", "ow"
    ).localCheckpoint(eager=True)
    for _ in range(ITERS):
        contrib = (
            ranks.join(ew, ranks.k == ew.src)
            .select(
                F.col("dst"),
                F.expr("(rf * w) DIV ow").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.k == contrib.dst, "left")
            .select(
                "k",
                (
                    F.lit(base)
                    + F.expr("COALESCE(s, 0) * 85 DIV 100")
                ).cast("bigint").alias("rf"),
            )
            # Truncate lineage each round (same policy as
            # hierarchy.py / clustering.py): without this, the plan
            # nests one join+agg per iteration and the optimizer
            # re-analyzes the whole chain every round — safe at
            # ITERS=5, quadratic planning blowup if ITERS grows.
            # Checkpointing is plan-only; values are unchanged, which
            # the unrolled-CTE oracle pins.
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("k").alias("nation"),
        F.col("rf").alias("rank_fp"),
        (F.col("rf").cast("double") / FP).alias("rank"),
    ).orderBy(F.desc("rank_fp"), "nation")


# --- triangle counting (degree-oriented) ----------------------------------

_TRI_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT cn.n_name AS a, sn.n_name AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE cn.n_name <> sn.n_name
), und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e0
), deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und
  ) GROUP BY n
), ori AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS s,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS t
  FROM und JOIN deg du ON du.n = und.u JOIN deg dv ON dv.n = und.v
), tri AS (
  SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM ori e1
  JOIN ori e2 ON e2.s = e1.t
  JOIN ori e3 ON e3.s = e1.s AND e3.t = e2.t
)
SELECT n AS nation, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS n FROM tri
  UNION ALL SELECT b AS n FROM tri
  UNION ALL SELECT c AS n FROM tri
)
GROUP BY n
ORDER BY n_triangles DESC, nation
"""


@register("iter_triangles", oracle=_TRI_ORACLE)
def iter_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the undirected nation trade
    graph, via DEGREE ORIENTATION: every edge is directed from its
    lower-(degree, name) endpoint to the higher, then a triangle is one
    wedge (a→b, b→c) closed by the orienting edge (a→c).

    Scale posture (100 TB graphs): orientation is THE standard trick
    that makes distributed triangle counting feasible — each node's
    out-degree is bounded by O(sqrt(m)), so the wedge join (the only
    quadratic-ish step) is quadratic per node in a bounded quantity,
    never in the raw degree of a hub. Everything is equi-joins + hash
    aggregates on the edge list: no driver collect, partitions by node
    key. The exact SQL twin runs the same plan.
    """
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("a"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("b"))
    e0 = (
        li.join(o.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == cn.c_nk)
        .join(s.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == sn.s_nk)
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    und = e0.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    # round-13 (guide §4.4): the tiny (≤ nations² / 2 rows) edge list
    # is consumed five times (degree union ×2, orientation, and the
    # oriented copies feeding the wedge join), each re-running the
    # 5-way lineitem join above it; the lazy localCheckpoint folds the
    # edge derivation once per run.
    und = und.localCheckpoint(eager=False)
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    fwd = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    ori = (
        und.join(du, "u").join(dv, "v")
        .select(
            F.when(fwd | tie, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd | tie, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    e1 = ori.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = ori.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = ori.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("n_triangles"))
        .select(F.col("n").alias("nation"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "nation")
    )
