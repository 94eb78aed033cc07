"""SQL entry point (SURVEY.md §3.4): the engine's second API.

``spark.sql`` over registered fixture views goes through the same
analyze→optimize→plan→execute path as the DataFrame API, so every
DataFrame operator has a SQL twin for free. The queries below are
implemented *via SQL strings* to pin that path explicitly — including a
correlated subquery (Catalyst decorrelation → join rewrite, SURVEY.md
§4.2) that the DataFrame API cannot express directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views
from .registry import register


def run_sql(spark: SparkSession, sf_dir: str, query: str,
            tables=None) -> DataFrame:
    """Register fixture views and run a SQL query (the spark.sql path)."""
    register_views(spark, sf_dir, tables or ("lineitem", "orders", "customer",
                                             "supplier", "nation", "region",
                                             "part", "events"))
    return spark.sql(query)


@register(
    "sql_q6_forecast_revenue",
    oracle="""
SELECT SUM(CAST(floor((l_extendedprice * l_discount) * 10000 + 0.5) AS BIGINT))
       / CAST(10000 AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape via the SQL API (scan + multi-predicate filter +
    global agg; every predicate reaches PushedFilters)."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT SUM(CAST(floor((l_extendedprice * l_discount) * 10000 + 0.5) AS BIGINT))
               / CAST(10000 AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
          AND l_shipdate < TIMESTAMP_NTZ '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """,
        tables=("lineitem",),
    )


@register(
    "sql_correlated_subquery",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal > (SELECT 2 * AVG(c2.c_acctbal)
                   FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey
""",
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (RewriteCorrelatedScalarSubquery); parity note: the
    AVG comparison is strict inequality against a 2x-scaled average, so
    cross-engine float drift at the boundary is not a practical risk
    (drift ~1e-12 relative vs value gaps ~1e0)."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT 2 * AVG(c2.c_acctbal)
                           FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
        """,
        tables=("customer",),
    )


@register(
    "sql_in_subquery",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
ORDER BY s_suppkey
""",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → RewritePredicateSubquery → left-semi join (§4.2)."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        ORDER BY s_suppkey
        """,
        tables=("supplier", "nation"),
    )


_LATERAL_SQL = """
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal, c_custkey FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) c
ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
"""


@register("sql_lateral_topk", oracle=_LATERAL_SQL)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    customers per nation): Catalyst decorrelates the lateral relation
    into a join + per-key limit instead of re-running the inner query
    per outer row — same rewrite family as sql_correlated_subquery,
    checked here because LATERAL is the general form (arbitrary inner
    shape). Identical SQL runs on DuckDB."""
    return run_sql(spark, sf_dir, _LATERAL_SQL, ("nation", "customer"))


_FILTER_AGG_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       SUM(CAST(floor((o_totalprice) * 10000 + 0.5) AS BIGINT))
         FILTER (WHERE o_orderstatus = 'O') / CAST(10000 AS DOUBLE) AS open_value,
       bool_or(o_totalprice > 300000) AS any_jumbo,
       bool_and(o_totalprice > 1000) AS all_over_1k
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_filtered_agg", oracle=_FILTER_AGG_SQL)
def sql_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clause + bool_and/bool_or: several
    differently-filtered aggregates in ONE scan/shuffle instead of N
    self-joined subqueries — the idiom for conditional metrics at scale.
    Identical SQL is the oracle (fixed-point money sum per the parity
    policy)."""
    return run_sql(spark, sf_dir, _FILTER_AGG_SQL, ("orders",))


@register(
    "sql_not_in_null_aware",
    oracle="""
SELECT 'outer_nulls_drop' AS label, CAST(COUNT(*) AS BIGINT) AS n
FROM customer
WHERE NULLIF(c_nationkey, 7) NOT IN
      (SELECT s_nationkey FROM supplier WHERE s_nationkey < 10)
UNION ALL
SELECT 'null_in_subquery', CAST(COUNT(*) AS BIGINT)
FROM customer
WHERE c_nationkey NOT IN (SELECT NULLIF(s_nationkey, 3) FROM supplier)
ORDER BY label
""",
)
def sql_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 variant with distinct semantics: NULL-aware NOT IN. Unlike
    NOT EXISTS (plain left-anti), three-valued logic makes (a) an outer
    NULL never satisfy NOT IN and (b) a single NULL in the subquery
    empty the whole result. Spark plans this as a null-aware anti join
    (BroadcastHashJoin/NestedLoop with isNullAware) — both legs are
    pinned here against DuckDB's NOT IN.

    Scale: the subquery side is an aggregated/filtered dim — broadcast;
    the probe side streams. NAAJ requires the full build side on every
    task (null-awareness cannot partition), which is why the planner
    only offers it for broadcastable builds — exactly the shape used."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT 'outer_nulls_drop' AS label, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        WHERE NULLIF(c_nationkey, 7) NOT IN
              (SELECT s_nationkey FROM supplier WHERE s_nationkey < 10)
        UNION ALL
        SELECT 'null_in_subquery', CAST(COUNT(*) AS BIGINT)
        FROM customer
        WHERE c_nationkey NOT IN (SELECT NULLIF(s_nationkey, 3) FROM supplier)
        ORDER BY label
        """,
        tables=("customer", "supplier"),
    )


@register(
    "sql_recursive_cte",
    oracle="""
WITH RECURSIVE r AS (
  SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth
  UNION ALL
  SELECT p.p_partkey, r.depth + 1
  FROM part p JOIN r ON (p.p_partkey - 1) // 2 = r.k
  WHERE p.p_partkey > 0
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(k) AS BIGINT) AS sum_keys
FROM r GROUP BY depth ORDER BY depth
""",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE ``WITH RECURSIVE`` on the engine side (Spark 4) walking
    the binary-heap part hierarchy — both engines now run a genuine
    recursive CTE over the same edge rule, checked level-by-level with
    a key-sum fingerprint. Complements `iter_hierarchy_levels`, where
    the Spark side is the iterative pointer-doubling loop and only the
    ORACLE recursed: between the two, all four quadrants of
    iterative/recursive × engine/oracle are hash-tied together.

    Scale: each recursion step is one equi-join of the frontier against
    the edge table + the union — the same shuffle shape as the manual
    loop, with the engine managing the iteration; depth is
    O(log |part|) here. Deep recursions still prefer the
    pointer-doubling form (O(log depth) rounds vs O(depth))."""
    return run_sql(
        spark,
        sf_dir,
        """
        WITH RECURSIVE r AS (
          SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth
          UNION ALL
          SELECT p.p_partkey, r.depth + 1
          FROM part p JOIN r ON (p.p_partkey - 1) DIV 2 = r.k
          WHERE p.p_partkey > 0
        )
        SELECT depth, COUNT(*) AS n_nodes,
               SUM(k) AS sum_keys
        FROM r GROUP BY depth ORDER BY depth
        """,
        tables=("part",),
    )


@register(
    "sql_pipe_syntax",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
         / CAST(10000 AS DOUBLE) AS gross
FROM lineitem
WHERE l_quantity < 25
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the same
    scan→filter→aggregate→sort plan as the classic form, written as a
    linear pipeline — each `|>` stage maps onto exactly one relational
    operator, so the optimizer sees an identical tree (pushdown and
    partial aggregation unchanged; the oracle IS the classic spelling
    of the same query)."""
    return run_sql(
        spark,
        sf_dir,
        """
        FROM lineitem
        |> WHERE l_quantity < 25
        |> AGGREGATE COUNT(*) AS n_items,
             SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
               / CAST(10000 AS DOUBLE) AS gross
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items, gross
        |> ORDER BY l_returnflag, l_linestatus
        """,
        tables=("lineitem",),
    )


@register(
    "sql_group_order_by_all",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS qty
FROM lineitem
WHERE l_discount > 0.05
GROUP BY ALL
ORDER BY ALL
""",
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` / `ORDER BY ALL` (the DuckDB-originated shorthand
    Spark 4 adopted): grouping keys inferred as every non-aggregate
    select item, ordering as every select item left-to-right. The
    oracle is the SAME spelling run by DuckDB — both engines must infer
    identical keys and identical (stable, left-to-right) sort order, or
    the hash comparison fails. Compiles to the ordinary partial/final
    hash aggregate; the sugar is resolver-level only."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)
                 AS qty
        FROM lineitem
        WHERE l_discount > 0.05
        GROUP BY ALL
        ORDER BY ALL
        """,
        tables=("lineitem",),
    )
