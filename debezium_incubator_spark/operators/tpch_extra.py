"""Additional TPC-H-shaped consumer queries (SURVEY.md §2 breadth):
HAVING-gated aggregates, year-bucketed join aggregates, conditional
aggregation, post-aggregation global ranks, format strings.

Scale notes: all follow the verified patterns — dims broadcast, facts
shuffle once on the group key, HAVING is a post-agg filter (no second
shuffle), global windows only ever run post-aggregation on group-sized
results (E7 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..exprs import money_sum, oracle_money_sum, round4
from ..registry import register


# --- Q18 shape: HAVING over a grouped fact --------------------------------

@register(
    "q18_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, {oracle_money_sum("l_quantity", "total_qty")}
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) > 250
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY b.total_qty DESC, o.o_orderkey
LIMIT 50
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-order customers: grouped fact + HAVING, then dim joins.
    The HAVING filter runs before the joins — orders of magnitude fewer
    rows reach the join at scale."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(money_sum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


# --- Q7 shape: year-bucketed volume between two nations ------------------

@register(
    "q7_volume_by_year",
    oracle=f"""
SELECT n.n_name AS supp_nation,
       year(l.l_shipdate) AS ship_year,
       {oracle_money_sum("l.l_extendedprice * (1 - l.l_discount)", "volume")}
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2')
GROUP BY n.n_name, year(l.l_shipdate)
ORDER BY supp_nation, ship_year
""",
)
def q7_volume_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(money_sum("l_extendedprice * (1 - l_discount)", "volume"))
        .orderBy("supp_nation", "ship_year")
    )


# --- Q10 shape: top customers by returned-item revenue -------------------

@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {oracle_money_sum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q12 shape: conditional aggregation (CASE inside agg) ----------------

@register(
    "q12_priority_class",
    oracle="""
SELECT year(o_orderdate) AS order_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders
GROUP BY year(o_orderdate)
ORDER BY order_year
""",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity: DuckDB SUM over INTEGER widens to HUGEINT, which its pandas
    conversion renders float64, while Spark SUM(int) stays int64 — the
    oracle therefore CASTs the sums to BIGINT (round-1 driver failure)."""
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("order_year")
    )


# --- E7: global rank post-aggregation ------------------------------------

@register(
    "w_global_rank",
    oracle=f"""
WITH nat AS (
  SELECT n.n_name, {oracle_money_sum("s.s_acctbal", "total_bal")}
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name
)
SELECT n_name, total_bal,
       row_number() OVER (ORDER BY total_bal DESC, n_name) AS global_rank
FROM nat
ORDER BY global_rank
""",
)
def w_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-partitioned window — legal ONLY post-aggregation on group-sized
    results (here ≤25 rows); on raw data it would serialize the world
    into one partition (E7 warning)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nat = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(money_sum("s_acctbal", "total_bal"))
    )
    w = W.orderBy(F.desc("total_bal"), F.asc("n_name"))
    return (
        nat.withColumn("global_rank", F.row_number().over(w))
        .orderBy("global_rank")
    )


# --- H10: format_string / printf -----------------------------------------

@register(
    "fn_format",
    oracle="""
SELECT n_nationkey,
       printf('%03d:%s', n_nationkey, n_name) AS padded_id,
       printf('%s in region %d', n_name, n_regionkey) AS label
FROM nation
ORDER BY n_nationkey
""",
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting — integers and strings only (float
    rendering is engine-specific and excluded by the parity policy)."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.format_string("%03d:%s", "n_nationkey", "n_name").alias("padded_id"),
        F.format_string("%s in region %d", "n_name", "n_regionkey").alias("label"),
    ).orderBy("n_nationkey")
