"""TPC-H query shapes q4..q22 adapted to the fixture star schema
(SURVEY.md §2C-§2F breadth; the fixtures carry no partsupp table and no
commit/receipt dates, so each query keeps the classic plan SHAPE —
exists/anti subqueries, scalar-subquery thresholds, disjunctive
predicate pushdown, double aggregation, correlated averages — over the
columns that exist; reference basis `[C]`, consumer query surface).

Scale notes (apply to all): dims (nation/region/supplier/part at TPC-H
ratios) broadcast; each aggregate is one shuffle on its group key;
scalar-subquery thresholds become broadcast 1-row joins, never a
driver collect; semi/anti joins stay semi/anti (no distinct+inner
rewrites that would double-shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import FX, money_sum, oracle_money_sum
from ..registry import register


# --- Q4: EXISTS semi-join, order counts by priority -----------------------

@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 7 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (in a year) that had at least one line shipped ≥7 days
    after order date, counted by priority. EXISTS → left-semi join with
    a non-equi residual condition; the date filter prunes orders before
    the join (at scale: partition orders by month → partition pruning).

    The lineitem side carries the IMPLIED bound l_shipdate >= 1996-01-08
    (any matching line has l_shipdate >= o_orderdate + 7 and the order
    filter pins o_orderdate >= 1996-01-01) — Catalyst cannot derive a
    constant bound through the non-equi conjunct, so spelling it makes
    the predicate reach the parquet scan (PushedFilters) and cuts the
    probe side before the join instead of after."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1996-01-08")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q8: market-share ratio via conditional aggregation -------------------

@register(
    "q8_market_share",
    oracle=f"""
WITH vol AS (
  SELECT year(o.o_orderdate) AS order_year,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * {FX} + 0.5) AS BIGINT) AS v,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o    ON o.o_orderkey = l.l_orderkey
  JOIN customer c  ON c.c_custkey = o.o_custkey
  JOIN nation n1   ON n1.n_nationkey = c.c_nationkey
  JOIN region r    ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s  ON s.s_suppkey = l.l_suppkey
  JOIN nation n2   ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT order_year,
       floor(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN v ELSE 0 END) AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE) * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS mkt_share
FROM vol
GROUP BY order_year
ORDER BY order_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2 suppliers' share of revenue sold to ASIA customers, by
    year. The ratio is fixed-point-quantized before the conditional sum
    so numerator and denominator are exact on both engines. Plan: one
    fact scan, nation/region broadcast (fixed 25/5 rows); supplier
    carries NO hint — it scales with SF, AQE broadcasts when small."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = table(spark, sf_dir, "supplier")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    v = F.expr(f"CAST(floor(l_extendedprice * (1 - l_discount) * {FX} + 0.5) AS BIGINT)")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .select(F.year("o_orderdate").alias("order_year"), v.alias("v"), "supp_nation")
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("v")).otherwise(F.lit(0)))
    return (
        vol.groupBy("order_year")
        .agg(
            (
                F.floor(num.cast("double") / F.sum("v").cast("double") * 10000 + 0.5)
                / F.lit(10000.0)
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


# --- Q9: product profit by nation and year --------------------------------

@register(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
       {oracle_money_sum("l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity * 0.1", "profit")}
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = 'PROMO'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, order_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on PROMO parts by supplier nation and year (q9 with
    p_retailprice*qty*0.1 standing in for ps_supplycost). The p_type
    filter reaches the part scan; nation broadcasts (25 rows fixed);
    part/supplier carry NO hint — they scale with SF, AQE decides."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year"))
        .agg(
            money_sum(
                "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1",
                "profit",
            )
        )
        .orderBy("nation", "order_year")
    )


# --- Q11: scalar-subquery threshold over grouped values -------------------

@register(
    "q11_important_parts",
    oracle=f"""
WITH val AS (
  SELECT l_partkey, {oracle_money_sum("l_extendedprice * (1 - l_discount)", "value")}
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, value
FROM val
WHERE value > (SELECT floor(SUM(value) * 0.0006 * 10000 + 0.5) / CAST(10000 AS DOUBLE) FROM val)
ORDER BY value DESC, l_partkey
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds a fraction of TOTAL revenue — the
    scalar-subquery threshold becomes a broadcast 1-row cross join (no
    driver collect; the threshold row moves to executors). value is an
    exact fixed-point sum so the > comparison cannot flip across engines."""
    li = table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        money_sum("l_extendedprice * (1 - l_discount)", "value")
    )
    total = val.agg(
        (F.floor(F.sum("value") * 0.0006 * 10000 + 0.5) / F.lit(10000.0)).alias(
            "__threshold"
        )
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__threshold"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


# --- Q13: distribution of orders-per-customer (double aggregation) --------

@register(
    "q13_customer_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                     AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed N (non-urgent) orders — orders
    pre-aggregate to (custkey, count) BEFORE the join (guide §2.3:
    map-side partial aggregation shuffles one partial row per custkey
    per task instead of every order row), then a left join preserves
    order-less customers at count 0. count(o_orderkey) over the old
    outer join ≡ coalesce(pre-agg count, 0) — an equivalence that
    DEPENDS on c_custkey being unique in customer (its TPC-H primary
    key): duplicate keys would inflate custdist instead of merging
    under the dropped groupBy(c_custkey) collapse (r13 ADVICE) —
    interleaved A/B measured
    the pre-agg shape ~12% faster at sf0.1 and it shuffles strictly
    fewer bytes at any scale; the second aggregation shuffles tiny
    data."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("n_ord"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_ord"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q14: promo revenue share in a month window ---------------------------

@register(
    "q14_promo_share",
    oracle=f"""
SELECT date_trunc('month', l.l_shipdate) AS ship_month,
       floor(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * {FX} + 0.5) AS BIGINT)
                  ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * {FX} + 0.5) AS BIGINT)) AS DOUBLE)
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS promo_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY date_trunc('month', l.l_shipdate)
ORDER BY ship_month
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of monthly revenue from PROMO parts — conditional
    aggregation over a part join (no forced broadcast — part scales
    with SF; AQE broadcasts when small), fixed-point-exact ratio."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf_dir, "part")
    v = F.expr(f"CAST(floor(l_extendedprice * (1 - l_discount) * {FX} + 0.5) AS BIGINT)")
    j = li.join(p, li.l_partkey == p.p_partkey).select(
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        v.alias("v"),
        (F.col("p_type") == "PROMO").alias("is_promo"),
    )
    promo = F.sum(F.when(F.col("is_promo"), F.col("v")).otherwise(F.lit(0)))
    return (
        j.groupBy("ship_month")
        .agg(
            (
                F.floor(
                    F.lit(100.0) * promo.cast("double") / F.sum("v").cast("double")
                    * 10000 + 0.5
                )
                / F.lit(10000.0)
            ).alias("promo_share")
        )
        .orderBy("ship_month")
    )


# --- Q15: top supplier(s) = argmax over an aggregated view ----------------

@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {oracle_money_sum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max quarterly revenue — the classic view +
    scalar-max pattern. Exact fixed-point revenue makes the equality
    safe; the max arrives as a broadcast 1-row join, and ties (multiple
    max suppliers) are preserved, matching SQL semantics."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum("l_extendedprice * (1 - l_discount)", "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q16: distinct-supplier counts with exclusion filters -----------------

@register(
    "q16_part_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_part_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers ship each surviving (brand, type,
    size) — q16 with lineitem standing in for partsupp. The exclusion
    predicates push into the part scan (AQE-chosen join strategy —
    part scales with SF, no forced broadcast); count(distinct) is
    Spark's two-phase expand-aggregate (scale-safe, no driver set)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q17: correlated per-group average threshold --------------------------

@register(
    "q17_small_quantity_revenue",
    oracle=f"""
SELECT floor(CAST(SUM(CAST(floor(l.l_extendedprice * {FX} + 0.5) AS BIGINT)) AS DOUBLE)
             / {FX} / 7.0 * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND l.l_quantity < t.qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small orders: lines under 20% of their part's
    average quantity (q17's correlated scalar subquery, decorrelated
    into a per-part aggregate join — exactly what Catalyst's subquery
    rewrite produces). Fixed-point sum then one rounded division."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(thr, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.floor(
                    F.expr(f"SUM(CAST(floor(l_extendedprice * {FX} + 0.5) AS BIGINT))").cast("double")
                    / F.lit(FX)
                    / F.lit(7.0)
                    * 10000
                    + 0.5
                )
                / F.lit(10000.0)
            ).alias("avg_yearly")
        )
    )


# --- Q19: disjunctive multi-range predicate -------------------------------

@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT {oracle_money_sum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19's OR-of-conjunctions over join output. Catalyst extracts the
    common p_partkey equi-key and keeps the disjunction as a residual
    filter; the per-side implied predicates (brand IN ..., size <= 35)
    are pushed to the part scan by constraint propagation."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        money_sum("l_extendedprice * (1 - l_discount)", "revenue")
    )


# --- Q20: semi-join chain gated by a grouped HAVING -----------------------

@register(
    "q20_promo_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey
  HAVING SUM(l.l_quantity) > 400
)
ORDER BY s.s_suppkey
""",
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved >400 units of PROMO parts in 1997 — q20's
    IN-subquery-with-HAVING shape as an aggregate → left-semi join.
    l_quantity is integral (1..50) so SUM stays exact in double."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Q22: anti join + global scalar-average threshold ---------------------

@register(
    "q22_idle_rich_customers",
    oracle="""
WITH avg_bal AS (
  SELECT floor(avg(c_acctbal) * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, count(*) AS numcust,
       SUM(CAST(floor(c.c_acctbal * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no urgent orders, by nation
    (q22: scalar AVG threshold + NOT EXISTS anti join). The average is
    rounded to 4dp on both engines so the > comparison is on identical
    values; the anti join replaces the correlated NOT EXISTS."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.floor(F.avg("c_acctbal") * 10000 + 0.5) / F.lit(10000.0)).alias(
            "__avg_bal"
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            money_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- Q2: per-group argmin with equality join back -------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
WITH cand AS (
  SELECT DISTINCT l.l_partkey AS p_key, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
), best AS (
  SELECT p_key, min(s_acctbal) AS min_bal FROM cand GROUP BY p_key
)
SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey, p.p_type
FROM part p
JOIN cand c ON c.p_key = p.p_partkey
JOIN best b ON b.p_key = p.p_partkey AND c.s_acctbal = b.min_bal
WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2's correlated-min shape (s_acctbal standing in for
    ps_supplycost): per part, the EUROPE supplier(s) with minimum
    balance. The correlated subquery decorrelates into a per-part min
    aggregate joined back on equality — min over untouched doubles is
    exact, so the equality cannot flip across engines; ties return all
    minimal suppliers in both (SQL semantics)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("l_partkey").alias("p_key"),
            "s_suppkey", "s_name", "s_acctbal", "n_name",
        )
        .distinct()
    )
    best = (
        cand.groupBy("p_key")
        .agg(F.min("s_acctbal").alias("min_bal"))
        .withColumnRenamed("p_key", "b_key")
    )
    return (
        p.join(cand, cand.p_key == p.p_partkey)
        .join(
            best,
            (F.col("b_key") == F.col("p_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q21: EXISTS + NOT EXISTS against the same fact -----------------------

@register(
    "q21_sole_returner",
    oracle="""
WITH l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
r1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
SELECT s.s_name, count(*) AS numwait
FROM r1
JOIN orders o   ON o.o_orderkey = r1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = r1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM l1
    WHERE l1.l_orderkey = r1.l_orderkey AND l1.l_suppkey <> r1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM r1 r2
    WHERE r2.l_orderkey = r1.l_orderkey AND r2.l_suppkey <> r1.l_suppkey
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21's signature shape (l_returnflag='R' standing in for
    receipt-past-commit lateness): suppliers who were the ONLY supplier
    with returned lines on a finished multi-supplier order — EXISTS
    (another supplier participated) + NOT EXISTS (another supplier also
    returned) against the same fact, as semi + anti joins with a
    non-equi residual (<> on suppkey). One distinct-projected scan feeds
    both sides; at scale both joins co-partition on l_orderkey so the
    three shuffles share one exchange.

    Round-13 rewrite (guide §2.3 aggregate-before-you-shuffle): the
    EXISTS/NOT EXISTS pair over the same fact is a per-order predicate —
    EXISTS(other supplier) ⟺ COUNT(DISTINCT l_suppkey) ≥ 2 and
    NOT EXISTS(other returned supplier) ⟺ COUNT(DISTINCT returned
    suppkey) = 1; when the latter is 1 the sole returner IS
    max(returned suppkey).  One hash aggregation of lineitem replaces
    two distinct pre-passes plus a left-semi and a left-anti self-join
    (which expanded every multi-supplier order's pair set).  Rows
    identical — r12's semi+anti spelling kept exactly the r1 rows whose
    order satisfies both counts, one per order."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    # one distinct-pair aggregate (map-side combined — NOT two
    # countDistincts, whose Expand would triple the scan), then a
    # dictionary-sized per-order rollup
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("is_ret")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_ret").alias("n_ret"),
        F.max(F.when(F.col("is_ret") == 1, F.col("l_suppkey"))).alias("l_suppkey"),
    )
    base = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_ret") == 1)
    ).select("l_orderkey", "l_suppkey")
    return (
        base.join(o, base.l_orderkey == o.o_orderkey)
        .join(s, base.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


# --- Q6: forecast revenue change (filtered scalar aggregate) --------------

@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {oracle_money_sum("l_extendedprice * l_discount", "revenue")},
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical predicate-pushdown showcase — a pure
    filtered scalar aggregate with no join and no group key. All four
    predicates reach the parquet scan (PushedFilters) and the aggregate
    is a two-phase partial/final with a single scalar exchange; at
    100 TB this query is I/O-bound exactly as it should be (min/max row
    group stats prune on l_shipdate). Revenue uses the fixed-point
    money-sum (order-insensitive, engine-exact); window 1996 because
    the fixture ships 1995+."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        money_sum("l_extendedprice * l_discount", "revenue"),
        F.count("*").alias("n_lines"),
    )
