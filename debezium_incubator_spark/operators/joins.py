"""Join operators (SURVEY.md §2C).

The reference performs no joins (per-record CDC pipeline); this is the
consumer-side query surface over the materialized star schema.

Scale notes (100 TB):
- Dim⋈fact joins broadcast the dim (C1) — zero shuffle of the fact side.
  nation/region/supplier stay broadcastable at any fact scale.
- Large⋈large equi-joins (C2) shuffle both sides on the key; AQE converts
  to broadcast when runtime stats allow and splits skewed partitions.
- Non-equi joins (C6/C7) are BroadcastNestedLoopJoin — only valid when
  one side is genuinely small (band tables, config ranges); an
  unbounded×unbounded theta join is a design error at scale, and the
  range-join helper below shows the bucketed equi-join rewrite instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..exprs import money_sum
from ..registry import register


# --- reusable operator: as-of join ---------------------------------------

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_id: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (C8): for each left row (unique id ``left_id``), the
    single right row with the greatest ``right_ts <= left_ts`` (backward)
    or least ``right_ts >= left_ts`` (forward) within the same key group.

    Implemented as equi-join on the key + per-left-row rank: the equi keys
    hash-co-partition both sides, so the only shuffle is the join itself.
    At 100 TB with dense right sides, pre-bucket both sides by coarse time
    range first so each left row joins its bucket, not the full per-key
    history (same rewrite as join_range).
    """
    l, r = left.alias("__l"), right.alias("__r")
    cond: Column = (
        F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}")
        if direction == "backward"
        else F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}")
    )
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    joined = l.join(r, cond, "inner")
    order = (
        F.col(f"__r.{right_ts}").desc()
        if direction == "backward"
        else F.col(f"__r.{right_ts}").asc()
    )
    w = W.partitionBy(F.col(f"__l.{left_id}")).orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- C1: broadcast hash join ---------------------------------------------

@register(
    "join_broadcast",
    oracle="""
SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY n.n_nationkey
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint — plan shows BroadcastHashJoin with no
    exchange on the probe side."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
        .select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))
        .orderBy("n_nationkey")
    )


# --- C2: large-large equi-join (TPC-H Q3 shape) --------------------------

@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       SUM(CAST(floor(((l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-10. Revenue sums are exact fixed-point, so
    the ORDER BY boundary is bit-stable across engines; l_orderkey breaks
    ties deterministically."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < TIMESTAMP_NTZ '1998-03-15'")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > TIMESTAMP_NTZ '1998-03-15'")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- C1+C2: 6-way star join (TPC-H Q5 shape) -----------------------------

@register(
    "q5_local_supplier",
    oracle="""
SELECT n.n_name,
       SUM(CAST(floor(((l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact (lineitem) joins orders (shuffle), then the small
    dims supplier/customer/nation/region ride broadcasts. Catalyst+AQE
    pick broadcast automatically under the threshold; the nation/region
    sides are hinted to make it explicit."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ '1996-01-01' AND o_orderdate < TIMESTAMP_NTZ '1998-01-01'"
        )
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            # supplier scales with SF — no forced broadcast, AQE decides
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --- C3: outer joins ------------------------------------------------------

@register(
    "join_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
""",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a join-side residual predicate (kept in the ON
    clause — moving it to WHERE would change semantics)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 9000),
     sn AS (SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 5000)
SELECT cn.c_nationkey, sn.s_nationkey
FROM cn FULL OUTER JOIN sn ON cn.c_nationkey = sn.s_nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_nationkey")
        .distinct()
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select("s_nationkey")
        .distinct()
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        "c_nationkey", "s_nationkey"
    )


# --- C4/C5: semi / anti ---------------------------------------------------

@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi: probe side streams, no row duplication."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti (null-safe, unlike NOT IN with nulls)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- C6: theta (non-equi) join -------------------------------------------

@register(
    "join_theta",
    oracle="""
SELECT s.s_suppkey, COUNT(*) AS n_richer_customers
FROM supplier s JOIN customer c ON s.s_acctbal > c.c_acctbal
GROUP BY s.s_suppkey
ORDER BY s_suppkey
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality join → BroadcastNestedLoopJoin (supplier side is small
    and broadcast). Guard: only valid because one side is dim-sized."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(s), s.s_acctbal > c.c_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer_customers"))
        .orderBy("s_suppkey")
    )


# --- C7: range / band join -----------------------------------------------

QUANTITY_BANDS = [(0, 0.0, 10.0), (1, 10.0, 25.0), (2, 25.0, 40.0), (3, 40.0, 100.0)]


@register(
    "join_range",
    oracle="""
WITH bands(band_id, lo, hi) AS (VALUES (0, 0.0, 10.0), (1, 10.0, 25.0),
                                       (2, 25.0, 40.0), (3, 40.0, 100.0))
SELECT b.band_id,
       COUNT(*) AS n_items,
       SUM(CAST(floor((l.l_extendedprice) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_price
FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY b.band_id
ORDER BY b.band_id
""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-in-[lo,hi) band join. The band table broadcasts, so the fact
    side never shuffles for the join — this is the rewrite that keeps
    range joins viable at 100 TB (vs. an O(n·m) nested loop of two big
    sides)."""
    li = table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(QUANTITY_BANDS, "band_id INT, lo DOUBLE, hi DOUBLE")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_items"),
            money_sum("l_extendedprice", "sum_price"),
        )
        .orderBy("band_id")
    )


# --- C8: as-of join -------------------------------------------------------

@register(
    "join_asof",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     j AS (
       SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
              c.event_id AS click_id, c.ts AS click_ts,
              row_number() OVER (PARTITION BY p.event_id
                                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
       FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
     )
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
FROM j WHERE rn = 1
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest prior click of the
    same user (point-in-time attribution — the canonical CDC consumer
    lookup). Equi-join on user_id + rank; see :func:`asof_join` for the
    generic operator and the 100 TB bucketing note."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    j = p.join(
        c,
        (p.user_id == c.c_user_id) & (c.click_ts <= p.purchase_ts),
        "inner",
    )
    w = W.partitionBy("purchase_id").orderBy(
        F.desc("click_ts"), F.desc("click_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
    )


# --- C9: cross join -------------------------------------------------------

@register(
    "join_cross",
    oracle="""
SELECT r1.r_regionkey AS a, r2.r_regionkey AS b
FROM region r1 CROSS JOIN region r2
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever over bounded inputs (here 5×5)."""
    r1 = table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("a"))
    r2 = table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("b"))
    return r1.crossJoin(r2)


@register(
    "join_fuzzy_blocked",
    oracle="""
WITH c AS (
  SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk
  FROM customer
), pairs AS (
  SELECT a.blk,
         levenshtein(a.c_name, b.c_name) AS d
  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
)
SELECT blk AS block,
       CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
       CAST(SUM(CASE WHEN d <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
       CAST(SUM(d) AS BIGINT) AS sum_lev
FROM pairs
GROUP BY blk
ORDER BY blk
""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join (entity resolution / record linkage):
    candidate pairs come ONLY from shared blocking keys (here a name
    prefix; production uses phonetic codes, sorted-neighborhood keys,
    or LSH buckets), then the expensive edit-distance runs on
    candidates alone and a threshold picks matches. The join shape
    lives in :func:`fuzzy_blocked_agg` (the plan-audit seam — the
    registered form checkpoints it before the trailing sort, which
    truncates the visible plan)."""
    # un-movable sort: the block repartition doubles as the join AND
    # agg partitioning, so the trailing sort's sampler would re-run the
    # whole levenshtein pair expansion; the per-block summary is
    # KB-scale — fold it once
    return (
        fuzzy_blocked_agg(spark, sf_dir)
        .localCheckpoint(eager=False)
        .orderBy("block")
    )


def fuzzy_blocked_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocked fuzzy join + per-block summary, unsorted (the shape
    the plan audit pins: no cartesian, levenshtein on candidates only).

    Scale: blocking is the string analog of LSH banding — the pair
    space is quadratic only within a block, never across the corpus,
    and the block join is a plain shuffle-hash equi-join that
    partitions by block key. levenshtein is a JVM built-in on both
    engines; the per-block aggregate (count / matches / distance sum)
    pins every pairwise distance differentially while keeping the
    output a KB-scale summary."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
    )
    # round-13 (the dedup_simhash lesson): the block self-join's input
    # is small in BYTES, so AQE coalesced it to one task while the
    # within-block pair expansion + levenshtein is the dominant CPU
    # (measured a 1-task 2.0 s stage). The explicit block-key
    # repartition (never AQE-coalesced) pins full-width execution and
    # is exactly the partitioning the join needs — no extra exchange.
    c = c.repartition(spark.sparkContext.defaultParallelism, "blk")
    a = c.select(F.col("blk"), F.col("c_custkey").alias("ka"),
                 F.col("c_name").alias("na"))
    b = c.select(F.col("blk"), F.col("c_custkey").alias("kb"),
                 F.col("c_name").alias("nb"))
    pairs = (
        a.join(b, "blk")
        .filter(F.col("ka") < F.col("kb"))
        .select("blk", F.levenshtein("na", "nb").alias("d"))
    )
    return (
        pairs.groupBy("blk")
        .agg(
            F.count("*").alias("n_candidate_pairs"),
            F.sum(F.when(F.col("d") <= 1, 1).otherwise(0))
            .cast("bigint").alias("n_matches"),
            F.sum("d").cast("bigint").alias("sum_lev"),
        )
        .select(F.col("blk").alias("block"), "n_candidate_pairs",
                "n_matches", "sum_lev")
    )


@register(
    "join_null_safe",
    oracle="""
WITH a AS (
  SELECT event_id,
         CASE WHEN value < 50 THEN NULL ELSE event_type END AS k
  FROM events WHERE event_id % 2 = 0
), b AS (
  SELECT event_id,
         CASE WHEN value < 50 THEN NULL ELSE event_type END AS k
  FROM events WHERE event_id % 2 = 1
)
SELECT COALESCE(a.k, '<null>') AS key,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
ORDER BY key
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantics CDC merge keys need
    when a nullable column participates in identity (a plain equi-join
    silently drops every NULL-keyed row; three-valued logic strikes
    again, same family as the NAAJ query).

    Scale: Spark plans <=> as a regular hash join on the coalesced key
    (EqualNullSafe is hash-able — no nested-loop fallback), so the
    plan is identical in shape to a plain equi-join.

    Round-13 optimization (guide §2.3 "aggregate before you shuffle" /
    §3.3 exploding joins): the key space is tiny (event types + NULL)
    while each side is half the events table, so the raw join
    materializes Σ_k |a_k|·|b_k| rows — ~0.5 × 10⁹ at sf0.1 (measured
    ~48 s to the noop sink) and quadratic in table growth — only for
    COUNT(*) to collapse them again. Aggregating each side to
    (key, count) FIRST and multiplying counts computes the identical
    result (n_pairs of key k ≡ |a_k|·|b_k|; inner join keeps exactly
    the keys present on both sides) through the same EqualNullSafe
    join operator, now over ≤|key-space| rows per side. Measured
    48 s → ~0.2 s; the oracle (unchanged, full-join COUNT) proves
    equivalence at every SF."""
    ev = table(spark, sf_dir, "events")
    k = F.when(F.col("value") < 50, F.lit(None)).otherwise(F.col("event_type"))
    a = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("ida"), k.alias("ka")
    )
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("idb"), k.alias("kb")
    )
    ga = a.groupBy("ka").agg(F.count("*").alias("ca"))
    gb = b.groupBy("kb").agg(F.count("*").alias("cb"))
    return (
        ga.join(gb, F.col("ka").eqNullSafe(F.col("kb")))
        .select(
            F.coalesce(F.col("ka"), F.lit("<null>")).alias("key"),
            (F.col("ca") * F.col("cb")).alias("n_pairs"),
        )
        .orderBy("key")
    )
