"""Window-function operators (SURVEY.md §2E).

Scale notes (100 TB): window functions shuffle once on partitionBy keys
and sort within partitions. High-cardinality keys (custkey, user_id)
distribute well. Rank-filter patterns (rn <= k) benefit from Spark 3.5+
WindowGroupLimit pushdown — the full rank never materializes. The one
anti-pattern is an un-partitioned window (E7): single partition, driver
OOM at scale — only valid post-aggregation on small results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..exprs import round4x
from ..registry import register


def topk_per_group(
    df: DataFrame, keys: list[str], order_by, k: int, rank_col: str = "rn"
) -> DataFrame:
    """E1 as a reusable operator: deterministic top-k per group."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


# --- E1: top-k per group --------------------------------------------------

@register(
    "w1_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
""",
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Check plan for WindowGroupLimit — ranks
    beyond k are pruned before the full sort output materializes."""
    o = table(spark, sf_dir, "orders")
    return topk_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    )


# --- E2: rank family ------------------------------------------------------

@register(
    "w_rank_family",
    oracle="""
SELECT s_nationkey, s_suppkey, s_acctbal,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       ROUND(percent_rank() OVER w, 4) AS prank,
       ROUND(cume_dist()    OVER w, 4) AS cdist
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
""",
)
def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("prank"),
        F.round(F.cume_dist().over(w), 4).alias("cdist"),
    )


# --- E3: lag / lead (inter-event deltas — CDC diffing primitive) ---------

@register(
    "w_lag_delta",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in integer microseconds (exact parity —
    no float time math)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# --- E4: first / last in frame -------------------------------------------

@register(
    "w_first_last",
    oracle="""
SELECT event_id, user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def w_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
    )


# --- E5: running / cumulative aggregate ----------------------------------

@register(
    "w_running_sum",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS event_seq
FROM events
""",
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals accumulated in exact decimal, SURFACED as double
    (bare DECIMAL outputs hash Decimal-vs-float64 against DuckDB —
    no-bare-DECIMAL rule)."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,10)")).over(w)
        .cast("double").alias("running_value"),
        F.count("*").over(w).alias("event_seq"),
    )


# --- E6: sliding frame (moving average) ----------------------------------

@register(
    "w_moving_avg",
    oracle="""
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mavg5
FROM events
""",
)
def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mavg5"),
    )


# --- E4+: nth_value -------------------------------------------------------

@register(
    "w_nth_value",
    oracle="""
SELECT event_id, user_id,
       nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_type,
       nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_value
FROM events
""",
)
def w_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value in a running frame: the k-th event per user once it has
    happened, NULL before (onboarding-funnel analyses)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return ev.select(
        "event_id",
        "user_id",
        F.nth_value("event_type", 2).over(w).alias("second_type"),
        F.nth_value("value", 3).over(w).alias("third_value"),
    )


# --- E-family application: z-score anomaly flags --------------------------

@register(
    "w_zscore_anomaly",
    oracle="""
WITH s AS (
  SELECT event_id, event_type, value,
         AVG(value)        OVER (PARTITION BY event_type) AS mu,
         STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS sigma
  FROM events
)
SELECT event_id, event_type,
       ROUND((value - mu) / sigma, 4) AS zscore,
       (abs(ROUND((value - mu) / sigma, 4)) >= 2.0) AS is_anomaly
FROM s
ORDER BY event_id
""",
)
def w_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flag — unframed window aggregate (whole
    partition per type; fine at scale: 5 types → 5 groups, but the same
    plan hash-partitions by type, so heavy types spread across tasks
    only via AQE skew handling — for truly hot single groups use the
    two_phase_agg helper instead). The flag thresholds the ROUNDED
    z-score so the boolean cannot flip on engine double drift."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    z = F.round(
        (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 4
    )
    return ev.select(
        "event_id",
        "event_type",
        z.alias("zscore"),
        (F.abs(z) >= 2.0).alias("is_anomaly"),
    ).orderBy("event_id")


# --- E6 variant: time-RANGE frame (interval-bounded, not row-count) ------

@register(
    "w_range_frame",
    oracle="""
SELECT event_id, event_type,
       COUNT(*) OVER w AS n_30m,
       SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) OVER w
         / CAST(10000 AS DOUBLE) AS sum_30m
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-MINUTE frame per event_type — a RANGE frame over the
    event-time axis (frame membership depends on timestamp distance,
    not row count; sparse/bursty streams behave correctly where a ROWS
    frame would not). Both engines order by epoch-microseconds and
    bound the frame numerically, so membership is bit-identical; the
    in-frame money sum uses the fixed-point policy."""
    ev = table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; the session zone is pinned UTC, so the cast
    # to TIMESTAMP is exact and epoch-µs matches DuckDB's epoch_us
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-1800 * 1_000_000, 0)
    )
    fx = F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)")
    return ev.select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_30m"),
        (F.sum(fx).over(w) / F.lit(10000.0)).alias("sum_30m"),
    ).orderBy("event_id")


@register(
    "w_ewma",
    oracle="""
WITH w AS (
  SELECT event_id, event_type, ts, value,
         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vs
  FROM events
)
SELECT event_id, event_type, ts, value,
       floor((
         list_sum(list_transform(range(1, len(vs)+1),
                                 k -> vs[k] * pow(0.5, len(vs)-k)))
         / list_sum(list_transform(range(1, len(vs)+1),
                                   k -> pow(0.5, len(vs)-k)))
       ) * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS ewma
FROM w ORDER BY event_id
""",
)
def w_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (decay 0.5) over a trailing
    8-row frame per event type, in event-time order — the
    smoothing primitive time-series engines ship natively, expressed as
    collect_list over an ordered frame + a fold (all JVM expressions,
    no UDF).

    Parity note: with decay = 0.5 every weight is a power of two, so
    each multiply is an EXACT binary scaling — both engines fold the
    identical value sequence left-to-right and the pre-division sums
    are bit-identical. The final 4dp rounding still uses the repo's
    round4x fixed-point form (floor(x*10^4+0.5)/10^4) on BOTH sides,
    not engine-native ROUND: Spark's BigDecimal HALF_UP and DuckDB's
    double-arithmetic round are different algorithms, and the round4x
    policy removes the half-boundary hazard regardless of fixture.

    Scale: one window shuffle on the partition key; the frame is O(8)
    per row regardless of history length (the recursive EWMA form is
    inherently sequential — the bounded-frame form is the scalable
    approximation, error < decay^8)."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    vs = F.collect_list("value").over(w)
    num = (
        "aggregate(zip_with(vs, sequence(size(vs)-1, 0, -1),"
        " (v, k) -> v * pow(0.5, k)), CAST(0 AS DOUBLE),"
        " (acc, x) -> acc + x)"
    )
    den = (
        "aggregate(sequence(size(vs)-1, 0, -1),"
        " CAST(0 AS DOUBLE), (acc, k) -> acc + pow(0.5, k))"
    )
    return (
        ev.select("event_id", "event_type", "ts", "value", vs.alias("vs"))
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            round4x(f"({num}) / ({den})").alias("ewma"),
        )
        .orderBy("event_id")
    )


@register(
    "w_count_distinct_running",
    oracle="""
WITH f AS (
  SELECT event_id, event_type, ts, user_id,
         CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, event_type,
       CAST(SUM(first_seen) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_users_so_far
FROM f ORDER BY event_id
""",
)
def w_count_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT user) per event type in event-time order —
    the window aggregate Spark (and standard SQL) cannot express
    directly (DISTINCT is not allowed in a window frame), composed from
    two plain windows: flag each key's FIRST occurrence
    (row_number = 1 over (type, user)), then a running SUM of flags
    over the type's time order.

    Scale: two window exchanges — one on (type, user), one on (type);
    both are hash partitions of the input, state per row is O(1), and
    no frame materializes the distinct set (the naive
    collect_set-over-frame alternative holds the whole set per row).
    The audience-growth curve every funnel dashboard needs."""
    ev = table(spark, sf_dir, "events")
    w_first = W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            "ts",
            "user_id",
            F.when(F.row_number().over(w_first) == 1, 1)
            .otherwise(0)
            .alias("first_seen"),
        )
        .select(
            "event_id",
            "event_type",
            F.sum("first_seen").over(w_run).cast("bigint")
            .alias("distinct_users_so_far"),
        )
        .orderBy("event_id")
    )
