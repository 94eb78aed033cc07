"""Event-time analytics over the `events` stream stand-in (SURVEY.md §2I
batch-checkable analogs: tumbling/sliding/session windows, latest-state).

These are the batch twins of the Structured Streaming operators in
``streaming/pipeline.py`` — identical window semantics (epoch-aligned
buckets, gap-based sessions), verified against the DuckDB oracle here and
reused by the streaming paths.

Scale notes: tumbling/sliding aggs group on (bucket, type) — bounded
cardinality, map-side combine collapses everything before the shuffle.
Sessionization shuffles once on user_id; a 100 TB events table with ~1e9
users distributes evenly (no skew: per-user history is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..exprs import money_sum, round4, round4x
from ..registry import register

SESSION_GAP_US = 1_800_000_000  # 30 minutes


# --- I2: tumbling window --------------------------------------------------

@register(
    "e1_tumbling_window",
    oracle="""
SELECT date_trunc('hour', ts) AS bucket, event_type,
       COUNT(*) AS n,
       SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
""",
)
def e1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling buckets via F.window — the same operator the
    streaming path uses; window.start of an epoch-aligned 1h window ==
    date_trunc('hour') in the oracle."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), money_sum("value", "sum_value"))
        .select(
            F.col("w.start").alias("bucket"), "event_type", "n", "sum_value"
        )
        .orderBy("bucket", "event_type")
    )


# --- D6/I6: latest state per key (arg-max) -------------------------------

@register(
    "e2_latest_per_user",
    oracle="""
SELECT user_id,
       max(ts) AS last_ts,
       max_by(event_type, ts) AS last_type,
       max_by(value, ts) AS last_value,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def e2_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC "current state" primitive as a single hash-agg (max_by) —
    cheaper than window+filter: one shuffle, no sort, partial-aggregable.
    ts is unique per user in the fixtures, so max_by is deterministic."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.expr("max_by(event_type, ts)").alias("last_type"),
            F.expr("max_by(value, ts)").alias("last_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# --- I3: sliding window ---------------------------------------------------

@register(
    "e3_sliding_window",
    oracle="""
WITH x AS (
  SELECT e.event_type, e.value,
         make_timestamp(((epoch_us(e.ts) // 1800000000) - s.i) * 1800000000) AS wstart
  FROM events e, (VALUES (0), (1)) s(i)
)
SELECT wstart, event_type, COUNT(*) AS n,
       SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_value
FROM x
GROUP BY 1, 2
ORDER BY wstart, event_type
""",
)
def e3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event lands in exactly 2
    epoch-aligned windows; the oracle materializes both bucket starts
    explicitly (SURVEY.md §2I: explode bucket offsets)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), money_sum("value", "sum_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "sum_value")
        .orderBy("wstart", "event_type")
    )


# --- I4: session window (batch analog: lag-gap + running sum) ------------

def sessionize(df: DataFrame, key: str, ts: str, gap_us: int) -> DataFrame:
    """Assign gap-based session ids per key (batch twin of
    F.session_window). New session when the gap to the previous event
    exceeds ``gap_us``."""
    w = W.partitionBy(key).orderBy(ts, "event_id")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


@register(
    "e4_session_window",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def e4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", SESSION_GAP_US)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


# --- bonus: per-type daily value profile (H2 date functions in anger) ----

@register(
    "e5_daily_type_profile",
    oracle="""
SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS avg_value,
       ROUND(quantile_cont(value, 0.5), 4) AS p50_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
""",
)
def e5_daily_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n"),
            round4("AVG(value)", "avg_value"),
            round4("percentile(value, 0.5)", "p50_value"),
        )
        .orderBy("day", "event_type")
    )


# --- E6: sequential funnel -------------------------------------------------

@register(
    "e6_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t0
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t1
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_then_click,
       (SELECT COUNT(*) FROM p) AS n_then_purchase
""",
)
def e6_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who signed up, then clicked
    AFTER signup, then purchased AFTER that click — each stage anchored
    at the previous stage's earliest qualifying time (min-join chain,
    strict ordering, no window over full history). Each stage is one
    filtered agg + one equi-join on user_id; at 100 TB all three stages
    co-partition on user_id, so with bucketed storage the chain is
    shuffle-free."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_then_click")))
        .crossJoin(p.agg(F.count("*").alias("n_then_purchase")))
    )


# --- e9: ordered-sequence pattern matching (MATCH_RECOGNIZE-lite) ---------

@register(
    "e9_sequence_pattern",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(regexp_matches(path, 'view(>click)+>purchase') AS INT) AS has_funnel,
       CAST(length(regexp_extract_all(path, 'error>error')) AS BIGINT) AS n_err_bursts,
       CAST(length(path) AS BIGINT) AS path_len
FROM seq ORDER BY user_id
""",
)
def e9_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL MATCH_RECOGNIZE-lite: fold each user's event history into an
    ordered type-path string, then run regex row-pattern predicates over
    it (strict-adjacency funnel ``view(>click)+>purchase``, repeated
    error bursts). The reassembly order (ts, event_id) is total — the
    tie-break keeps the fold deterministic on both engines.

    Scale: one shuffle on user_id; per-user history is bounded (the
    path string is KBs), and the regex scan is per-row, embarrassingly
    parallel. This is the batch shape of streaming CEP: the same path
    fold works under applyInPandasWithState with the regex per update."""
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id,"
                " event_type))), x -> x.event_type)"
            ),
            ">",
        ).alias("path"),
        F.count("*").alias("n_events"),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.col("path").rlike("view(>click)+>purchase").cast("int").alias("has_funnel"),
        F.expr("CAST(regexp_count(path, 'error>error') AS BIGINT)").alias(
            "n_err_bursts"
        ),
        F.length("path").cast("bigint").alias("path_len"),
    ).orderBy("user_id")


@register(
    "e10_key_skew",
    oracle="""
WITH freq AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(x) OVER (PARTITION BY event_type) AS total
  FROM freq
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_keys,
       CAST(MAX(total) AS BIGINT) AS n_rows,
       floor((CAST(MAX(mx) AS DOUBLE) / MAX(total)) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS top_share,
       floor((CAST(SUM((2 * i - n - 1) * x) AS DOUBLE)
              / (MAX(n) * MAX(total))) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS gini
FROM (SELECT *, MAX(x) OVER (PARTITION BY event_type) AS mx FROM ranked)
GROUP BY event_type
ORDER BY event_type
""",
)
def e10_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key skew profile of the (event_type → user_id) distribution:
    key count, row count, heaviest key's share, and the Gini
    coefficient of the frequency distribution — the diagnostic that
    tells you BEFORE a 100 TB shuffle whether a join/groupBy key needs
    salting (operators/skew.py) or AQE skew-join handling.

    Exact parity: frequencies, ranks, and the Gini numerator are all
    integer arithmetic (sum((2i−n−1)·x)); the only divisions are the
    final two, gated by the tie-free round4x policy."""
    ev = table(spark, sf_dir, "events")
    return key_skew_profile(ev, "event_type", "user_id")


def key_skew_profile(df: DataFrame, group: str, key: str) -> DataFrame:
    """Op-level form of the e10 profiler (reused by the Zipf stress
    tests): per `group`, the skew statistics of the `key` frequency
    distribution — (n_keys, n_rows, top_share, gini)."""
    freq = df.groupBy(group, key).agg(F.count("*").alias("x"))
    wr = W.partitionBy(group).orderBy("x", key)
    wp = W.partitionBy(group)
    ranked = freq.select(
        group,
        "x",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("x").over(wp).alias("total"),
        F.max("x").over(wp).alias("mx"),
    )
    num = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x"))
    return (
        ranked.groupBy(group)
        .agg(
            F.max("n").cast("bigint").alias("n_keys"),
            F.max("total").cast("bigint").alias("n_rows"),
            round4x("CAST(MAX(mx) AS DOUBLE) / MAX(total)").alias("top_share"),
            (
                F.floor(
                    (num.cast("double") / (F.max("n") * F.max("total")))
                    * 10000
                    + 0.5
                )
                / F.lit(10000.0)
            ).alias("gini"),
        )
        .orderBy(group)
    )
