"""Time-series analytics: gap-filling with LOCF interpolation and cohort
retention — the TimescaleDB-style `time_bucket_gapfill`/`locf` surface
(SURVEY.md §2I-adjacent; hypertable-rollup family from the build brief)
re-expressed as declarative Spark plans.

Scale posture (100 TB): the spine is generated from the *aggregated*
time range — its size is (time-range / bucket width) × type cardinality,
independent of the raw event volume. The raw table collapses through one
partial+final hash aggregate before it ever meets the spine, so the
grid join touches thousands of rows however large the input; the LOCF
window partitions on the low-cardinality series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..registry import register


@register(
    "e7_gapfill_locf",
    oracle="""
WITH b AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         COUNT(*) AS n,
         SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
), span AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM span
), grid AS (
  SELECT s.bucket, t.event_type
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT g.bucket, g.event_type,
       COALESCE(b.n, CAST(0 AS BIGINT)) AS n,
       COALESCE(last_value(b.sum_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS locf_value,
       CAST(CASE WHEN b.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
FROM grid g LEFT JOIN b ON g.bucket = b.bucket AND g.event_type = b.event_type
ORDER BY g.bucket, g.event_type
""",
)
def e7_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type: generate the full bucket spine
    over the observed range, left-join the hourly rollup onto it, and
    fill empty buckets with last-observation-carried-forward.

    The spine is built with sequence()+explode from a one-row min/max
    aggregate — no driver collect, no data-volume dependence. LOCF is
    ``last(value, ignorenulls=True)`` over an unbounded-preceding frame
    per series (5 series here; at scale the window parallelizes across
    series keys). Fixed-point money sum per the parity policy."""
    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.expr(
                "SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT))"
                " / CAST(10000 AS DOUBLE)"
            ).alias("sum_value"),
        )
    )
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket")
    )
    grid = spine.crossJoin(ev.select("event_type").distinct())
    locf = (
        F.last("sum_value", ignorenulls=True)
        .over(
            W.partitionBy("event_type")
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    )
    return (
        F.broadcast(grid)
        .join(b, ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce("n", F.lit(0).cast("bigint")).alias("n"),
            F.coalesce(locf, F.lit(0.0)).alias("locf_value"),
            F.when(F.col("n").isNull(), 1).otherwise(0).cast("bigint").alias("is_gap"),
        )
        .orderBy("bucket", "event_type")
    )


@register(
    "e8_cohort_retention",
    oracle="""
WITH ue AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
), f AS (
  SELECT user_id, MIN(d) AS cohort FROM ue GROUP BY user_id
)
SELECT f.cohort AS cohort_day,
       CAST(date_diff('day', f.cohort, ue.d) AS BIGINT) AS day_offset,
       COUNT(DISTINCT ue.user_id) AS n_users
FROM ue JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def e8_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort/retention triangle: users grouped by first-active
    day, activity counted per (cohort, day-offset) cell.

    Two hash aggregates + one equi-join on user_id; both aggregates are
    map-side combinable and the join key is the natural partitioning of
    the events table (no skew: per-user history is bounded). Day-offset
    on day-truncated timestamps is exact integer days on both engines;
    cohort surfaces as timestamp (never bare DATE — parity policy)."""
    ev = table(spark, sf_dir, "events")
    ue = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    f = ue.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        ue.join(f, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_day"),
            F.expr("CAST(datediff(d, cohort) AS BIGINT)").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "e11_time_weighted_avg",
    oracle="""
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS t_next
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(SUM(t_next - t) AS BIGINT) AS span_us,
       floor((CAST(SUM(CAST(value * (t_next - t) AS DECIMAL(38,10)))
                   AS DOUBLE)
              / CAST(SUM(t_next - t) AS DOUBLE)) * 10000 + 0.5) / 10000
         AS twa
FROM seq
GROUP BY user_id
HAVING SUM(t_next - t) > 0
ORDER BY user_id
""",
)
def e11_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series (the TimescaleDB `time_weight`
    / 'last observation carried forward integral' surface): each sample
    holds its value until the next sample, so
    twa = Σ valueᵢ·(tᵢ₊₁−tᵢ) / (t_last−t_first). Irregular sampling is
    the point — a plain AVG over-weights burst periods.

    Parity: durations are exact integer µs; each value·Δ product is one
    IEEE double op (identical cross-engine) summed through
    DECIMAL(38,10) (order-insensitive), and the final ratio goes
    through round4x. ONE window pass (lead) + ONE hash agg — the
    window partitions on the series key, so 100 TB scales by series
    cardinality, not sample count."""
    from ..exprs import round4x_col

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id", "value", t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    ).withColumn("d_us", F.col("t_next") - F.col("t"))
    agg = (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("d_us").alias("span_us"),
            F.sum(
                (F.col("value") * F.col("d_us")).cast("decimal(38,10)")
            ).alias("__num"),
        )
        .filter(F.col("span_us") > 0)
    )
    return agg.select(
        "user_id",
        "n_samples",
        "span_us",
        round4x_col(
            F.col("__num").cast("double")
            / F.col("span_us").cast("double")
        ).alias("twa"),
    ).orderBy("user_id")


@register(
    "e12_rfm_segments",
    oracle="""
WITH base AS (
  SELECT user_id,
         max(ts) AS last_ts,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS monetary
  FROM events GROUP BY user_id
), scored AS (
  SELECT user_id, freq, monetary,
         ntile(5) OVER (ORDER BY last_ts DESC, user_id) AS r_score,
         ntile(5) OVER (ORDER BY freq DESC, user_id) AS f_score,
         ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
  FROM base
)
SELECT user_id, freq, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored ORDER BY user_id
""",
)
def e12_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles —
    the classic customer-analytics rollup): one hash aggregation to
    per-user metrics, then ntile(5) per dimension with the engine's
    deterministic tie-break discipline (user_id), concatenated into
    the '515'-style segment label. Monetary sums go through
    DECIMAL(38,10) per the money-sum parity policy.

    Scale: the aggregation reduces the event stream to USER cardinality
    before any window — the global ntile then sorts users, not events.
    That is exact-quantile semantics for parity; at 1e9+ users the
    production spelling swaps ntile for approx_percentile threshold
    lookups (no global sort), trading exactness the way every RFM
    system at that size does."""
    ev = table(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("value").cast("decimal(38,10)"))
        .cast("double").alias("monetary"),
    )
    r_w = W.orderBy(F.desc("last_ts"), F.asc("user_id"))
    f_w = W.orderBy(F.desc("freq"), F.asc("user_id"))
    m_w = W.orderBy(F.desc("monetary"), F.asc("user_id"))
    scored = base.select(
        "user_id",
        "freq",
        "monetary",
        F.ntile(5).over(r_w).alias("r_score"),
        F.ntile(5).over(f_w).alias("f_score"),
        F.ntile(5).over(m_w).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    ).orderBy("user_id")


@register(
    "e13_attribution",
    oracle="""
WITH attr AS (
  SELECT user_id, event_id, event_type, value,
     last_value(CASE WHEN event_type = 'click' THEN event_id END
                IGNORE NULLS)
       OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       AS last_click,
     first_value(CASE WHEN event_type = 'click' THEN event_id END
                 IGNORE NULLS)
       OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       AS first_click
  FROM events
)
SELECT event_id, user_id, last_click, first_click, value AS revenue
FROM attr WHERE event_type = 'purchase'
ORDER BY event_id
""",
)
def e13_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution (first-touch / last-touch): every purchase
    is attributed to the FIRST and the LAST click preceding it in the
    user's stream — the ignore-nulls window idiom (a conditional
    last_value over an unbounded-to-previous frame IS an as-of lookup
    within one table, no self-join). Purchases with no preceding click
    surface NULL (organic), exactly what an attribution report needs.

    Scale: one window per user partition — hash-partitioned on
    user_id, running state is two event ids; no join, no second pass
    over the stream."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    attr = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").alias("revenue"),
        F.last(click_id, ignorenulls=True).over(w).alias("last_click"),
        F.first(click_id, ignorenulls=True).over(w).alias("first_click"),
    )
    return (
        attr.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "last_click", "first_click",
                "revenue")
        .orderBy("event_id")
    )


@register(
    "e14_time_to_convert",
    oracle="""
WITH attr AS (
  SELECT event_id, event_type, epoch_ms(ts) AS tms,
     last_value(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END
                IGNORE NULLS)
       OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       AS click_ms
  FROM events
), p AS (
  SELECT tms - click_ms AS delta_ms FROM attr
  WHERE event_type = 'purchase'
)
SELECT CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(delta_ms) AS BIGINT) AS n_converted,
       floor(quantile_cont(delta_ms, 0.5) * 10000 + 0.5) / 10000 AS p50_ms,
       floor(quantile_cont(delta_ms, 0.9) * 10000 + 0.5) / 10000 AS p90_ms
FROM p
""",
)
def e14_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: e13's as-of click lookup carried
    as the click's epoch-millis, the purchase-minus-click delta in
    exact integer milliseconds, and the conversion-latency quantiles
    every funnel dashboard reports (organic purchases count toward
    n_purchases but carry NULL deltas — both engines' percentile
    skips them identically). Same one-window-per-user plan as e13;
    the final agg is a single row. Quantiles go through round4x (the
    repo's tie-free 4dp policy) — deltas are integer-derived, so
    engine interpolation can land on a ROUND(,4) half-boundary."""
    from ..exprs import round4x

    ev = table(spark, sf_dir, "events")
    tms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_ms = F.last(
        F.when(F.col("event_type") == "click", tms), ignorenulls=True
    ).over(w)
    p = ev.select(
        "event_type",
        (tms - click_ms).alias("delta_ms"),
    ).filter(F.col("event_type") == "purchase")
    return p.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("delta_ms").alias("n_converted"),
        round4x("percentile(delta_ms, 0.5)").alias("p50_ms"),
        round4x("percentile(delta_ms, 0.9)").alias("p90_ms"),
    )


@register(
    "e15_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, min(event_id) AS s FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, min(e.event_id) AS v
  FROM events e JOIN s ON e.user_id = s.user_id
   AND e.event_id > s.s AND e.event_id <= s.s + 500
  WHERE e.event_type = 'view' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.event_id) AS p
  FROM events e JOIN v ON e.user_id = v.user_id
   AND e.event_id > v.v AND e.event_id <= v.v + 500
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
         AS n_users,
       CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_signup_view,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel,
       floor(CAST((SELECT count(*) FROM p) AS DOUBLE)
             / CAST((SELECT count(*) FROM s) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS conv_rate
""",
)
def e15_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ORDERED conversion funnel signup → view → purchase: each
    stage's earliest event must come strictly AFTER the previous
    stage's earliest qualifying event AND land within the 500-position
    conversion window (the product-analytics funnel rule — a view
    before the signup does not count, and a purchase a year later is
    not attributable; the window makes every stage genuinely cut:
    150 → 60 → 30 at sf0.01). The stage aggregates `s` and `v` are one
    row per USER — a side that GROWS with the data (1e9 users at the
    100 TB target) — so the stage joins carry NO broadcast hint: AQE
    broadcasts them when they are genuinely small and degrades to a
    shuffle join when they are not (an explicit F.broadcast is a hint
    AQE cannot override and would OOM executors at 100×). Only the
    final one-row summary cross-joins keep F.broadcast — those sides
    are single-row aggregates at any SF. Integer-derived conversion
    rate goes through round4x."""
    from ..exprs import round4x_col

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("event_id").alias("ts"), "event_type"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("s"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter((F.col("ts") > F.col("s")) & (F.col("ts") <= F.col("s") + 500))
        .groupBy("user_id").agg(F.min("ts").alias("v"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("v")) & (F.col("ts") <= F.col("v") + 500))
        .groupBy("user_id").agg(F.min("ts").alias("p"))
    )
    out = (
        ev.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(F.broadcast(s.agg(F.count(F.lit(1)).alias("n_signup"))))
        .crossJoin(F.broadcast(
            v.agg(F.count(F.lit(1)).alias("n_signup_view"))))
        .crossJoin(F.broadcast(
            p.agg(F.count(F.lit(1)).alias("n_full_funnel"))))
    )
    return out.select(
        "n_users",
        "n_signup",
        "n_signup_view",
        "n_full_funnel",
        round4x_col(
            F.col("n_full_funnel").cast("double")
            / F.col("n_signup").cast("double")
        ).alias("conv_rate"),
    )


#: Trailing-window width (days) for the rolling-active denominator.
#: 7 because the fixture spans 30 days — a 28-day MAU would be nearly
#: cumulative; production would use 28 with identical plan shape.
STICKY_W = 7


def rolling_active_counts(pairs: DataFrame, w: int) -> DataFrame:
    """Exact rolling COUNT DISTINCT via interval-merge + diff-array
    (e16 docstring): from a distinct ``(user_id, di)`` activity-pair
    frame, one row per spine day with ``day_no``, ``day``, ``dau``
    (actives that day) and ``wau`` (distinct actives in the trailing
    ``w`` days, current included). The seam the registered query and
    the hypothesis property share."""
    wu = W.partitionBy("user_id").orderBy("di")
    pd_ = F.lag("di").over(wu)
    flagged = pairs.select(
        "user_id",
        "di",
        F.when(pd_.isNull() | (F.col("di") - pd_ > w), 1)
        .otherwise(0)
        .alias("brk"),
    )
    gi = flagged.select(
        "user_id",
        "di",
        F.sum("brk").over(
            wu.rowsBetween(W.unboundedPreceding, 0)
        ).alias("grp"),
    )
    iv = gi.groupBy("user_id", "grp").agg(
        F.min("di").alias("s"),
        (F.max("di") + (w - 1)).alias("e"),
    )
    deltas = iv.select(
        F.col("s").alias("di"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select((F.col("e") + 1).alias("di"), F.lit(-1).alias("delta"))
    )
    dd = deltas.groupBy("di").agg(F.sum("delta").alias("delta"))
    spine = (
        pairs.agg(F.min("di").alias("lo"), F.max("di").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("di"))
    )
    dau = pairs.groupBy("di").agg(F.count("*").alias("dau_"))
    wg = W.orderBy("di").rowsBetween(W.unboundedPreceding, 0)
    return (
        spine.join(dau, "di", "left")
        .join(dd, "di", "left")
        .select(
            F.col("di").alias("day_no"),
            F.timestamp_millis(F.col("di") * 86400000).alias("day"),
            F.coalesce("dau_", F.lit(0)).alias("dau"),
            F.sum(F.coalesce("delta", F.lit(0))).over(wg).alias("wau"),
        )
    )


@register(
    "e16_stickiness",
    oracle=f"""
WITH pe AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS di
  FROM events WHERE event_type = 'purchase'
), g AS (
  SELECT user_id, di,
         lag(di) OVER (PARTITION BY user_id ORDER BY di) AS pd
  FROM pe
), gi AS (
  SELECT user_id, di,
         sum(CASE WHEN pd IS NULL OR di - pd > {STICKY_W} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY di ROWS UNBOUNDED PRECEDING)
           AS grp
  FROM g
), iv AS (
  SELECT user_id, grp, min(di) AS s, max(di) + {STICKY_W - 1} AS e
  FROM gi GROUP BY user_id, grp
), deltas AS (
  SELECT s AS di, 1 AS delta FROM iv
  UNION ALL
  SELECT e + 1 AS di, -1 AS delta FROM iv
), dd AS (
  SELECT di, CAST(sum(delta) AS BIGINT) AS delta FROM deltas GROUP BY di
), span AS (
  SELECT min(di) AS lo, max(di) AS hi FROM pe
), spine AS (
  SELECT unnest(range(lo, hi + 1)) AS di FROM span
), dau AS (
  SELECT di, CAST(count(*) AS BIGINT) AS dau FROM pe GROUP BY di
), m AS (
  SELECT sp.di,
         CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau,
         CAST(sum(COALESCE(dd.delta, 0))
              OVER (ORDER BY sp.di ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS wau
  FROM spine sp LEFT JOIN dau d ON sp.di = d.di
  LEFT JOIN dd ON sp.di = dd.di
)
SELECT di AS day_no, epoch_ms(di * 86400000) AS day, dau, wau,
       CASE WHEN wau = 0 THEN NULL
            ELSE floor(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE)
                       * 10000 + 0.5) / 10000 END AS stickiness
FROM m ORDER BY day_no
""",
)
def e16_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-active "stickiness" per day — the
    product-analytics engagement ratio (DAU/MAU in production; 7-day
    window here, see STICKY_W) over purchase activity.

    The interesting part is the denominator: "users active in the
    trailing W days" is a ROLLING COUNT DISTINCT, which neither engine
    has as a window function — and the naive day×user expansion is a
    W-fold blowup of the activity table. Instead: each user's active
    days are merged into coverage intervals ([a, a+W-1] per active
    day, coalesced while gaps stay ≤ W — a lag + running-sum group-id
    window per user), every interval contributes a +1/−1 diff-array
    event, and one running sum over the day spine materializes the
    rolling distinct count exactly. Work is O(active-pairs) + O(days),
    never O(days × users).

    Scale posture (100 TB): the per-user windows partition on user_id;
    the diff-array aggregate and the final running-sum window are
    day-spine-cardinality (time-bounded — 30 rows here, ~36k rows for
    a century — NOT data-bounded), so the single-partition global
    window at the end is a control-plane-sized sort, the same class as
    e7's gap-fill spine. All counts integer; the one ratio goes
    through round4x with a NULL guard on an empty window."""
    from ..exprs import round4x_col

    ev = table(spark, sf_dir, "events")
    pe = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("unix_millis(cast(ts as timestamp)) div 86400000")
            .alias("di"),
        )
        .distinct()
    )
    m = rolling_active_counts(pe, STICKY_W)
    return m.select(
        "day_no",
        "day",
        "dau",
        "wau",
        F.when(F.col("wau") == 0, F.lit(None).cast("double"))
        .otherwise(
            round4x_col(
                F.col("dau").cast("double") / F.col("wau").cast("double")
            )
        )
        .alias("stickiness"),
    ).orderBy("day_no")


#: trailing frame width (days, excluding the current day) and the
#: minimum history required to score.
ZS_W = 7
ZS_MIN_N = 4
#: anomaly threshold |z| > 2.5, enforced in INTEGER space:
#: z^2 = d^2 / V with d = k*x - sum_x and V = k*sum_x2 - sum_x^2, so
#: |z| > 2.5  <=>  d^2 * 100 > 625 * V  — no float boundary exists.
ZS_T_NUM = 625
ZS_T_DEN = 100


@register(
    "e17_rolling_zscore",
    oracle=f"""
WITH b AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS di,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, epoch_ms(ts) // 86400000
), span AS (
  SELECT min(di) AS lo, max(di) AS hi FROM b
), grid AS (
  SELECT t.event_type, s.di
  FROM (SELECT unnest(range(lo, hi + 1)) AS di FROM span) s
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), g AS (
  SELECT grid.event_type, grid.di,
         CAST(COALESCE(b.n, 0) AS BIGINT) AS n
  FROM grid LEFT JOIN b
    ON grid.event_type = b.event_type AND grid.di = b.di
), w AS (
  SELECT event_type, di, n,
         CAST(count(*) OVER fr AS BIGINT) AS k,
         CAST(COALESCE(sum(n) OVER fr, 0) AS BIGINT) AS sx,
         CAST(COALESCE(sum(n * n) OVER fr, 0) AS BIGINT) AS sx2
  FROM g
  WINDOW fr AS (PARTITION BY event_type ORDER BY di
                ROWS BETWEEN {ZS_W} PRECEDING AND 1 PRECEDING)
), s AS (
  SELECT event_type, di, n, k,
         k * n - sx AS d,
         k * sx2 - sx * sx AS v
  FROM w
)
SELECT event_type, di AS day_no, n, k,
       CASE WHEN k >= {ZS_MIN_N} AND v > 0
            THEN floor((CAST(d AS DOUBLE) / CAST(k AS DOUBLE))
                       / sqrt(CAST(v AS DOUBLE)
                              / CAST(k * k AS DOUBLE))
                       * 10000 + 0.5) / 10000 END AS z,
       (k >= {ZS_MIN_N} AND v > 0
        AND d * d * {ZS_T_DEN} > {ZS_T_NUM} * v) AS is_anomaly
FROM s ORDER BY event_type, day_no
""",
)
def e17_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the daily event-count
    series, per event type: each day's count scored against the
    trailing-{ZS_W}-day window (current day EXCLUDED — the standard
    leave-current-out control-chart rule), with a zero-filled day
    spine so silent days are scoreable data points, not missing rows
    (an outage IS the anomaly a monitor must catch).

    Parity design: mean and variance come from INTEGER window sums
    (k, Σx, Σx²) — d = k·x − Σx and V = k·Σx² − (Σx)² are exact
    integers, z = (d/k)/sqrt(V/k²) is a fixed shape of exact doubles,
    and the anomaly flag never touches a float: |z| > 2.5 ⟺
    d²·100 > 625·V in pure integer arithmetic (the t46/t50 threshold
    trick applied to second moments). Days with under {ZS_MIN_N}
    history rows or zero variance surface NULL z and false.

    Scale posture: one hash agg collapses the raw stream; everything
    after runs on the (types × days) grid — time-bounded,
    data-volume-independent (e7's spine argument); the window
    partitions per series key."""
    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "event_type",
            F.expr("unix_millis(cast(ts as timestamp)) div 86400000")
            .alias("di"),
        )
        .agg(F.count("*").alias("n"))
    )
    spine = (
        b.agg(F.min("di").alias("lo"), F.max("di").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("di"))
    )
    types = ev.select("event_type").distinct()
    # both grid sides are control-plane-sized (types x days), but only
    # the one-row span is a guaranteed single row — no forced broadcast
    grid = spine.crossJoin(types)
    g = grid.join(b, ["event_type", "di"], "left").select(
        "event_type", "di", F.coalesce("n", F.lit(0)).alias("n")
    )
    fr = (
        W.partitionBy("event_type")
        .orderBy("di")
        .rowsBetween(-ZS_W, -1)
    )
    w = g.select(
        "event_type", "di", "n",
        F.count("*").over(fr).alias("k"),
        F.coalesce(F.sum("n").over(fr), F.lit(0)).alias("sx"),
        F.coalesce(F.sum(F.col("n") * F.col("n")).over(fr), F.lit(0))
        .alias("sx2"),
    )
    s = w.select(
        "event_type", "di", "n", "k",
        (F.col("k") * F.col("n") - F.col("sx")).alias("d"),
        (F.col("k") * F.col("sx2") - F.col("sx") * F.col("sx")).alias("v"),
    )
    scoreable = (F.col("k") >= ZS_MIN_N) & (F.col("v") > 0)
    z = (F.col("d").cast("double") / F.col("k").cast("double")) / F.sqrt(
        F.col("v").cast("double")
        / (F.col("k") * F.col("k")).cast("double")
    )
    from ..exprs import round4x_col

    return s.select(
        "event_type",
        F.col("di").alias("day_no"),
        "n",
        "k",
        F.when(scoreable, round4x_col(z)).alias("z"),
        (
            scoreable
            & (F.col("d") * F.col("d") * ZS_T_DEN > ZS_T_NUM * F.col("v"))
        ).alias("is_anomaly"),
    ).orderBy("event_type", "day_no")


@register(
    "e18_markov_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY event_id) AS nxt
  FROM events
), t AS (
  SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY event_type, nxt
), w AS (
  SELECT src, dst, n,
         CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS row_total
  FROM t
)
SELECT src, dst, n, row_total,
       floor(CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE)
             * 10000 + 0.5) / 10000 AS p
FROM w ORDER BY src, dst
""",
)
def e18_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    journeys: for every consecutive event pair within a user's
    event_id-ordered stream, the (src → dst) transition count and the
    row-normalized transition probability — the user-journey model
    behind next-action prediction and funnel-drop diagnosis.

    Plan: ONE per-user window (lead) — the same shuffle class as
    e13's attribution pass — then a hash agg onto the
    type × type matrix (cardinality = event-type², a few dozen cells
    at any data volume) and a window over that tiny matrix for row
    totals. The matrix is control-plane-sized however large the
    input; per-user partitions bound the lead window. Integer counts;
    the probability is an integer-derived ratio through round4x."""
    from ..exprs import round4x

    ev = table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wu).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = s.groupBy("src", "dst").agg(F.count("*").alias("n"))
    w = t.select(
        "src", "dst", "n",
        F.sum("n").over(W.partitionBy("src")).alias("row_total"),
    )
    return w.select(
        "src", "dst", "n", "row_total",
        round4x("CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE)").alias("p"),
    ).orderBy("src", "dst")


@register(
    "e19_daily_trend",
    oracle="""
WITH b AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS di,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, epoch_ms(ts) // 86400000
), span AS (
  SELECT min(di) AS lo, max(di) AS hi FROM b
), grid AS (
  SELECT t.event_type, s.di
  FROM (SELECT unnest(range(lo, hi + 1)) AS di FROM span) s
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), g AS (
  SELECT grid.event_type, grid.di - span.lo AS x,
         CAST(COALESCE(b.n, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN b
    ON grid.event_type = b.event_type AND grid.di = b.di
  CROSS JOIN span
), s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2
  FROM g GROUP BY event_type
)
SELECT event_type, k, sy AS total,
       floor(CAST(k * sxy - sx * sy AS DOUBLE)
             / CAST(k * sx2 - sx * sx AS DOUBLE)
             * 10000 + 0.5) / 10000 AS slope_per_day,
       (k * sxy - sx * sy > 0) AS rising
FROM s ORDER BY event_type
""",
)
def e19_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear trend of the daily event-count series: the
    least-squares slope (events/day drift) every monitoring dashboard
    fits, over the zero-filled day grid so silent days pull the trend
    down instead of vanishing.

    Parity design: x is the day index, y the day's integer count —
    ALL regression sums (k, Σx, Σy, Σxy, Σx²) are exact integers, the
    slope numerator/denominator (k·Σxy − Σx·Σy, k·Σx² − (Σx)²) are
    exact integers, and the slope is ONE double division through the
    4dp floor policy. The `rising` flag compares the integer
    numerator to zero (the denominator is positive whenever ≥2 days
    exist) — no float boundary anywhere. The engine deliberately does
    NOT use regr_slope(): both engines' built-ins accumulate double
    sums in aggregation order, which is exactly the drift class the
    parity policy exists to avoid.

    Scale posture: e17's shape — one hash agg collapses the stream,
    everything after runs on the (types × days) grid."""
    from ..exprs import round4x

    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "event_type",
            F.expr("unix_millis(cast(ts as timestamp)) div 86400000")
            .alias("di"),
        )
        .agg(F.count("*").alias("n"))
    )
    span = b.agg(F.min("di").alias("lo"), F.max("di").alias("hi"))
    spine = span.select(
        "lo", F.explode(F.sequence("lo", "hi")).alias("di")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(types)
    g = grid.join(b, ["event_type", "di"], "left").select(
        "event_type",
        (F.col("di") - F.col("lo")).alias("x"),
        F.coalesce("n", F.lit(0)).alias("y"),
    )
    s = g.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sx2") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "k",
        F.col("sy").alias("total"),
        round4x(
            "CAST(k * sxy - sx * sy AS DOUBLE)"
            " / CAST(k * sx2 - sx * sx AS DOUBLE)"
        ).alias("slope_per_day"),
        (num > 0).alias("rising"),
    ).orderBy("event_type")
