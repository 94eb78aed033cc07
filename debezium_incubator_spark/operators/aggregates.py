"""Aggregation operators (SURVEY.md §2D).

Reference basis: Debezium performs no aggregation (per-record pipeline,
/root/reference/README.md:13); this is the consumer-side query surface
every Debezium deployment delegates to a downstream engine.

Scale notes (100 TB): every groupBy here compiles to Catalyst's
partial→shuffle→final HashAggregate, so the map-side combine bounds
shuffle volume by |groups|·|partitions|, not |rows|. Low-cardinality
group keys (returnflag×linestatus = 6 groups) shuffle kilobytes even at
100 TB. High-cardinality keys (user_id) hash-distribute evenly; skewed
keys are handled by AQE skew splitting (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import money_sum, oracle_round4x, round4, round4x
from ..registry import register


# --- D1: hash aggregate (flagship; TPC-H Q1 shape) -----------------------

@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_qty,
       SUM(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_base_price,
       SUM(CAST(floor(((l_extendedprice * (1 - l_discount))) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_disc_price,
       SUM(CAST(floor(((l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → hash-agg → sort. The flagship end-to-end slice.

    Plan check: filter + 8-column projection push into the parquet scan;
    6 output groups → partial aggregation collapses before the shuffle.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            money_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            money_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
            round4("AVG(l_quantity)", "avg_qty"),
            round4("AVG(l_extendedprice)", "avg_price"),
            round4("AVG(l_discount)", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- D2: distinct aggregates ---------------------------------------------

@register(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_distinct_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct)/sum(distinct). Catalyst expands multi-distinct via
    Expand + two-phase agg; at scale the expand multiplies rows by the
    number of distinct clauses — acceptable for 3, not 30.

    Parity: the distinct sum runs exact in DECIMAL(38,10) but SURFACES as
    DOUBLE — a bare DECIMAL output column crosses toPandas as
    decimal.Decimal while DuckDB renders every DECIMAL as float64, so the
    driver's value hash would diverge (round-1 failure; no-bare-DECIMAL
    rule in registry.py)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.expr(
                "CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE)"
            ).alias("sum_distinct_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- D3: approximate count-distinct (HLL) — rows-only (engine-specific) --

@register("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ cardinality. No oracle: DuckDB's approx_count_distinct uses a
    different sketch, so results legitimately diverge (SURVEY.md §5.2).
    At 100 TB this is THE distinct-count: fixed-size sketch per group,
    mergeable map-side, no expand."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"))
        .orderBy("l_returnflag")
    )


@register("agg_hll_mergeable")
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup (Apache DataSketches, Spark 3.5+): build
    per-day sketches of user_id, then hll_union_agg merges the daily
    sketches into per-type totals WITHOUT rescanning raw rows — the
    stored-sketch pattern for incremental distinct counts at 100 TB
    (persist the binary sketch column; each new day unions in O(sketch)).
    Rows-only: DuckDB's approx sketch differs; determinism is pinned by
    the repeated-run check instead."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )


# --- D4: rollup / cube / grouping sets -----------------------------------

@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity totals via ROLLUP (Expand → single agg pass)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(money_sum("l_quantity", "sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.asc_nulls_last("l_returnflag"), F.asc_nulls_last("l_linestatus")
        )
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       SUM(CAST(floor((o_totalprice) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_price,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(money_sum("o_totalprice", "sum_price"), F.count("*").alias("n"))
        .orderBy(
            F.asc_nulls_last("o_orderstatus"), F.asc_nulls_last("o_orderpriority")
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube desugar to):
    per-flag totals, per-status totals, and the grand total in ONE scan —
    Expand multiplies each input row by the number of sets, then a single
    hash aggregate runs. At 100 TB prefer this over N separate groupBys
    (one shuffle instead of N) unless the expand factor outweighs the
    extra scans."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(money_sum("l_quantity", "sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.asc_nulls_last("l_returnflag"), F.asc_nulls_last("l_linestatus")
        )
    )


@register(
    "agg_unpivot",
    oracle="""
SELECT metric,
       SUM(CAST(floor((val) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_val,
       COUNT(*) AS n
FROM (
  UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME metric VALUE val
)
GROUP BY metric
ORDER BY metric
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 inverse: columns→rows (unpivot/melt, Spark 3.4+), then one
    aggregate over the long form. Narrow transform — no shuffle until the
    groupBy; at 100 TB the 4× row expansion is map-local and cheaper than
    4 separate scans."""
    li = table(spark, sf_dir, "lineitem")
    metrics = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return (
        li.select(*metrics)
        .unpivot([], metrics, "metric", "val")
        .groupBy("metric")
        .agg(money_sum("val", "sum_val"), F.count("*").alias("n"))
        .orderBy("metric")
    )


@register(
    "agg_regression",
    oracle="""
SELECT event_type,
       regr_count(value, user_id) AS n,
       ROUND(regr_slope(value, user_id), 4) AS slope,
       ROUND(regr_intercept(value, user_id), 4) AS icept,
       ROUND(regr_r2(value, user_id), 4) AS r2,
       ROUND(regr_avgx(value, user_id), 4) AS avgx,
       ROUND(regr_avgy(value, user_id), 4) AS avgy
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 extension: linear-regression aggregates (slope/intercept/R² of
    value vs user_id per event type) — trend detection in one pass.
    Moment sketches are mergeable, so these partial-aggregate map-side
    like sum/avg; ROUND(,4) absorbs summation-order float drift
    (verified exact at sf0.01 and sf0.1)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.regr_count("value", "user_id").alias("n"),
            F.round(F.regr_slope("value", "user_id"), 4).alias("slope"),
            F.round(F.regr_intercept("value", "user_id"), 4).alias("icept"),
            F.round(F.regr_r2("value", "user_id"), 4).alias("r2"),
            F.round(F.regr_avgx("value", "user_id"), 4).alias("avgx"),
            F.round(F.regr_avgy("value", "user_id"), 4).alias("avgy"),
        )
        .orderBy("event_type")
    )


# --- D5: collect / list-agg ----------------------------------------------

@register(
    "agg_collect",
    oracle="""
SELECT n_regionkey,
       STRING_AGG(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sort → join: deterministic list-agg (collect order is
    partition-dependent, so sort before serializing)."""
    nation = table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


# --- D8: pivot ------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "agg_pivot",
    oracle="""
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows→columns. Explicit pivot values keep the plan single-pass (no
    extra distinct-values job) — mandatory at scale."""
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)  # pivot yields null for empty cells
        .orderBy("user_id")
    )
    return out


# --- D9: percentiles / median --------------------------------------------

@register(
    "agg_percentile",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS qty_median
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation
    on the sorted column). At 100 TB prefer approx_percentile — exact
    percentile materializes per-group sorted buffers."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        round4("percentile(l_extendedprice, 0.5)", "p50"),
        round4("percentile(l_extendedprice, 0.95)", "p95"),
        round4("percentile(l_quantity, 0.5)", "qty_median"),
    )
    # round-13: the global sort's range sampler re-executed the exact-
    # percentile merge (per-group sorted buffers over 600k rows — two
    # ~2 s merge stages per run at sf0.1); the lazy localCheckpoint
    # materializes the 3-row aggregate once, the sampler reads memory.
    return agg.localCheckpoint(eager=False).orderBy("l_returnflag")


# --- D10: second-moment statistics ---------------------------------------

@register(
    "agg_stats",
    oracle=f"""
SELECT l_returnflag,
       {oracle_round4x("stddev_samp(l_quantity)", "sd_qty")},
       {oracle_round4x("var_samp(l_discount)", "var_disc")},
       {oracle_round4x("corr(l_quantity, l_extendedprice)", "corr_qty_price")},
       {oracle_round4x("covar_samp(l_discount, l_tax)", "covar_disc_tax")}
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second moments. Parity note: the source columns are FIXED-POINT
    (integer quantities, 2dp discount/tax), so their moments are rationals
    that can land exactly on 4-decimal half-boundaries where Spark
    (BigDecimal HALF_UP) and DuckDB (double round) disagree — and a
    covariance can surface IEEE ``-0.0``, which survives plain ROUND and
    hash-diverges (round-1 failure). round4x (floor(x·1e4+0.5)/1e4) on
    BOTH sides is pure IEEE double math — tie-identical across engines —
    and structurally never yields -0.0 (floor output ∈ {…,-1,+0,…}/1e4)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round4x("stddev_samp(l_quantity)").alias("sd_qty"),
            round4x("var_samp(l_discount)").alias("var_disc"),
            round4x("corr(l_quantity, l_extendedprice)").alias("corr_qty_price"),
            round4x("covar_samp(l_discount, l_tax)").alias("covar_disc_tax"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_approx_percentile")
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 scale path: approx_percentile (Greenwald-Khanna sketch,
    accuracy 10000) — the 100 TB replacement for exact percentile
    (which materializes per-group sorted buffers). Sketches are
    mergeable, so this partial-aggregates map-side like a sum. No
    oracle: DuckDB's approx_quantile uses a different sketch; the
    rows-only check pins determinism (GK is deterministic for a fixed
    partitioning; exact-percentile parity is asserted separately by
    agg_percentile)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
            ).alias("approx_p50_p95"),
            F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias(
                "approx_qty_median"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram",
    oracle="""
SELECT LEAST(GREATEST(CAST(floor(l_extendedprice / 5000) AS BIGINT), 0), 19) AS bin_id,
       CAST(LEAST(GREATEST(CAST(floor(l_extendedprice / 5000) AS BIGINT), 0), 19) * 5000 AS DOUBLE) AS bin_lo,
       COUNT(*) AS n,
       SUM(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) / CAST(10000 AS DOUBLE) AS sum_price
FROM lineitem GROUP BY 1, 2 ORDER BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (equi-width binning with edge clamping) —
    the distribution-profiling aggregate behind data-quality dashboards
    and drift checks. Bin = clamp(floor(x / width), 0, nbins-1), a pure
    integer expression on both engines (no width_bucket: its edge
    semantics differ across engines; the explicit clamp is portable and
    survives pushdown).

    Scale: one partial+final hash aggregate on a 20-value key — the
    histogram is map-side-combined to 20 rows per task regardless of
    input volume."""
    li = table(spark, sf_dir, "lineitem")
    bin_id = F.expr(
        "LEAST(GREATEST(CAST(floor(l_extendedprice / 5000) AS BIGINT), 0), 19)"
    )
    return (
        li.groupBy(
            bin_id.alias("bin_id"),
            (bin_id * 5000).cast("double").alias("bin_lo"),
        )
        .agg(
            F.count("*").alias("n"),
            money_sum("l_extendedprice", "sum_price"),
        )
        .orderBy("bin_id")
    )


@register(
    "agg_approx_top_k",
    oracle="""
SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events
GROUP BY event_type
ORDER BY cnt DESC, item
""",
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3+ heavy-hitter sketch via the built-in ``approx_top_k``
    aggregate (Spark 4): one mergeable sketch pass, KB-sized state. The
    differential check runs the sketch in its EXACT regime
    (maxItemsTracked far above the key cardinality — the sketch tracks
    every key, so counts equal GROUP BY), then re-sorts the exploded
    output deterministically; k = full cardinality makes the selection
    (not just the order) tie-proof. k is DERIVED from the data (one
    1-row control-plane count-distinct), not hardcoded — a regenerated
    fixture with more event types stays in the tie-proof full-selection
    regime instead of silently becoming a truncated tie-sensitive
    top-k. The estimation regime (cardinality above the tracked budget)
    is the CMS query's territory (t12_heavy_hitters_cms,
    error-bound-tested)."""
    ev = table(spark, sf_dir, "events")
    k = ev.select(F.countDistinct("event_type")).first()[0]
    topk = ev.agg(
        F.expr(f"approx_top_k(event_type, {int(k)}, 100000)").alias("tk")
    )
    return (
        topk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), "item")
    )


@register(
    "agg_theta_overlap",
    oracle="""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS overlap_users
FROM tu a JOIN tu b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b
""",
)
def agg_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix via Theta sketches — the mergeable sketch
    family that supports set INTERSECTION (HLL cannot): one sketch of
    user_id per event type (5 KB-sized states), then pairwise
    theta_intersection estimates on the 5×5 control-plane matrix.

    The differential check pins the sketch in its exact regime:
    distinct users (≤1.5k at sf0.1) sit far below the 2^14 nominal
    entries, so sketches retain every hash and the intersection
    estimate EQUALS the exact distinct overlap (oracle = distinct-pair
    self-join). At 100 TB (billions of users) the same plan returns
    ±1.6% estimates — but the corpus-side cost is unchanged: one scan,
    one KB-sketch per group, pairwise ops on sketches, never on rows.
    Sketch content is set-determined (smallest retained hashes), so
    results are order- and partitioning-independent."""
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id, 14)").alias("sk")
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("ska"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("skb"))
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.expr(
                "theta_sketch_estimate(theta_intersection(ska, skb))"
            ).cast("bigint").alias("overlap_users"),
        )
        .orderBy("type_a", "type_b")
    )


# --- D3/D9 exact-regime differential twins --------------------------------
#
# The sketch queries above (agg_approx_distinct, agg_hll_mergeable,
# agg_approx_percentile) are rows-only: DuckDB's sketches differ, so the
# ESTIMATES legitimately diverge. These twins pin the same Spark
# operators in their EXACT regime — inputs small enough that the sketch
# guarantees collapse to equality — so the machinery (partial
# aggregation, sketch merge, final estimate) is differentially checked
# against plain COUNT(DISTINCT) / value-at-rank oracles, the same
# template agg_approx_top_k and agg_theta_overlap use.


@register(
    "agg_approx_distinct_exact",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS nd_status,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
       CAST(COUNT(DISTINCT CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS nd_disc,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_approx_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx_count_distinct in its exact regime: with rsd 0.01
    the register array is 2^14 wide, and linear counting on n ≪ m
    occupied registers rounds to the exact cardinality as long as no two
    values collide in a register (deterministic for fixed data — and
    cardinalities here are 2 / 50 / ≤11 against 16k registers, so the
    estimate EQUALS the exact count; the register set depends only on
    the VALUE SET, which is identical at every SF for these columns, so
    sf-sweep equality proves the regime everywhere). rsd was 0.005
    through round 12: the 2^16-register buffer surfaces as ~19.6k LONG
    aggregate-buffer attributes across the three sketches (157 KB per
    group row) and measured 14.9 s at sf0.1 to the noop sink; rsd 0.01
    is the last power-of-two step that stays collision-free (0.02
    already loses a register on l_quantity: 49 ≠ 50) and runs 3.8 s —
    identical output, 4× narrower buffer (guide §2.3: narrower
    shuffle/buffer bytes). The high-cardinality estimation regime stays
    rows-only as agg_approx_distinct — same operator, same merge path,
    sketch behavior differentially pinned HERE."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_linestatus", 0.01).alias("nd_status"),
        F.approx_count_distinct("l_quantity", 0.01).alias("nd_qty"),
        F.approx_count_distinct(
            F.expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"), 0.01
        ).alias("nd_disc"),
        F.count("*").alias("n"),
    )
    # round-13: the sort's range sampler re-ran the HLL-buffer merge
    # (two ~0.7 s single-task merge stages per run); lazy
    # localCheckpoint materializes the 3-row result once (the
    # agg_percentile fix, applied to the sketch-buffer shape).
    return agg.localCheckpoint(eager=False).orderBy("l_returnflag")


@register(
    "agg_hll_exact",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id % 97) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def agg_hll_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The agg_hll_mergeable two-level rollup (daily DataSketches HLL of
    user buckets → hll_union_agg per event type) pinned in the sketch's
    exact regime: Apache DataSketches HLL starts in coupon-list/set mode,
    which counts distinct 26-bit coupons EXACTLY until it promotes to
    dense HLL (hundreds of items at lgK=12). user_id % 97 keeps every
    daily sketch and every union in that mode, so the merged estimate is
    the exact distinct count and hll_sketch_estimate rounds to it — the
    full persist-daily-sketches → union-without-rescan path checked
    against COUNT(DISTINCT). Estimation regime: agg_hll_mergeable
    (rows-only, same operators)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.hll_sketch_agg(F.expr("user_id % 97")).alias("sk")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("exact_users"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_approx_percentile_exact",
    oracle="""
WITH t AS (
  SELECT l_returnflag, l_extendedprice, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rp,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rq,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       MIN(l_extendedprice) FILTER (rp = CAST(ceil(0.5  * n) AS BIGINT)) AS p50_price,
       MIN(l_extendedprice) FILTER (rp = CAST(ceil(0.95 * n) AS BIGINT)) AS p95_price,
       MIN(l_quantity)      FILTER (rq = CAST(ceil(0.5  * n) AS BIGINT)) AS med_qty
FROM t GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_approx_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approx_percentile in its exact regime: the GK
    summary guarantees rank error ≤ N/accuracy, so with accuracy 10^7
    and N ≤ 5·10^6 the error is < 0.5 ranks — the returned sample IS the
    element at the target rank, which Spark resolves as rank
    ceil(p·N) in ascending order (verified at both fixture scales; the
    bound, not the fixture, is what makes this stable). The oracle
    states that rank directly via row_number. Ties are harmless: any
    row of a tie run carries the same value. The sketch-estimation
    regime stays rows-only as agg_approx_percentile — same operator,
    same mergeable partials."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000000)"
            ).alias("p"),
            F.expr("approx_percentile(l_quantity, 0.5, 10000000)").alias(
                "med_qty"
            ),
        )
        .select(
            "l_returnflag",
            F.col("p")[0].alias("p50_price"),
            F.col("p")[1].alias("p95_price"),
            "med_qty",
        )
        .orderBy("l_returnflag")
    )


# --- D1+: predicate aggregates (count_if / bool_and / bool_or / FILTER) --

@register(
    "agg_bool_family",
    oracle="""
SELECT event_type,
       CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(user_id % 97 = 0) AS any_mod97,
       CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_even,
       CAST(count(DISTINCT user_id) FILTER (WHERE value > 50) AS BIGINT)
         AS distinct_high_users
FROM events
GROUP BY event_type ORDER BY event_type
""",
)
def agg_bool_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-aggregate family: ``count_if`` (ANSI FILTER clause
    twin), ``bool_and`` / ``bool_or``, and a filtered DISTINCT count —
    all Tungsten hash-aggregate functions with map-side partials; the
    filtered distinct expands to the standard two-phase distinct
    rewrite. One shuffle on the group key at any scale."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 50).alias("n_high"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("user_id") % 97 == 0).alias("any_mod97"),
            F.count_if(F.col("user_id") % 2 == 0).alias("n_even"),
            F.count_distinct(
                F.when(F.col("value") > 50, F.col("user_id"))
            ).alias("distinct_high_users"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_mode_det",
    oracle="""
WITH c AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, user_id
), r AS (
  SELECT event_type, user_id, cnt,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cnt DESC, user_id DESC
         ) AS rn
  FROM c
)
SELECT event_type, user_id AS mode_user, cnt AS mode_count
FROM r WHERE rn = 1 ORDER BY event_type
""",
)
def agg_mode_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC mode (D-family closure): the built-in ``mode()``
    breaks frequency ties arbitrarily in BOTH engines — useless under a
    hash gate — so the engine's spelling is a lexicographic struct max
    over (count, value): two hash aggregations, no window, and ties
    resolve to the largest value on both sides by construction. At
    scale this beats the window spelling (no per-group sort; partial
    aggregation applies to both layers)."""
    from ..catalog import table

    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = c.groupBy("event_type").agg(
        F.max(F.struct("cnt", "user_id")).alias("m")
    )
    return top.select(
        "event_type",
        F.col("m.user_id").alias("mode_user"),
        F.col("m.cnt").alias("mode_count"),
    ).orderBy("event_type")
