"""Skew-handling helpers (SURVEY.md §4.3 "100 TB posture").

AQE's skew-join splitting (on in session defaults) handles most runtime
skew; these helpers are the explicit tools for the cases AQE can't see:
a hot key known in advance (celebrity user, null-heavy FK) in a join
AQE won't re-plan (e.g. already-broadcast exchange reuse, streaming).

Pattern: SALT the skewed side (append random salt 0..n-1 to the key) and
EXPLODE the other side (replicate each row n times, one per salt) — the
hot key's rows spread over n partitions instead of one straggler task.
Aggregations use two-phase salting instead: partial agg on (key, salt),
final agg on key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side exploded.

    Cost: the other side is replicated n_salts× — use only when the
    other side is much smaller than the skew penalty (or restrict
    salting to the known-hot keys and union with a plain join for the
    rest). Deterministic salt via xxhash64 of a per-row unique-ish tuple
    (not rand(): resumable & test-stable).
    """
    salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)),
    )
    exploded = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted.join(exploded, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame, key: str, aggs: list, n_salts: int = 8
) -> DataFrame:
    """Skew-proof aggregation: partial agg on (key, salt), final on key.

    ``aggs``: list of (col_expr_str, partial_fn_name, final_fn_name,
    alias) — e.g. ("value", "sum", "sum", "total"). Catalyst's own
    partial aggregation usually makes this unnecessary; it matters for
    aggregates without map-side combine (exact distinct via sets,
    collect_list) over hot keys.
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )
    partial = salted.groupBy(key, "__salt").agg(
        *[
            getattr(F, pfn)(c).alias(f"__p_{alias}")
            for c, pfn, _ffn, alias in aggs
        ]
    )
    final = partial.groupBy(key).agg(
        *[
            getattr(F, ffn)(f"__p_{alias}").alias(alias)
            for _c, _pfn, ffn, alias in aggs
        ]
    )
    return final


@register(
    "join_salted",
    oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT))
         / CAST(10000 AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join as a driver-verifiable query: orders (the
    "skewed" side) salted over 8 buckets, customer exploded 8×, joined
    on (custkey, salt) — results MUST equal the plain join (the oracle
    is the unsalted spelling; salting redistributes, never changes
    semantics). At 100 TB this is the manual fix for a hot key AQE
    cannot re-plan (already-reused exchange, streaming side)."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, "o_custkey")
    fx = "CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)"
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.expr(fx)) / F.lit(10000.0)).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_salted_two_phase",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT))
         / CAST(10000 AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation as a driver-verifiable query:
    partial agg on (event_type, salt-of-row), final on event_type —
    equal to the direct aggregate (the oracle) by the associativity of
    count/sum; the fixed-point money form keeps the equality EXACT
    (integer partials re-associate losslessly where double partials
    would drift). The explicit fallback for aggregates without
    map-side combine over hot keys."""
    ev = table(spark, sf_dir, "events").select("event_type", "value").withColumn(
        "__fx", F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)")
    )
    out = two_phase_agg(
        ev, "event_type",
        [("event_type", "count", "sum", "n"), ("__fx", "sum", "sum", "fx_sum")],
    )
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("fx_sum") / F.lit(10000.0)).alias("total_value"),
    ).orderBy("event_type")
