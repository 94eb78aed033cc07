"""Sort / limit / sample operators (SURVEY.md §2F).

Scale notes: global sorts range-partition (sample → range bounds →
shuffle) so they scale linearly; ORDER BY + LIMIT compiles to
TakeOrderedAndProject (per-partition top-k, then k·partitions merged on
the driver) — no global sort materializes. Null placement follows the
DuckDB default (NULLS LAST on ASC) wherever order is result-relevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --- F2: top-k ------------------------------------------------------------

@register(
    "sort_topk",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (verify via .explain)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# --- F5: offset / pagination ---------------------------------------------

@register(
    "sort_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 100
""",
)
def sort_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination. Offset requires a deterministic total order — the
    o_orderkey tie-breaker makes the page boundary engine-stable."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(100)
        .limit(50)
    )


# --- F4: sampling — rows-only (engine-specific RNG) ----------------------

@register("sort_sample")
def sort_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample. No oracle: sampling RNG streams are
    engine-specific by design; the driver's rows-only check still pins
    determinism across runs of THIS engine (fixed seed + partitioning)."""
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# --- F3: partition-local sort (write clustering) — rows-only -------------

@register("sort_within_partitions")
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions: clusters rows for write-time locality (e.g.
    parquet min/max pruning on l_shipdate) without a global shuffle.
    Row SET is unchanged — rows-only check is exact here."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_returnflag")
        .sortWithinPartitions("l_shipdate")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    )
