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


# --- F4: sampling ---------------------------------------------------------

@register(
    "sort_sample",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                    CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
""",
)
def sort_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sample (~12.5%): keep rows whose md5 of the
    primary key starts with one of 2/16 hex digits. This is the
    REPRODUCIBLE sampling you want in a 100 TB pipeline anyway —
    membership is a pure function of the key, so the sample is stable
    across engines, runs, retries, and re-partitioning (unlike RNG
    streams, which are engine- and partitioning-specific; that variant
    is `sort_sample_rng`). Both engines emit lowercase-hex md5 over the
    identical key rendering, so the oracle is exact."""
    li = table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return li.filter(F.substring(F.md5(key), 1, 1).isin("0", "1")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register("sort_sample_rng")
def sort_sample_rng(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample via the engine RNG (`df.sample`). No
    oracle: RNG streams are engine-specific by design; the rows-only
    check still pins determinism across runs of THIS engine (fixed seed
    + partitioning)."""
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# --- F3: partition-local sort (write clustering) --------------------------

@register(
    "sort_within_partitions",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
FROM lineitem
""",
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions: clusters rows for write-time locality (e.g.
    parquet min/max pruning on l_shipdate) without a global shuffle.
    The row SET is unchanged, so the identity projection is an exact
    oracle under the driver's order-insensitive value hash."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_returnflag")
        .sortWithinPartitions("l_shipdate")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    )
