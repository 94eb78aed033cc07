"""Scan / projection / per-record transform operators (SURVEY.md §2A/§2B).

This is the part of the surface the reference actually has: Debezium's
snapshot scans (`snapshot.select.statement.overrides`), column
include/exclude lists, and the Kafka Connect SMT chain (Filter, MaskField,
truncate, type-coercion modes) — all per-record stateless transforms
[/root/reference/README.md:13; SURVEY.md §2B reconstruction]. Here each
becomes a declarative projection/filter that Catalyst pushes into the
parquet scan (check: `PushedFilters`/`ReadSchema` in .explain) — the
Spark analog of Debezium pushing the snapshot predicate into the source
SELECT.

Scale: pushdown means a 100 TB scan with a selective predicate reads only
matching row groups and only projected columns; none of these operators
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def project(df: DataFrame, include: list[str] | None = None,
            exclude: list[str] | None = None) -> DataFrame:
    """B1 `column.include.list` / `column.exclude.list` as an operator."""
    if include:
        df = df.select(*include)
    if exclude:
        df = df.drop(*exclude)
    return df


def mask_columns(df: DataFrame, mask_with_length: dict[str, int] | None = None,
                 hash_mask: list[str] | None = None) -> DataFrame:
    """B7 `column.mask.with.length.chars` + `column.mask.hash.*`."""
    for col, n in (mask_with_length or {}).items():
        df = df.withColumn(col, F.lit("*" * n))
    for col in hash_mask or []:
        df = df.withColumn(col, F.sha2(F.col(col).cast("string"), 256))
    return df


def truncate_columns(df: DataFrame, lengths: dict[str, int]) -> DataFrame:
    """B8 `column.truncate.to.length.chars`."""
    for col, n in lengths.items():
        df = df.withColumn(col, F.substring(F.col(col), 1, n))
    return df


# --- A3/B1: snapshot scan + projection -----------------------------------

@register(
    "scan_project",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment FROM customer
""",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning reaches the scan: ReadSchema lists exactly 3 cols."""
    return project(table(spark, sf_dir, "customer"),
                   include=["c_custkey", "c_name", "c_mktsegment"])


# --- A4: filtered snapshot (predicate pushdown) --------------------------

@register(
    "scan_filter_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 10
""",
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium's `snapshot.select.statement.overrides` analog — the
    predicate lands in PushedFilters and skips parquet row groups."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.expr("l_shipdate >= TIMESTAMP_NTZ '2000-01-01' AND l_quantity < 10")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


# --- B3: Filter SMT (scripted predicate) ---------------------------------

@register(
    "filter_predicate",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus IN ('O', 'F'))
  AND (o_totalprice > 150000 OR o_orderpriority LIKE '1-%')
  AND o_custkey IS NOT NULL
""",
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicate (IN / LIKE / null-check / disjunction) —
    the Filter SMT's expression language, expressed to Catalyst."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("O", "F"))
        & ((F.col("o_totalprice") > 150000) | F.col("o_orderpriority").like("1-%"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# --- B7: masking ----------------------------------------------------------

@register(
    "mask_columns",
    oracle="""
SELECT c_custkey,
       '********' AS c_name,
       sha256(c_mktsegment) AS c_mktsegment
FROM customer
""",
)
def mask_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length star mask + SHA-256 hash mask (PII redaction at the
    capture boundary). Hash mask applies to string columns only — hashing
    a numeric would depend on engine-specific float→string rendering."""
    c = table(spark, sf_dir, "customer")
    out = mask_columns(
        c.select("c_custkey", "c_name", "c_mktsegment"),
        mask_with_length={"c_name": 8},
        hash_mask=["c_mktsegment"],
    )
    return out


# --- B8: truncation -------------------------------------------------------

@register(
    "truncate_columns",
    oracle="""
SELECT p_partkey, substring(p_name, 1, 10) AS p_name, substring(p_type, 1, 5) AS p_type
FROM part
""",
)
def truncate_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_type")
    return truncate_columns(p, {"p_name": 10, "p_type": 5})


# --- B10/H10: type coercion modes ----------------------------------------

@register(
    "cast_coerce",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_decimal,
       CAST(floor(o_totalprice) AS BIGINT) AS price_long,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
       CAST(o_orderstatus = 'O' AS BOOLEAN) AS is_open
FROM orders
""",
)
def cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`decimal.handling.mode` / `time.precision.mode` analogs: controlled
    casts between precise (decimal), lossy (long), and string renderings.
    Parity note on double→BIGINT: Spark CAST truncates toward zero,
    DuckDB CAST rounds half-to-even (and prices hit exact .5 values) —
    so the lossy integer rendering goes through an explicit floor() on
    BOTH sides. The decimal rendering quantizes through DECIMAL(18,2)
    but SURFACES as DOUBLE: a bare DECIMAL output hashes as
    decimal.Decimal (Spark) vs float64 (DuckDB renders every DECIMAL
    that way) — round-1 driver failure; no-bare-DECIMAL rule."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_decimal"),
        F.floor("o_totalprice").cast("bigint").alias("price_long"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        # DATE output rendered as midnight timestamp on both sides — bare
        # DATE crosses pandas as datetime.date (Spark) vs datetime64
        # (DuckDB) and would defeat the driver's value-hash.
        F.col("o_orderdate").cast("date").cast("timestamp_ntz").alias("order_date"),
        (F.col("o_orderstatus") == "O").cast("boolean").alias("is_open"),
    )
