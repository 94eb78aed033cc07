"""Set operations (SURVEY.md §2G).

Debezium motivation: B5 ByLogicalTableRouter merges sharded tables into
one logical stream — a union; CDC snapshot diffing is an except.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
DISTINCT/INTERSECT/EXCEPT shuffle on the full row hash — at 100 TB
project to the minimal column set first (done below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def union_shards(shards: list[DataFrame]) -> DataFrame:
    """B5 shard-merge: union by name, tolerating missing columns."""
    out = shards[0]
    for s in shards[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


@register(
    "set_union",
    oracle="""
SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer WHERE c_acctbal > 9500
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier WHERE s_acctbal > 9500
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src"))
    )
    return union_shards([c, s])


@register(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
UNION
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff primitive: keys present in one capture, absent in
    the other."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct semantics), matching SQL EXCEPT


@register(
    "set_bag_ops",
    oracle="""
SELECT 'intersect_all' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
  INTERSECT ALL
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
)
UNION ALL
SELECT 'except_all' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
  EXCEPT ALL
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
)
ORDER BY op, nationkey
""",
)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3b/G4b BAG semantics (INTERSECT ALL / EXCEPT ALL): multiplicity
    matters — a nationkey with 5 rich customers and 3 rich suppliers
    intersects 3 times and excepts 2, which the DISTINCT forms erase.
    Spark compiles both to an aggregate of per-side counts (min /
    saturating difference) — same one-shuffle cost class as DISTINCT,
    verified against the engines' own ALL spellings on both sides."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    both = c.intersectAll(s).select(
        F.lit("intersect_all").alias("op"), "nationkey"
    ).unionAll(
        c.exceptAll(s).select(F.lit("except_all").alias("op"), "nationkey")
    )
    return both.orderBy("op", "nationkey")
