"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``debezium_incubator_spark.registry``: every implemented
operator from SURVEY.md §2 registers a ``(spark, sf_dir) -> DataFrame``
callable plus (where SQL-expressible) a DuckDB oracle SQL twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_incubator_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q1_pricing_summary) on /root/testdata/sf0.001."""
    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
