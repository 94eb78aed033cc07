"""Differential oracle tests: every registered query runs on Spark AND
its oracle SQL on DuckDB over the same sf0.01 parquet; results must
match (row count + columns + order-insensitive values). This mirrors the
driver's CORRECTNESS gate exactly (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from debezium_incubator_spark.registry import all_oracles, all_queries

from .compare import assert_frames_match
from .conftest import SF_DIR

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    oracle_pdf = ddb.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark):
    """Non-SQL-expressible ops: must run, be deterministic across two
    executions, and produce a stable schema."""
    df1 = QUERIES[name](spark, SF_DIR)
    p1 = df1.toPandas()
    p2 = QUERIES[name](spark, SF_DIR).toPandas()
    assert list(p1.columns) == list(p2.columns)
    assert len(p1) == len(p2)
    assert_frames_match(p1, p2, name)
