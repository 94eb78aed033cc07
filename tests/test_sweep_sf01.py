"""Opt-in sf0.1 differential sweep (CLAUDE.md invariant: rounding /
tie-break behavior is SF-dependent, so the oracle sweep must also pass
at sf0.1 whenever rounding or ordering logic changes).

Run: python -m pytest tests/ -m sf01 -q            (~6 min)
Equivalent script form: python scripts/sweep_oracle.py
"""

from __future__ import annotations

import duckdb
import pytest

from debezium_incubator_spark.registry import all_oracles, all_queries

from .compare import assert_frames_match

SF01_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

ORACLES = all_oracles()


@pytest.fixture(scope="module")
def ddb_sf01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.sf01
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_sf01(name, spark, ddb_sf01):
    spark_pdf = all_queries()[name](spark, SF01_DIR).toPandas()
    oracle_pdf = ddb_sf01.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
