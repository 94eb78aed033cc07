"""Query registry: the single source of truth for the engine's verified
operator surface (SURVEY.md §2).

Every operator is registered as ``(name, spark_fn, oracle_sql)``.
``spark_fn(spark, sf_dir) -> DataFrame`` is the engine implementation;
``oracle_sql`` is the ANSI-SQL twin DuckDB runs on the same parquet for
the driver's differential check. Non-SQL-expressible ops register with
``oracle=None`` → rows-only check.

Oracle-parity rules (SURVEY.md §4.3, verified this session):
- Sums of doubles: ``SUM(CAST(expr AS DECIMAL(38,10)))`` on BOTH sides —
  decimal addition is exact and associative, so Spark's partial/final
  aggregation order and DuckDB's sequential order produce bit-identical
  results (doubles would drift ~1e-5 absolute on 1e9-magnitude sums).
- Averages / second moments: double math + ROUND(x, 4) on both sides
  (magnitudes are small; double drift ≪ rounding resolution).
- Every computed column aliased identically on both sides.
- LIMIT-after-sort queries carry a deterministic tie-breaker key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        joins,
        scans,
        setops,
        sorts,
        tpch_extra,
        tpch_more,
        windows,
    )
    from .functions import pandas_udfs, scalar, udtf  # noqa: F401
    from . import connector, sql  # noqa: F401
    from .events import analytics  # noqa: F401
    from .cdc import materialize, routing, scd2  # noqa: F401
    from .llm import clustering  # noqa: F401
    from .llm import dedup, multimodal, similarity, text  # noqa: F401

    _LOADED = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
