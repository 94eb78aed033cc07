"""Fused multi-query dispatch — the product answer to the per-job
dispatch floor (r10 verdict #3).

The registry's only perf-`weak` entry, ``e2_latest_per_user``, is
bounded below by Spark's ~30 ms per-action Py4J dispatch + result
fetch, not by its plan (measured r3, re-measured every round). That
floor is a PER-ACTION cost, so it amortizes the moment a caller runs
more than one query: bench.py's one-action fold of all 8 headliners
runs at ~0.21× same-box DuckDB. This module exposes that amortization
as an API instead of a bench artifact.

Two modes, two contracts:

- ``run_batch(spark, keys, sf_dir)`` — full typed results for every
  key, submitted CONCURRENTLY from a thread pool. Spark's scheduler
  runs independent actions in one JVM simultaneously, so the N
  dispatch floors overlap instead of summing (the idiomatic
  multi-tenant Spark pattern; threads are safe because each action is
  read-only and the driver conf is untouched). Results are the exact
  ``toPandas`` frames a per-query loop would produce — test-pinned
  row-identical.
- ``run_batch_digest(spark, keys, sf_dir)`` — ONE Spark action for the
  whole batch: every query folded to a single ``bit_xor(xxhash64(*))``
  row and unioned under a tagging column (the bench fused-fold shape,
  the cdc_table_checksum anti-entropy hash). This is the job-dispatch-
  free regime — use it for cross-engine validation sweeps and change
  detection where a digest suffices; per-branch results can't be
  fetched typed from one action without lossy re-encoding, which is
  why the full-result mode uses overlap instead of fusion.

Measured (sf0.1, local[32], idle, 8 headliners, median-of-7, plans
rebuilt per call as a cold caller would): serial per-query loop
4.05 s, ``run_batch`` 1.93 s, ``run_batch_digest`` 2.37 s. End-to-end
the win is ~2× because Python-side plan CONSTRUCTION (py4j chatter)
is serial in all modes and dominates cold calls; on pre-built plans
the digest mode reaches the bench's 0.21×-of-DuckDB fused regime
(BENCH fused_engine_sec vs 8× engine_sec).

Scale posture: both modes leave each query's plan exactly as the
registry built it (broadcasts, pushed filters, partial aggs all
intact). The digest union adds one row per query — scheduler-sized,
never data-sized. At 1000 executors the concurrent mode is how a
dashboard fan-outs its panel queries; the digest mode is how an
operator checksums 10k tables in one job wave.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import all_queries

#: concurrent actions per batch — enough to overlap dispatch floors
#: without oversubscribing the local scheduler pool.
MAX_CONCURRENCY = 8


def _resolve(keys: list[str]):
    queries = all_queries()
    unknown = [k for k in keys if k not in queries]
    if unknown:
        raise KeyError(f"run_batch: unknown query keys: {unknown}")
    if len(set(keys)) != len(keys):
        raise ValueError("run_batch: duplicate keys in batch")
    return queries


def run_batch(
    spark: SparkSession,
    keys: list[str],
    sf_dir: str,
    max_concurrency: int = MAX_CONCURRENCY,
) -> dict[str, pd.DataFrame]:
    """Run registered queries as overlapping concurrent actions.

    Returns ``{key: pandas.DataFrame}`` — each frame bit-identical to
    ``all_queries()[key](spark, sf_dir).toPandas()`` run alone (same
    plan, same Arrow fetch; only the wall-clock overlaps).
    """
    queries = _resolve(keys)
    # build every logical plan up front on the caller's thread —
    # analysis errors surface here, not inside the pool
    plans = {k: queries[k](spark, sf_dir) for k in keys}

    def fetch(k: str) -> pd.DataFrame:
        return plans[k].toPandas()

    with ThreadPoolExecutor(max_workers=max(1, max_concurrency)) as ex:
        futs = {k: ex.submit(fetch, k) for k in keys}
        return {k: futs[k].result() for k in keys}


def digest_plan(df: DataFrame, key: str) -> DataFrame:
    """One query's digest branch: (q, n, h) — row count + order-free
    bit_xor of per-row xxhash64 over every column (the
    cdc_table_checksum fold). Schema-uniform, so any mix of queries
    unions cleanly."""
    return df.select(F.xxhash64(*df.columns).alias("__h")).agg(
        F.lit(key).alias("q"),
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(__h)"), F.lit(0)).alias("h"),
    )


def run_batch_digest(
    spark: SparkSession, keys: list[str], sf_dir: str
) -> dict[str, tuple[int, int]]:
    """Fold + union every query's digest under ONE Spark action.

    Returns ``{key: (row_count, bit_xor_hash)}``. The per-job dispatch
    floor is paid once for the whole batch (the bench fused regime,
    ~0.21× same-box DuckDB for the 8 headliners).
    """
    queries = _resolve(keys)
    branches = [
        digest_plan(queries[k](spark, sf_dir), k) for k in keys
    ]
    # unionAll keeps branches distinct even when two queries digest
    # identically; the tag column makes rows attributable regardless
    fused = reduce(lambda a, b: a.unionAll(b), branches)
    return {
        r["q"]: (r["n"], r["h"]) for r in fused.collect()
    }
