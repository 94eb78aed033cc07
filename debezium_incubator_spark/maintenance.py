"""Table-maintenance operators for the materialized-state sinks
(SURVEY.md §2A A8 follow-through): streaming CDC sinks produce one file
per micro-batch per partition — at 100 TB that is millions of small
files, and scan throughput dies on open() overhead and non-clustered
row groups.

Two remedies, both pure DataFrame rewrites:

- ``compact``: coalesce a parquet directory to ~target-sized files.
- ``cluster``: range-partition + sort by the query predicate columns so
  parquet min/max row-group stats prune (the poor man's Z-order: for a
  single high-selectivity column, range clustering gives the same skip
  behavior; multi-column interleaving would need a space-filling-curve
  key, which composes here as ``cluster(df, [curve_col])``).

Both write to a NEW directory (read-modify-write in place is unsafe —
Spark reads lazily, and a failed rewrite must not destroy state); the
caller swaps the pointer, exactly like streaming/upsert.py's
``_LATEST`` protocol. At scale run them per partition-directory so a
compaction touches only closed partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``src_dir`` into ``dest_dir`` with ~target-sized files.
    Returns the output file count. Uses coalesce (no shuffle) — file
    sizing is the goal, not redistribution; pair with ``cluster`` when
    layout matters too."""
    n = max(1, -(-_dir_bytes(src_dir) // target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.coalesce(n).write.mode("overwrite").parquet(dest_dir)
    return sum(
        1 for f in os.listdir(dest_dir) if f.endswith(".parquet")
    )


def cluster(
    df: DataFrame,
    by: list[str],
    num_files: int | None = None,
) -> DataFrame:
    """Range-partition + locally sort by ``by`` so every output file
    covers a narrow key range → parquet min/max stats skip whole files
    for predicates on those columns. One shuffle (range exchange)."""
    parts = df.repartitionByRange(num_files, *by) if num_files else (
        df.repartitionByRange(*by)
    )
    return parts.sortWithinPartitions(*by)


def compact_and_cluster(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compaction + clustering in one rewrite (one shuffle total)."""
    n = max(1, -(-_dir_bytes(src_dir) // target_file_bytes))
    df = spark.read.parquet(src_dir)
    cluster(df, by, num_files=n).write.mode("overwrite").parquet(dest_dir)
    return sum(1 for f in os.listdir(dest_dir) if f.endswith(".parquet"))
