"""Table-maintenance operators for the materialized-state sinks
(SURVEY.md §2A A8 follow-through): streaming CDC sinks produce one file
per micro-batch per partition — at 100 TB that is millions of small
files, and scan throughput dies on open() overhead and non-clustered
row groups.

Two remedies, both pure DataFrame rewrites:

- ``compact``: coalesce a parquet directory to ~target-sized files.
- ``cluster``: range-partition + sort by the query predicate columns so
  parquet min/max row-group stats prune (for a single
  high-selectivity column, range clustering is optimal skipping).
- ``zorder_cluster``: multi-column data skipping via a Z-order
  (Morton) space-filling-curve key — bit-interleave the normalized
  dimensions, then range-cluster on the curve key. Every output file
  covers a small box in EVERY clustered dimension, so min/max stats
  prune for predicates on any of them (the public Delta/Iceberg
  OPTIMIZE ZORDER layout, built from plain expressions).

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


def zorder_key(scaled: list, bits: int):
    """Interleave the bits of pre-scaled [0, 2^bits) long columns into
    one Morton key (pure shift/and/or expressions — whole-stage
    codegen, no UDF)."""
    z = F.lit(0).cast("long")
    k = len(scaled)
    for b in range(bits):
        for i, c in enumerate(scaled):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def zorder_cluster(
    df: DataFrame,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 16,
) -> DataFrame:
    """Cluster on a Z-order curve over ``cols`` (numeric). One
    control-plane min/max aggregate normalizes each dimension to
    [0, 2^bits), bits are interleaved expression-side, and the result is
    range-partitioned + locally sorted on the curve key. One data
    shuffle total — same cost as single-column ``cluster``, but row
    groups now skip on EVERY dimension. Nulls sort into the first
    partition (null curve key). len(cols)*bits must fit a long."""
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds the 63-bit key"
        )
    row = df.agg(
        *(F.min(c).alias(f"__mn{i}") for i, c in enumerate(cols)),
        *(F.max(c).alias(f"__mx{i}") for i, c in enumerate(cols)),
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = row[f"__mn{i}"], row[f"__mx{i}"]
        span = (mx - mn) if (mx is not None and mx != mn) else 1
        scaled.append(
            F.floor(
                (F.col(c) - F.lit(mn)) / F.lit(span) * F.lit(top)
            ).cast("long")
        )
    zdf = df.withColumn("__z", zorder_key(scaled, bits))
    parts = (
        zdf.repartitionByRange(num_files, "__z")
        if num_files
        else zdf.repartitionByRange("__z")
    )
    return parts.sortWithinPartitions("__z").drop("__z")


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
