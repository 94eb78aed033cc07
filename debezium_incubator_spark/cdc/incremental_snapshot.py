"""Incremental snapshot (Debezium's signal-driven, DBLog-style chunked
snapshot: Netflix DBLog paper / Debezium "incremental snapshotting" —
read the table in PK-ordered chunks WHILE the change stream keeps
flowing, and reconcile so concurrent changes are never lost and never
resurrected).

Why it exists: a monolithic initial snapshot of a 100 TB table blocks
streaming for hours and cannot be resumed; chunked snapshotting is
resumable (per-chunk bookmarks), pausable, and bounded-memory.

Algorithm (per chunk, following DBLog's watermark protocol):
 1. note the current stream position L (low watermark),
 2. read chunk rows ``key ∈ (last_bookmark, bookmark]`` as ``op='r'``,
 3. note position H (high watermark),
 4. any change event for a chunk key with position in (L, H] supersedes
    the chunk's row image (the change is newer); chunk rows for keys
    changed in-window are DROPPED, the change events win.
Union of all reconciled chunks + the live stream, folded by position
(materialize_latest), equals the table state — the invariant
``test_incremental_snapshot_reconciles`` asserts.

Spark mapping: a chunk is a predicate-pushdown scan (PK range reaches
the parquet/JDBC source); reconciliation is one anti-join per chunk
against the in-window changes; everything stays declarative. At scale:
chunk bounds from an equi-width PK range (or source-side LIMIT
pagination); chunks are independent → resumable and parallelizable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_bounds(df: DataFrame, key: str, n_chunks: int) -> list[tuple]:
    """PK-range chunk boundaries via approx quantiles (source-side
    pagination in a real connector; quantiles keep chunks even under
    skewed key distributions)."""
    qs = [i / n_chunks for i in range(1, n_chunks)]
    cuts = df.approxQuantile(key, qs, 0.01)
    lo = df.agg(F.min(key)).first()[0]
    hi = df.agg(F.max(key)).first()[0]
    edges = [lo - 1] + sorted(set(int(c) for c in cuts)) + [hi]
    return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]


def snapshot_chunk(
    snapshot_df: DataFrame,
    key: str,
    bounds: tuple,
    changes: DataFrame,
    pos_col: str,
    low_watermark: int,
    high_watermark: int,
) -> DataFrame:
    """One reconciled chunk: rows in (lo, hi] minus keys that changed
    between the chunk's low and high watermarks (those keys' truth is
    the change event, which the downstream fold already has)."""
    lo, hi = bounds
    chunk = snapshot_df.filter((F.col(key) > lo) & (F.col(key) <= hi))
    in_window = changes.filter(
        (F.col(pos_col) > low_watermark) & (F.col(pos_col) <= high_watermark)
    ).select(key).distinct()
    return chunk.join(in_window, key, "left_anti")


def incremental_snapshot(
    snapshot_at,
    changes: DataFrame,
    key: str,
    pos_col: str,
    bounds: list[tuple],
    watermarks: list[tuple],
) -> DataFrame:
    """Full chunked snapshot: union of reconciled chunks, each stamped
    ``op='r'`` at position = its chunk's low watermark (so the
    position-ordered fold lets any in-window or later change win).

    ``snapshot_at(pos) -> DataFrame`` reads the live table as the chunk
    scan would see it at stream position ``pos`` — a real connector
    ignores the argument (its SELECT sees current state); the batch
    simulation replays changes up to ``pos``. ``watermarks[i] =
    (L_i, H_i)`` bracket chunk i's read, exactly DBLog's low/high
    watermark protocol.
    """
    parts = []
    for b, (lw, hw) in zip(bounds, watermarks):
        parts.append(
            snapshot_chunk(snapshot_at(hw), key, b, changes, pos_col, lw, hw)
            .withColumn("__op", F.lit("r"))
            .withColumn(pos_col, F.lit(lw).cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
